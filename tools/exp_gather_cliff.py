"""Micro-benchmark: [PC, 128] bf16 row-gather throughput vs PC on the real
chip — chasing the 3.6x efficiency cliff between the bench-scale rank gather
(fusion.409, 282240 rows, ~325 GB/s) and the mapping-scale one (fusion.35,
646272 rows, ~91 GB/s). Also times split-output variants (gather in 2/4 row
chunks) and the narrow [:, :16] sliced form.

Run: python tools/exp_gather_cliff.py
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *a, iters=20):
    # chain a scalar carry through every iteration so nothing is elided and
    # the dispatches serialize on a real data dependency
    @jax.jit
    def loop(c, *args):
        def body(i, c):
            return c + fn(*args, c)
        return jax.lax.fori_loop(0, iters, body, c)

    out = jax.block_until_ready(loop(jnp.float32(0.0), *a))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(jnp.float32(0.0), *a))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for pc in (141184, 282240, 424064, 565888, 646272, 847232):
        slab = jnp.asarray(
            rng.normal(size=(pc, 128)).astype(np.float32)).astype(jnp.bfloat16)
        perm = jnp.asarray(rng.permutation(pc).astype(np.int32))

        def take_full(s, p, c):
            g = jnp.take(s, p + c.astype(jnp.int32) * 0, axis=0)
            return jnp.sum(g[:, :16].astype(jnp.float32))

        def take_split2(s, p, c):
            h = p.shape[0] // 2
            pc_ = p + c.astype(jnp.int32) * 0
            return sum(
                jnp.sum(jnp.take(s, q, axis=0)[:, :16].astype(jnp.float32))
                for q in (pc_[:h], pc_[h:]))

        def take_sliced(s, p, c):
            g = jnp.take(s[:, :16], p + c.astype(jnp.int32) * 0, axis=0)
            return jnp.sum(g.astype(jnp.float32))

        mb = pc * 128 * 2 * 2 / 1e6
        t_full = timeit(take_full, slab, perm)
        t_s2 = timeit(take_split2, slab, perm)
        t_sl = timeit(take_sliced, slab, perm)
        print(f"PC={pc:7d} ({mb:6.0f} MB moved): full {t_full:6.2f} ms "
              f"({mb / t_full:5.0f} GB/s)  split2 {t_s2:6.2f} "
              f"({mb / t_s2:5.0f})  sliced16 {t_sl:6.2f}",
              flush=True)


if __name__ == "__main__":
    main()
