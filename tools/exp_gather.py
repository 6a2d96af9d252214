"""Micro-benchmark XLA row-gather formulations on the chip — chasing the
map-scale pack-gather anomaly (ONCHIP_r03 profile_map: [941952,16] gather
from a [262785,16] table costs 6.95 ms = 135M rows/s, while the IDENTICAL
gather at bench scale ([454272] rows from a [100001,16] table) runs at
750M rows/s). Hypothesis: a table-size cliff (small tables are staged in
VMEM; big ones gather row-by-row from HBM).

Variants:
  direct    jnp.take(table, idx, axis=0)
  split-K   K gathers against [S,16] table slices (each VMEM-sized) with
            shifted+clamped indices, summed (rows unique -> masked add)
  transposeT jnp.take(table.T [16,M] along axis=1)

Run on chip: python tools/exp_gather.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root


def bench(fn, table, idx, label="", iters=20):
    # chain iterations in ONE program (per-dispatch tunnel latency ~5 ms);
    # each iteration's indices depend on the previous output so XLA cannot
    # CSE or DCE the repeats (the perturbation is a data-dependent zero)
    @jax.jit
    def many(t, i):
        def body(_, carry):
            i_k, acc = carry
            out = fn(t, i_k)
            # consume the WHOLE output (a single-element consume lets XLA
            # DCE the gather down to one row) and perturb the next indices
            # ELEMENTWISE with a data-dependent zero (s*0 folds to 0 and the
            # loop-invariant gather gets hoisted — measured 0.01 ms
            # "gathers" both ways)
            s = jnp.sum(out)
            pert = (jnp.abs(jnp.ravel(out)[0]) > 1e30).astype(jnp.int32)
            return i_k + pert, acc + s
        _, acc = jax.lax.fori_loop(0, iters, body, (i, jnp.float32(0)))
        return acc
    jax.block_until_ready(many(table, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(many(table, idx))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:42s} {dt:8.3f} ms", flush=True)
    return dt


def split_gather(table, idx, K):
    M = table.shape[0]
    S = -(-M // K)
    pad = jnp.pad(table, ((0, K * S - M), (0, 0)))
    out = jnp.zeros((idx.shape[0], table.shape[1]), table.dtype)
    for k in range(K):
        sl = pad[k * S:(k + 1) * S]
        loc = idx - k * S
        inrange = (loc >= 0) & (loc < S)
        g = jnp.take(sl, jnp.clip(loc, 0, S - 1), axis=0)
        out = out + jnp.where(inrange[:, None], g, 0.0)
    return out


def main():
    rng = np.random.default_rng(0)
    PC = 941952
    results = {}
    for M in (100_001, 262_785):
        table = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
        # ascending-run index pattern like real pair_idx (per-tile ascending)
        idx = jnp.asarray(np.sort(rng.integers(0, M, PC).astype(np.int32)
                                  .reshape(-1, 128), axis=1).reshape(-1))
        r = {}
        r["direct"] = bench(lambda t, i: jnp.take(t, i, axis=0), table, idx,
                            label=f"direct M={M}")
        # materialized: barrier blocks the gather+reduce fusion, so the
        # [PC,16] output is written to HBM in its (8,128)-tiled layout —
        # the form the real program consumes (fused direct reads 430 GB/s)
        r["direct_mat"] = bench(
            lambda t, i: jax.lax.optimization_barrier(
                jnp.take(t, i, axis=0)), table, idx,
            label=f"direct_mat M={M}")
        r["direct_mat_T"] = bench(
            lambda t, i: jax.lax.optimization_barrier(
                jnp.take(t, i, axis=0)).T, table, idx,
            label=f"direct_mat_T M={M}")
        for K in (2, 3, 4, 6):
            r[f"split{K}"] = bench(
                lambda t, i, K=K: split_gather(t, i, K), table, idx,
                label=f"split{K} M={M}")
        r["transposed"] = bench(
            lambda t, i: jnp.take(t.T, i, axis=1).T, table, idx,
            label=f"transposed M={M}")
        results[str(M)] = {k: round(v, 3) for k, v in r.items()}
    print(json.dumps({"tool": "exp_gather", "pc": PC, "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
