"""Layout micro-experiment: is a [N, k<<128] f32 array lane-padded to 128
on TPU (T(8,128) tiling -> 32x physical bytes at k=4), making every
elementwise pass over per-Gaussian [N,3]/[N,4] state ~32x more HBM traffic
than the same data as [k, N] or flat [N*k]?

Times chained elementwise updates over three representations of the same
1.6 MB of logical data. Run on chip: python tools/exp_layout.py
"""
from __future__ import annotations
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(x, iters=300):
    @jax.jit
    def run(v, n):
        def body(_, s):
            return s * 1.0000001 + 1e-9
        return jax.lax.fori_loop(0, n, body, v)

    jax.block_until_ready(run(x, 1))
    jax.block_until_ready(run(x, 1))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 100_000
    rng = np.random.default_rng(0)
    base = rng.random((N, 4)).astype(np.float32)
    res = {
        "ms_Nx4": round(bench(jnp.asarray(base)), 4),
        "ms_4xN": round(bench(jnp.asarray(base.T.copy())), 4),
        "ms_flat": round(bench(jnp.asarray(base.reshape(-1))), 4),
        "ms_Nx128": round(bench(jnp.asarray(
            rng.random((N, 128)).astype(np.float32))), 4),
    }
    res["pad_factor_vs_flat"] = round(res["ms_Nx4"] / res["ms_flat"], 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
