"""Mosaic-validate the one-pass Pallas segmented scan (SEGSCAN_MODE
"pallas") against the XLA Hillis-Steele fallback ON THE CHIP, through the
full backward (the scan only runs inside the grad program).

Prints one JSON line: ok requires max relative gradient deviation <= 1e-4
(both modes sum the same per-pair values in the same order; only the
carry/roll mechanics differ) plus finiteness. Also reports per-iter times
so the ~0.7 ms/iter saving is verified, and — if ok — the flip to make:
set pallas_raster.SEGSCAN_MODE = "pallas".
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import pallas_raster, rasterize, RasterConfig


def main():
    H, W, N = 480, 640, 100_000
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                      rng.uniform(1.0, 8.0, N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5.5, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))
    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0, W / 2,
                        H / 2, W, H)
    cfg = RasterConfig(use_pallas=True)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))

    def loss(*a):
        out = rasterize(*a, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    results = {}
    for mode in ("xla", "pallas"):
        pallas_raster.SEGSCAN_MODE = mode
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        t0 = time.perf_counter()
        out = jax.block_until_ready(g(*args))
        compile_s = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        results[mode] = {
            "grads": [np.asarray(x) for x in out],
            "ms": (time.perf_counter() - t0) / iters * 1e3,
            "compile_s": round(compile_s, 1),
        }
        jax.clear_caches()   # force a fresh compile for the other mode

    devs = []
    finite = True
    for a, b in zip(results["xla"]["grads"], results["pallas"]["grads"]):
        finite &= bool(np.isfinite(a).all() and np.isfinite(b).all())
        scale = np.abs(a).max() + 1e-12
        devs.append(float(np.abs(a - b).max() / scale))
    ok = finite and max(devs) <= 1e-4
    print(json.dumps({
        "tool": "segscan_onchip_check", "ok": ok, "finite": finite,
        "max_rel_dev": round(max(devs), 8),
        "ms_xla": round(results["xla"]["ms"], 2),
        "ms_pallas": round(results["pallas"]["ms"], 2),
        "compile_s_pallas": results["pallas"]["compile_s"],
        "action": ("flip pallas_raster.SEGSCAN_MODE to 'pallas'" if ok
                   else "keep 'xla'"),
    }), flush=True)


if __name__ == "__main__":
    main()
