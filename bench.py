"""Headline benchmark: differentiable rasterization fwd+bwd throughput.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the full differentiable pipeline (project -> sort -> bin -> blend,
forward + backward to all Gaussian params) at 640x480 with 100k Gaussians on
whatever device JAX selects (the real TPU chip under the driver).

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); we normalize against 100 Mpix/s fwd+bwd — the order of
magnitude of the reference CUDA diff-gaussian-rasterization on the
consumer GPUs it ships for — so vs_baseline=1.0 means CUDA-class speed.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import rasterize, RasterConfig

    H, W, N = 480, 640, 100_000
    rng = np.random.default_rng(0)
    means = np.stack([
        rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
        rng.uniform(1.0, 8.0, N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5.5, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    target = rng.uniform(0, 1, (H, W, 4)).astype(np.float32)

    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(tile_size=16, max_per_tile=1024, tile_chunk=64, use_pallas=True)

    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
    tgt = jnp.asarray(target)

    def loss_fn(means, scales, quats, opac, colors):
        out = rasterize(means, scales, quats, opac, colors, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    # warmup/compile
    g = step(*args)
    jax.block_until_ready(g)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    mpix_s = H * W * iters / dt / 1e6
    baseline = 100.0  # Mpix/s fwd+bwd, CUDA-class nominal (see docstring)
    print(json.dumps({
        "metric": "rasterize_fwd_bwd",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
