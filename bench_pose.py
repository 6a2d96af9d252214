"""Secondary benchmark: render-loss 6-DoF pose-refinement iterations/s
(BASELINE.md north-star "pose-opt iters/s"). One iteration = full
differentiable render + gradient w.r.t. the SE(3) twist + SGD update,
640x480, 100k Gaussians. Prints one JSON line (same schema as bench.py).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from splatloc_tpu.core import transforms
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import rasterize, RasterConfig

    H, W, N = 480, 640, 100_000
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                      rng.uniform(1.0, 8.0, N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5.5, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))

    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(use_pallas=jax.default_backend() != "cpu")
    target = rasterize(*args, cam, cfg).image

    def step(xi):
        def loss(xi):
            w2c = transforms.se3_exp(xi) @ cam.w2c
            out = rasterize(*args, cam.replace_pose(w2c), cfg)
            return jnp.mean(jnp.abs(out.image - target))
        g = jax.grad(loss)(xi)
        return xi - 1e-3 * g

    @jax.jit
    def run(xi, iters):
        # chained inside ONE program (traced bound -> one compile): the
        # axon tunnel costs ~120 ms per dispatch+sync, which per-iteration
        # dispatch would add to every iteration of what steady-state
        # refinement runs device-side
        return jax.lax.fori_loop(0, iters, lambda _, x: step(x), xi)

    xi = jnp.array([0.02, -0.01, 0.01, 0.005, -0.004, 0.006])
    jax.block_until_ready(run(xi, 1))
    iters = 50
    t0 = time.perf_counter()
    xi = run(xi, iters)
    jax.block_until_ready(xi)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "pose_opt",
        "value": round(iters / dt, 2),
        "unit": "iters/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
