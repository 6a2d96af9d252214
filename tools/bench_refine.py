"""Quantified render-loss pose refinement benchmark (VERDICT r1 item 6).

Perturbs the ground-truth camera pose of a reference-scale scene (640x480,
100k Gaussians) by a KNOWN epsilon (default ~5 cm translation + ~5 deg
rotation, several seeds), runs match.localize.refine_pose, and reports the
median translation/rotation error before/after plus refinement iters/s.

Run on the chip: python tools/bench_refine.py [n_seeds]
Prints one JSON line; the table lands in PARITY.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(n_seeds: int = 5, N: int = 100_000, W: int = 640, H: int = 480):
    from splatloc_tpu.core import transforms
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.scene.gaussians import GaussianScene
    from splatloc_tpu.raster import render, RasterConfig
    from splatloc_tpu.match.localize import refine_pose

    from quality_gate import make_gt_scene

    rng = np.random.default_rng(0)

    def inv_sig(x):
        return np.log(x / (1 - x))

    # structured room scene (walls + clutter, smooth colors): photometric
    # refinement needs image structure; a uniform random cloud has no basin
    means, scales, quats, opac, colors = make_gt_scene(N, rng)
    sc = GaussianScene.empty(N)
    sc = sc.replace(
        xyz=jnp.asarray(means),
        f_dc=jnp.asarray(colors[:, None, :]),
        scaling=jnp.asarray(np.log(scales)),
        rotation=jnp.asarray(quats),
        opacity=jnp.asarray(
            inv_sig(np.clip(opac, 0.01, 0.99))[:, None].astype(np.float32)),
        alive=jnp.ones((N,), bool))
    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0,
                        (W - 1) / 2, (H - 1) / 2, W, H)
    cfg = RasterConfig(use_pallas=jax.default_backend() != "cpu")
    gt_img = jax.jit(lambda: render(sc, cam, cfg)["render"])()
    jax.block_until_ready(gt_img)

    t_errs0, r_errs0, t_errs1, r_errs1, iters_all = [], [], [], [], []
    t_run = 0.0
    for seed in range(n_seeds):
        srng = np.random.default_rng(100 + seed)
        axis = srng.normal(size=3)
        axis /= np.linalg.norm(axis)
        tdir = srng.normal(size=3)
        tdir /= np.linalg.norm(tdir)
        xi = np.concatenate([0.05 * tdir,                 # 5 cm
                             np.radians(5.0) * axis]).astype(np.float32)
        w2c0 = np.asarray(transforms.se3_exp(jnp.asarray(xi)) @ jnp.eye(4))

        t0, r0 = _pose_err(w2c0, np.eye(4))
        t_start = time.perf_counter()
        dxi, info = refine_pose(sc, cam, w2c0, gt_img, iters=100)
        jax.block_until_ready(dxi)
        t_run += time.perf_counter() - t_start
        w2c1 = np.asarray(transforms.se3_exp(dxi) @ jnp.asarray(w2c0))
        t1, r1 = _pose_err(w2c1, np.eye(4))
        t_errs0.append(t0); r_errs0.append(r0)
        t_errs1.append(t1); r_errs1.append(r1)
        iters_all.append(float(info["iters"]))
        print(f"[refine seed {seed}] {t0*100:.2f}cm/{r0:.2f}deg -> "
              f"{t1*100:.3f}cm/{r1:.3f}deg in {float(info['iters']):.0f} it",
              file=sys.stderr, flush=True)

    iters_per_s = sum(iters_all) / t_run
    res = {
        "metric": "pose_refine_5cm5deg",
        "median_t_cm": round(float(np.median(t_errs1)) * 100, 3),
        "median_r_deg": round(float(np.median(r_errs1)), 3),
        "start_t_cm": round(float(np.median(t_errs0)) * 100, 2),
        "start_r_deg": round(float(np.median(r_errs0)), 2),
        "t_reduction_x": round(float(np.median(t_errs0) /
                                     max(np.median(t_errs1), 1e-9)), 1),
        "r_reduction_x": round(float(np.median(r_errs0) /
                                     max(np.median(r_errs1), 1e-9)), 1),
        "iters_per_s": round(iters_per_s, 1),
        "n_seeds": n_seeds,
    }
    print(json.dumps(res), flush=True)
    return res


def _pose_err(w2c_a, w2c_b):
    """(translation m, rotation deg) between two w2c poses (camera-center
    translation error, geodesic rotation error — eval protocol of
    eval/metrics.py pose_errors)."""
    ca = -w2c_a[:3, :3].T @ w2c_a[:3, 3]
    cb = -w2c_b[:3, :3].T @ w2c_b[:3, 3]
    t = float(np.linalg.norm(ca - cb))
    R = w2c_a[:3, :3] @ w2c_b[:3, :3].T
    r = float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))
    return t, r


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
