"""Triangulate on-chip numerical parity: image AND all-param gradients of
both chip paths against a CPU f32 golden.

tpu_parity_check originally compared Pallas-vs-XLA BOTH compiled on the TPU
— it cannot tell which side diverges (the XLA fallback's own TPU lowering
also uses bf16 MXU operands). This tool computes the golden
(use_pallas=False on CPU, f32 throughout; CPU pallas-interpret agrees with
it to ~4e-4 image / 4e-5 grad rel) in a subprocess, then renders + grads the
same scene through both chip paths and reports, per path:

  image: max diff, #pixels > 0.02, worst pixel
  grads: per-param max-elementwise rel (vs golden max-abs), relative L2

Run on the chip: python tools/parity_triage.py
"""
import json
import os
import subprocess
import sys

import numpy as np

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root

GOLDEN = "/tmp/parity_golden.npz"
PARAMS = ("means", "scales", "quats", "opac", "colors")


def scene():
    H, W, N = 240, 320, 20_000
    rng = np.random.default_rng(3)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(1., 6., N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5., -3.2, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    tgt = rng.uniform(0, 1, (H, W, 4)).astype(np.float32)
    return H, W, means, scales, quats, opac, colors, tgt


def run_path(use_pallas):
    import jax
    import jax.numpy as jnp
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import rasterize, RasterConfig

    H, W, means, scales, quats, opac, colors, tgt = scene()
    cam = Camera.create(np.eye(4, dtype=np.float32), 160., 160., W / 2,
                        H / 2, W, H)
    cfg = RasterConfig(use_pallas=use_pallas, tile_chunk=64)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
    tgt = jnp.asarray(tgt)

    def loss(*a):
        out = rasterize(*a, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    img = jax.jit(lambda *a: rasterize(*a, cam, cfg).image)(*args)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    return np.asarray(img), [np.asarray(x) for x in g]


def img_stats(a, golden):
    d = np.abs(a - golden)
    flat = np.argmax(d.max(axis=-1).reshape(-1))
    y, x = divmod(int(flat), golden.shape[1])
    return {"max": round(float(d.max()), 5),
            "n_px_gt_0.02": int((d.max(axis=-1) > 0.02).sum()),
            "worst_px": [y, x]}


def grad_stats(g, gg):
    out = {}
    for name, a, b in zip(PARAMS, g, gg):
        d = np.abs(a - b)
        scale = max(np.abs(b).max(), 1e-8)
        l2 = float(np.linalg.norm(d) / max(np.linalg.norm(b), 1e-8))
        out[name] = {"max_rel": round(float(d.max() / scale), 5),
                     "l2_rel": round(l2, 6),
                     "finite": bool(np.isfinite(a).all())}
    return out


def main():
    if "--golden" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        img, g = run_path(False)
        np.savez(GOLDEN, img=img, **dict(zip(PARAMS, g)))
        return
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, __file__, "--golden"], check=True,
                   env=env)
    z = np.load(GOLDEN)
    golden_img = z["img"]
    golden_g = [z[p] for p in PARAMS]
    img_x, g_x = run_path(False)
    img_p, g_p = run_path(True)
    print(json.dumps({
        "tool": "parity_triage",
        "xla": {"image": img_stats(img_x, golden_img),
                "grads": grad_stats(g_x, golden_g)},
        "pallas": {"image": img_stats(img_p, golden_img),
                   "grads": grad_stats(g_p, golden_g)},
    }))


if __name__ == "__main__":
    main()
