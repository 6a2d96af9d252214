"""On-chip numerical parity: the Mosaic-compiled Pallas rasterizer vs the
pure-XLA fallback path, forward image + all-param gradients.

This catches what the CPU test suite structurally cannot: the CPU runs the
Pallas kernels in interpret mode, so a Mosaic-lowering numeric (e.g. MXU
bf16 operand rounding — found in round 2: power evaluated via a bf16 MXU
contraction dropped splat centers, max image error 0.73) only shows up here.

Run on the chip: python tools/tpu_parity_check.py
Prints one JSON line; "ok" requires image parity <= 0.02 and finite grads
with <= 2% relative deviation. (The XLA path itself differs from f64 truth
by ~1e-3 on TPU; the blend-accumulation MXU dots keep bf16 operands by
design — exact variants sent the Mosaic compile into the tens of minutes —
so the bound is loose-ish but catches structural breakage.)
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize, RasterConfig


def main():
    H, W, N = 240, 320, 20_000
    rng = np.random.default_rng(3)
    means = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(1., 6., N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5., -3.2, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.9, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    cam = Camera.create(np.eye(4, dtype=np.float32), 160., 160., W / 2,
                        H / 2, W, H)
    tgt = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))

    def make(cfg):
        def loss(*a):
            out = rasterize(*a, cam, cfg)
            return (jnp.mean(jnp.abs(out.image - tgt))
                    + 0.1 * jnp.mean(out.depth))
        return (jax.jit(lambda *a: rasterize(*a, cam, cfg).image),
                jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))))

    fwd_p, grad_p = make(RasterConfig(use_pallas=True, tile_chunk=64))
    fwd_x, grad_x = make(RasterConfig(use_pallas=False, tile_chunk=64))
    img_d = float(jnp.abs(fwd_p(*args) - fwd_x(*args)).max())
    gp, gx = grad_p(*args), grad_x(*args)
    rels, finite = {}, True
    for name, a, b in zip(("means", "scales", "quats", "opac", "colors"),
                          gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        finite &= bool(np.isfinite(a).all())
        rels[name] = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-8))
    ok = img_d <= 0.02 and finite and max(rels.values()) <= 0.02
    print(json.dumps({"ok": ok, "image_max_diff": round(img_d, 5),
                      "grad_rel": {k: round(v, 5) for k, v in rels.items()},
                      "finite": finite}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
