"""Slow exact per-pixel compositor — golden oracle for the tiled rasterizer.

No tiling, no capacity limits: every pixel walks the full depth-sorted
Gaussian list. Identical math to blend.py (same clamps/termination), used by
tests to validate binning, capacity handling and tile assembly. O(H*W*N)
memory/compute — small inputs only.
"""
from __future__ import annotations

import jax.numpy as jnp

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import binning, project
from splatloc_tpu.raster.types import RasterConfig


def rasterize_reference(means3d, scales, quats, opacities, colors, camera: Camera,
                        cfg: RasterConfig = RasterConfig(), bg=None, alive=None):
    C = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((C,), jnp.float32)
    proj = project.project_gaussians(means3d, scales, quats, camera, cfg, alive=alive)
    order = binning.depth_sort(proj)
    xy = proj.xy[order]
    conic = proj.conic[order]
    dep = proj.depth[order]
    vis = proj.visible[order]
    op = opacities[order]
    col = colors[order]

    H, W = camera.height, camera.width
    px = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :], (H, 1)).reshape(-1)
    py = jnp.tile(jnp.arange(H, dtype=jnp.float32)[:, None], (1, W)).reshape(-1)

    dx = xy[:, 0:1] - px[None, :]      # [N,P]
    dy = xy[:, 1:2] - py[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(op[:, None] * jnp.exp(power), cfg.alpha_max)

    # CUDA semantics: a Gaussian is only blended at pixels whose *tile* lies
    # inside the Gaussian's rect (it is never binned elsewhere), even though
    # its alpha may exceed alpha_min slightly outside the 3-sigma bbox.
    ts = float(cfg.tile_size)
    gx = -(-camera.width // cfg.tile_size)
    gy = -(-camera.height // cfg.tile_size)
    radius = proj.radius[order]
    # exclusive max = floor((u + r)/ts) + 1 (see pairs._tile_rects note)
    rminx = jnp.clip(jnp.floor((xy[:, 0] - radius) / ts), 0, gx)
    rmaxx = jnp.clip(jnp.floor((xy[:, 0] + radius) / ts) + 1, 0, gx)
    rminy = jnp.clip(jnp.floor((xy[:, 1] - radius) / ts), 0, gy)
    rmaxy = jnp.clip(jnp.floor((xy[:, 1] + radius) / ts) + 1, 0, gy)
    ptx = jnp.floor(px / ts)[None, :]
    pty = jnp.floor(py / ts)[None, :]
    in_rect = ((rminx[:, None] <= ptx) & (ptx < rmaxx[:, None])
               & (rminy[:, None] <= pty) & (pty < rmaxy[:, None]))

    keep = (power <= 0.0) & (alpha >= cfg.alpha_min) & vis[:, None] & in_rect
    alpha = jnp.where(keep, alpha, 0.0)

    t_inc = jnp.cumprod(1.0 - alpha, axis=0)
    t_exc = jnp.concatenate([jnp.ones_like(t_inc[:1]), t_inc[:-1]], axis=0)
    w = alpha * t_exc * (t_inc >= cfg.transmittance_eps)

    img = w.T @ col + (1.0 - jnp.sum(w, axis=0))[:, None] * bg[None, :]
    depth = w.T @ dep
    alpha_out = jnp.sum(w, axis=0)
    return (img.reshape(H, W, C), depth.reshape(H, W),
            alpha_out.reshape(H, W), proj.radius.astype(jnp.int32))
