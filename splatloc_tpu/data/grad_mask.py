"""Scharr-gradient edge mask (reference utils/camera_utils.py:145-172).

Carried for capability parity: the reference computes it per keyframe
(train_gaussians.py:329) as a vestigial MonoGS tracking hook; the SplatLoc
mapping losses never consume it. Vectorized: the reference's 32x32 Python
block loop becomes one reshape + per-block median.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _conv2(img, k):
    return jax.lax.conv_general_dilated(
        img[None, :, :, None], k[:, :, None, None], (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("dataset_type", "rows", "cols"))
def compute_grad_mask(rgb: jax.Array, edge_threshold: float = 4.0,
                      dataset_type: str = "replica", rows: int = 32,
                      cols: int = 32) -> jax.Array:
    """rgb [H,W,3] in [0,1] -> edge mask [H,W] (1 = high-gradient pixel)."""
    gray = jnp.mean(rgb, axis=-1)
    scharr_x = jnp.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]],
                         jnp.float32) / 32.0
    scharr_y = scharr_x.T
    gx = _conv2(gray, scharr_x)
    gy = _conv2(gray, scharr_y)
    inten = jnp.sqrt(gx * gx + gy * gy)

    H, W = gray.shape
    if dataset_type == "replica" and H % rows == 0 and W % cols == 0:
        bh, bw = H // rows, W // cols
        blocks = inten.reshape(rows, bh, cols, bw).transpose(0, 2, 1, 3)
        med = jnp.median(blocks.reshape(rows, cols, -1), axis=-1)
        thr = (med * edge_threshold)[:, :, None, None]
        mask = (blocks > thr).astype(jnp.float32)
        return mask.transpose(0, 2, 1, 3).reshape(H, W)
    med = jnp.median(inten)
    return (inten > med * edge_threshold).astype(jnp.float32)
