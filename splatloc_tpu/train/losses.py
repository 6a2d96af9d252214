"""Training losses for scene mapping.

Parity targets:
- get_loss_mapping: masked L1 RGB (exposure-affine-corrected) + masked L1
  depth (reference utils/utils.py:55-82)
- get_loss_marker: BCE(sigmoid(kp_prob), gt score map) (train_gaussians.py:38-42)
- isotropic scale regularizer weighted by (1 - marker) on key primitives
  (train_gaussians.py:222-228)
- l1 + D-SSIM color-refinement loss (loss_utils.py:21-22,61-69)

All images are channels-last [H,W,C] here (TPU-friendly layout).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mapping_loss(image: jax.Array, depth: jax.Array, gt_image: jax.Array,
                 gt_depth: jax.Array, exposure_a, exposure_b,
                 rgb_boundary_threshold: float = 0.01) -> jax.Array:
    """Masked L1 rgb + L1 depth with per-frame exposure affine exp(a)*I + b.

    Matches get_loss_mapping_rgbd: pixels with sum(rgb_gt) <= thresh are
    masked out of the RGB term; depth <= 0.01 out of the depth term; both
    terms are means over *all* pixels (masked entries contribute 0).
    """
    image_ab = jnp.exp(exposure_a) * image + exposure_b
    rgb_mask = (jnp.sum(gt_image, axis=-1) > rgb_boundary_threshold)[..., None]
    depth_mask = gt_depth > 0.01
    l1_rgb = jnp.abs(image_ab * rgb_mask - gt_image * rgb_mask)
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return jnp.mean(l1_rgb) + jnp.mean(l1_depth)


def marker_loss(kp_prob_logits: jax.Array, gt_score: jax.Array) -> jax.Array:
    """BCE between sigmoid(composited kp channel) and the gt score map."""
    p = jax.nn.sigmoid(kp_prob_logits.reshape(-1))
    t = gt_score.reshape(-1)
    eps = 1e-7
    p = jnp.clip(p, eps, 1 - eps)
    return -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))


def isotropic_loss(scaling: jax.Array, marker: jax.Array, alive: jax.Array,
                   thresh: float = 0.005) -> jax.Array:
    """|mean(scale)/(0.02*(1-marker)) - 1| over key primitives
    (train_gaussians.py:222-228). marker is detached by the caller."""
    marker = jax.lax.stop_gradient(marker)
    mask = (marker > thresh) & alive
    target = 0.02 * (1.0 - marker)
    val = jnp.abs(jnp.mean(scaling, axis=-1) / target - 1.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, val, 0.0)) / denom


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over [H,W,C] images — the standard 11x11 sigma=1.5 gaussian
    window formulation used by the reference (loss_utils.py:25-69)."""
    C = img1.shape[-1]
    w = _gaussian_window(window_size)
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, C))   # HWIO, depthwise

    def filt(x):
        x = x[None]                                        # NHWC
        # HIGHEST precision: the TPU MXU's default bf16 conv makes
        # sigma^2 = E[x^2] - mu^2 catastrophically cancel on low-variance
        # (dark) windows — SSIM came out > 1 on rendered scenes
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)[0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def refinement_loss(image: jax.Array, gt_image: jax.Array,
                    lambda_dssim: float = 0.2) -> jax.Array:
    """(1-l)*L1 + l*(1 - SSIM) (train_gaussians.py:285-287)."""
    l1 = jnp.mean(jnp.abs(image - gt_image))
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(image, gt_image))
