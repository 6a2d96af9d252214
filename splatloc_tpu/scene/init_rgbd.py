"""Keypoint-aware Gaussian initialization from an RGB-D frame.

Jittable (fixed-budget) re-design of the reference's per-keyframe point
creation (gaussian_model.py:119-248): keypoint pixels (SuperPoint score >
0.005, no downsampling) plus non-keypoint pixels randomly downsampled 64x,
back-projected through the camera, colored from the exposure-corrected image,
with isotropic log-scale from the 3-NN mean squared distance times the
(adaptive) point size. New Gaussians: opacity logit 0 (sigmoid 0.5), identity
rotation, marker = score, kp_score raw 0.5.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatloc_tpu.core import sh as sh_mod
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.knn import mean_dist2_3nn
from splatloc_tpu.scene import optim
from splatloc_tpu.scene.gaussians import GaussianScene


def _select_first(mask2d: jax.Array, budget: int):
    """Row-major first-``budget`` selected pixel indices (matches the
    reference's np.argwhere ordering). Returns (flat_idx [B], valid [B])."""
    flat = mask2d.reshape(-1)
    n = flat.shape[0]
    pos = jnp.cumsum(flat) - 1
    dst = jnp.where(flat & (pos < budget), pos, budget)
    out = jnp.zeros((budget + 1,), jnp.int32)
    out = out.at[dst].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(flat), budget)
    valid = jnp.arange(budget) < count
    return out[:budget], valid


def _select_random(mask2d: jax.Array, budget: int, n_take: jax.Array,
                   rng: jax.Array):
    """Random ``n_take`` selected pixels (reference np.random.choice
    downsampling, gaussian_model.py:160-166)."""
    flat = mask2d.reshape(-1)
    pri = jnp.where(flat, jax.random.uniform(rng, flat.shape), -1.0)
    _, idx = jax.lax.top_k(pri, budget)
    count = jnp.minimum(jnp.minimum(n_take, jnp.sum(flat)), budget)
    valid = jnp.arange(budget) < count
    return idx.astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("kp_budget", "nonkp_budget",
                                             "downsample",
                                             "adaptive_pointsize"))
def frame_to_gaussians(
    rgb: jax.Array,          # [H,W,3] in [0,1]
    depth: jax.Array,        # [H,W] metric
    score: jax.Array,        # [H,W] SuperPoint saliency
    camera: Camera,
    rng: jax.Array,
    exposure_a: jax.Array | float = 0.0,
    exposure_b: jax.Array | float = 0.0,
    kp_budget: int = 16384,
    nonkp_budget: int = 8192,
    downsample: int = 64,
    point_size: float = 0.05,
    adaptive_pointsize: bool = True,
    score_thresh: float = 0.005,
):
    """Returns (values dict for GaussianScene.insert, valid [B])."""
    H, W = depth.shape
    kp_budget = min(kp_budget, H * W)
    nonkp_budget = min(nonkp_budget, H * W)
    image_ab = jnp.clip(jnp.exp(exposure_a) * rgb + exposure_b, 0.0, 1.0)

    kp_mask = (depth > 0.0) & (score > score_thresh)
    nonkp_mask = (depth > 0.0) & (score <= score_thresh)
    kp_idx, kp_valid = _select_first(kp_mask, kp_budget)
    n_take = jnp.sum(nonkp_mask) // downsample
    nk_idx, nk_valid = _select_random(nonkp_mask, nonkp_budget, n_take, rng)

    idx = jnp.concatenate([kp_idx, nk_idx])
    valid = jnp.concatenate([kp_valid, nk_valid])
    rows = (idx // W).astype(jnp.float32)
    cols = (idx % W).astype(jnp.float32)
    d = depth.reshape(-1)[idx]
    uv = jnp.stack([cols, rows], axis=-1)
    xyz = camera.backproject(uv, d)
    col = image_ab.reshape(-1, 3)[idx]
    sc = score.reshape(-1)[idx]

    if adaptive_pointsize:
        psize = jnp.minimum(0.05, point_size * jnp.median(depth))
    else:
        psize = point_size
    dist2 = jnp.clip(mean_dist2_3nn(xyz, valid), 1e-7, None) * psize
    log_scale = 0.5 * jnp.log(dist2)                     # log(sqrt(dist2))

    B = idx.shape[0]
    values = {
        "xyz": xyz,
        "f_dc": sh_mod.rgb_to_sh(col)[:, None, :],
        "f_rest": jnp.zeros((B, 0, 3), jnp.float32),
        "scaling": jnp.tile(log_scale[:, None], (1, 3)),
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (B, 1)),
        "opacity": jnp.zeros((B, 1), jnp.float32),       # sigmoid^-1(0.5)
        "marker": sc[:, None],
        "kp_score": jnp.full((B, 1), 0.5, jnp.float32),
    }
    return values, valid


def add_frame(scene: GaussianScene, opt_state: optim.AdamState,
              rgb, depth, score, camera: Camera, rng,
              exposure_a=0.0, exposure_b=0.0, sh_rest: int = 0, **kw):
    """Insert a new RGB-D keyframe into the scene (reference
    extend_from_pcd_seq). Returns (scene, opt_state, n_added)."""
    values, valid = frame_to_gaussians(rgb, depth, score, camera, rng,
                                       exposure_a, exposure_b, **kw)
    if scene.f_rest.shape[1] != values["f_rest"].shape[1]:
        B = valid.shape[0]
        values["f_rest"] = jnp.zeros((B, scene.f_rest.shape[1], 3), jnp.float32)
    dst, ok = scene.slots_for(valid)
    new = {k: getattr(scene, k).at[dst].set(values[k], mode="drop")
           for k in scene.PARAM_FIELDS}
    scene = scene.replace(alive=scene.alive.at[dst].set(True, mode="drop"),
                          **new)
    opt_state = optim.zero_slots(opt_state, dst)
    return scene, opt_state, jnp.sum(ok)
