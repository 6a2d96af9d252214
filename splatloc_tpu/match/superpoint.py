"""SuperPoint keypoint detector + descriptor in JAX.

Port of the architecture the reference uses through hloc's
``superpoint_inloc`` extractor (pre_process/extract_save_sp_feature.py:56-67,
test.py:122-126): VGG-style shared encoder, 65-way cell softmax detector
(8x8 cells + dustbin), 256-d descriptor head with bilinear upsampling and L2
normalization, NMS radius 4, up to 4096 keypoints.

Weights are converted from the public superpoint_v1.pth with
``tools/convert_superpoint.py`` (this environment has no network egress, so
conversion runs wherever the checkpoint is available). Random-weight
initialization is provided for architecture tests.

All convs run channels-last; the grid math is static-shape and jittable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels) of the shared encoder, pools after conv1b/2b/3b
_ENCODER = [("conv1a", 64), ("conv1b", 64), ("conv2a", 64), ("conv2b", 64),
            ("conv3a", 128), ("conv3b", 128), ("conv4a", 128),
            ("conv4b", 128)]
_POOL_AFTER = {"conv1b", "conv2b", "conv3b"}


def init_params(key: jax.Array, desc_dim: int = 256) -> dict:
    """Random weights with the correct shapes (for tests / shape checks)."""
    params = {}
    cin = 1
    k = key
    for name, cout in _ENCODER:
        k, sub = jax.random.split(k)
        params[f"{name}_w"] = jax.random.normal(
            sub, (3, 3, cin, cout), jnp.float32) * np.sqrt(2.0 / (9 * cin))
        params[f"{name}_b"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    heads = [("convPa", 3, 128, 256), ("convPb", 1, 256, 65),
             ("convDa", 3, 128, 256), ("convDb", 1, 256, desc_dim)]
    for name, ksz, ci, co in heads:
        k, sub = jax.random.split(k)
        params[f"{name}_w"] = jax.random.normal(
            sub, (ksz, ksz, ci, co), jnp.float32) * np.sqrt(2.0 / (ksz * ksz * ci))
        params[f"{name}_b"] = jnp.zeros((co,), jnp.float32)
    return params


def _conv(x, w, b, stride=1, pad=None):
    ksz = w.shape[0]
    if pad is None:
        pad = ksz // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


@functools.partial(jax.jit, static_argnames=())
def dense_outputs(params: dict, image_gray: jax.Array):
    """image_gray [H,W] in [0,1] (H, W multiples of 8) ->
    (scores [H,W], descriptors_coarse [H/8, W/8, D])."""
    x = image_gray[None, :, :, None]
    for name, _ in _ENCODER:
        x = jax.nn.relu(_conv(x, params[f"{name}_w"], params[f"{name}_b"]))
        if name in _POOL_AFTER:
            x = _pool2(x)

    # detector head
    p = jax.nn.relu(_conv(x, params["convPa_w"], params["convPa_b"]))
    p = _conv(p, params["convPb_w"], params["convPb_b"], pad=0)   # [1,h,w,65]
    p = jax.nn.softmax(p, axis=-1)[..., :64]                       # drop bin
    h, w = p.shape[1], p.shape[2]
    scores = p.reshape(1, h, w, 8, 8).transpose(0, 1, 3, 2, 4)
    scores = scores.reshape(h * 8, w * 8)

    # descriptor head (coarse)
    d = jax.nn.relu(_conv(x, params["convDa_w"], params["convDa_b"]))
    d = _conv(d, params["convDb_w"], params["convDb_b"], pad=0)    # [1,h,w,D]
    d = d[0]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-10)
    return scores, d


def _simple_nms(scores: jax.Array, radius: int) -> jax.Array:
    """Fast NMS via max-pooling (the SuperPoint reference scheme)."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(scores[None, :, :, None], -jnp.inf,
                                   jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
                                   "SAME")[0, :, :, 0]
    return jnp.where(scores == pooled, scores, 0.0)


def _bilinear_sample(grid: jax.Array, xy: jax.Array, cell: float = 8.0):
    """Sample coarse [h,w,D] at pixel coords via align_corners-style mapping
    (the SuperPoint sample_descriptors normalization)."""
    h, w, D = grid.shape
    # pixel -> coarse coords (center of 8x8 cell at (cell-1)/2 + i*cell)
    gx = (xy[:, 0] - cell / 2 + 0.5) / cell
    gy = (xy[:, 1] - cell / 2 + 0.5) / cell
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(gx - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]
    v = (grid[y0, x0] * (1 - fx) * (1 - fy) + grid[y0, x1] * fx * (1 - fy)
         + grid[y1, x0] * (1 - fx) * fy + grid[y1, x1] * fx * fy)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-10)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def extract(params: dict, image_gray: jax.Array, max_keypoints: int = 4096,
            nms_radius: int = 4, score_threshold: float = 0.005):
    """Full extractor -> dict(keypoints [K,2] (u,v), scores [K],
    descriptors [D,K], valid [K], dense_scores [H,W])."""
    scores_dense, desc_coarse = dense_outputs(params, image_gray)
    H, W = scores_dense.shape
    nms = _simple_nms(scores_dense, nms_radius)
    # remove border keypoints (4 px, SuperPoint convention)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = 4
    inb = ((xx >= border) & (xx < W - border)
           & (yy >= border) & (yy < H - border))
    nms = jnp.where(inb, nms, 0.0)

    flat = nms.reshape(-1)
    # small frames can hold fewer pixels than the keypoint budget
    vals, idx = jax.lax.top_k(flat, min(max_keypoints, flat.shape[0]))
    valid = vals > score_threshold
    u = (idx % W).astype(jnp.float32)
    v = (idx // W).astype(jnp.float32)
    kps = jnp.stack([u, v], axis=-1)
    desc = _bilinear_sample(desc_coarse, kps)
    return {"keypoints": kps, "scores": vals, "descriptors": desc.T,
            "valid": valid, "dense_scores": scores_dense}


def load_params(path: str) -> dict:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}
