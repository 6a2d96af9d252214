"""Evaluation metrics: PSNR / SSIM / LPIPS and pose errors.

Parity targets: utils/eval_utils.py (masked PSNR over gt>0 pixels :49-51,
quaternion-geodesic rotation error :75-131, L2 translation :133-145) and the
eval_rendering/eval_pose report files.

LPIPS uses an AlexNet backbone + linear heads in JAX; pretrained weights
cannot be downloaded in this environment, so ``lpips_fn`` consumes a
converted-weights .npz when available (tools/convert_lpips.py) and otherwise
returns NaN — flagged in the report rather than silently wrong.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core import transforms
from splatloc_tpu.train.losses import ssim  # same 11x11 gaussian-window SSIM


def psnr_masked(image: jax.Array, gt: jax.Array) -> jax.Array:
    """PSNR over pixels where gt > 0 (any channel counts individually —
    the reference masks elementwise: image[mask] vs gt[mask])."""
    image = jnp.clip(image, 0.0, 1.0)
    mask = gt > 0
    se = jnp.where(mask, (image - gt) ** 2, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    mse = jnp.sum(se) / denom
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def pose_errors(pred_c2w_r: np.ndarray, pred_c2w_t: np.ndarray,
                gt_c2w: np.ndarray):
    """(rotation_deg, translation_m) — quaternion geodesic + L2
    (utils/eval_utils.py:75-145)."""
    q_pred = transforms.matrix_to_quat(jnp.asarray(pred_c2w_r, jnp.float32))
    q_gt = transforms.matrix_to_quat(jnp.asarray(gt_c2w[:3, :3], jnp.float32))
    r_err = float(transforms.quat_angle_deg(q_pred, q_gt))
    t_err = float(np.linalg.norm(np.asarray(pred_c2w_t) - gt_c2w[:3, 3]))
    return r_err, t_err


# ---------------------------------------------------------------------------
# LPIPS (AlexNet)
# ---------------------------------------------------------------------------

_ALEX_CFG = [  # (out_ch, kernel, stride, padding) for the 5 conv stages
    (64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_features(params: dict, x: jax.Array):
    """x [N,H,W,3] in [-1,1] -> list of 5 feature maps."""
    feats = []
    h = x
    for i in range(5):
        w = params[f"conv{i}_w"]      # [kh,kw,in,out]
        b = params[f"conv{i}_b"]
        stride = _ALEX_CFG[i][2]
        pad = _ALEX_CFG[i][3]
        h = jax.lax.conv_general_dilated(
            h, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        feats.append(h)
        if i in (0, 1):
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return feats


def lpips_fn(params: dict | None):
    """Returns lpips(image, gt) for [H,W,3] in [0,1]; NaN if no weights."""
    if params is None:
        return lambda a, b: jnp.nan

    def fn(image, gt):
        def prep(x):
            x = x * 2.0 - 1.0
            x = (x - _SHIFT) / _SCALE
            return x[None]
        fa = _alex_features(params, prep(image))
        fb = _alex_features(params, prep(gt))
        total = 0.0
        for i, (a, b) in enumerate(zip(fa, fb)):
            an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (an - bn) ** 2
            lin = params[f"lin{i}"]           # [C]
            total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :],
                                             axis=-1))
        return total
    return fn


def load_lpips_params(path: str) -> dict | None:
    import os
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def write_rendering_report(path: str, mean_psnr, mean_ssim, mean_lpips):
    """eval_rendering.txt, reference format (utils/eval_utils.py:64-70).

    mean_lpips=None (no converted LPIPS weights available) writes an
    explicit marker instead of silently averaging NaN into the report."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if mean_lpips is None:
        mean_lpips = "UNAVAILABLE (no converted LPIPS weights)"
    with open(path, "w") as f:
        f.write(f"mean_psnr: {mean_psnr}\n")
        f.write(f"mean_ssim: {mean_ssim}\n")
        f.write(f"mean_lpips: {mean_lpips}")


def write_pose_report(path: str, retrieval_t, retrieval_r, match_t, match_r,
                      n_solved: int | None = None,
                      n_failed: int | None = None):
    """eval_pose.txt, reference format (test.py:506-513). Inputs are error
    lists (meters / degrees) over ALL valid queries — failed matches carry
    the retrieval-pose fallback (test.py:318-326). Solved/failed counts are
    appended so the query population is auditable."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("Median Error: \n")
        f.write("Retrieval: Trans.(cm): {}. Rotation(deg): {}.\n".format(
            np.median(retrieval_t) * 100, np.median(retrieval_r)))
        f.write("Match    : Trans.(cm): {}. Rotation(deg): {}.\n".format(
            np.median(match_t) * 100, np.median(match_r)))
        if n_solved is not None:
            f.write("Solved: {}. Failed (retrieval fallback): {}.\n".format(
                n_solved, n_failed))
