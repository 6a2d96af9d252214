"""PnP + RANSAC, TPU-native (replaces pycolmap.absolute_pose_estimation,
reference test.py:64-84).

Design: vmapped minimal-sample hypotheses (6-point DLT -> projection matrix
-> K^-1 factorization into [R|t]) scored by reprojection inliers, followed by
Gauss-Newton refinement on the inlier set parameterized by an SE(3) twist.
All hypotheses evaluate in parallel on the accelerator — RANSAC becomes two
batched einsums instead of a sequential loop.

Returns the camera-to-world rotation/translation like the reference
``solve_pose`` (it inverts the solved world-to-camera pose).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core import transforms


def _dlt_pose(pts2d_n: jax.Array, pts3d: jax.Array):
    """6+ point DLT for [R|t] from normalized image coords (K applied).

    pts2d_n [S,2] (x/z, y/z in camera normalized coords), pts3d [S,3].
    Returns (R [3,3], t [3], ok).
    """
    S = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((S, 1))], axis=1)      # [S,4]
    zeros = jnp.zeros((S, 4))
    u = pts2d_n[:, 0:1]
    v = pts2d_n[:, 1:2]
    rows_u = jnp.concatenate([X, zeros, -u * X], axis=1)         # [S,12]
    rows_v = jnp.concatenate([zeros, X, -v * X], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)                # [2S,12]
    # nullspace via smallest right singular vector
    _, s, vt = jnp.linalg.svd(A, full_matrices=True)
    p = vt[-1]                                                    # [12]
    P = p.reshape(3, 4)
    M = P[:, :3]
    # fix scale/sign: det(M) > 0 and ||rows|| ~ 1
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    scale = jnp.cbrt(jnp.maximum(jnp.linalg.det(M), 1e-12))
    P = P / jnp.maximum(scale, 1e-12)
    M = P[:, :3]
    # orthogonalize M -> nearest rotation (SVD)
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = P[:, 3]
    ok = jnp.isfinite(R).all() & jnp.isfinite(t).all()
    return R, t, ok


def _reproj_errors(R, t, pts2d_n, pts3d):
    cam = pts3d @ R.T + t
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    proj = cam[:, :2] / zs[:, None]
    err = jnp.linalg.norm(proj - pts2d_n, axis=-1)
    return jnp.where(z > 0.01, err, jnp.inf)


def _gauss_newton_refine(R, t, pts2d_n, pts3d, weights, iters: int = 10):
    """Masked Gauss-Newton on the reprojection residual, SE(3) twist param."""

    def residual(xi):
        T = transforms.se3_exp(xi)
        Rr = T[:3, :3] @ R
        tr = T[:3, :3] @ t + T[:3, 3]
        cam = pts3d @ Rr.T + tr
        z = jnp.maximum(cam[:, 2], 1e-6)
        proj = cam[:, :2] / z[:, None]
        return ((proj - pts2d_n) * weights[:, None]).reshape(-1)

    def step(xi, _):
        # jacfwd: the residual is R^6 -> R^{2M}, so forward-mode costs 6
        # JVPs with O(M) intermediates; reverse-mode (jax.jacobian) vmaps a
        # VJP per OUTPUT row and under the RANSAC hypothesis vmap its
        # intermediates scale O(n_hyp * M^2) — observed 36 GB at 512
        # matches x 1024 hypotheses
        J = jax.jacfwd(residual)(xi)                  # [2S, 6]
        r = residual(xi)
        JTJ = J.T @ J + 1e-8 * jnp.eye(6)
        g = J.T @ r
        dx = jnp.linalg.solve(JTJ, g)
        return xi - dx, None

    xi, _ = jax.lax.scan(step, jnp.zeros(6), None, length=iters)
    T = transforms.se3_exp(xi)
    return T[:3, :3] @ R, T[:3, :3] @ t + T[:3, 3]


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "sample_size",
                                             "refine_iters"))
def _solve_core(pts2d_n, pts3d, valid, key, inlier_thresh_n,
                n_hypotheses: int, sample_size: int, refine_iters: int):
    M = pts3d.shape[0]
    keys = jax.random.split(key, n_hypotheses)

    def one_hyp(k):
        # random sample of valid indices via random priorities
        pri = jax.random.uniform(k, (M,)) + jnp.where(valid, 0.0, -10.0)
        _, idx = jax.lax.top_k(pri, sample_size)
        R, t, ok = _dlt_pose(pts2d_n[idx], pts3d[idx])
        # near-minimal DLT amplifies pixel noise badly, so refine EVERY
        # hypothesis on its loose-inlier support (all hypotheses refine in
        # parallel under vmap — RANSAC+LO as one batched program), then
        # score the refined pose at the true threshold.
        err = _reproj_errors(R, t, pts2d_n, pts3d)
        w = ((err < 3.0 * inlier_thresh_n) & valid).astype(jnp.float32)
        R, t = _gauss_newton_refine(R, t, pts2d_n, pts3d, w, 5)
        err = _reproj_errors(R, t, pts2d_n, pts3d)
        inl = (err < inlier_thresh_n) & valid
        score = jnp.where(ok & jnp.isfinite(t).all(), jnp.sum(inl), -1)
        return score, R, t

    scores, Rs, ts = jax.vmap(one_hyp)(keys)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]
    # final local optimization on the winner's strict inliers
    err = _reproj_errors(R, t, pts2d_n, pts3d)
    w = ((err < inlier_thresh_n) & valid).astype(jnp.float32)
    R, t = _gauss_newton_refine(R, t, pts2d_n, pts3d, w, refine_iters)
    err2 = _reproj_errors(R, t, pts2d_n, pts3d)
    inl2 = (err2 < inlier_thresh_n) & valid
    return R, t, inl2, jnp.sum(inl2)


def solve_pnp_ransac(pts2d: np.ndarray, pts3d: np.ndarray, K: np.ndarray,
                     inlier_px: float = 12.0, n_hypotheses: int = 1024,
                     sample_size: int = 6, refine_iters: int = 10,
                     min_inliers: int = 5, seed: int = 0):
    """pts2d [M,2] pixel coords (x=u, y=v), pts3d [M,3] world.

    Returns dict {success, r (c2w R), t (c2w t), num_inliers, inliers} with
    the reference solve_pose output convention (test.py:64-84; note the
    reference defines ransac_thresh=12 px, which we actually apply).
    """
    M = pts2d.shape[0]
    if M < sample_size:
        return {"success": False, "r": None, "t": None,
                "num_inliers": 0, "inliers": np.zeros((M,), bool)}
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pts2d_n = np.stack([(pts2d[:, 0] - cx) / fx,
                        (pts2d[:, 1] - cy) / fy], axis=-1).astype(np.float32)
    thresh_n = inlier_px / float((fx + fy) / 2)
    valid = np.isfinite(pts2d_n).all(-1) & np.isfinite(pts3d).all(-1)
    R, t, inl, n_inl = _solve_core(
        jnp.asarray(pts2d_n), jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(valid), jax.random.PRNGKey(seed),
        jnp.float32(thresh_n), n_hypotheses, sample_size, refine_iters)
    n_inl = int(n_inl)
    if n_inl < min_inliers:
        return {"success": False, "r": None, "t": None,
                "num_inliers": n_inl, "inliers": np.asarray(inl)}
    # w2c -> c2w like the reference
    Rw2c = np.asarray(R)
    tw2c = np.asarray(t)
    Rc2w = Rw2c.T
    tc2w = -Rc2w @ tw2c
    return {"success": True, "r": Rc2w, "t": tc2w,
            "num_inliers": n_inl, "inliers": np.asarray(inl)}
