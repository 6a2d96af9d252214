"""Frustum gather of key Gaussians + KD-snap to db keypoints.

Replaces the reference's get_frusm_pts / get_ref_keyponts_3d
(test.py:247-302): project key Gaussians (marker > thresh) into the database
view with the raw K matrix (the reference's convention here — no half-pixel
shift), frustum-cull, back-project the db frame's score-mask pixels through
its depth, and snap each such 3D keypoint to the nearest in-frustum Gaussian
within 0.1 m. The scipy cKDTree becomes a tiled brute-force nearest-neighbor
(one MXU matmul per tile) — exact, and faster than tree-building at these
sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("width", "height"))
def project_points_K(pts: jax.Array, w2c: jax.Array, K: jax.Array,
                     width: int, height: int, near: float = 0.05):
    """Project with u = fx x/z + cx (reference test.py:255-262). Returns
    (uv [N,2], in_frustum [N])."""
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = K[0, 0] * cam[:, 0] / zs + K[0, 2]
    v = K[1, 1] * cam[:, 1] / zs + K[1, 2]
    inside = (z > near) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return jnp.stack([u, v], -1), inside


@functools.partial(jax.jit, static_argnames=("block",))
def nearest_neighbor(queries: jax.Array, points: jax.Array,
                     points_valid: jax.Array, block: int = 1024):
    """For each query [M,3], nearest point among valid [N,3].
    Returns (dist [M], index [M]). Tiled |x-y|^2 via matmul."""
    M = queries.shape[0]
    pad = (-M) % block
    q = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)])
    sq_p = jnp.sum(points * points, -1)
    big = jnp.where(points_valid, 0.0, jnp.inf)

    def tile(qc):
        cross = qc @ points.T
        d2 = sq_p[None, :] - 2 * cross + jnp.sum(qc * qc, -1)[:, None] + big
        idx = jnp.argmin(d2, axis=1)
        return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0)), idx

    d, i = jax.lax.map(tile, q.reshape(-1, block, 3))
    return d.reshape(-1)[:M], i.reshape(-1)[:M]


def backproject_mask(mask: np.ndarray, depth: np.ndarray, K: np.ndarray,
                     c2w: np.ndarray) -> np.ndarray:
    """Reference get_ref_keyponts_3d (test.py:287-302): back-project score-
    mask pixels through depth with the raw K (u - cx convention)."""
    ys, xs = np.nonzero(mask)
    d = depth[ys, xs]
    x = (xs - K[0, 2]) * d / K[0, 0]
    y = (ys - K[1, 2]) * d / K[1, 1]
    pc = np.stack([x, y, d], -1)
    return pc @ c2w[:3, :3].T + c2w[:3, 3]


def frustum_key_points(xyz: np.ndarray, marker: np.ndarray,
                       w2c: np.ndarray, K: np.ndarray,
                       width: int, height: int,
                       db_mask: np.ndarray | None = None,
                       db_depth: np.ndarray | None = None,
                       c2w: np.ndarray | None = None,
                       marker_thresh: float = 0.005,
                       snap_radius: float = 0.1,
                       subset: bool = False):
    """The reference get_frusm_pts pipeline (test.py:247-285).

    Returns (pts3d [P,3], pts2d [P,2] in (u,v)). When ``subset`` (landmark
    selection eval) the marker filter and KD-snap are skipped
    (test.py:252-253,265-273).
    """
    uv, inside = project_points_K(jnp.asarray(xyz), jnp.asarray(w2c),
                                  jnp.asarray(K), width, height)
    inside = np.asarray(inside)
    uv = np.asarray(uv)
    if not subset:
        inside = inside & (marker > marker_thresh)
    pts3d = xyz[inside]
    pts2d = uv[inside]
    if subset or db_mask is None:
        return pts3d, pts2d
    if pts3d.shape[0] == 0:
        return pts3d, pts2d

    kp3d = backproject_mask(db_mask, db_depth, K, c2w)
    if kp3d.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 2), np.float32)
    # power-of-two shape buckets: per-query point counts vary, and every
    # distinct shape would recompile the KD kernel (a ~2 s remote compile
    # per query on a tunnel-attached TPU). Padded points are masked
    # invalid; padded queries are sliced off — results are exact.
    M, P = kp3d.shape[0], pts3d.shape[0]
    Mb = max(1024, 1 << int(np.ceil(np.log2(M))))
    Pb = max(1024, 1 << int(np.ceil(np.log2(P))))
    kp_b = np.zeros((Mb, 3), np.float32)
    kp_b[:M] = kp3d
    pts_b = np.zeros((Pb, 3), np.float32)
    pts_b[:P] = pts3d
    valid = np.zeros((Pb,), bool)
    valid[:P] = True
    dist, idx = nearest_neighbor(jnp.asarray(kp_b), jnp.asarray(pts_b),
                                 jnp.asarray(valid))
    dist = np.asarray(dist)[:M]
    idx = np.asarray(idx)[:M]
    keep = dist < snap_radius
    return pts3d[idx[keep]], pts2d[idx[keep]]
