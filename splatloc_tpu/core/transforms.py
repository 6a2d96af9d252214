"""Rotation / rigid-transform math (pure jnp, fully vmappable).

TPU-native replacement for the reference's rotation helpers:
- quaternion <-> matrix (reference: gaussian_splatting/utils/general_utils.py:113-148,
  utils/optimization_utils.py:5-67, utils/cam.py:154-246)
- SO(3)/SE(3) exp/log maps used for 6-DoF pose refinement.

Quaternion convention: (w, x, y, z), w first — matches the reference's
``build_rotation`` (gaussian_splatting/utils/general_utils.py:113).
All functions operate on the last axis and broadcast over leading axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion (w,x,y,z).

    Branch-stable (selects the largest-denominator branch), mirroring the
    reference's ``SO3_to_quat`` (utils/eval_utils.py:90-131) without host
    control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Four candidate constructions; pick by the largest diagonal term.
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    cand0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    cand1 = jnp.stack([(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    cand2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    cand3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4], -1)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(cond0[..., None], cand0,
                  jnp.where(cond1[..., None], cand1,
                            jnp.where(cond2[..., None], cand2, cand3)))
    return quat_normalize(q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def quat_angle_deg(a: jax.Array, b: jax.Array) -> jax.Array:
    """Geodesic angle (degrees) between two unit quaternions.

    Same metric as the reference's ``compute_quaternion_dist``
    (utils/eval_utils.py:75-87).
    """
    a = quat_normalize(a)
    b = quat_normalize(b)
    dot = jnp.abs(jnp.sum(a * b, axis=-1))
    dot = jnp.clip(dot, -1.0, 1.0)
    return 2.0 * jnp.degrees(jnp.arccos(dot))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Continuous 6D rotation parameterization -> matrix (Zhou et al. 2019).

    Parity with the reference's pytorch3d usage (utils/optimization_utils.py:44-49).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle [...,3] -> rotation matrix via Rodrigues (utils/cam.py:154-175).

    NaN-safe under autodiff at theta=0: the untaken branch is computed with a
    sanitized theta (double-where pattern), so jacobians at w=0 are the exact
    generator derivatives rather than NaN.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = skew(w) / theta
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = eye + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)
    # Taylor fallback at theta ~ 0 (exp(w) ~ I + skew(w))
    return jnp.where(small, eye + skew(w), R)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle [...,3] (utils/cam.py:177-190)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(cos)
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    scale = theta / jnp.maximum(2 * jnp.sin(theta), _EPS)
    w = scale[..., None] * v
    small = (theta < 1e-6)[..., None]
    return jnp.where(small, 0.5 * v, w)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist [...,6] (rho, omega) -> 4x4 rigid transform.

    Used by the render-loss 6-DoF pose refinement: pose update is
    ``T_new = se3_exp(delta) @ T``. NaN-safe jacobians at xi=0 (see so3_exp).
    """
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = skew(w) / theta
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = so3_exp(w)
    V = (eye + (1 - jnp.cos(theta)) / theta * K
         + (theta - jnp.sin(theta)) / theta * (K @ K))
    # Taylor at 0: V ~ I + skew(w)/2
    V = jnp.where(small, eye + 0.5 * skew(w), V)
    t = (V @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jax.Array) -> jax.Array:
    """4x4 rigid transform -> twist [...,6] (rho, omega); inverse of
    se3_exp: ``se3_exp(se3_log(T)) == T``. rho = V^-1 t with V the SO(3)
    left Jacobian."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-14
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = skew(w) / theta
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    half = 0.5 * theta
    cot = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    Vinv = eye - 0.5 * theta * K + (1 - cot) * (K @ K)
    Vinv = jnp.where(small, eye - 0.5 * skew(w), Vinv)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to points [..., N, 3] (batch projection
    helper, reference utils/cam.py:65-143)."""
    return pts @ T[..., :3, :3].swapaxes(-1, -2) + T[..., :3, 3][..., None, :]


def invert_se3(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.swapaxes(-1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
