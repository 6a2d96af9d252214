"""Screen-space projection of 3D Gaussians (EWA splatting).

Functional equivalent of the reference CUDA ``preprocess`` kernel in
submodules/diff-gaussian-rasterization (characterized by its call contract at
gaussian_splatting/gaussian_renderer/__init__.py:42-55,117-126): frustum cull,
3D->2D projection, J W Sigma W^T J^T covariance, low-pass blur, conic +
radius. Written as one big vmappable jnp program so XLA fuses it into a
single elementwise pipeline over the Gaussian axis; differentiable w.r.t.
every Gaussian parameter *and* the camera pose (w2c), which the reference
kernels do not provide.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.core import transforms
from splatloc_tpu.raster.types import Projected, RasterConfig


def _rot_components(quats: jax.Array):
    """Rotation-matrix entries as nine [N] vectors (quat_to_matrix unrolled;
    batched [N,3,3] matmuls lower to bf16 MXU custom-calls with pathological
    T(4,128) layout copies on TPU — elementwise [N]-vector math keeps the
    whole covariance pipeline in fused f32 VPU ops)."""
    q = transforms.quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
            (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
            (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)))


def _cov3d_components(scales: jax.Array, quats: jax.Array):
    """Symmetric world covariance R S S^T R^T as a {(j,k): [N]} dict of its
    six unique entries (reference lower-triangular build,
    gaussian_splatting/scene/gaussian_model.py:72-76)."""
    R = _rot_components(quats)
    s0, s1, s2 = scales[..., 0], scales[..., 1], scales[..., 2]
    M = [[R[i][0] * s0, R[i][1] * s1, R[i][2] * s2] for i in range(3)]
    S = {}
    for j in range(3):
        for k in range(j, 3):
            S[(j, k)] = M[j][0] * M[k][0] + M[j][1] * M[k][1] \
                + M[j][2] * M[k][2]
            S[(k, j)] = S[(j, k)]
    return S


def build_cov3d(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Scale (activated, [N,3]) + quaternion ([N,4], wxyz) -> 3D covariance
    [N,3,3]. Reference: R S S^T R^T lower-triangular build
    (gaussian_splatting/scene/gaussian_model.py:72-76,
    utils/general_utils.py:96-110)."""
    S = _cov3d_components(scales, quats)
    rows = [jnp.stack([S[(j, 0)], S[(j, 1)], S[(j, 2)]], -1)
            for j in range(3)]
    return jnp.stack(rows, axis=-2)


def project_gaussians(
    means3d: jax.Array,      # [N,3]
    scales: jax.Array,       # [N,3] activated (exp'd)
    quats: jax.Array,        # [N,4] unnormalized ok
    camera: Camera,
    cfg: RasterConfig,
    alive: jax.Array | None = None,   # [N] bool
    scaling_modifier: float = 1.0,
    opacities: jax.Array | None = None,  # [N] activated; tightens radius_xy
) -> Projected:
    w2c = camera.w2c
    R_cw = w2c[:3, :3]
    t_cw = w2c[:3, 3]

    # elementwise world->view (a [N,3]@[3,3] dot can lower to a bf16 MXU
    # op on TPU — quantizing positions)
    p_view = jnp.stack(
        [means3d[:, 0] * R_cw[i, 0] + means3d[:, 1] * R_cw[i, 1]
         + means3d[:, 2] * R_cw[i, 2] + t_cw[i] for i in range(3)], axis=-1)
    z = p_view[..., 2]
    in_front = z > cfg.near

    zs = jnp.where(in_front, z, 1.0)  # safe divisor for culled points
    x, y = p_view[..., 0], p_view[..., 1]
    u = camera.fx * x / zs + (camera.cx - 0.5)
    v = camera.fy * y / zs + (camera.cy - 0.5)

    # EWA: clamp the tangent-plane coords like the CUDA computeCov2D does.
    tan_fovx = camera.tanfovx
    tan_fovy = camera.tanfovy
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txz = jnp.clip(x / zs, -limx, limx)
    tyz = jnp.clip(y / zs, -limy, limy)
    tx = txz * zs
    ty = tyz * zs

    fx, fy = camera.fx, camera.fy
    # J rows (the 2x3 Jacobian of (u,v) wrt view-space point)
    j00 = fx / zs
    j02 = -fx * tx / (zs * zs)
    j11 = fy / zs
    j12 = -fy * ty / (zs * zs)

    S = _cov3d_components(scales * scaling_modifier, quats)
    # V' = W Sigma W^T in view space (W = R_cw constant 3x3: unrolled
    # scalar-broadcast fmas instead of an [N,3,3] einsum), then the 2x2
    # block via J.

    def covV(i, l):
        acc = 0.0
        for j in range(3):
            for k in range(3):
                acc = acc + R_cw[i, j] * R_cw[l, k] * S[(j, k)]
        return acc

    v00, v01, v02 = covV(0, 0), covV(0, 1), covV(0, 2)
    v11, v12, v22 = covV(1, 1), covV(1, 2), covV(2, 2)
    # 2x2 = J covV J^T with J = [[j00,0,j02],[0,j11,j12]]
    c00 = (j00 * (j00 * v00 + j02 * v02)
           + j02 * (j00 * v02 + j02 * v22))
    c01 = (j11 * (j00 * v01 + j02 * v12)
           + j12 * (j00 * v02 + j02 * v22))
    c11 = (j11 * (j11 * v11 + j12 * v12)
           + j12 * (j11 * v12 + j12 * v22))

    c00 = c00 + cfg.cov2d_blur
    c11 = c11 + cfg.cov2d_blur

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic_a = c11 * inv_det
    conic_b = -c01 * inv_det
    conic_c = c00 * inv_det

    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    visible = in_front & det_ok
    if alive is not None:
        visible = visible & alive

    # Tile-overlap cull identical to CUDA getRect: zero-area rect => invisible.
    ts = float(cfg.tile_size)
    gx = -(-camera.width // cfg.tile_size)
    gy = -(-camera.height // cfg.tile_size)
    rect_min_x = jnp.clip(jnp.floor((u - radius) / ts), 0, gx)
    rect_max_x = jnp.clip(jnp.floor((u + radius) / ts) + 1, 0, gx)
    rect_min_y = jnp.clip(jnp.floor((v - radius) / ts), 0, gy)
    rect_max_y = jnp.clip(jnp.floor((v + radius) / ts) + 1, 0, gy)
    nonempty = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y) > 0
    visible = visible & nonempty

    radius = jnp.where(visible, radius, 0.0)

    # Per-axis binning extents: the reference CUDA getRect bins the SQUARE
    # of the max eigenvalue (3 sigma_max both axes), so anisotropic splats
    # emit tiles whose every pixel blends to exactly zero. The tight rect is
    # the ellipse's axis-aligned bounding box at the opacity-aware cutoff
    # alpha >= alpha_min: Q(p) = 2 ln(op/alpha_min) has x-extent
    # sqrt(c)*sigma_x (sigma_x^2 = blurred c00). Intersecting with the
    # square radius keeps the pair set output-preserving up to f32
    # accumulation order: every pixel of a tile the AABB excludes has
    # alpha < alpha_min (zeroed by the kernels' alpha cut), and no tile
    # outside the reference square is added. The 0.05 slack on c absorbs
    # f32 rounding at the alpha_min boundary.
    if opacities is not None and cfg.aabb_binning:
        c_cut = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12)
                              / cfg.alpha_min) + 0.05
        s_cut = jnp.sqrt(jnp.maximum(c_cut, 0.0))
        rx = jnp.minimum(s_cut * jnp.sqrt(jnp.maximum(c00, 0.0)), radius)
        ry = jnp.minimum(s_cut * jnp.sqrt(jnp.maximum(c11, 0.0)), radius)
        rx = jnp.where(visible, rx, 0.0)
        ry = jnp.where(visible, ry, 0.0)
    else:
        rx = ry = radius
    return Projected(u=u, v=v, depth=z, conic_a=conic_a, conic_b=conic_b,
                     conic_c=conic_c, radius=radius, visible=visible,
                     radius_x=rx, radius_y=ry)
