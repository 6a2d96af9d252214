"""Per-tile front-to-back alpha compositing (pure-JAX tiled blend).

The sequential CUDA blend loop becomes an associative program: with alphas in
depth order, transmittance is an (exclusive) cumulative product and the blend
weights w_i = alpha_i * T_i turn compositing into one MXU matmul
``[pixels, K] @ [K, channels]`` per tile. Early termination and the alpha
clamps replicate the CUDA forward bit-for-bit in exact arithmetic:

    alpha   = min(alpha_max, opa * exp(power)),   zeroed if < alpha_min or power > 0
    T_inc   = cumprod(1 - alpha)                  (monotone non-increasing)
    live    = T_inc >= transmittance_eps          (CUDA: test_T < eps => done)
    w       = alpha * T_exc * live

Gradients (to conic/xy/opacity/colors/depth and through them to all Gaussian
params and the camera) come from plain autodiff of this program; the whole
tile computation is rematerialized in the backward pass (jax.checkpoint) so
the [K, P] alpha matrices are never stored across tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatloc_tpu.raster.types import RasterConfig


def blend_tile(
    tile_origin: jax.Array,   # [2] (x0, y0) pixel coords of tile corner
    xy: jax.Array,            # [K,2]
    conic: jax.Array,         # [K,3]
    opacity: jax.Array,       # [K]
    colors: jax.Array,        # [K,C]
    depth: jax.Array,         # [K]
    valid: jax.Array,         # [K] bool
    cfg: RasterConfig,
):
    """Composite one tile. Returns (rgbc [P,C], depth [P], alpha [P]) with
    P = tile_size**2 pixels in row-major order."""
    ts = cfg.tile_size
    py = jax.lax.broadcasted_iota(jnp.float32, (ts, ts), 0).reshape(-1)
    px = jax.lax.broadcasted_iota(jnp.float32, (ts, ts), 1).reshape(-1)
    pix_x = tile_origin[0] + px                     # [P]
    pix_y = tile_origin[1] + py

    dx = xy[:, 0:1] - pix_x[None, :]                # [K,P]
    dy = xy[:, 1:2] - pix_y[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    alpha = opacity[:, None] * jnp.exp(power)
    alpha = jnp.minimum(alpha, cfg.alpha_max)
    keep = (power <= 0.0) & (alpha >= cfg.alpha_min) & valid[:, None]
    alpha = jnp.where(keep, alpha, 0.0)

    one_m = 1.0 - alpha
    t_inc = jnp.cumprod(one_m, axis=0)              # [K,P]
    t_exc = jnp.concatenate([jnp.ones_like(t_inc[:1]), t_inc[:-1]], axis=0)
    live = t_inc >= cfg.transmittance_eps
    w = alpha * t_exc * jnp.where(live, 1.0, 0.0)   # [K,P]

    wt = w.swapaxes(0, 1)                           # [P,K]
    out_c = jnp.dot(wt, colors, preferred_element_type=jnp.float32)   # [P,C]
    out_d = jnp.dot(wt, depth[:, None], preferred_element_type=jnp.float32)[:, 0]
    out_a = jnp.sum(w, axis=0)
    return out_c, out_d, out_a


def blend_image(
    lists: jax.Array,        # [T,K] indices into sorted axis (N = OOB sentinel)
    sorted_xy: jax.Array,    # [N,2]
    sorted_conic: jax.Array, # [N,3]
    sorted_opacity: jax.Array,  # [N]
    sorted_colors: jax.Array,   # [N,C]
    sorted_depth: jax.Array,    # [N]
    width: int,
    height: int,
    cfg: RasterConfig,
    bg: jax.Array,           # [C]
):
    """Blend all tiles and assemble the image.

    Returns (image [H,W,C], depth [H,W], alpha [H,W]).
    """
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    T = gx * gy
    N = sorted_xy.shape[0]
    C = sorted_colors.shape[-1]

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    origins = jnp.stack([(tile_ids % gx) * ts, (tile_ids // gx) * ts],
                        axis=-1).astype(jnp.float32)

    # Pad the sorted arrays with one sentinel row so index N is a cheap
    # always-invalid gather (keeps the gather in-bounds without clamping).
    def pad1(x):
        pad_shape = (1,) + x.shape[1:]
        return jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)

    p_xy = pad1(sorted_xy)
    p_conic = pad1(sorted_conic)
    p_op = pad1(sorted_opacity)
    p_col = pad1(sorted_colors)
    p_dep = pad1(sorted_depth)

    @functools.partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
    def one_tile(origin, idx):
        valid = idx < N
        xy = p_xy[idx]
        conic = p_conic[idx]
        op = p_op[idx]
        col = p_col[idx]
        dep = p_dep[idx]
        return blend_tile(origin, xy, conic, op, col, dep, valid, cfg)

    chunk = max(cfg.tile_chunk, 1)
    pad = (-T) % chunk
    org_p = jnp.concatenate([origins, jnp.zeros((pad, 2), jnp.float32)])
    lst_p = jnp.concatenate(
        [lists, jnp.full((pad, lists.shape[1]), N, jnp.int32)])

    def chunk_fn(args):
        return jax.vmap(one_tile)(*args)

    out_c, out_d, out_a = jax.lax.map(
        chunk_fn, (org_p.reshape(-1, chunk, 2),
                   lst_p.reshape(-1, chunk, lists.shape[1])))
    P = ts * ts
    out_c = out_c.reshape(-1, P, C)[:T]
    out_d = out_d.reshape(-1, P)[:T]
    out_a = out_a.reshape(-1, P)[:T]

    # Background composite: C_final = C + T_final * bg, T_final = 1 - alpha.
    out_c = out_c + (1.0 - out_a)[..., None] * bg[None, None, :]

    def assemble(x, channels):
        x = x.reshape(gy, gx, ts, ts, channels)
        x = x.transpose(0, 2, 1, 3, 4).reshape(gy * ts, gx * ts, channels)
        return x[:height, :width]

    image = assemble(out_c, C)
    depth = assemble(out_d[..., None], 1)[..., 0]
    alpha = assemble(out_a[..., None], 1)[..., 0]
    return image, depth, alpha
