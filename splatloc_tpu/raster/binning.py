"""Depth sort + per-tile Gaussian index lists (static shapes).

TPU-native replacement for the CUDA duplicate+radix-sort tile binning: we
globally sort the Gaussian axis by view depth once (XLA sort), then build a
fixed-capacity, depth-ordered index list per tile with a cumsum+scatter
compaction — no dynamic shapes, no atomics. Per-tile order then equals the
CUDA per-tile (tile|depth) key sort order exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatloc_tpu.raster.types import Projected, RasterConfig


def depth_sort(proj: Projected) -> jax.Array:
    """Return permutation [N] sorting visible Gaussians front-to-back;
    invisible Gaussians sort to the end."""
    key = jnp.where(proj.visible, proj.depth, jnp.inf)
    return jnp.argsort(key)


def tile_lists(
    proj: Projected,
    order: jax.Array,          # [N] depth permutation
    width: int,
    height: int,
    cfg: RasterConfig,
):
    """Build per-tile index lists.

    Returns (lists [T, K] int32 indices into the *sorted* axis, counts [T],
    n_dropped [] int32 entries lost to the per-tile capacity K).
    Entries beyond a tile's count are N (out-of-range sentinel).
    T = tiles_y * tiles_x, row-major. Capacity overflow keeps the closest K.
    """
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    T = gx * gy
    K = cfg.max_per_tile
    N = proj.xy.shape[0]

    # Sorted per-Gaussian tile rects.
    xy = proj.xy[order]
    radius = proj.radius[order]
    visible = proj.visible[order]
    u, v = xy[:, 0], xy[:, 1]
    tsf = float(ts)
    # exclusive max = floor((u + r)/ts) + 1 (see pairs._tile_rects note)
    rminx = jnp.clip(jnp.floor((u - radius) / tsf), 0, gx).astype(jnp.int32)
    rmaxx = jnp.clip(jnp.floor((u + radius) / tsf) + 1, 0, gx).astype(jnp.int32)
    rminy = jnp.clip(jnp.floor((v - radius) / tsf), 0, gy).astype(jnp.int32)
    rmaxy = jnp.clip(jnp.floor((v + radius) / tsf) + 1, 0, gy).astype(jnp.int32)

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx = tile_ids % gx
    ty = tile_ids // gx

    def build_tile(tile_xy):
        txi, tyi = tile_xy
        mask = (visible & (rminx <= txi) & (txi < rmaxx)
                & (rminy <= tyi) & (tyi < rmaxy))
        pos = jnp.cumsum(mask) - 1                        # [N]
        raw_count = pos[-1] + 1
        count = jnp.minimum(raw_count, K)
        dst = jnp.where(mask & (pos < K), pos, K)
        lst = jnp.full((K + 1,), N, dtype=jnp.int32)
        lst = lst.at[dst].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        return (lst[:K], count.astype(jnp.int32),
                jnp.maximum(raw_count - K, 0).astype(jnp.int32))

    # Chunk the vmap over tiles to bound the [chunk, N] mask memory.
    chunk = max(cfg.tile_chunk, 1)
    pad = (-T) % chunk
    txp = jnp.concatenate([tx, jnp.full((pad,), -1, jnp.int32)])
    typ = jnp.concatenate([ty, jnp.full((pad,), -1, jnp.int32)])
    txc = txp.reshape(-1, chunk)
    tyc = typ.reshape(-1, chunk)

    def chunk_fn(args):
        return jax.vmap(build_tile)(args)

    lists, counts, dropped = jax.lax.map(chunk_fn, (txc, tyc))
    lists = lists.reshape(-1, K)[:T]
    counts = counts.reshape(-1)[:T]
    n_dropped = jnp.sum(dropped.reshape(-1)[:T])
    return lists, counts, n_dropped
