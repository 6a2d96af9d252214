"""(Gaussian, tile) pair construction — the CUDA duplicate+sort binning,
TPU-style.

The reference CUDA rasterizer duplicates each Gaussian per touched tile and
radix-sorts (tile | depth) keys. We pack ``tile_id << IDX_BITS | depth_rank``
into one int32, sort the padded [N * MAX_TILES] key array directly (invalid
slots = INT32_MAX sort to the end), read per-tile segment bounds with a
hand-rolled vector bisection (jnp.searchsorted's default 'scan' costs ~3 ms
on this TPU regardless of query count), then relayout each tile's segment to
a 128-ALIGNED start. Depth order within a tile is automatic because
depth_rank is the position in the depth-sorted arrays.

The aligned layout means a [CHUNK]-slab of pair data is owned by exactly one
tile: the Pallas kernels need no tile-id masking, and the backward kernel's
per-chunk gradient writes are pure stores (no read-modify-write of shared
boundary slabs). Alignment padding entries carry index N -> all-zero
attributes -> zero opacity, so they are inert in the blend with no masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.raster.types import RasterConfig

IDX_BITS = 20                       # supports N < 2^20 per shard
IDX_MASK = (1 << IDX_BITS) - 1
ALIGN = 128


def _tile_rects(xy, radius, width, height, ts):
    """Per-Gaussian touched-tile rectangle (clipped to the tile grid)."""
    gx = -(-width // ts)
    gy = -(-height // ts)
    u, v = xy[:, 0], xy[:, 1]
    tsf = float(ts)
    rminx = jnp.clip(jnp.floor((u - radius) / tsf), 0, gx).astype(jnp.int32)
    rmaxx = jnp.clip(jnp.floor((u + radius + tsf - 1) / tsf), 0,
                     gx).astype(jnp.int32)
    rminy = jnp.clip(jnp.floor((v - radius) / tsf), 0, gy).astype(jnp.int32)
    rmaxy = jnp.clip(jnp.floor((v + radius + tsf - 1) / tsf), 0,
                     gy).astype(jnp.int32)
    return rminx, rmaxx, rminy, rmaxy


def resolve_caps(cfg: RasterConfig, n: int,
                 max_tiles: int | None = None,
                 pair_cap: int | None = None) -> tuple[int, int]:
    if max_tiles is None:
        max_tiles = cfg.max_tiles
    if pair_cap is None:
        pair_cap = cfg.pair_cap_factor * n
    pair_cap = int(np.ceil(pair_cap / ALIGN)) * ALIGN
    return max_tiles, pair_cap


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def pair_stats(xy, radius, visible, width: int, height: int,
               cfg: RasterConfig):
    """Exact (n_pairs_kept, n_dropped) of build_pairs, from elementwise math
    only (no sort). Valid pairs per Gaussian = min(area, max_tiles); the
    sorted valid pairs are contiguous, so the pair_cap clamp drops exactly
    relu(total_valid - pair_cap)."""
    ts = cfg.tile_size
    N = xy.shape[0]
    max_tiles, pair_cap = resolve_caps(cfg, N)
    rminx, rmaxx, rminy, rmaxy = _tile_rects(xy, radius, width, height, ts)
    area = (rmaxx - rminx) * (rmaxy - rminy)
    vis = visible.astype(jnp.int32)
    n_trunc = jnp.sum(jnp.maximum(area - max_tiles, 0) * vis)
    total_valid = jnp.sum(jnp.minimum(area, max_tiles) * vis)
    over_cap = jnp.maximum(total_valid - pair_cap, 0)
    return total_valid - over_cap, n_trunc + over_cap


def _bisect(sorted_arr, queries, rounds: int):
    """Vector lower-bound bisection: first index i with sorted_arr[i] >=
    query. ~20 gather rounds beat jnp.searchsorted's 'scan' lowering
    (~3 ms/call on TPU) by ~25x."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(rounds):
        mid = (lo + hi) // 2
        v = sorted_arr[jnp.minimum(mid, n - 1)]
        go = v < queries
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return lo


def aligned_cap(cfg: RasterConfig, n: int, width: int, height: int) -> int:
    """Static size of the aligned pair array."""
    ts = cfg.tile_size
    T = (-(-width // ts)) * (-(-height // ts))
    _, pair_cap = resolve_caps(cfg, n)
    return pair_cap + T * ALIGN


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg",
                                             "max_tiles", "pair_cap"))
def build_pairs(xy, radius, visible, width: int, height: int,
                cfg: RasterConfig, max_tiles: int | None = None,
                pair_cap: int | None = None):
    """Inputs are depth-sorted per-Gaussian screen quantities.

    Returns dict with:
      pair_idx [CAP_AL] int32 index into the depth-sorted Gaussian axis,
                        in per-tile segments each starting 128-aligned
                        (N = padding sentinel; gathers must clamp)
      starts   [T]      int32 aligned segment start (start % 128 == 0)
      counts   [T]      int32 valid pair count per tile (clamped at the cap)
      n_dropped         int32 pairs lost to max_tiles truncation or pair_cap
    """
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    T = gx * gy
    N = xy.shape[0]
    assert N < (1 << IDX_BITS), N
    assert T < (1 << (31 - IDX_BITS)), T
    max_tiles, pair_cap = resolve_caps(cfg, N, max_tiles, pair_cap)
    cap_al = pair_cap + T * ALIGN

    rminx, rmaxx, rminy, rmaxy = _tile_rects(xy, radius, width, height, ts)
    aw = rmaxx - rminx
    ah = rmaxy - rminy
    area = aw * ah

    slot = jnp.arange(max_tiles, dtype=jnp.int32)
    aw_s = jnp.maximum(aw, 1)[:, None]
    dx = slot[None, :] % aw_s
    dy = slot[None, :] // aw_s
    tile = (rminy[:, None] + dy) * gx + rminx[:, None] + dx      # [N, MT]
    ok = (slot[None, :] < area[:, None]) & (dy < ah[:, None]) & visible[:, None]

    ridx = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(ok, (tile << IDX_BITS) | ridx[:, None],
                    jnp.int32(np.iinfo(np.int32).max))
    n_trunc = jnp.sum(jnp.maximum(area - max_tiles, 0)
                      * visible.astype(jnp.int32))

    sorted_all = jnp.sort(key.reshape(-1))
    n_keys = N * max_tiles
    rounds = int(np.ceil(np.log2(max(n_keys, 2)))) + 1
    tile_ids = jnp.arange(T + 1, dtype=jnp.int32)
    bounds = _bisect(sorted_all, tile_ids << IDX_BITS, rounds)
    total_valid = bounds[T]
    starts_v = jnp.minimum(bounds[:T], pair_cap)
    ends_v = jnp.minimum(bounds[1:], pair_cap)
    counts = ends_v - starts_v
    n_dropped = n_trunc + (total_valid - jnp.sum(counts))

    # Relayout: tile t's segment moves to a 128-aligned start. Work per
    # aligned chunk (cap_al/128 of them): owning tile, source offset, count.
    asize = ((counts + ALIGN - 1) // ALIGN) * ALIGN
    astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(asize).astype(jnp.int32)])  # [T+1]
    nc = cap_al // ALIGN
    cpos = jnp.arange(nc, dtype=jnp.int32) * ALIGN
    # owning tile: first t with astarts[t+1] > cpos (zero-size tiles skipped)
    u = jnp.minimum(_bisect(astarts[1:], cpos + 1,
                            int(np.ceil(np.log2(max(T, 2)))) + 1),
                    T - 1)
    off = cpos - astarts[u]
    base = starts_v[u] + off
    rem = counts[u] - off
    lane = jnp.arange(ALIGN, dtype=jnp.int32)
    src = base[:, None] + lane[None, :]
    valid = lane[None, :] < rem[:, None]
    key_g = sorted_all[jnp.clip(src, 0, n_keys - 1)]
    pair_idx = jnp.where(valid, key_g & IDX_MASK, N).reshape(-1)
    return {"pair_idx": pair_idx.astype(jnp.int32),
            "starts": astarts[:T], "counts": counts,
            "n_dropped": n_dropped}
