"""(Gaussian, tile) pair construction — the CUDA duplicate+sort binning,
TPU-style.

The reference CUDA rasterizer duplicates each Gaussian per touched tile and
radix-sorts (tile | depth) keys. We pack ``tile_id << IDX_BITS | depth_rank``
into one int32 and sort — but where the CUDA path then walks raw segments,
the TPU kernels want every tile segment to START 128-ALIGNED so a
[CHUNK]-slab of pair data is owned by exactly one tile (no masks in the
kernels; backward gradient slabs are pure stores, no RMW).

Alignment is achieved IN the sort, not by a post-sort relayout gather (XLA
1-D gathers run at ~150M elem/s on TPU — a 550k-element relayout cost more
than the 2M-key sort): per-tile pair counts are computed BEFORE the sort
with a corner-difference histogram over the tile grid (each Gaussian's
emitted tile set is a union of <=2 rectangles, so its histogram contribution
is <=8 signed corners; corner counting = one small sort + bisect), then
(-count % 128) FILLER keys per tile are appended to the key population. One
sort of [N*MAX_TILES + T*128] keys yields tile segments that are
128-aligned by construction. Depth order within a tile is automatic because
depth_rank is the position in the depth-sorted arrays.

Filler/invalid entries carry index N -> all-zero attributes -> zero opacity,
so they are inert in the blend with no masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.raster.types import RasterConfig

IDX_BITS = 20
IDX_MASK = (1 << IDX_BITS) - 1      # filler rank sentinel; needs N < IDX_MASK
ALIGN = 128
_I32_MAX = np.iinfo(np.int32).max


def _components(xy, radius_xy):
    """(u, v, rx, ry) 1-D vectors from either [N, 2] arrays or (u, v) /
    (rx, ry) tuples — the tuple form avoids materializing [N, 2] arrays,
    whose (8,128) tiling lane-pads 2 -> 128 (64x physical bytes)."""
    if isinstance(xy, tuple):
        u, v = xy
    else:
        u, v = xy[:, 0], xy[:, 1]
    if isinstance(radius_xy, tuple):
        rx, ry = radius_xy
    else:
        rx, ry = radius_xy[:, 0], radius_xy[:, 1]
    return u, v, rx, ry


def _tile_rects(xy, radius_xy, width, height, ts):
    """Per-Gaussian touched-tile rectangle (clipped to the tile grid).
    radius_xy carries per-axis extents (the opacity-aware ellipse
    AABB from project.project_gaussians — the reference CUDA getRect uses a
    3 sigma_max square, which for anisotropic splats emits tiles whose every
    pixel blends to exactly zero)."""
    gx = -(-width // ts)
    gy = -(-height // ts)
    u, v, rx, ry = _components(xy, radius_xy)
    tsf = float(ts)
    # exclusive max = floor((u + r)/ts) + 1: the last tile with any pixel
    # center <= u + r. (floor((u + r + ts - 1)/ts) misses that tile when
    # frac(u + r) < 1 — invisible with integer-ceiled radii that are
    # identical in every path, wrong for fractional AABB extents.)
    rminx = jnp.clip(jnp.floor((u - rx) / tsf), 0, gx).astype(jnp.int32)
    rmaxx = jnp.clip(jnp.floor((u + rx) / tsf) + 1, 0,
                     gx).astype(jnp.int32)
    rminy = jnp.clip(jnp.floor((v - ry) / tsf), 0, gy).astype(jnp.int32)
    rmaxy = jnp.clip(jnp.floor((v + ry) / tsf) + 1, 0,
                     gy).astype(jnp.int32)
    return rminx, rmaxx, rminy, rmaxy


def resolve_caps(cfg: RasterConfig, n: int,
                 max_tiles: int | None = None,
                 pair_cap: int | None = None) -> tuple[int, int]:
    if max_tiles is None:
        max_tiles = cfg.max_tiles
    if pair_cap is None:
        pair_cap = (cfg.pair_cap_override if cfg.pair_cap_override
                    else cfg.pair_cap_factor * n)
    pair_cap = int(np.ceil(pair_cap / ALIGN)) * ALIGN
    return max_tiles, pair_cap


def _misaligned(cap_al: int) -> int:
    """Keep the pair-array length OFF 1024-multiples: XLA:TPU's gather
    emitter takes a ~2.6x slower path when the gathered row count is an
    exact 1024 multiple (measured 4.35 vs 1.68 ms for the backward
    rank-sort gather at 453632 vs +640 rows; non-multiples route through a
    pad-to-1024 + clamp wrapper that pipelines properly). 640 keeps
    128-alignment for the tile segments."""
    return cap_al + 640 if cap_al % 1024 == 0 else cap_al


def _cap_al(cfg: RasterConfig, n: int, width: int, height: int,
            pair_cap: int, max_tiles: int) -> int:
    """Static aligned pair-array length: budget + per-tile fill reserve,
    nudged off 1024-multiples, clamped to the total key population (tiny
    scenes can have fewer emitted keys than the nudged budget — the sort
    slice must not run short)."""
    ts = cfg.tile_size
    T = (-(-width // ts)) * (-(-height // ts))
    total = (n * max_tiles
             + sum(k * c for k, c in extension_tiers(cfg, n, width, height))
             + T * ALIGN)
    return min(_misaligned(pair_cap + T * ALIGN), (total // ALIGN) * ALIGN)


def _bisect(sorted_arr, queries, rounds: int):
    """Vector lower-bound bisection: first index i with sorted_arr[i] >=
    query. ~20 gather rounds of tiny query vectors beat jnp.searchsorted's
    'scan' lowering (~3 ms/call on TPU) by ~25x."""
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
    max_tiles, pair_cap = resolve_caps(cfg, n)
    return _cap_al(cfg, n, width, height, pair_cap, max_tiles)


def _emission(xy, radius_xy, visible, width, height, ts, max_tiles):
    """Shared emitted-tile-set geometry: each visible Gaussian emits the
    first ``m`` row-major cells of its rect — the full rect when it fits
    ``max_tiles``, else max_tiles ROUNDED DOWN to whole rows. Row-rounded
    truncation makes the partial-row corner contribution structurally zero
    (r == 0 always), HALVING the corner-histogram sort population (the
    partial-row corner arrays were pure sentinels for every non-truncated
    Gaussian — 4N of the 8N ids); the few extra truncated cells ride the
    giant-splat extension tiers / n_trunc escalation like all truncation."""
    rminx, rmaxx, rminy, rmaxy = _tile_rects(xy, radius_xy, width, height,
                                             ts)
    aw = rmaxx - rminx
    ah = rmaxy - rminy
    area = aw * ah
    awc = jnp.maximum(aw, 1)
    m = jnp.where(area <= max_tiles, area, (max_tiles // awc) * awc)
    m = jnp.where(visible, m, 0)
    n_trunc = jnp.sum(jnp.maximum(area - m, 0)
                      * visible.astype(jnp.int32))
    return rminx, rminy, aw, awc, m, area, n_trunc


def big_tiles_for(cfg: RasterConfig, width: int, height: int) -> int:
    """Max tiles any one Gaussian can emit (= the max run length of one
    depth rank in the sorted pair array; the backward segmented scan's
    static bound)."""
    caps = [cap for _, cap in extension_tiers(cfg, 1 << 20, width, height)]
    return max(caps, default=cfg.max_tiles)


def _corner_blocks(rminx, rminy, aw, awc, m, G, gxp, flip,
                   partial: bool = True):
    """Corner-id arrays encoding the emission of the FIRST ``m`` row-major
    cells of each rect (union of a full-rows rect and a partial-row rect =
    <= 8 signed corners on the (gy+1, gx+1) difference grid). Minus-corners
    are tagged +G; ``flip`` swaps plus/minus (subtracts the emission).
    ``partial=False`` asserts the caller's ``m`` is row-rounded (r == 0
    structurally, see _emission) and emits only the 4 full-rows corners —
    half the sort population."""
    sent = 2 * G
    q = m // awc
    r = m - q * awc

    def cid(y, x):
        return y * gxp + x

    a1 = q > 0
    a2 = r > 0
    y1 = rminy + q
    # keep every corner array 1-D: column-shaped [N, 1] intermediates get a
    # 1-lane TPU layout and cost ~1 ms each in fusions
    plus = [jnp.where(a1, cid(rminy, rminx), sent),
            jnp.where(a1, cid(y1, rminx + aw), sent)]
    minus = [jnp.where(a1, cid(rminy, rminx + aw), sent),
             jnp.where(a1, cid(y1, rminx), sent)]
    if partial:
        plus += [jnp.where(a2, cid(y1, rminx), sent),
                 jnp.where(a2, cid(y1 + 1, rminx + r), sent)]
        minus += [jnp.where(a2, cid(y1, rminx + r), sent),
                  jnp.where(a2, cid(y1 + 1, rminx), sent)]
    if flip:
        plus, minus = minus, plus
    return plus + [x + G for x in minus]


def _tile_counts(corner_ids, gx, gy):
    """Exact per-tile emitted-pair counts [gy*gx] WITHOUT the main sort:
    sort the corner ids, bisect per-id occurrence counts, difference the
    plus/minus planes, 2-D prefix sum (TPU scatters are ~100x slower than
    sorts at this size, so the corner "scatter" is a sort + bisect)."""
    gxp = gx + 1
    G = gxp * (gy + 1)
    ids = jnp.concatenate(corner_ids)
    s = jnp.sort(ids, stable=False)
    rounds = int(np.ceil(np.log2(max(ids.shape[0], 2)))) + 1
    bounds = _bisect(s, jnp.arange(2 * G + 1, dtype=jnp.int32), rounds)
    per_id = bounds[1:] - bounds[:-1]                        # [2G]
    diff = (per_id[:G] - per_id[G:]).reshape(gy + 1, gxp)
    counts2d = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)
    return counts2d[:gy, :gx].reshape(-1)                    # [T]


def extension_tiers(cfg: RasterConfig, n: int,
                    width: int, height: int) -> list[tuple[int, int]]:
    """Static (count, tile cap) tiers of the giant-splat extension: a few
    full-grid slots for huge splats + many mid slots, so thousands of
    moderately-big Gaussians (fresh RGB-D insertions in sparse regions) are
    covered without paying full-grid key capacity for each."""
    ts = cfg.tile_size
    T = (-(-width // ts)) * (-(-height // ts))
    full = T if cfg.big_tiles is None else min(cfg.big_tiles, T)
    tiers = []
    ka = min(cfg.big_k, n)
    if ka > 0 and full > cfg.max_tiles:
        tiers.append((ka, full))
    kb = min(cfg.mid_k, max(n - ka, 0))
    mid = min(cfg.mid_tiles, full)
    if kb > 0 and cfg.max_tiles < mid < full:
        tiers.append((kb, mid))
    return tiers


def _big_extension(area, visible, rminx, rminy, aw, awc, m,
                   gx, G, gxp, tiers):
    """Giant-splat extension: the largest-area visible Gaussians (by one
    descending area sort) emit their remaining cells [m, min(area, cap))
    beyond the dense cap, tier t covering ranks
    [sum(K_<t), sum(K_<=t)) at tile cap cap_t. Returns (corner id blocks,
    total per-Gaussian extension [N], per-tier key-emission geometry)."""
    areav = jnp.where(visible, area, 0)
    n = area.shape[0]
    _, order_desc = jax.lax.sort_key_val(-areav,
                                         jnp.arange(n, dtype=jnp.int32))
    ids, geo = [], []
    m_ext = jnp.zeros_like(m)
    off = 0
    for K, cap in tiers:
        bidx = jax.lax.dynamic_slice_in_dim(order_desc, off, K)
        off += K
        m2 = jnp.minimum(jnp.minimum(areav[bidx], cap), IDX_MASK)
        m1 = m[bidx]                             # dense part already emitted
        ext = jnp.maximum(m2 - m1, 0)
        brminx, brminy = rminx[bidx], rminy[bidx]
        baw, bawc = aw[bidx], awc[bidx]
        # m1 (the dense part being subtracted) is row-rounded -> 4 corners;
        # m2 = min(area, cap) is not -> full 8
        ids += (_corner_blocks(brminx, brminy, baw, bawc, m2, G, gxp, False)
                + _corner_blocks(brminx, brminy, baw, bawc, m1, G, gxp,
                                 True, partial=False))
        m_ext = m_ext.at[bidx].add(ext)
        geo.append((bidx, brminx, brminy, bawc, m1, m2, cap))
    return ids, m_ext, geo


def _counts_and_geometry(xy, radius_xy, visible, width, height, cfg,
                         max_tiles):
    """Shared between pair_stats and build_pairs: emission geometry, exact
    per-tile counts (dense + giant-splat extension tiers), per-rank totals,
    and the truncation count remaining after the extension."""
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    gxp = gx + 1
    G = gxp * (gy + 1)
    N = (xy[0] if isinstance(xy, tuple) else xy).shape[0]
    rminx, rminy, aw, awc, m, area, n_trunc = _emission(
        xy, radius_xy, visible, width, height, ts, max_tiles)
    # dense emission is row-rounded (r == 0 structurally): 4 corners per
    # Gaussian instead of 8 — the tier blocks below keep the partial-row
    # corners (their m2 = min(area, cap) is not row-rounded)
    ids = _corner_blocks(rminx, rminy, aw, awc, m, G, gxp, False,
                         partial=False)
    tiers = extension_tiers(cfg, N, width, height)
    geo = []
    m_tot = m
    if tiers:
        bids, m_ext, geo = _big_extension(
            area, visible, rminx, rminy, aw, awc, m, gx, G, gxp, tiers)
        ids = ids + bids
        m_tot = m + m_ext
        n_trunc = n_trunc - jnp.sum(m_ext)
    counts = _tile_counts(ids, gx, gy)
    return (gx, gy, rminx, rminy, awc, m, m_tot, counts, n_trunc, geo)


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def pair_stats(xy, radius_xy, visible, width: int, height: int,
               cfg: RasterConfig):
    """Exact (n_pairs_kept, n_dropped, n_trunc) of build_pairs without the
    main sort (same corner-histogram counts + the same cap arithmetic)."""
    N = (xy[0] if isinstance(xy, tuple) else xy).shape[0]
    max_tiles, pair_cap = resolve_caps(cfg, N)
    gx, gy, *_rest = geo = _counts_and_geometry(
        xy, radius_xy, visible, width, height, cfg, max_tiles)
    m_tot, counts, n_trunc = geo[6], geo[7], geo[8]
    cap_al = _cap_al(cfg, N, width, height, pair_cap, max_tiles)
    asize = ((counts + ALIGN - 1) // ALIGN) * ALIGN
    astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(asize).astype(jnp.int32)])[:-1]
    kept = jnp.sum(jnp.clip(cap_al - astarts, 0, counts))
    total_valid = jnp.sum(m_tot)
    return kept, n_trunc + (total_valid - kept), n_trunc


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def pair_need(xy, radius_xy, visible, width: int, height: int,
              cfg: RasterConfig):
    """Exact 128-aligned pair-array length this scene needs under ``cfg``
    with NO drops (sum of per-tile aligned segment sizes, uncapped) — the
    probe behind probe-driven static caps (RasterConfig.pair_cap_override):
    measure once on a representative frame, then compile the hot program
    with a zero-slack pair array. Pass the result MINUS the T*ALIGN fill
    reserve as the override (cap arithmetic adds the reserve back)."""
    N = (xy[0] if isinstance(xy, tuple) else xy).shape[0]
    max_tiles, _ = resolve_caps(cfg, N)
    geo = _counts_and_geometry(xy, radius_xy, visible, width, height,
                               cfg, max_tiles)
    counts = geo[7]
    asize = ((counts + ALIGN - 1) // ALIGN) * ALIGN
    return jnp.sum(asize)


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg",
                                             "max_tiles", "pair_cap"))
def build_pairs(xy, radius_xy, visible, width: int, height: int,
                cfg: RasterConfig, max_tiles: int | None = None,
                pair_cap: int | None = None):
    """Inputs are depth-sorted per-Gaussian screen quantities.

    Returns dict with:
      pair_idx [CAP_AL] int32 DEPTH RANK (index into the depth-sorted
                        Gaussian axis), in per-tile segments each starting
                        128-aligned (N = padding sentinel)
      starts   [T]      int32 aligned segment start (start % 128 == 0)
      counts   [T]      int32 valid pair count per tile (clamped at the cap)
      n_dropped         int32 pairs lost to max_tiles truncation or pair_cap
    """
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    T = gx * gy
    N = (xy[0] if isinstance(xy, tuple) else xy).shape[0]
    assert N < IDX_MASK, N
    assert T < (1 << (31 - IDX_BITS)), T
    max_tiles, pair_cap = resolve_caps(cfg, N, max_tiles, pair_cap)
    cap_al = _cap_al(cfg, N, width, height, pair_cap, max_tiles)

    (gx, gy, rminx, rminy, awc, m, m_tot, counts, n_trunc,
     geo) = _counts_and_geometry(xy, radius_xy, visible, width, height,
                                 cfg, max_tiles)

    # per-tile filler population so every segment is a 128-multiple
    fill = (-counts) % ALIGN
    asize = counts + fill
    astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(asize).astype(jnp.int32)])[:-1]

    # SLOT-MAJOR [MT, N] emission tables: the [N, MT] orientation lane-pads
    # MT=6 -> 128 under the (8,128) tiling (measured ~0.95 ms/iter of pure
    # padding traffic across the broadcasts/iotas/reshapes at N=100k);
    # slot-major keeps N on lanes. The sort consumes a multiset — emission
    # order is irrelevant.
    slot = jnp.arange(max_tiles, dtype=jnp.int32)[:, None]       # [MT, 1]
    dx = slot % awc[None, :]
    dy = slot // awc[None, :]
    tile = (rminy[None, :] + dy) * gx + rminx[None, :] + dx      # [MT, N]
    ridx = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(slot < m[None, :],
                    (tile << IDX_BITS) | ridx[None, :], jnp.int32(_I32_MAX))
    key_blocks = [key.reshape(-1)]

    for bidx, brminx, brminy, bawc, m1, m2, cap in geo:
        # giant-splat extension keys: cells [m1, m2) of this tier's rects
        slot2 = jnp.arange(cap, dtype=jnp.int32)[:, None]        # [cap, 1]
        dx2 = slot2 % bawc[None, :]
        dy2 = slot2 // bawc[None, :]
        ok2 = (slot2 >= m1[None, :]) & (slot2 < m2[None, :])
        # clamp the masked-out branch: dy2 can run past the rect for small
        # rects and the tile id would overflow the shift
        tile2 = jnp.where(ok2, (brminy[None, :] + dy2) * gx
                          + brminx[None, :] + dx2, 0)
        key_blocks.append(jnp.where(
            ok2, (tile2 << IDX_BITS) | bidx[None, :],
            jnp.int32(_I32_MAX)).reshape(-1))

    lane = jnp.arange(ALIGN, dtype=jnp.int32)
    tid = jnp.arange(T, dtype=jnp.int32)
    fkey = jnp.where(lane[None, :] < fill[:, None],
                     (tid[:, None] << IDX_BITS) | IDX_MASK,
                     jnp.int32(_I32_MAX))
    key_blocks.append(fkey.reshape(-1))

    sorted_all = jnp.sort(jnp.concatenate(key_blocks), stable=False)[:cap_al]
    rank = sorted_all & IDX_MASK
    pair_idx = jnp.where(rank == IDX_MASK, N, rank)

    counts_c = jnp.clip(cap_al - astarts, 0, counts)
    total_valid = jnp.sum(m_tot)
    n_dropped = n_trunc + (total_valid - jnp.sum(counts_c))
    return {"pair_idx": pair_idx.astype(jnp.int32),
            "starts": jnp.minimum(astarts, cap_al), "counts": counts_c,
            # emitted pairs per depth rank [N] (= number of touched tiles);
            # exact run lengths of each rank in rank-sorted pair order
            # whenever n_dropped == 0
            "per_rank_counts": m_tot, "n_dropped": n_dropped,
            "n_trunc": n_trunc}
