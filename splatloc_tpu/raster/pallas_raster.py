"""Pallas TPU rasterization core: pair-segment walk, forward + backward.

The differentiable blend over sort-binned (Gaussian, tile) pairs
(see pairs.py). Per tile, both kernels walk the tile's contiguous,
128-ALIGNED pair segment in [CHUNK]-sized slabs of attribute-major data:

- forward: front-to-back compositing via lane-axis cumprod, MXU matmul for
  the weighted accumulation, per-pixel early exit at transmittance_eps, and
  a per-pixel ``n_contrib`` (last blended pair position) output for the
  backward pass — the CUDA forward's last_contributor. Kernel-boundary
  arrays (accumulators, cotangents) are ATTR-MAJOR [T, OUT, P]: pixels on
  lanes, so nothing lane-pads to 128 (the channels-minor [T, P, OUT] form
  cost 13x physical bytes on every crossing — 157 MB/iter at 640x480).
- backward: reverse walk from the last contributing chunk, reconstructing
  transmittance by division over *blended* pairs only (numerically safe, the
  CUDA scheme) and producing analytic gradients for xy/conic/opacity/
  depth/channels per pair. Because segments are 128-aligned, every gradient
  slab is owned by exactly one tile: stores are pure writes (no RMW), and a
  depth-2 ring of in-flight write DMAs hides the store latency. Per-pair
  gradients reduce to per-Gaussian gradients with one segment_sum — no large
  scatters anywhere.

Alignment padding pairs carry Gaussian index N whose packed attributes are
all zero -> opacity 0 -> inert in the blend; neither kernel needs tile-id or
segment-window masks.

``blend_pairs`` wraps the two in a jax.custom_vjp; everything upstream
(projection, SH, activations, camera pose) stays ordinary JAX autodiff.

Replaces the reference CUDA rasterizer (submodules/diff-gaussian-
rasterization, call contract at gaussian_splatting/gaussian_renderer/
__init__.py:117-126), adding camera-pose gradients the reference never had.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatloc_tpu.raster import pairs as pairs_mod
from splatloc_tpu.raster.types import RasterConfig

# attribute-major row layout of per-pair data
R_X, R_Y, R_CA, R_CB, R_CC, R_OP, R_DEPTH = 0, 1, 2, 3, 4, 5, 6
N_FIXED = 7
CHUNK = 128
# chunk-walk prefetch ring depth: the walks are HBM-LATENCY-bound (see
# _fwd_kernel note), so NPF-1 chunk loads stay in flight
NPF = 4


def _rows_for(c: int) -> int:
    # + 3: the binning rect rows (radius_x, radius_y, visible) ride in the
    # table (see _build_per_g)
    need = N_FIXED + c + 3
    if need <= 8:
        return 8
    return 16 if need <= 16 else 32


def _row(g, j, rows, chunk):
    """Extract row j of [rows, chunk] as [1, chunk] (Mosaic forbids
    sublane-1 slices; masked sum-reduce is layout-friendly)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 0)
    return jnp.sum(jnp.where(ri == j, g, 0.0), axis=0, keepdims=True)


def _col_from(mat, k, P, lanes):
    """Column k of [P, lanes] as [P, 1] via masked reduce."""
    li = jax.lax.broadcasted_iota(jnp.int32, (P, lanes), 1)
    return jnp.sum(jnp.where(li == k, mat, 0.0), axis=1, keepdims=True)


# Floor tolerance for the power<=0 inside-ellipse test. The working keep
# threshold is PER-PAIR (see _power_coeffs): the _dot_f32 limb-split error is
# ABSOLUTE — bounded by sum_i |a_i||b_i| * 2^-16, and the tile-local quadratic
# coefficients reach ~1e3 for small splats far from the tile origin while
# cancelling to power ~ 0 at the splat center. A fixed 1e-5 epsilon dropped
# those centers on the real chip (ONCHIP_r03 tpu_parity_check:
# image_max_diff 0.44); the coefficient-magnitude-scaled epsilon keeps them
# while admitting at most a ~2% alpha error on boundary pixels of the most
# ill-conditioned pairs.
_POWER_KEEP_EPS = 1e-5


def _pixel_monomials(flat, ts, P):
    """[P, 8] per-pixel monomial matrix in TILE-LOCAL coordinates:
    [1, p, q, p^2, p*q, q^2, 0, 0] for pixel (p, q). power is then one MXU
    contraction with the per-pair quadratic coefficients (local coords keep
    the expansion catastrophic-cancellation-free: |p|,|q| < ts)."""
    p = (flat % ts).astype(jnp.float32)                      # [P, 1]
    q = (flat // ts).astype(jnp.float32)
    li = jax.lax.broadcasted_iota(jnp.int32, (P, 8), 1)
    m = jnp.zeros((P, 8), jnp.float32)
    for k, v in ((0, jnp.ones((P, 1), jnp.float32)), (1, p), (2, q),
                 (3, p * p), (4, p * q), (5, q * q)):
        m = m + jnp.where(li == k, jnp.broadcast_to(v, (P, 8)), 0.0)
    return m


def _power_coeffs(g, ox, oy, rows, ts):
    """Per-pair quadratic power coefficients [8, CHUNK] in tile-local pixel
    coords: power(p,q) = c0 + c1*p + c2*q + c3*p^2 + c4*p*q + c5*q^2.
    All math on [1, CHUNK] rows — negligible next to [P, CHUNK] work.

    Also returns the per-pair keep epsilon [1, CHUNK]: the limb-split MXU
    dot's absolute error bound sum_i |a_i||b_i| * 2^-16 (monomials bounded by
    (ts-1)^k), with 4x margin, floored at _POWER_KEEP_EPS — the threshold for
    the power<=0 inside-ellipse test (see _POWER_KEEP_EPS note)."""
    gxv = _row(g, R_X, rows, CHUNK)
    gyv = _row(g, R_Y, rows, CHUNK)
    ca = _row(g, R_CA, rows, CHUNK)
    cb = _row(g, R_CB, rows, CHUNK)
    cc = _row(g, R_CC, rows, CHUNK)
    ex = gxv - ox
    ey = gyv - oy
    c0 = -0.5 * (ca * ex * ex + cc * ey * ey) - cb * ex * ey
    c1 = ca * ex + cb * ey
    c2 = cc * ey + cb * ex
    c3 = -0.5 * ca
    c4 = -cb
    c5 = -0.5 * cc
    t = float(ts - 1)
    mag = (jnp.abs(c0) + t * (jnp.abs(c1) + jnp.abs(c2))
           + t * t * (jnp.abs(c3) + jnp.abs(c4) + jnp.abs(c5)))
    eps = jnp.maximum(mag * (2.0 ** -14), _POWER_KEEP_EPS)   # [1, CHUNK]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 0)
    out = jnp.zeros((8, CHUNK), jnp.float32)
    for k, v in ((0, c0), (1, c1), (2, c2), (3, c3), (4, c4), (5, c5)):
        out = out + jnp.where(ri == k, jnp.broadcast_to(v, (8, CHUNK)), 0.0)
    return out, eps, (ex, ey, ca, cb, cc)


def _tri_mask(P_rows, pred):
    ri = jax.lax.broadcasted_iota(jnp.int32, (P_rows, P_rows), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (P_rows, P_rows), 1)
    return pred(ri, ci).astype(jnp.float32)


def _dot_f32(a, b, dims, exact_a=False, exact_b=False):
    """MXU matmul with (near-)f32 operand precision via manual bf16 limb
    splitting. Mosaic's default-precision dot rounds f32 operands to bf16
    (~0.4% relative) — the compiled kernels diverged from the interpret-mode
    oracle by up to 0.73 in image value. Precision.HIGHEST fixes the math
    but sends the Mosaic compile into the tens of minutes, so split
    x = hi + lo with hi = bf16(x): every emitted default-precision dot's
    implicit bf16 rounding is then LOSSLESS for hi and first-order small
    for lo -> ~2^-16 relative operand error at 2-3 plain dots. exact_a/b
    mark operands already exactly bf16-representable (pixel monomials:
    small integers; triangular 0/1 masks) that need no splitting."""
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    if exact_a and exact_b:
        return d(a, b)
    if exact_a:
        b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
        return d(a, b_hi) + d(a, b - b_hi)
    if exact_b:
        a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        return d(a_hi, b) + d(a - a_hi, b)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    return d(a_hi, b_hi) + d(a - a_hi, b_hi) + d(a_hi, b - b_hi)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(starts_ref, counts_ref, origin_ref,          # scalar prefetch
                gpair_hbm,                                   # [rows, PC] HBM
                out_ref,                                     # [1, P, OUT]
                gbuf, gsem, mpix_s, su_s,                    # scratch
                *, ts, n_channels, rows, alpha_max, alpha_min, t_eps,
                n_tiles, pair_len):
    t = pl.program_id(0)
    P = ts * ts
    # starts are 128-aligned by construction; the floor-multiply is an
    # identity that lets Mosaic PROVE the DMA offsets are tile-divisible
    # (it must come AFTER the clamp or the proof is lost). The clamp only
    # bites for empty tiles whose start is the capacity sentinel (their
    # drain-wait descriptor must still be addressable).
    lo = (jnp.minimum(starts_ref[t], pair_len - CHUNK) // CHUNK) * CHUNK
    count = counts_ref[t]
    ox = origin_ref[2 * t]
    oy = origin_ref[2 * t + 1]
    nchunks = pl.cdiv(count, CHUNK)

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            gpair_hbm.at[:, pl.ds(lo + j * CHUNK, CHUNK)],
            gbuf.at[slot], gsem.at[slot])

    # loop-invariant tables live in scratch VMEM across the sequential
    # grid: built once at t == 0, reused by all later tiles; the first
    # tile's chunk-0 DMA also starts here — every later tile's was started
    # by its predecessor's epilogue (cross-tile handoff below), overlapping
    # the HBM latency with the predecessor's output write + this prologue
    @pl.when(t == 0)
    def _():
        flat = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        mpix_s[...] = _pixel_monomials(flat, ts, P)          # [P, 8]
        su_s[...] = _tri_mask(CHUNK, lambda r, c: r < c)     # prefix-excl

        @pl.when(nchunks > 0)
        def _():
            get_dma(0, 0).start()

    # drain an unconsumed handoff prefetch (empty tile, t > 0): the
    # predecessor prefetched this tile's chunk 0 unconditionally
    @pl.when((t > 0) & (nchunks == 0))
    def _():
        get_dma(0, 0).wait()

    # prime the deep prefetch ring: chunks 1..NPF-1 in flight before the
    # walk starts (chunk 0 was started above or by the handoff). The walk
    # is DMA-LATENCY-bound, not compute-bound — removing a whole
    # [P,C]x[C,C] MXU op per chunk measured ZERO time change — so the ring
    # keeps NPF-1 loads in flight to hide the ~1 us HBM latency behind
    # NPF-1 chunks of compute.
    for k in range(1, NPF):
        @pl.when(nchunks > k)
        def _(k=k):
            get_dma(k, k).start()

    mpix = mpix_s[...]
    su = su_s[...]

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)

    def body(state):
        j, t_carry, t_blend, acc, ncontrib = state
        slot = jax.lax.rem(j, NPF)

        # j == 0's lookahead (chunk NPF-1) was already primed above
        @pl.when((j >= 1) & (j + NPF - 1 < nchunks))
        def _():
            get_dma(jax.lax.rem(j + NPF - 1, NPF), j + NPF - 1).start()

        get_dma(slot, j).wait()
        g = gbuf[slot]

        op = _row(g, R_OP, rows, CHUNK)

        # absolute position of each pair in the global pair array
        pos = (lo + j * CHUNK + lane1).astype(jnp.float32)

        # power as ONE MXU contraction with per-pair quadratic coefficients
        # in tile-local pixel coordinates (see _power_coeffs)
        c8, keep_eps, _ = _power_coeffs(g, oxf, oyf, rows, ts)
        power = _dot_f32(mpix, c8, (((1,), (0,)), ((), ())),
                         exact_a=True)                       # [P, CHUNK]
        # keep-eps test folded into the exponent: rejected pairs get a -40
        # exponent -> raw ~ op*4e-18, killed by the alpha_min cut below
        # (one select replaces the separate compare+and+select chain)
        pm = jnp.where(power <= keep_eps, jnp.minimum(power, 0.0), -40.0)
        raw = op * jnp.exp(pm)
        # padding pairs have all-zero attrs -> alpha 0 -> dropped here
        alpha = jnp.where(raw >= alpha_min,
                          jnp.minimum(raw, alpha_max), 0.0)

        # transmittance chain in log space: the in-chunk exclusive prefix
        # cumprod of (1-alpha) becomes exp of ONE MXU matmul with a
        # triangular ones matrix (alpha <= alpha_max < 1 keeps log finite)
        lg = jnp.log1p(-alpha)                               # [P, CHUNK]
        cum = jax.lax.dot_general(
            lg, su, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # prefix-excl sum
        t_exc = t_carry * jnp.exp(cum)
        aw = alpha * t_exc
        live = (t_exc - aw) >= t_eps                         # t_inc >= eps
        w = jnp.where(live, aw, 0.0)

        # w > 0 iff (live & alpha > 0): the blended test in one compare
        ncontrib = jnp.maximum(
            ncontrib,
            jnp.max(jnp.where(w > 0.0, jnp.broadcast_to(pos, (P, CHUNK)),
                              -1.0), axis=1, keepdims=True))

        attr_rows = [_row(g, N_FIXED + c, rows, CHUNK)
                     for c in range(n_channels)]
        attr_rows.append(_row(g, R_DEPTH, rows, CHUNK))
        attr_rows.append(jnp.ones((1, CHUNK), jnp.float32))
        attrs_ln = jnp.concatenate(attr_rows, axis=0)        # [OUT', CHUNK]
        # same contraction as the historical [P, OUT'] form, transposed
        # output (identical operands + accumulation order -> identical
        # values): accumulate attr-major for the compact output block
        contrib = jax.lax.dot_general(
            attrs_ln, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [OUT', P]
        acc = acc + contrib

        t_carry = t_carry * jnp.exp(
            jnp.sum(lg, axis=1, keepdims=True))              # [P, 1]
        # exact (VPU f32) transmittance over BLENDED pairs only — telescopes
        # to the same value as 1 - sum(w), but WITHOUT the MXU-accumulated
        # weight sum's bf16 noise: the backward seeds its divide-based
        # reconstruction from this, and on saturated pixels 1 - alpha_sum
        # cancels catastrophically (true t ~ t_eps vs ~4e-3 dot noise ->
        # 40x relative error amplifying EVERY grad of the pixel; measured
        # 19% grad L2 on chip before this output existed).
        t_blend = t_blend * jnp.exp(
            jnp.sum(jnp.where(live, lg, 0.0), axis=1, keepdims=True))
        return j + 1, t_carry, t_blend, acc, ncontrib

    def cond(state):
        j, t_carry, _, _, _ = state
        return (j < nchunks) & (jnp.max(t_carry) >= t_eps)

    t0 = jnp.ones((P, 1), jnp.float32)
    acc0 = jnp.zeros((n_channels + 2, P), jnp.float32)
    nc0 = jnp.full((P, 1), -1.0, jnp.float32)
    j_end, _, t_blend, acc, ncontrib = jax.lax.while_loop(
        cond, body, (0, t0, t0, acc0, nc0))

    # early-exit drain: iterations 0..j_end-1 started chunks up to
    # j_end + NPF - 2 — wait every in-flight slot before reusing the ring
    for k in range(NPF - 1):
        @pl.when((j_end > 0) & (j_end + k < nchunks))
        def _(k=k):
            get_dma(jax.lax.rem(j_end + k, NPF), j_end + k).wait()

    # cross-tile handoff: start the NEXT tile's chunk-0 DMA now (slot 0 is
    # drained — every in-flight DMA above has been waited), so its HBM
    # latency overlaps this tile's output write and the next prologue.
    # Empty next tiles drain it (see prologue); the offset is clamped so a
    # start at the capacity sentinel cannot address out of bounds.
    @pl.when(t + 1 < n_tiles)
    def _():
        nlo = (jnp.minimum(starts_ref[t + 1], pair_len - CHUNK)
               // CHUNK) * CHUNK
        pltpu.make_async_copy(gpair_hbm.at[:, pl.ds(nlo, CHUNK)],
                              gbuf.at[0], gsem.at[0]).start()

    # ATTR-MAJOR output block [OUT'+2, P]: pixels on lanes, attrs on
    # sublanes — a [T, P, OUT] HBM array lane-pads OUT -> 128 under the
    # (8,128) tiling (13x physical bytes; measured 157 MB/iter of pure
    # padding traffic at 640x480). The two per-pixel [P, 1] tails transpose
    # to [1, P] rows once per tile (Mosaic dots with swapped contraction
    # dims lower to non-constant-accumulator multi_reductions and fail to
    # compile, so transpose via jnp).
    tail_t = jnp.concatenate([ncontrib, t_blend], axis=1).T   # [2, P]
    out_ref[0] = jnp.concatenate([acc, tail_t], axis=0)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(starts_ref, counts_ref, origin_ref, jhi_ref,  # scalar prefetch
                gpair_hbm, fwd_ref, cot_ref, gzero_hbm,      # inputs
                gout_hbm,                                    # [PC, 128] HBM
                gbuf, wbuf, gsem, wsem, wcnt, mpix_s, sli_s,  # scratch
                *, ts, n_channels, rows, alpha_max, alpha_min, t_eps,
                n_tiles, pair_len, fill_skipped=False):
    # Slab init (BWD_INIT): the walk never writes chunks past each tile's
    # last contributor. "alias_zeros" aliases a full zeros array into the
    # output; "kernel_fill" instead zero-writes ONLY those skipped chunks
    # through the same write ring (second loop after the walk) — strictly
    # fewer HBM bytes than the full-slab zeros broadcast it replaces
    # (0.22 ms/iter bench, 2.9 ms/step mapping at 5 views). The pair-array
    # slack tail past the LAST tile's segment belongs to no tile and stays
    # unwritten under kernel_fill: its keys are i32_max -> sentinel rank N,
    # whose run the reduction's validity mask discards.
    del gzero_hbm
    t = pl.program_id(0)
    P = ts * ts
    OUTP = n_channels + 2
    # aligned by construction; floor-multiply is Mosaic's divisibility proof
    lo = (starts_ref[t] // CHUNK) * CHUNK
    count = counts_ref[t]
    ox = origin_ref[2 * t]
    oy = origin_ref[2 * t + 1]
    nchunks = pl.cdiv(count, CHUNK)
    # last chunk containing any contributor — precomputed in the glue from
    # the forward's per-pixel n_contrib channel (one [T] reduction there
    # replaces a per-tile max reduce here AND makes the cross-tile DMA
    # handoff target exact)
    j_hi = jhi_ref[t]

    # loop-invariant tables built once at t == 0, persistent across the
    # sequential grid (see _fwd_kernel)
    @pl.when(t == 0)
    def _():
        wcnt[0] = 0
        flat = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        mpix_s[...] = _pixel_monomials(flat, ts, P)          # [P, 8]
        sli_s[...] = _tri_mask(CHUNK, lambda r, c: r >= c)   # suffix-incl
        # zero the write slabs once: per-chunk stores touch only the data
        # lanes (0..rows-1); the pad lanes stay zero forever
        wbuf[...] = jnp.zeros_like(wbuf)

    mpix = mpix_s[...]
    sli = sli_s[...]
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)

    fwd = fwd_ref[0]                                         # [OUT'+2, P]
    cot = cot_ref[0]                                         # [OUT', P]
    # per-pixel tails come in attr-major [1, P] rows (compact layout, see
    # _fwd_kernel); transpose back to [P, 1] columns once per tile
    ncontrib = _row(fwd, n_channels + 2, OUTP + 2, P).T      # [P, 1]
    # the forward's exact f32 blended-prefix transmittance (NOT
    # 1 - alpha_sum: on saturated pixels that subtraction cancels against
    # the MXU weight-sum's bf16 noise and amplifies every grad of the pixel)
    t_final = _row(fwd, n_channels + 3, OUTP + 2, P).T       # [P, 1]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            gpair_hbm.at[:, pl.ds(lo + j * CHUNK, CHUNK)],
            gbuf.at[slot], gsem.at[slot])

    def write_start(slot, j):
        return pltpu.make_async_copy(
            wbuf.at[slot], gout_hbm.at[pl.ds(lo + j * CHUNK, CHUNK), :],
            wsem.at[slot])

    def write_waiter(slot):
        # same byte count as any grad-slab write; dst slice is irrelevant
        # for waiting on the semaphore
        return pltpu.make_async_copy(
            wbuf.at[slot], gout_hbm.at[pl.ds(0, CHUNK), :], wsem.at[slot])

    # the first tile starts its own walk DMA; later tiles' were started by
    # their predecessor's epilogue handoff (gated on j_hi >= 0 there)
    @pl.when((t == 0) & (j_hi >= 0))
    def _():
        get_dma(0, j_hi).start()

    # prime the deep prefetch ring (walk runs j_hi -> 0): chunks
    # j_hi-1..j_hi-(NPF-1) in flight before the first iteration — the walk
    # is HBM-latency-bound like the forward's
    for k in range(1, NPF):
        @pl.when(j_hi - k >= 0)
        def _(k=k):
            get_dma(k, j_hi - k).start()

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(state):
        j, t_end, s_end = state
        slot = jax.lax.rem(j_hi - j, NPF)

        # j == j_hi's lookahead (chunk j_hi - NPF + 1) was already primed
        @pl.when((j < j_hi) & (j - (NPF - 1) >= 0))
        def _():
            get_dma(jax.lax.rem(j_hi - (j - (NPF - 1)), NPF),
                    j - (NPF - 1)).start()

        get_dma(slot, j).wait()
        g = gbuf[slot]

        op = _row(g, R_OP, rows, CHUNK)

        pos = (lo + j * CHUNK + lane1).astype(jnp.float32)

        # power via the same MXU contraction as the forward kernel
        c8, keep_eps, (ex, ey, ca, cb, cc) = _power_coeffs(g, oxf, oyf,
                                                           rows, ts)
        power = _dot_f32(mpix, c8, (((1,), (0,)), ((), ())),
                         exact_a=True)                       # [P, CHUNK]
        # keep-eps test folded into the exponent (as in the forward):
        # rejected pairs get e ~ 4e-18 -> killed by the alpha_min cut
        e = jnp.exp(jnp.where(power <= keep_eps,
                              jnp.minimum(power, 0.0), -40.0))
        raw = op * e
        keep = raw >= alpha_min
        alpha = jnp.where(keep, jnp.minimum(raw, alpha_max), 0.0)

        b = keep & (jnp.broadcast_to(pos, (P, CHUNK)) <= ncontrib)
        # suffix-inclusive cumprod of (1-alpha) over blended pairs, in log
        # space: exp of ONE MXU matmul with a triangular ones matrix
        lg_eff = jnp.where(b, jnp.log1p(-alpha), 0.0)
        sfx = jax.lax.dot_general(
            lg_eff, sli, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # suffix-incl sum
        t_exc = t_end * jnp.exp(-sfx)                        # [P, CHUNK]

        attr_rows = [_row(g, N_FIXED + c, rows, CHUNK)
                     for c in range(n_channels)]
        attr_rows.append(_row(g, R_DEPTH, rows, CHUNK))
        attr_rows.append(jnp.ones((1, CHUNK), jnp.float32))
        attrs_ln = jnp.concatenate(attr_rows, axis=0)        # [OUT', CHUNK]

        # u = dL/dw per (pixel, pair): cot [OUT', P] contracted with
        # attrs_ln [OUT', CHUNK] over OUT' (same operands + accumulation
        # order as the historical [P, OUT'] form)
        u = jax.lax.dot_general(
            cot, attrs_ln, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [P, CHUNK]

        bw = jnp.where(b, 1.0, 0.0)
        w = bw * alpha * t_exc
        wu = w * u
        # exclusive suffix cumsum of wu: the suffix-EXCLUSIVE triangular is
        # sli - I, so reuse the inclusive mask and subtract wu — one big
        # [P,C]x[C,C] MXU op per chunk instead of two
        s_in = s_end - wu + jax.lax.dot_general(
            wu, sli, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        one_m = 1.0 - alpha
        dalpha = bw * (t_exc * u - s_in / one_m)
        not_clamped = jnp.where(raw < alpha_max, 1.0, 0.0)
        # d alpha / d power = alpha only where the exp(min(power, 0)) clamp
        # is inactive: boundary pairs kept with power in (0, KEEP_EPS] have
        # zero derivative w.r.t. power (alpha is flat there), so mask them
        # out of the xy/conic/opacity chain
        in_ellipse = jnp.where(power <= 0.0, 1.0, 0.0)
        dpower = dalpha * alpha * not_clamped * in_ellipse
        dop_pix = dalpha * e * not_clamped

        # grads w.r.t. the quadratic coefficients: ONE MXU contraction over
        # pixels, then the (cheap, [1, CHUNK]) linear chain back to
        # xy/conic — replaces five full [P, CHUNK] product-reduce passes
        dc8 = _dot_f32(mpix, dpower, (((0,), (0,)), ((), ())),
                       exact_a=True)                         # [8, CHUNK]
        d0 = _row(dc8, 0, 8, CHUNK)
        d1 = _row(dc8, 1, 8, CHUNK)
        d2 = _row(dc8, 2, 8, CHUNK)
        d3 = _row(dc8, 3, 8, CHUNK)
        d4 = _row(dc8, 4, 8, CHUNK)
        d5 = _row(dc8, 5, 8, CHUNK)
        d_gx = d0 * (-ca * ex - cb * ey) + d1 * ca + d2 * cb
        d_gy = d0 * (-cc * ey - cb * ex) + d1 * cb + d2 * cc
        d_ca = d0 * (-0.5 * ex * ex) + d1 * ex - 0.5 * d3
        d_cb = d0 * (-ex * ey) + d1 * ey + d2 * ex - d4
        d_cc = d0 * (-0.5 * ey * ey) + d2 * ey - 0.5 * d5

        def rsum(x):
            return jnp.sum(x, axis=0, keepdims=True)          # [1, CHUNK]

        d_op = rsum(dop_pix)

        # channel + depth grads: [OUT', CHUNK] in one MXU op
        d_attrs = jax.lax.dot_general(
            cot, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [OUT', CHUNK]

        ri = jax.lax.broadcasted_iota(jnp.int32, (rows, CHUNK), 0)
        upd = jnp.zeros((rows, CHUNK), jnp.float32)
        for row_id, val in ((R_X, d_gx), (R_Y, d_gy), (R_CA, d_ca),
                            (R_CB, d_cb), (R_CC, d_cc), (R_OP, d_op)):
            upd = upd + jnp.where(ri == row_id,
                                  jnp.broadcast_to(val, (rows, CHUNK)), 0.0)
        # depth grad is d_attrs row n_channels; channel c -> row N_FIXED + c
        li2 = jax.lax.broadcasted_iota(jnp.int32, (OUTP, CHUNK), 0)
        d_depth = jnp.sum(jnp.where(li2 == n_channels, d_attrs, 0.0),
                          axis=0, keepdims=True)
        upd = upd + jnp.where(ri == R_DEPTH,
                              jnp.broadcast_to(d_depth, (rows, CHUNK)), 0.0)
        for c in range(n_channels):
            d_c = jnp.sum(jnp.where(li2 == c, d_attrs, 0.0),
                          axis=0, keepdims=True)
            upd = upd + jnp.where(ri == N_FIXED + c,
                                  jnp.broadcast_to(d_c, (rows, CHUNK)), 0.0)

        # pure store through a depth-2 ring of in-flight write DMAs
        # (aligned segments: no slab is shared between tiles, so no RMW and
        # no ordering constraint between writes)
        wi = wcnt[0]
        wslot = jax.lax.rem(wi, NPF)

        @pl.when(wi >= NPF)
        def _():
            write_waiter(wslot).wait()

        # PAIR-major slab: the HBM grad buffer is [PC, 128] (attr lanes
        # 0..rows, rest zero) so the rank-sort row gather downstream reads
        # contiguous rows — XLA gathers from an attr-major buffer run ~5x
        # slower (16 strided 4-B reads per pair). 128 lanes because Mosaic
        # rejects DMA slabs whose lane dim is not a 128-multiple. The slab
        # dtype (GRAD_SLAB_DTYPE) may be bf16: per-pair grads round at
        # ~0.4% relative BEFORE the f32 segmented reduction — under the
        # kernels' own MXU bf16 compositing noise floor — and the slab
        # write + rank gather are pure HBM traffic that halves. Lanes
        # rows..127 were zeroed once at t == 0 (every store leaves them 0),
        # so only the data lanes are stored per chunk.
        wbuf[wslot, :, :rows] = upd.T.astype(wbuf.dtype)
        write_start(wslot, j).start()
        wcnt[0] = wi + 1

        # carries: walking one chunk toward the front divides t_end by the
        # chunk's total blended (1-alpha) product = exp(sum of lg_eff)
        t_end = t_end * jnp.exp(-jnp.sum(lg_eff, axis=1, keepdims=True))
        s_end = s_end + jnp.sum(wu, axis=1, keepdims=True)
        return j - 1, t_end, s_end

    def cond(state):
        j, _, _ = state
        return j >= 0

    jax.lax.while_loop(cond, body, (j_hi, t_final, jnp.zeros((P, 1),
                                                            jnp.float32)))

    # cross-tile handoff: start the NEXT tile's first walk chunk (its
    # j_hi) now — slot 0 is drained (the walk's final wait was at j = 0,
    # slot rem(j_hi, 2)... every started DMA has been waited by the loop)
    @pl.when((t + 1 < n_tiles) & (jhi_ref[t + 1] >= 0))
    def _():
        nlo = (jnp.minimum(
            starts_ref[t + 1] + jhi_ref[t + 1] * CHUNK,
            pair_len - CHUNK) // CHUNK) * CHUNK
        pltpu.make_async_copy(gpair_hbm.at[:, pl.ds(nlo, CHUNK)],
                              gbuf.at[0], gsem.at[0]).start()

    if fill_skipped:
        # zero-write the chunks the walk skipped (beyond the tile's last
        # contributor), through the same write ring
        def zbody(j):
            wi = wcnt[0]
            wslot = jax.lax.rem(wi, NPF)

            @pl.when(wi >= NPF)
            def _():
                write_waiter(wslot).wait()

            wbuf[wslot, :, :rows] = jnp.zeros((CHUNK, rows), wbuf.dtype)
            write_start(wslot, j).start()
            wcnt[0] = wi + 1
            return j + 1

        jax.lax.while_loop(lambda j: j < nchunks, zbody, j_hi + 1)

    # drain the write ring before the kernel (last grid step) retires
    @pl.when(t == n_tiles - 1)
    def _():
        wi = wcnt[0]
        for k in range(1, NPF + 1):
            @pl.when(wi >= k)
            def _(k=k):
                write_waiter(jax.lax.rem(wi - k, NPF)).wait()


# --------------------------------------------------------------------------
# host-side wrappers + custom VJP
# --------------------------------------------------------------------------

# Pack-gather layout: "rows" gathers [PC, rows] rows from the transposed
# table then transposes (XLA's row-gather is ~3x faster than its
# column-gather-with-layout-change at 500k indices); "cols" is the direct
# take(axis=1). Module-level so experiments can flip it.
PACK_MODE = "rows"


def _build_per_g(xy, conic, opacity, depth, colors, order_p,
                 radius_xy=None, visible_f=None):
    """DEPTH-SORTED per-Gaussian attribute table [rows, n+1] (column n = all
    zeros -> the inert padding sentinel). One N-sized take instead of a
    PC-sized gauss-index compose: the pair ranks then index this table
    directly, and backward pair-grads reduce in the sorted domain.

    Built as ONE stack + pad: a chain of row dynamic-update-slices into a
    [rows, n] table measured ~2.3 ms/iter at n=100k (each row write is a
    lane-strided pass over the whole table); the stack is a single fusion.

    The binning rect quantities (radius_xy, visible) ride in three of the
    table's padding rows (indices from _rect_rows): a separate [N, 5] rect
    stack + row gather materialized five lane-padded [N, <128] arrays
    (measured ~0.6 ms/iter at N=100k — a [N, k<128] f32 array tiles to
    (8,128), 32x physical bytes); here they reuse the table's compact
    [rows, n] layout and its one order gather. The kernels ignore the
    extra rows; their grad-slab rows are zero."""
    c = colors.shape[-1]
    rows = _rows_for(c)
    us, vs = (xy if isinstance(xy, tuple) else (xy[:, 0], xy[:, 1]))
    ca, cb, cc = (conic if isinstance(conic, tuple)
                  else (conic[:, 0], conic[:, 1], conic[:, 2]))
    n = us.shape[0]
    chans = [us, vs, ca, cb, cc, opacity, depth]   # R_X..R_DEPTH order
    chans += [colors[:, i] for i in range(c)]      # N_FIXED..
    if radius_xy is not None:
        rx, ry = (radius_xy if isinstance(radius_xy, tuple)
                  else (radius_xy[:, 0], radius_xy[:, 1]))
        chans += [rx, ry, visible_f]
    if len(chans) < rows:
        z = jnp.zeros((n,), jnp.float32)
        chans += [z] * (rows - len(chans))
    per_g = jnp.stack(chans, axis=0)               # [rows, n]
    # sentinel column appended AFTER the order gather: order_p's final
    # entries (= n) clamp into the last real column here and the pad below
    # overwrites that slot with zeros. Padding the PRE-gather table instead
    # rewrote the whole 17 MB stacked table behind XLA's {0,1} layout copy
    # (0.41 ms/view at 262k capacity); per-channel 1-D pads broke the
    # single-fusion stack lowering (+1.0 ms at bench scale). The gather
    # output is [K, rows]-physical, so this pad is one 64 B tail row.
    sorted_t = jnp.take(per_g, order_p[:-1], axis=1)
    return jnp.pad(sorted_t, ((0, 0), (0, 1)))     # [rows, K+1]


def _rect_rows(c: int) -> tuple[int, int, int]:
    """(radius_x, radius_y, visible) row indices in the per-Gaussian
    table for C = c channels."""
    return N_FIXED + c, N_FIXED + c + 1, N_FIXED + c + 2


def _compact_copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(o_ref.dtype)


def _force_compact(x, interpret):
    """Pass-through pallas call: pins ``x`` [rows, PC] to the canonical
    compact (rows-sublane, PC-lane) layout, upcasting to f32 (the segscan
    accumulates in f32 whatever GRAD_SLAB_DTYPE the slab used). XLA inserts
    the relayout copy in front when the producer (e.g. a transposed row
    gather) left the buffer PAIR-major (16 lanes padded to 128 -> 8x
    bytes)."""
    rows, PC = x.shape
    blk = 128 * 64
    grid = -(-PC // blk)
    return pl.pallas_call(
        _compact_copy_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((rows, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, PC), jnp.float32),
        interpret=interpret,
    )(x)


# Segmented-scan implementation for the backward per-Gaussian reduction:
# "pallas" = one-pass kernel (single HBM read+write of the 35 MB grad
# matrix); "xla" = log2(kmax) Hillis-Steele roll passes (~0.7 ms more at
# 550k pairs). Mosaic-validated on a real v5e chip 2026-08-18
# (tools/segscan_onchip_check.py: max_rel_dev 0.0 vs the XLA path,
# 79.6 ms vs 95.5 ms per 10 bwd iters at bench scale) -> "pallas".
SEGSCAN_MODE = "pallas"


def _segscan_kernel(x_ref, si_ref, o_ref, carry, prev_id, *, rows, blk):
    """Inclusive SEGMENTED prefix sum along lanes over a sequential grid.

    x [rows, blk] f32 block of a [rows, PC] matrix whose lanes are grouped
    into ascending-id runs (si [1, blk] i32); a VMEM carry chains the run
    that spans the block boundary, so runs of ANY length work (the XLA
    fallback needs log2(max run) passes over HBM)."""
    b = pl.program_id(0)
    x = x_ref[...]
    s = si_ref[...]                                          # [1, blk] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    k = 1
    while k < blk:
        same = (pltpu.roll(s, k, 1) == s) & (lane >= k)
        x = jnp.where(same, x + pltpu.roll(x, k, 1), x)
        k *= 2

    @pl.when(b == 0)
    def _():
        prev_id[0] = jnp.int32(-1)
        carry[...] = jnp.zeros_like(carry)

    # chain the run continuing from the previous block (ids ascend, so its
    # lanes are a prefix of this block)
    cont = (s == prev_id[0]).astype(jnp.float32)             # [1, blk]
    cv = jnp.sum(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1) == 0,
        carry[...], 0.0), axis=1, keepdims=True)             # [rows, 1]
    x = x + cont * cv
    o_ref[...] = x

    ylast = jnp.sum(jnp.where(lane == blk - 1, x, 0.0), axis=1,
                    keepdims=True)                           # [rows, 1]
    carry[...] = jnp.broadcast_to(ylast, (rows, 128))
    prev_id[0] = jnp.sum(jnp.where(lane == blk - 1, s, 0))


def _segscan(x, si, interpret):
    """x [rows, PC] compact, si [PC] ascending run ids -> inclusive
    segmented prefix sums, via ONE pallas pass (SEGSCAN_MODE)."""
    rows, PC = x.shape
    blk = 128 * 128
    grid = -(-PC // blk)
    kernel = functools.partial(_segscan_kernel, rows=rows, blk=blk)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, blk), lambda i: (0, i)),
                  pl.BlockSpec((1, blk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((rows, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, PC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x, si[None])


def _gather_pairs(per_g_sorted, rank_idx):
    """The pack gather: [rows, n+1] table -> [rows, PC] per-pair data."""
    if PACK_MODE == "cols":
        return jnp.take(per_g_sorted, rank_idx, axis=1)
    gp = jnp.take(per_g_sorted.T, rank_idx, axis=0)         # [PC, rows]
    gp = jax.lax.optimization_barrier(gp)
    return gp.T


def _origins(width, height, ts):
    gx = -(-width // ts)
    gy = -(-height // ts)
    T = gx * gy
    tile_ids = np.arange(T, dtype=np.int32)
    return T, np.stack([(tile_ids % gx) * ts, (tile_ids // gx) * ts],
                       -1).reshape(-1).astype(np.int32)


def _run_fwd_kernel(starts, counts, origins, gpair, T, P, C, rows, cfg,
                    interpret):
    """Invoke the forward kernel over T tiles (local shard under shard_map)."""
    kernel = functools.partial(_fwd_kernel, ts=cfg.tile_size, n_channels=C,
                               rows=rows, alpha_max=cfg.alpha_max,
                               alpha_min=cfg.alpha_min,
                               t_eps=cfg.transmittance_eps,
                               n_tiles=T, pair_len=gpair.shape[1])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        # ATTR-MAJOR [T, OUT, P]: pixels on lanes. [T, P, OUT] would lane-pad
        # OUT -> 128 in HBM (13x bytes at C=4) on every kernel-boundary
        # crossing: the forward's write, the loss fusions' reads, the
        # cotangent materialization and the backward's reads.
        out_specs=pl.BlockSpec((1, C + 4, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NPF, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((NPF,)),
            pltpu.VMEM((P, 8), jnp.float32),          # mpix (persistent)
            pltpu.VMEM((CHUNK, CHUNK), jnp.float32),  # su (persistent)
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C + 4, P), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, origins, gpair)


def _forward_impl(xy, conic, opacity, depth, colors, radius, visible, order,
                  width, height, cfg, interpret, mesh=None, axis="tile"):
    """All per-Gaussian inputs UNSORTED; ``order`` is the depth permutation.
    Only the small rect quantities are gathered into sorted order for pair
    building; the heavy per-pair attribute gather composes order[pair_idx]
    directly.

    cfg.visible_cap K (None = N) slices every depth-sorted quantity to the
    first K ranks BEFORE pair building: invisible/dead Gaussians sort to the
    end (depth +inf), so with n_visible <= K nothing is lost while ALL the
    capacity-proportional glue (pair keys, attribute table, pack gathers,
    run-end extraction) shrinks from the storage capacity to the active-set
    tier — at map scale the capacity is 1.3-2x the alive count by
    construction of the growth policy. Overflow (n_visible > K) drops the
    FARTHEST visible Gaussians and is counted in n_vis_dropped so the
    trainer escalates the tier (same no-silent-under-rendering contract as
    the pair caps)."""
    ts = cfg.tile_size
    P = ts * ts
    C = colors.shape[-1]
    n = (xy[0] if isinstance(xy, tuple) else xy).shape[0]
    rows = _rows_for(C)
    T, origins = _origins(width, height, ts)

    K = n if cfg.visible_cap is None else min(int(cfg.visible_cap), n)
    n_vis = jnp.sum(visible.astype(jnp.int32))
    n_vis_dropped = jnp.maximum(n_vis - K, 0)
    order = order[:K]

    # the binning rect quantities ride in three padding rows of the
    # attribute table (see _build_per_g) — one shared order gather in the
    # table's compact layout instead of a separate [K, 5] stack + row
    # gather (which materialized lane-padded [N, <128] arrays, ~0.6 ms)
    order_p = jnp.concatenate([order.astype(jnp.int32),
                               jnp.full((1,), n, jnp.int32)])
    per_gs = _build_per_g(xy, conic, jnp.where(visible, opacity, 0.0),
                          depth, colors, order_p,
                          radius_xy=radius,
                          visible_f=visible.astype(jnp.float32))
    rrx, rry, rvis = _rect_rows(C)
    rect_uv = (per_gs[R_X, :K], per_gs[R_Y, :K])
    rect_r = (per_gs[rrx, :K], per_gs[rry, :K])
    rect_vis = per_gs[rvis, :K] > 0.5

    if mesh is None:
        pr = pairs_mod.build_pairs(rect_uv, rect_r, rect_vis,
                                   width, height, cfg)
        gpair = _gather_pairs(per_gs, jnp.minimum(pr["pair_idx"], K))
        out = _run_fwd_kernel(pr["starts"], pr["counts"],
                              jnp.asarray(origins), gpair, T, P, C, rows,
                              cfg, interpret)
        pr["n_vis_dropped"] = n_vis_dropped
        return out, pr, gpair

    # Sharded: each device bins pairs ONLY for its own contiguous block of
    # tile ROWS (clipping every rect to its row range) and gathers only its
    # own pair attributes — nothing pair-sized is replicated or communicated
    # in the forward; only the O(N) prep above (projection gather, per-G
    # table) is replicated. The tile grid is padded to D*rows_dev rows;
    # phantom rows (beyond the image) can receive pairs from bottom-edge
    # splats, but their accumulators are sliced off here and their
    # cotangents are zero in the backward, so they are inert.
    from jax.sharding import PartitionSpec as Pspec
    from jax import shard_map
    D = mesh.shape[axis]
    gx = -(-width // ts)
    gy = -(-height // ts)
    rows_dev = -(-gy // D)
    H_local = rows_dev * ts
    Tl = rows_dev * gx
    Tp = D * Tl
    _, orig_pad = _origins(width, D * H_local, ts)   # GLOBAL pixel origins
    orig_pad = orig_pad.reshape(Tp, 2)
    # per-device pair budget: the global budget split across devices with a
    # load-imbalance margin; overflow is surfaced via the psummed drop
    # counters and the trainer's escalation (which grows pair_cap_factor)
    pair_cap_local = int(np.ceil(cfg.pair_cap_factor * K
                                 * cfg.shard_pair_margin / D))

    def per_dev(o, per_gs_):
        d = jax.lax.axis_index(axis)
        y0 = (d * H_local).astype(jnp.float32)
        p = pairs_mod.build_pairs(
            (per_gs_[R_X, :K], per_gs_[R_Y, :K] - y0),
            (per_gs_[rrx, :K], per_gs_[rry, :K]),
            per_gs_[rvis, :K] > 0.5, width, H_local, cfg,
            pair_cap=pair_cap_local)
        g = _gather_pairs(per_gs_, jnp.minimum(p["pair_idx"], K))
        acc = _run_fwd_kernel(p["starts"], p["counts"], o.reshape(-1), g,
                              Tl, P, C, rows, cfg, interpret)
        return (acc, p["starts"], p["counts"], p["pair_idx"],
                p["per_rank_counts"][None], p["n_dropped"][None],
                p["n_trunc"][None], g)

    (acc, starts, counts, pair_idx, prc, nd, nt, gpair) = shard_map(
        per_dev, mesh=mesh,
        in_specs=(Pspec(axis), Pspec()),
        out_specs=tuple([Pspec(axis)] * 8), check_vma=False,
    )(jnp.asarray(orig_pad), per_gs)
    pr = {"starts": starts, "counts": counts, "pair_idx": pair_idx,
          "per_rank_counts": prc, "n_dropped": jnp.sum(nd),
          "n_trunc": jnp.sum(nt), "n_vis_dropped": n_vis_dropped}
    return acc[:T], pr, gpair


# Grad-slab init mode:
# - "kernel_fill" (default): the bwd kernel zero-writes the chunks its walk
#   skipped (past each tile's last contributor) through its write ring —
#   strictly fewer HBM bytes than a full-slab zeros init. The pair-array
#   slack tail past the LAST tile's segment stays unwritten: its keys are
#   i32_max -> sentinel rank N, whose run the reduction's validity mask
#   discards.
# - "alias_zeros": XLA zeros broadcast aliased into the output (the round-3
#   default; costs a full-slab HBM write: 0.22 ms/iter bench, 2.9 ms/step
#   mapping).
# - "undef": no init at all — WRONG on real HBM (early-terminated pairs
#   carry garbage into real ranks' runs); kept only for the A/B harness.
# Module-level so tools/exp_bwd_glue.py can flip it per-variant on chip.
BWD_INIT = "kernel_fill"

# Dtype of the per-pair gradient slab the backward kernel writes to HBM and
# the rank-sort gather re-reads (the two biggest pure-HBM passes of the
# backward glue: [PC, 128] lane-padded). bf16 (default) halves both at
# ~0.4% relative per-pair rounding BEFORE the f32 segmented reduction —
# within 1.5% relative L2 of the f32-slab grads on every parameter
# (tests/test_pallas.py::test_grad_slab_bf16_accuracy) and under the
# kernels' own bf16-MXU compositing noise floor (tpu_parity_check gates).
# SPLATLOC_GRAD_SLAB=f32 restores exact-f32 slabs.
GRAD_SLAB_DTYPE = (jnp.float32 if os.environ.get("SPLATLOC_GRAD_SLAB")
                   == "f32" else jnp.bfloat16)


def _run_bwd_kernel(starts, counts, origins, gpair, fwd_out, cot, T, P, C,
                    rows, cfg, interpret):
    """Invoke the backward kernel over T tiles -> grad_pairs [PC, 128]
    (PAIR-major, lane-padded so the rank-sort row gather reads contiguous
    rows; attrs live in lanes 0..rows)."""
    PC = gpair.shape[1]
    fill = BWD_INIT == "kernel_fill"
    kernel = functools.partial(_bwd_kernel, ts=cfg.tile_size, n_channels=C,
                               rows=rows,
                               alpha_max=cfg.alpha_max,
                               alpha_min=cfg.alpha_min,
                               t_eps=cfg.transmittance_eps, n_tiles=T,
                               pair_len=PC, fill_skipped=fill)
    # per-tile last-contributor chunk from the forward's n_contrib channel:
    # one [T]-sized reduction here replaces a per-tile in-kernel max reduce
    # and gives the cross-tile DMA handoff its exact target
    max_pos = jnp.max(fwd_out[:, C + 2, :], axis=-1).astype(jnp.int32)
    lo_t = (starts // CHUNK) * CHUNK
    nchunks_t = -(-counts // CHUNK)
    jhi = jnp.where(max_pos < lo_t, -1,
                    jnp.minimum((max_pos - lo_t) // CHUNK, nchunks_t - 1))
    jhi = jhi.astype(jnp.int32)
    # interpret mode (CPU tests) zero-fills the whole out buffer via the
    # alias so the kernel_fill sentinel-tail argument, which relies on the
    # reduction masking, is ALSO exercised: keep the alias only for
    # alias_zeros
    alias = BWD_INIT == "alias_zeros" or (interpret and not fill)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),              # gpair
        pl.BlockSpec((1, C + 4, P), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),             # fwd out
        pl.BlockSpec((1, C + 2, P), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),             # cotangent
    ]
    operands = [starts, counts, origins, jhi, gpair, fwd_out, cot]
    if alias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # zeros (alias)
        operands.append(jnp.zeros((PC, 128), GRAD_SLAB_DTYPE))
        kern = kernel
    else:
        def kern(s, c, o, jh, gp, f, ct, gout, *scratch, **kw):
            return kernel(s, c, o, jh, gp, f, ct, None, gout, *scratch,
                          **kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((NPF, rows, CHUNK), jnp.float32),
            pltpu.VMEM((NPF, CHUNK, 128), GRAD_SLAB_DTYPE),
            pltpu.SemaphoreType.DMA((NPF,)),
            pltpu.SemaphoreType.DMA((NPF,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((P, 8), jnp.float32),          # mpix (persistent)
            pltpu.VMEM((CHUNK, CHUNK), jnp.float32),  # sli (persistent)
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PC, 128), GRAD_SLAB_DTYPE),
        input_output_aliases={7: 0} if alias else {},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)


# Rank-sort gather layout experiment: "full" gathers the whole 128-lane
# pair-major rows then slices to ``rows``; "sliced" fuses the lane slice
# into the gather operand (XLA may emit a narrower output). Module-level so
# tools/exp_bwd_glue.py can flip it per-variant on chip; the env var lets
# profiling tools A/B it without an edit.
RANK_GATHER = os.environ.get("SPLATLOC_RANK_GATHER", "full")


def _reduce_to_gauss(grad_pairs, pair_idx, per_rank_counts, n, C, kmax,
                     interpret):
    """Reduce per-pair grads -> per-Gaussian grads (DEPTH-SORTED order).

    pair_idx is the DEPTH RANK; an XLA scatter-add here costs ~7 ms at 550k
    pairs (sequential per-update apply), so instead: sort pairs by rank
    (ranks form ascending runs of <= kmax), row-gather the grad rows through
    the sort permutation (TPU row-gathers are ~10x its scatters), run a
    Hillis-Steele segmented scan over the lane axis, and read each rank's
    run-end. Run boundaries come from the analytic per-rank emitted
    counts — exact whenever n_dropped == 0 (the steady-state invariant
    the trainer enforces by auto-escalating the binning caps); when pairs
    were dropped, affected ranks conservatively miss part of their
    gradient for that step and the run-end mask keeps sums sound.

    Under the sharded path this runs PER DEVICE on the device's own pair
    array, so the cross-device collective is the [n, rows] psum of its
    result — not the [PC, 128] pair-grad slab (~6 MB vs ~280 MB at map
    scale; SURVEY.md §2.3 ICI design)."""
    PC = grad_pairs.shape[0]
    rows = _rows_for(C)
    si, perm = jax.lax.sort_key_val(pair_idx,
                                    jnp.arange(PC, dtype=jnp.int32))
    # grad_pairs is PAIR-major straight from the kernel ([PC, 128], attrs
    # in lanes 0..rows): the gather reads contiguous rows ({1,0} operand
    # AND output — measured ~5x faster than the attr-major-source form XLA
    # lowers to strided element reads)
    if RANK_GATHER == "sliced":
        gperm = jnp.take(grad_pairs[:, :rows], perm, axis=0)  # [PC, rows]
    elif RANK_GATHER.startswith("split"):
        # gather in k output chunks (A/B probe: is the big-gather efficiency
        # cliff output-size-bound?)
        k = int(RANK_GATHER[5:])
        q = -(-PC // k)
        parts = [jnp.take(grad_pairs, perm[i * q:min((i + 1) * q, PC)],
                          axis=0) for i in range(k)]
        gperm = jnp.concatenate(parts, axis=0)[:, :rows]
    else:
        gperm = jnp.take(grad_pairs, perm, axis=0)[:, :rows]  # [PC, rows]
    # attribute-major for the scan: every step is a lane-axis roll. The
    # pass-through kernel pins the scan operand to the COMPACT canonical
    # [rows, PC] layout: left to itself XLA may run the whole scan chain on
    # the gather's PAIR-major layout, whose (8,128) tiling pads 16 -> 128
    # lanes (8x the physical bytes on every scan step).
    x = _force_compact(gperm.T, interpret)                    # [rows, PC]
    if SEGSCAN_MODE == "pallas":
        x = _segscan(x, si, interpret)
    else:
        pos = jnp.arange(PC, dtype=jnp.int32)
        k = 1
        # max run length of one rank = the giant-splat extension tile cap
        while k < kmax:
            same = (jnp.roll(si, k) == si) & (pos >= k)
            x = jnp.where(same[None, :], x + jnp.roll(x, k, axis=1), x)
            k *= 2
    # back to row-major with the sorted rank ids as one more attribute so
    # the run-end extraction is a single row gather
    xr = jax.lax.optimization_barrier(
        jnp.concatenate([x, si[None].astype(jnp.float32)]).T)  # [PC, rows+1]
    b = jnp.cumsum(per_rank_counts)                           # run ends
    at = jnp.clip(b - 1, 0, PC - 1)
    ends = jnp.take(xr, at, axis=0)                           # [n, rows+1]
    valid = ends[:, rows].astype(jnp.int32) == jnp.arange(n, dtype=jnp.int32)
    return jnp.where(valid[:, None], ends[:, :rows], 0.0)


def _backward_impl(pr, gpair, fwd_out, cot, order, width, height, cfg, n, C,
                   interpret, mesh=None, axis="tile"):
    ts = cfg.tile_size
    P = ts * ts
    rows = _rows_for(C)
    T, origins = _origins(width, height, ts)
    # the per-pair/per-rank arrays cover only the first K depth ranks
    # (cfg.visible_cap); ranks >= K are invisible and get zero grads
    K = n if cfg.visible_cap is None else min(int(cfg.visible_cap), n)

    if mesh is None:
        grad_pairs = _run_bwd_kernel(pr["starts"], pr["counts"],
                                     jnp.asarray(origins), gpair, fwd_out,
                                     cot, T, P, C, rows, cfg, interpret)
        seg = _reduce_to_gauss(grad_pairs, pr["pair_idx"],
                               pr["per_rank_counts"], K, C,
                               pairs_mod.big_tiles_for(cfg, width, height),
                               interpret)
    else:
        # Sharded: every pair-sized quantity (the kernel's grad slab, the
        # rank sort, the segmented scan) stays ON its owning device; the
        # only collective is the psum of the per-Gaussian [n, rows]
        # reduction (~6 MB at 100k Gaussians vs ~280 MB for the per-pair
        # slab it replaces). Phantom tiles beyond the image get zero
        # cotangents, so their pairs contribute exactly zero.
        from jax.sharding import PartitionSpec as Pspec
        from jax import shard_map
        D = mesh.shape[axis]
        gx = -(-width // ts)
        gy = -(-height // ts)
        rows_dev = -(-gy // D)
        H_local = rows_dev * ts
        Tl = rows_dev * gx
        pad = D * Tl - T
        _, orig_pad = _origins(width, D * H_local, ts)
        orig_pad = orig_pad.reshape(D * Tl, 2)
        fwd_p = jnp.concatenate(
            [fwd_out, jnp.zeros((pad,) + fwd_out.shape[1:], fwd_out.dtype)])
        cot_p = jnp.concatenate(
            [cot, jnp.zeros((pad,) + cot.shape[1:], cot.dtype)])
        kmax = pairs_mod.big_tiles_for(cfg, width, H_local)

        def per_dev(s, c, o, g, f, ct, pi, prc):
            gp = _run_bwd_kernel(s, c, o.reshape(-1), g, f, ct, Tl, P, C,
                                 rows, cfg, interpret)
            seg_local = _reduce_to_gauss(gp, pi, prc[0], K, C, kmax,
                                         interpret)
            return jax.lax.psum(seg_local, axis)

        seg = shard_map(
            per_dev, mesh=mesh,
            in_specs=(Pspec(axis), Pspec(axis), Pspec(axis), Pspec(axis),
                      Pspec(axis), Pspec(axis), Pspec(axis), Pspec(axis)),
            out_specs=Pspec(), check_vma=False,
        )(pr["starts"], pr["counts"], jnp.asarray(orig_pad), gpair, fwd_p,
          cot_p, pr["pair_idx"], pr["per_rank_counts"])
    if K < n:
        seg = jnp.concatenate(
            [seg, jnp.zeros((n - K, seg.shape[1]), seg.dtype)])
    inv_order = jnp.argsort(order.astype(jnp.int32))
    seg = jnp.take(seg, inv_order, axis=0)                    # unsorted
    # component cotangents (matching the tuple inputs): a [N, 2]/[N, 3]
    # cotangent array would lane-pad 32-64x on every materialization
    dxy = (seg[:, R_X], seg[:, R_Y])
    dconic = (seg[:, R_CA], seg[:, R_CB], seg[:, R_CC])
    dop = seg[:, R_OP]
    ddepth = seg[:, R_DEPTH]
    dcolors = seg[:, N_FIXED:N_FIXED + C]
    return dxy, dconic, dop, ddepth, dcolors


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def blend_pairs(xy, conic, opacity, depth, colors, radius, visible_f, order_f,
                width: int, height: int, cfg: RasterConfig,
                interpret: bool = False, mesh=None, axis: str = "tile"):
    """Differentiable pair blend over UNSORTED per-Gaussian screen
    quantities — ``xy`` is the tuple (u, v), ``conic`` the tuple
    (a, b, c), ``radius`` the tuple (rx, ry): 1-D components, because a
    [N, k<128] array (and its cotangent) lane-pads 32-64x under the TPU
    (8,128) tiling. ``order_f`` is the depth permutation (float-encoded,
    exact for N < 2^24). radius/visible_f/order_f direct the binning and
    get zero cotangents. With ``mesh``, the tile axis shards across the named mesh
    axis (forward tiles sharded; backward pair-grad shards psummed).

    Returns (acc [T, C+4, P] attr-major, n_dropped, n_trunc,
    n_vis_dropped): C
    channels, expected depth, alpha (= sum of blend weights), n_contrib +
    t_final (backward bookkeeping); the drop counters come free from the
    pair build (a separate pair_stats call re-runs the whole
    corner-histogram pipeline, ~1 ms/iter); n_vis_dropped counts visible
    Gaussians beyond cfg.visible_cap (0 when uncapped)."""
    out, pr, _ = _forward_impl(xy, conic, opacity, depth, colors, radius,
                               visible_f > 0.5, order_f.astype(jnp.int32),
                               width, height, cfg, interpret, mesh, axis)
    return out, pr["n_dropped"], pr["n_trunc"], pr["n_vis_dropped"]


def _blend_fwd_rule(xy, conic, opacity, depth, colors, radius, visible_f,
                    order_f, width, height, cfg, interpret, mesh=None,
                    axis="tile"):
    out, pr, gpair = _forward_impl(xy, conic, opacity, depth, colors, radius,
                                   visible_f > 0.5,
                                   order_f.astype(jnp.int32), width, height,
                                   cfg, interpret, mesh, axis)
    return ((out, pr["n_dropped"], pr["n_trunc"], pr["n_vis_dropped"]),
            (pr, gpair, out,
             (xy[0] if isinstance(xy, tuple) else xy).shape[0],
             colors.shape[-1], radius, visible_f, order_f))


def _blend_bwd_rule(width, height, cfg, interpret, mesh, axis, res, cot):
    pr, gpair, fwd_out, n, C, radius, visible_f, order_f = res
    cot = cot[0]                 # drop the (int) drop-counter cotangents
    cot_main = cot[:, :C + 2, :]                 # ignore n_contrib cotangent
    dxy, dconic, dop, ddepth, dcolors = _backward_impl(
        pr, gpair, fwd_out, cot_main, order_f.astype(jnp.int32), width,
        height, cfg, n, C, interpret, mesh, axis)
    return (dxy, dconic, dop, ddepth, dcolors,
            jax.tree.map(jnp.zeros_like, radius),
            jnp.zeros_like(visible_f), jnp.zeros_like(order_f))


blend_pairs.defvjp(_blend_fwd_rule, _blend_bwd_rule)


def assemble_image(acc, width, height, cfg, bg):
    """[T, C+4, P] raw attr-major accumulators -> (image [H,W,C], depth,
    alpha)."""
    ts = cfg.tile_size
    gx = -(-width // ts)
    gy = -(-height // ts)
    C = acc.shape[1] - 4
    img = acc[:, :C, :] + (1.0 - acc[:, C + 1, :])[:, None, :] * bg[None, :, None]

    def asm(x, ch):
        x = x.reshape(gy, gx, ch, ts, ts)
        x = x.transpose(0, 3, 1, 4, 2).reshape(gy * ts, gx * ts, ch)
        return x[:height, :width]

    image = asm(img, C)
    depth = asm(acc[:, C:C + 1, :], 1)[..., 0]
    alpha = asm(acc[:, C + 1:C + 2, :], 1)[..., 0]
    return image, depth, alpha
