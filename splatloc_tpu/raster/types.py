"""Rasterizer configuration and output containers."""
from __future__ import annotations

import jax
from flax import struct


@struct.dataclass
class RasterConfig:
    """Static rasterization parameters (hashable; safe as a jit-static arg).

    The reference CUDA rasterizer uses 16x16 tiles with unbounded per-tile
    depth-sorted lists (submodules/diff-gaussian-rasterization, characterized
    at gaussian_splatting/gaussian_renderer/__init__.py:117-126). On TPU we
    keep static shapes: fixed tile size + fixed per-tile capacity; overflow
    drops the *farthest* Gaussians (lists are built in depth order), which is
    graceful because their blend weight is the smallest.
    """
    tile_size: int = struct.field(pytree_node=False, default=16)
    max_per_tile: int = struct.field(pytree_node=False, default=1024)
    # Tiles processed per lax.map step in the pure-JAX blend (memory knob).
    tile_chunk: int = struct.field(pytree_node=False, default=64)
    # Near-plane cull distance — hardcoded 0.2 in the reference CUDA kernels.
    near: float = struct.field(pytree_node=False, default=0.2)
    # Alpha clamp / termination constants from the CUDA kernel.
    alpha_max: float = struct.field(pytree_node=False, default=0.99)
    alpha_min: float = struct.field(pytree_node=False, default=1.0 / 255.0)
    transmittance_eps: float = struct.field(pytree_node=False, default=1e-4)
    # Low-pass filter added to the 2D covariance diagonal (EWA blur).
    cov2d_blur: float = struct.field(pytree_node=False, default=0.3)
    # Use the Pallas TPU kernel for the blend stage (else pure-JAX tiled).
    use_pallas: bool = struct.field(pytree_node=False, default=False)
    # Pair-binning capacities (Pallas path): tiles kept per Gaussian and the
    # global pair budget as a multiple of N. Truncation is surfaced via
    # RenderOutput.n_dropped so it can never silently under-render.
    # Tighter defaults are a throughput lever (every sort/gather in the
    # binning glue scales with the key/pair budget); real scenes that
    # exceed them surface drops and the trainer auto-escalates.
    max_tiles: int = struct.field(pytree_node=False, default=12)
    pair_cap_factor: int = struct.field(pytree_node=False, default=3)
    # Probe-driven absolute pair budget (overrides pair_cap_factor * N when
    # set): measure the scene's exact aligned need once with
    # pairs.pair_need() minus the T*ALIGN fill reserve, then compile the hot
    # program with a zero-slack pair array — every pair-proportional op
    # (kernel slab, rank gather/sort, segscan) shrinks by the former slack.
    # Drops still surface via n_dropped if the scene outgrows the probe.
    pair_cap_override: int | None = struct.field(pytree_node=False,
                                                 default=None)
    # Giant-splat extension (Pallas path): the largest-area Gaussians (by
    # one descending area sort) additionally emit tiles beyond max_tiles in
    # two static tiers — big_k full-grid slots (big_tiles None = whole tile
    # grid) for huge splats, mid_k slots of mid_tiles for the moderately big
    # (fresh RGB-D insertions in sparse regions produce thousands of
    # 20-130-tile splats) — so real scenes never truncate while max_tiles
    # stays small for the 99.9% of Gaussians that fit it. big_k=0 disables.
    # Tier caps are also lean by default (they emit K*cap sort keys whether
    # used or not; the big tier at the full grid alone would be ~14% of the
    # key population) — the trainer escalates big_tiles too when truncation
    # persists (mapping.py:_check_pair_truncation).
    big_k: int = struct.field(pytree_node=False, default=256)
    big_tiles: int | None = struct.field(pytree_node=False, default=192)
    mid_k: int = struct.field(pytree_node=False, default=4096)
    mid_tiles: int = struct.field(pytree_node=False, default=48)
    # Sharded path (dist.sharded_raster): per-device pair budget = the
    # global pair budget split across the D tile-row shards times this
    # load-imbalance margin. Overflow is surfaced via the psummed drop
    # counters exactly like the single-device caps.
    shard_pair_margin: float = struct.field(pytree_node=False, default=2.0)
    # Active-set cap (Pallas path): slice every depth-sorted quantity to the
    # first K ranks before pair building — invisible/dead Gaussians sort to
    # the end (depth +inf), so with n_visible <= K nothing changes while the
    # capacity-proportional binning glue (pair keys, attribute table, pack
    # gathers, run-end extraction) shrinks from the STORAGE capacity to the
    # active-set tier (the trainer keeps capacity 1.3-2x the alive count).
    # Overflow drops the farthest visible Gaussians and is surfaced via
    # RenderOutput.n_vis_dropped for the trainer's tier escalation. None =
    # no cap.
    visible_cap: int | None = struct.field(pytree_node=False, default=None)
    # Opacity-aware ellipse-AABB binning rects (project.radius_xy). False
    # falls back to the reference's square max-eigenvalue rects — used by
    # tests to isolate the AABB cull's effect within one backend.
    aabb_binning: bool = struct.field(pytree_node=False, default=True)


@struct.dataclass
class RenderOutput:
    """Mirror of the reference render() dict contract
    (gaussian_splatting/gaussian_renderer/__init__.py:133-141), channels-last.
    """
    image: jax.Array        # [H, W, C]   all composited channels (RGB+extra)
    depth: jax.Array        # [H, W]      expected depth
    alpha: jax.Array        # [H, W]      1 - final transmittance
    radii: jax.Array        # [N]         screen-space radius (pixels, int32)
    means2d: jax.Array      # [N, 2]      pixel-space projected centers
    n_dropped: jax.Array    # []          pairs lost to binning caps (int32)
    n_trunc: jax.Array      # []          subset of n_dropped lost to the
    #                                     per-Gaussian tile cap (vs the
    #                                     global pair budget) — the trainer
    #                                     escalates each cap independently
    n_vis_dropped: jax.Array  # []        visible Gaussians beyond
    #                                     cfg.visible_cap (always 0 when the
    #                                     cap is None); the trainer bumps
    #                                     the active-set tier on overflow


@struct.dataclass
class Projected:
    """Per-Gaussian screen-space quantities produced by project_gaussians.

    Vector quantities live as 1-D components (u/v, conic_a/b/c,
    radius_x/y): a [N, k<128] f32 array tiles to (8,128) on TPU — 32-64x
    physical bytes on every materialization AND on every cotangent — so the
    hot path passes components and the stacked views are lazy properties
    for the cold consumers (probes, the XLA fallback, tests)."""
    u: jax.Array            # [N]    pixel x (integer-center grid)
    v: jax.Array            # [N]    pixel y
    depth: jax.Array        # [N]    view-space z
    conic_a: jax.Array      # [N]    inverse 2D covariance components
    conic_b: jax.Array      # [N]
    conic_c: jax.Array      # [N]
    radius: jax.Array       # [N]    float radius in pixels (0 => culled);
    #                                reference semantics (3 sigma_max square)
    visible: jax.Array      # [N]    bool
    radius_x: jax.Array     # [N]    per-axis binning extents: the ellipse
    radius_y: jax.Array     # [N]    AABB at the alpha_min cutoff intersected
    #                                with the square radius (== radius when
    #                                opacities were not given to projection)

    @property
    def xy(self) -> jax.Array:
        return jax.numpy.stack([self.u, self.v], axis=-1)

    @property
    def conic(self) -> jax.Array:
        return jax.numpy.stack([self.conic_a, self.conic_b, self.conic_c],
                               axis=-1)

    @property
    def radius_xy(self) -> jax.Array:
        return jax.numpy.stack([self.radius_x, self.radius_y], axis=-1)
