"""Scene-mapping trainer — TPU redesign of the reference SplatLoc driver
(train_gaussians.py:51-355).

Structure: all hot work lives in two jitted step functions (mapping step over
a window of keyframes; color-refinement step over one keyframe); the host
loop only samples window indices, triggers densify/opacity-reset on the
reference schedule, and grows the padded capacity when needed.

Keyframes live on device in a preallocated FrameStore (rgb uint8, depth in
uint16 millimeters, score float16) so a training step never touches the host.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize
from splatloc_tpu.raster.types import RasterConfig
from splatloc_tpu.scene import GaussianScene, densify, init_rgbd, optim
from splatloc_tpu.train import losses


class FrameStore:
    """Preallocated on-device keyframe storage."""

    def __init__(self, capacity: int, height: int, width: int):
        self.capacity = capacity
        self.n = 0
        self.rgb = jnp.zeros((capacity, height, width, 3), jnp.uint8)
        self.depth_mm = jnp.zeros((capacity, height, width), jnp.uint16)
        self.score = jnp.zeros((capacity, height, width), jnp.float16)
        self.w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1))
        self.exposure = jnp.zeros((capacity, 2), jnp.float32)

    def append(self, rgb: np.ndarray, depth: np.ndarray, score: np.ndarray,
               w2c: np.ndarray) -> int:
        """rgb [H,W,3] float 0..1 or uint8; depth metric float; score [H,W]."""
        i = self.n
        assert i < self.capacity, "FrameStore full"
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        self.rgb = self.rgb.at[i].set(jnp.asarray(rgb))
        self.depth_mm = self.depth_mm.at[i].set(
            jnp.asarray(np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)))
        self.score = self.score.at[i].set(jnp.asarray(score.astype(np.float16)))
        self.w2c = self.w2c.at[i].set(jnp.asarray(w2c.astype(np.float32)))
        self.n += 1
        return i

    def gather(self, idx: jax.Array) -> dict:
        return {
            "rgb": self.rgb[idx],
            "depth_mm": self.depth_mm[idx],
            "score": self.score[idx],
            "w2c": self.w2c[idx],
            "exposure": self.exposure[idx],
        }


@dataclass(frozen=True)
class MappingConfig:
    """Static hyperparameters (reference configs/*/base_config.yaml)."""
    width: int = 640
    height: int = 480
    fx: float = 320.0
    fy: float = 320.0
    cx: float = 319.5
    cy: float = 239.5
    window_size: int = 5
    rgb_boundary_threshold: float = 0.01
    primitive_reg: bool = True
    marker_thresh: float = 0.005
    isotropic_weight: float = 0.01
    lambda_dssim: float = 0.2
    sh_degree: int = 0
    # densification (Training + opt_params sections)
    gaussian_update_every: int = 150
    gaussian_update_offset: int = 50
    gaussian_th: float = 0.7
    gaussian_extent: float = 6.0        # cameras_extent * Training.gaussian_extent
    gaussian_reset: int = 2001
    size_threshold: float = 20.0
    densify_grad_threshold: float = 0.0002
    percent_dense: float = 0.01
    spatial_lr_scale: float = 6.0       # gaussians.init_lr(6.0)
    # adam lrs (opt_params)
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    marker_lr: float = 0.05
    kp_score_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    # rasterizer; use_pallas None = auto (Pallas on TPU, XLA path on CPU)
    tile_size: int = 16
    max_per_tile: int = 1024
    tile_chunk: int = 32
    use_pallas: bool | None = None
    # pair-binning caps; the trainer auto-escalates these when a step
    # reports dropped pairs (RenderOutput.n_dropped): per-Gaussian
    # truncation grows the giant-splat extension (big_k), global-budget
    # overflow grows pair_cap_factor — each cap against its own cause, so
    # pair memory never inflates for the wrong reason.
    # max_tiles 6 (was 12): only the SORT-KEY population scales with it
    # (invalid slots sort to the tail), and the key sort was 1.84 ms/view
    # at 12 (5 views -> ~9 ms/step); splats past the cap ride the
    # big/mid tiers and n_trunc-driven escalation doubles it when a scene
    # genuinely needs more
    max_tiles: int = 6
    pair_cap_factor: int = 3
    # probe-driven static pair budget (RasterConfig.pair_cap_override);
    # set by MappingTrainer.tighten_pair_cap at color-refinement entry,
    # cleared by escalation when the global budget overflows
    pair_cap_override: int | None = None
    big_k: int = 256
    big_tiles: int | None = 192
    mid_k: int = 4096
    mid_tiles: int = 48
    # active-set cap (RasterConfig.visible_cap): the trainer keeps this at
    # the smallest tier above the alive count + insertion headroom, so the
    # capacity-proportional binning glue tracks the ALIVE count instead of
    # the (1.3-2x larger) storage capacity; None = uncapped
    visible_cap: int | None = None
    # insertion budgets
    kp_budget: int = 16384
    nonkp_budget: int = 8192
    pcd_downsample: int = 64
    point_size: float = 0.05
    adaptive_pointsize: bool = True

    def raster_config(self) -> RasterConfig:
        import jax as _jax
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = _jax.default_backend() != "cpu"
        return RasterConfig(tile_size=self.tile_size,
                            max_per_tile=self.max_per_tile,
                            tile_chunk=self.tile_chunk,
                            use_pallas=use_pallas,
                            max_tiles=self.max_tiles,
                            pair_cap_factor=self.pair_cap_factor,
                            pair_cap_override=self.pair_cap_override,
                            big_k=self.big_k, big_tiles=self.big_tiles,
                            mid_k=self.mid_k, mid_tiles=self.mid_tiles,
                            visible_cap=self.visible_cap)

    def opt_lr_dict(self) -> dict:
        return {
            "position_lr_init": self.position_lr_init,
            "position_lr_final": self.position_lr_final,
            "position_lr_delay_mult": self.position_lr_delay_mult,
            "position_lr_max_steps": self.position_lr_max_steps,
            "feature_lr": self.feature_lr,
            "opacity_lr": self.opacity_lr,
            "marker_lr": self.marker_lr,
            "kp_score_lr": self.kp_score_lr,
            "scaling_lr": self.scaling_lr,
            "rotation_lr": self.rotation_lr,
        }

    @classmethod
    def from_config(cls, config: dict) -> "MappingConfig":
        """Build from a reference-schema YAML config dict."""
        cal = config["Dataset"]["Calibration"]
        tr = config["Training"]
        op = config["opt_params"]
        return cls(
            width=cal["width"], height=cal["height"],
            fx=cal["fx"], fy=cal["fy"], cx=cal["cx"], cy=cal["cy"],
            window_size=tr["window_size"],
            rgb_boundary_threshold=tr["rgb_boundary_threshold"],
            primitive_reg=tr["primitive_reg"],
            gaussian_update_every=tr["gaussian_update_every"],
            gaussian_update_offset=tr["gaussian_update_offset"],
            gaussian_th=tr["gaussian_th"],
            gaussian_extent=6.0 * tr["gaussian_extent"],
            gaussian_reset=tr["gaussian_reset"],
            size_threshold=tr["size_threshold"],
            sh_degree=3 if tr.get("spherical_harmonics") else 0,
            densify_grad_threshold=op["densify_grad_threshold"],
            percent_dense=op["percent_dense"],
            lambda_dssim=op["lambda_dssim"],
            position_lr_init=op["position_lr_init"],
            position_lr_final=op["position_lr_final"],
            position_lr_delay_mult=op["position_lr_delay_mult"],
            position_lr_max_steps=op["position_lr_max_steps"],
            feature_lr=op["feature_lr"],
            opacity_lr=op["opacity_lr"],
            marker_lr=op["marker_lr"],
            kp_score_lr=op["kp_score_lr"],
            scaling_lr=op["scaling_lr"],
            rotation_lr=op["rotation_lr"],
            pcd_downsample=config["Dataset"]["pcd_downsample"],
            point_size=config["Dataset"]["point_size"],
            adaptive_pointsize=config["Dataset"].get("adaptive_pointsize", True),
        )


def _render_view(scene: GaussianScene, frame: dict, offset: jax.Array,
                 cfg: MappingConfig):
    """Render one keyframe view with SH->RGB conversion + kp channel."""
    from splatloc_tpu.core import sh as sh_mod
    cam = Camera.create(frame["w2c"], cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                        cfg.width, cfg.height)
    rgb = sh_mod.sh_to_color(cfg.sh_degree, scene.features(), scene.xyz,
                             cam.camera_center)
    colors = jnp.concatenate([rgb, scene.kp_score], axis=-1)
    out = rasterize(scene.xyz, scene.scaling_activated(), scene.rotation,
                    scene.opacity_activated(), colors, cam,
                    cfg.raster_config(), alive=scene.alive,
                    means2d_offset=offset)
    return out


def make_mapping_step(cfg: MappingConfig):
    """Build the jitted mapping step (train_gaussians.py map() body)."""

    @jax.jit
    def step_fn(scene: GaussianScene, opt_state: optim.AdamState,
                stats: densify.DensifyStats, frames: dict, step: jax.Array):
        M = scene.capacity
        V = frames["w2c"].shape[0]

        def loss_fn(params, offsets):
            sc = scene.with_params(params)

            def one(frame, off):
                out = _render_view(sc, frame, off, cfg)
                gt_rgb = frame["rgb"].astype(jnp.float32) / 255.0
                gt_depth = frame["depth_mm"].astype(jnp.float32) / 1000.0
                gt_score = frame["score"].astype(jnp.float32)
                l = losses.mapping_loss(out.image[..., :3], out.depth, gt_rgb,
                                        gt_depth, frame["exposure"][0],
                                        frame["exposure"][1],
                                        cfg.rgb_boundary_threshold)
                l = l + losses.marker_loss(out.image[..., 3], gt_score)
                return l, (out.radii, out.n_dropped, out.n_trunc,
                           out.n_vis_dropped)

            # python-unrolled over views, NOT vmap and NOT lax.map: batching
            # the rasterizer glue turns its row gathers into batched gathers
            # with pessimal layouts (pack gather measured 43 ms/step vmapped
            # vs 0.8 ms/view sequential at 262k capacity), and a lax.map
            # while-body starves the gathers of scoped VMEM (6.9 vs 1.7
            # ms/view); unrolling also lets XLA overlap work across views
            outs = [one(jax.tree.map(lambda x, v=v: x[v], frames),
                        offsets[v]) for v in range(V)]
            ls = jnp.stack([o[0] for o in outs])
            radii = jnp.stack([o[1][0] for o in outs])
            ndrop = jnp.stack([o[1][1] for o in outs])
            ntrunc = jnp.stack([o[1][2] for o in outs])
            nvis = jnp.stack([o[1][3] for o in outs])
            loss = jnp.sum(ls)
            iso = losses.isotropic_loss(jnp.exp(params["scaling"]),
                                        params["marker"][:, 0], scene.alive,
                                        cfg.marker_thresh)
            if cfg.primitive_reg:
                loss = loss + cfg.isotropic_weight * iso
            return loss, (radii, jnp.stack([jnp.sum(ndrop),
                                            jnp.sum(ntrunc),
                                            jnp.max(nvis)]))

        offsets = jnp.zeros((V, M, 2), jnp.float32)
        (loss, (radii, n_dropped)), (grads, off_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(scene.params(), offsets)

        # densification stats per view (train_gaussians.py:239-245)
        for v in range(cfg.window_size):
            stats = densify.add_stats(stats, off_grads[v], radii[v],
                                      cfg.width, cfg.height)
        vis_union = jnp.any(radii > 0, axis=0)

        # key-primitive xyz freeze (train_gaussians.py:231-234)
        if cfg.primitive_reg:
            key = scene.marker[:, 0] > cfg.marker_thresh
            grads["xyz"] = jnp.where(key[:, None], 0.0, grads["xyz"])
        # marker carries no gradient anywhere (detached at all uses)
        grads["marker"] = jnp.zeros_like(grads["marker"])

        lrs = optim.make_lrs(
            {**cfg.opt_lr_dict()}, cfg.spatial_lr_scale, step)
        params, opt_state = optim.update(scene.params(), grads, opt_state, lrs)
        scene = scene.with_params(params)
        return scene, opt_state, stats, loss, vis_union, n_dropped

    return step_fn


def make_refinement_step(cfg: MappingConfig):
    """Build the jitted color-refinement step (train_gaussians.py:269-297).

    Returns (scene, opt_state, loss, ndrop [3]) — the drop counters feed the
    same host-side truncation check as the mapping step (the refinement
    phase previously went unchecked: 26k iterations of potential silent
    under-rendering)."""

    @jax.jit
    def step_fn(scene: GaussianScene, opt_state: optim.AdamState,
                frame: dict, step: jax.Array):
        def loss_fn(params):
            sc = scene.with_params(params)
            out = _render_view(sc, frame, None, cfg)
            gt_rgb = frame["rgb"].astype(jnp.float32) / 255.0
            l = losses.refinement_loss(out.image[..., :3], gt_rgb,
                                       cfg.lambda_dssim)
            return l, jnp.stack([out.n_dropped, out.n_trunc,
                                 out.n_vis_dropped])

        (loss, ndrop), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(scene.params())
        if cfg.primitive_reg:
            key = scene.marker[:, 0] > cfg.marker_thresh
            grads["xyz"] = jnp.where(key[:, None], 0.0, grads["xyz"])
        grads["marker"] = jnp.zeros_like(grads["marker"])
        lrs = optim.make_lrs(cfg.opt_lr_dict(), cfg.spatial_lr_scale, step)
        params, opt_state = optim.update(scene.params(), grads, opt_state, lrs)
        return scene.with_params(params), opt_state, loss, ndrop

    return step_fn


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def _pair_need_probe(scene, camera, width: int, height: int, cfg):
    """Exact aligned pair-array need of one view (pairs.pair_need) — a
    module-level jit so repeated growth-phase probes hit the compile cache
    (a per-call closure jit recompiled every probe)."""
    from splatloc_tpu.raster import binning, pairs, project
    proj = project.project_gaussians(
        scene.xyz, scene.scaling_activated(), scene.rotation, camera, cfg,
        alive=scene.alive, opacities=scene.opacity_activated())
    order = binning.depth_sort(proj)
    if cfg.visible_cap is not None:
        order = order[:cfg.visible_cap]
    return pairs.pair_need(jnp.take(proj.xy, order, axis=0),
                           jnp.take(proj.radius_xy, order, axis=0),
                           jnp.take(proj.visible, order),
                           width, height, cfg)


def _miscap(capacity: int) -> int:
    """Nudge a Gaussian capacity off exact 1024-multiples: every
    capacity-sized row gather in the step (rect pack, grad unsort, run-end
    extraction) hits XLA:TPU's ~2.6x slower gather path when the gathered
    row count is an exact 1024 multiple (raster/pairs.py:_misaligned)."""
    return capacity + 640 if capacity % 1024 == 0 else capacity


class MappingTrainer:
    """Host-side orchestrator mirroring SplatLoc.do_recon control flow."""

    def __init__(self, cfg: MappingConfig, capacity: int = 2 ** 17,
                 frame_capacity: int = 512, seed: int = 0):
        self.cfg = cfg
        capacity = _miscap(capacity)
        self.scene = GaussianScene.empty(capacity, cfg.sh_degree)
        self.opt_state = optim.init(self.scene.params())
        self.stats = densify.DensifyStats.zeros(capacity)
        self.frames = FrameStore(frame_capacity, cfg.height, cfg.width)
        self.iteration = 0
        self.rng = jax.random.PRNGKey(seed)
        self.host_rng = np.random.default_rng(seed)
        self._mapping_step = make_mapping_step(cfg)
        self._refine_step = make_refinement_step(cfg)
        self._refresh_visible_cap()
        # per-step [dropped, trunc, vis_overflow] device arrays
        self._pending_dropped = []
        self.n_dropped_total = 0
        self.camera = Camera.create(np.eye(4, dtype=np.float32), cfg.fx,
                                    cfg.fy, cfg.cx, cfg.cy, cfg.width,
                                    cfg.height)

    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # -- keyframe ingestion -------------------------------------------

    def add_keyframe(self, rgb: np.ndarray, depth: np.ndarray,
                     score: np.ndarray, w2c: np.ndarray) -> int:
        """Store the frame and extend the scene from its RGB-D point cloud
        (reference add_next_kf; depth pixels with dark rgb are zeroed like
        load_depth, train_gaussians.py:299-308)."""
        rgbf = rgb.astype(np.float32)
        if rgbf.max() > 1.5:
            rgbf = rgbf / 255.0
        valid_rgb = rgbf.sum(-1) > self.cfg.rgb_boundary_threshold
        depth = np.where(valid_rgb, depth, 0.0).astype(np.float32)
        idx = self.frames.append(rgbf, depth, score, w2c)

        self._maybe_grow()
        cam = self.camera.replace_pose(jnp.asarray(w2c))
        self.scene, self.opt_state, n = init_rgbd.add_frame(
            self.scene, self.opt_state, jnp.asarray(rgbf),
            jnp.asarray(depth), jnp.asarray(score.astype(np.float32)), cam,
            self._next_rng(), kp_budget=self.cfg.kp_budget,
            nonkp_budget=self.cfg.nonkp_budget,
            downsample=self.cfg.pcd_downsample,
            point_size=self.cfg.point_size,
            adaptive_pointsize=self.cfg.adaptive_pointsize)
        self._refresh_visible_cap()
        if self.cfg.pair_cap_override is not None:
            # preemptive ladder grow on the fresh frame: cheaper than a
            # drop -> escalation -> re-tighten double recompile
            self._ladder_pair_cap(sample=np.asarray([idx]), shrink_ok=False)
        return idx

    def _check_pair_truncation(self):
        """Surface + bound pair truncation (build_pairs caps). Checked at the
        densify cadence (checking per-iter would force a device sync). On any
        dropped pairs: warn, double the caps, rebuild the jitted steps —
        silent under-rendering is impossible by construction."""
        if not self._pending_dropped:
            return
        # every step since the last check is inspected (device arrays are
        # accumulated sync-free and read here in one host transfer), so a
        # transient drop on an intermediate step cannot be missed
        arrs = np.stack([np.asarray(x) for x in self._pending_dropped])
        self._pending_dropped = []
        self.n_dropped_total += int(arrs[:, 0].sum())
        # escalate on the worst step seen for each counter
        dropped = int(arrs[:, 0].max())
        trunc = int(arrs[:, 1].max())
        vis = int(arrs[:, 2].max()) if arrs.shape[1] > 2 else 0
        if dropped == 0 and vis == 0:
            return
        import dataclasses
        import warnings
        old = self.cfg
        changes = {}
        if vis > 0:
            # the active-set tier overflowed (should be prevented by
            # _refresh_visible_cap at every alive-changing point; belt and
            # braces): drop the cap entirely and let the refresh re-tier
            changes["visible_cap"] = None
        if trunc > 0:
            # some Gaussian overflowed the giant-splat extension tiers (or
            # didn't get an extension slot): grow both tier pools AND the
            # tier tile caps — a splat larger than big_tiles stays truncated
            # no matter how many slots exist
            T = ((-(-old.width // old.tile_size))
                 * (-(-old.height // old.tile_size)))
            changes["big_k"] = max(old.big_k * 2, 256)
            changes["mid_k"] = max(old.mid_k * 2, 4096)
            if old.big_tiles is not None:
                bt = old.big_tiles * 2
                changes["big_tiles"] = None if bt >= T else bt
            # keep mid strictly below the full tier: extension_tiers drops
            # the mid tier entirely at mid == full (pairs.py), which would
            # silently remove mid_k slots of moderately-big-splat coverage
            new_full = changes.get("big_tiles", old.big_tiles) or T
            changes["mid_tiles"] = min(old.mid_tiles * 2, new_full - 1)
        if dropped > trunc:
            # global pair budget overflowed: grow it (and the per-tile list
            # capacity of the XLA fallback path, whose drops count here too);
            # a probe-tightened override is stale evidence — clear it so the
            # factor-based budget governs again
            changes["pair_cap_override"] = None
            changes["pair_cap_factor"] = old.pair_cap_factor * 2
            changes["max_per_tile"] = old.max_per_tile * 2
        self.cfg = dataclasses.replace(old, **changes)
        warnings.warn(
            f"rasterizer dropped {dropped} (gaussian, tile) pairs "
            f"({trunc} to per-Gaussian tile caps, {vis} visible Gaussians "
            f"beyond the active-set tier) at iter {self.iteration}; "
            f"escalating {changes} (recompiles the step)")
        self._mapping_step = make_mapping_step(self.cfg)
        self._refine_step = make_refinement_step(self.cfg)

    # active-set tier fractions of capacity; the glue savings flatten out
    # above 3/4 (alive <= 0.75 * capacity by the growth policy anyway)
    _VIS_TIERS = (0.375, 0.5, 0.625, 0.75)

    def _refresh_visible_cap(self):
        """Keep cfg.visible_cap at the smallest capacity-fraction tier above
        the alive count + insertion headroom. Called at every point where
        the alive count can change (init, keyframe insertion, densify), so
        n_vis_dropped stays zero by construction; tier changes recompile the
        step like the other cap escalations. Hysteresis: a cap that still
        covers the need is kept even when a smaller tier would do (e.g.
        after pruning) — shrinking only trims glue time, never correctness,
        and each recompile costs ~100 s, which dominated the quality-gate
        wall before this guard."""
        cap = self.scene.capacity
        alive = int(self.scene.num_alive)
        need = alive + max(2048, alive // 16)
        cur = self.cfg.visible_cap
        if cur is not None and need <= cur <= cap:
            return
        new = None
        for frac in self._VIS_TIERS:
            k = (int(cap * frac) // 128) * 128
            k = k + 640 if k % 1024 == 0 else k   # off-1024 (pairs.py note)
            if k >= need:
                new = min(k, cap)
                break
        if new != self.cfg.visible_cap:
            import dataclasses
            self.cfg = dataclasses.replace(self.cfg, visible_cap=new)
            self._mapping_step = make_mapping_step(self.cfg)
            self._refine_step = make_refinement_step(self.cfg)

    def _maybe_grow(self):
        cap = self.scene.capacity
        alive = int(self.scene.num_alive)
        if alive > 0.75 * cap:
            # grow 1.5x, not 2x: every sort/gather in the step scales with
            # CAPACITY (dead slots emit sentinel keys), so tighter tracking
            # of the alive count buys ~25% step time at one extra recompile
            # per two doublings
            new_cap = _miscap(-(-int(cap * 1.5) // 4096) * 4096)
            pad = new_cap - cap

            def grow(x):
                return jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

            empty = GaussianScene.empty(new_cap, self.cfg.sh_degree)
            fields = {}
            for k in GaussianScene.PARAM_FIELDS:
                fields[k] = jnp.concatenate(
                    [getattr(self.scene, k), getattr(empty, k)[cap:]], axis=0)
            self.scene = self.scene.replace(
                alive=grow(self.scene.alive), **fields)
            self.opt_state = self.opt_state.replace(
                m=jax.tree.map(grow, self.opt_state.m),
                v=jax.tree.map(grow, self.opt_state.v))
            self.stats = densify.DensifyStats.zeros(new_cap)

    # -- optimization -------------------------------------------------

    def map(self, iters: int):
        """The reference map() loop: per iteration, a random window of
        keyframes, a gradient step, scheduled densify / opacity reset."""
        cfg = self.cfg
        n = self.frames.n
        V = cfg.window_size
        for _ in range(iters):
            self.iteration += 1
            idx = self.host_rng.permutation(n)[:V]
            if len(idx) < V:   # repeat frames if fewer than window
                idx = np.resize(idx, V)
            frames = self.frames.gather(jnp.asarray(idx))
            (self.scene, self.opt_state, self.stats, loss, vis_union,
             n_dropped) = (
                self._mapping_step(self.scene, self.opt_state, self.stats,
                                   frames, jnp.asarray(self.iteration)))
            self._pending_dropped.append(n_dropped)

            update = (self.iteration % cfg.gaussian_update_every
                      == cfg.gaussian_update_offset)
            if update:
                self._check_pair_truncation()
                self._maybe_grow()
                self.scene, self.stats, self.opt_state, info = (
                    densify.densify_and_prune(
                        self.scene, self.stats, self.opt_state,
                        self._next_rng(),
                        max_grad=cfg.densify_grad_threshold,
                        min_opacity=cfg.gaussian_th,
                        extent=cfg.gaussian_extent,
                        max_screen_size=cfg.size_threshold,
                        percent_dense=cfg.percent_dense,
                        primitive_reg=cfg.primitive_reg,
                        marker_thresh=cfg.marker_thresh))
                self._refresh_visible_cap()
                self._ladder_pair_cap()
            elif self.iteration % cfg.gaussian_reset == 0:
                self.scene, self.opt_state = densify.reset_opacity_nonvisible(
                    self.scene, self.opt_state, vis_union)
        return float(loss)

    # minimum iterations between growth-phase ladder recompiles (3 densify
    # cycles at the default cadence): bounds recompile churn while the
    # drop-counter escalation path still catches any under-capacity
    # immediately
    _LADDER_MIN_INTERVAL = 450

    def _ladder_pair_cap(self, headroom: float = 1.4,
                         sample: np.ndarray | None = None,
                         shrink_ok: bool = True):
        """Growth-phase probe-driven pair caps (the refinement-entry
        tighten_pair_cap extended to the densify cadence, VERDICT r4 #3):
        probe the exact aligned pair need of a keyframe sample, quantize to
        a coarse ladder tier, and step pair_cap_override between tiers with
        hysteresis — shrink only for a >=25% saving, grow preemptively when
        the need approaches the current budget (cheaper than waiting for a
        drop -> escalation -> re-tighten double recompile). The probe jit is
        cached across ladder steps (its cfg is normalized to the fields
        pair_need actually reads), so re-probing costs one dispatch per
        sampled frame, not a recompile."""
        import dataclasses
        if self.frames.n == 0:
            return
        in_interval = (self.iteration - getattr(self, "_ladder_last",
                                                -10**9)
                       < self._LADDER_MIN_INTERVAL)
        if sample is None:
            # the most recent frames dominate the need (fresh insertions
            # render big) + a spread over history; within the recompile
            # min-interval only the cheap overflow check (recent frames)
            # runs
            recent = np.arange(max(0, self.frames.n - 3), self.frames.n)
            if in_interval:
                sample = recent
            else:
                spread = np.linspace(0, self.frames.n - 1,
                                     min(5, self.frames.n), dtype=int)
                sample = np.unique(np.concatenate([recent, spread]))
        from splatloc_tpu.raster import pairs
        need = self._probe_pair_need(sample)
        rcfg = self.cfg.raster_config()
        n_ranks = (rcfg.visible_cap if rcfg.visible_cap is not None
                   else self.scene.capacity)
        cur = pairs.aligned_cap(rcfg, n_ranks, self.cfg.width,
                                self.cfg.height)
        # tier quantization scales with the need (coarse at scale so
        # recompile-triggering steps are rare; fine for small scenes)
        q = max(2048, 1 << int(np.log2(max(need, 1) / 6 + 1)))
        target = int(np.ceil(need * headroom / q)) * q
        grow = need * 1.1 > cur           # about to overflow: raise now
        # only SHRINKS wait out the recompile min-interval — an imminent
        # overflow must raise the cap immediately (a drop costs an
        # escalation recompile anyway, plus the dropped pairs)
        shrink = shrink_ok and target < cur * 0.75 and not in_interval
        if not (grow or shrink):
            return
        ts = self.cfg.tile_size
        T = ((-(-self.cfg.width // ts)) * (-(-self.cfg.height // ts)))
        override = max(max(target, int(need * 1.2)) - T * pairs.ALIGN,
                       pairs.ALIGN)
        self._ladder_last = self.iteration
        self.cfg = dataclasses.replace(self.cfg,
                                       pair_cap_override=override)
        self._mapping_step = make_mapping_step(self.cfg)
        self._refine_step = make_refinement_step(self.cfg)

    def _probe_pair_need(self, frame_indices) -> int:
        """Exact aligned pair-array need (pairs.pair_need) of the current
        scene over the given keyframes, under the current raster config."""
        import dataclasses
        rcfg = self.cfg.raster_config()
        # normalize fields pair_need never reads so ladder steps (which
        # change only the pair caps) reuse the compiled probe
        probe_cfg = dataclasses.replace(
            rcfg, pair_cap_override=None, pair_cap_factor=1,
            max_per_tile=1024, tile_chunk=64, shard_pair_margin=2.0)
        need = 0
        for i in frame_indices:
            w2c = jnp.asarray(self.frames.w2c[int(i)])
            need = max(need, int(_pair_need_probe(
                self.scene, self.camera.replace_pose(w2c),
                self.cfg.width, self.cfg.height, probe_cfg)))
        return need

    def tighten_pair_cap(self, headroom: float = 1.25,
                         max_probe_frames: int = 16) -> bool:
        """Probe-driven static pair cap (RasterConfig.pair_cap_override):
        measure the exact aligned pair need over (a sample of) the stored
        keyframes and, when the current budget carries >25% slack beyond
        headroom, recompile the steps with a near-zero-slack pair array —
        every pair-proportional op (bwd kernel slab, rank gather, segscan,
        run-end extraction) shrinks by the former slack. Intended at
        color-refinement entry: the scene is frozen there (no densify), so
        one recompile amortizes over the 26k-iteration phase; headroom
        covers optimization-driven scale drift, and any residual overflow
        still surfaces via the step's drop counters -> escalation clears
        the override. Returns True if the caps changed (steps rebuilt)."""
        import dataclasses
        if self.frames.n == 0:
            return False
        idx = np.unique(np.linspace(0, self.frames.n - 1,
                                    min(max_probe_frames, self.frames.n),
                                    dtype=int))
        need = self._probe_pair_need(idx)
        from splatloc_tpu.raster import pairs
        rcfg = self.cfg.raster_config()
        n_ranks = (rcfg.visible_cap if rcfg.visible_cap is not None
                   else self.scene.capacity)
        cur = pairs.aligned_cap(rcfg, n_ranks, self.cfg.width,
                                self.cfg.height)
        ts = self.cfg.tile_size
        T = ((-(-self.cfg.width // ts)) * (-(-self.cfg.height // ts)))
        # tier quantization scaled to the need so recompile-triggering
        # growth steps stay coarse at scale but small scenes still tighten
        q = max(4096, 1 << int(np.log2(max(need, 1) / 8 + 1)))
        target = int(np.ceil(need * headroom / q)) * q
        if target >= cur * 0.8:
            return False
        override = max(target - T * pairs.ALIGN, pairs.ALIGN)
        self.cfg = dataclasses.replace(self.cfg,
                                       pair_cap_override=override)
        self._mapping_step = make_mapping_step(self.cfg)
        self._refine_step = make_refinement_step(self.cfg)
        return True

    def color_refinement(self, total_iters: int = 26000, log_every: int = 0,
                         probe_caps: bool = True):
        """L1+D-SSIM polishing over random keyframes
        (train_gaussians.py:269-297; LR schedule restarts from 1)."""
        if probe_caps and total_iters >= 2000:
            if self.tighten_pair_cap():
                print("refinement: probe-tightened pair caps "
                      f"(override {self.cfg.pair_cap_override})")
        last = None
        for it in range(1, total_iters + 1):
            i = int(self.host_rng.integers(0, self.frames.n))
            frame = self.frames.gather(jnp.asarray([i]))
            frame = jax.tree.map(lambda x: x[0], frame)
            self.scene, self.opt_state, last, ndrop = self._refine_step(
                self.scene, self.opt_state, frame, jnp.asarray(it))
            self._pending_dropped.append(ndrop)
            if it % 200 == 0:
                self._check_pair_truncation()
            if log_every and it % log_every == 0:
                print(f"refine {it}: loss {float(last):.5f}")
        self._check_pair_truncation()
        return None if last is None else float(last)
