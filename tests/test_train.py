import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.train import losses
from splatloc_tpu.train.mapping import FrameStore, MappingConfig, MappingTrainer


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(losses.ssim(img, img)) > 0.9999
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32))
    assert float(losses.ssim(img, noisy)) < 0.9


def test_mapping_loss_masks(rng):
    H, W = 8, 8
    img = jnp.asarray(rng.uniform(0.2, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.full((H, W), 2.0)
    # black gt pixels are masked out of rgb; zero gt depth masked out of depth
    gt_img = img.at[0, :, :].set(0.0)
    gt_depth = depth.at[1, :].set(0.0)
    base = losses.mapping_loss(img, depth, gt_img, gt_depth, 0.0, 0.0)
    # perturbing the prediction at masked pixels must not change the loss
    img2 = img.at[0, :, :].add(10.0)
    depth2 = depth.at[1, :].add(5.0)
    pert = losses.mapping_loss(img2, depth2, gt_img, gt_depth, 0.0, 0.0)
    np.testing.assert_allclose(float(base), float(pert), atol=1e-6)


def test_marker_loss_targets():
    logits = jnp.full((4, 4), 10.0)    # sigmoid ~ 1
    assert float(losses.marker_loss(logits, jnp.ones((4, 4)))) < 1e-3
    assert float(losses.marker_loss(logits, jnp.zeros((4, 4)))) > 5.0


def test_isotropic_loss_on_target():
    n = 6
    marker = jnp.array([0.5, 0.5, 0.0, 0.0, 0.9, 0.0])
    alive = jnp.ones((n,), bool)
    # key primitives at exactly the target size 0.02*(1-marker) => loss 0
    scale = jnp.tile((0.02 * (1 - marker))[:, None], (1, 3))
    assert float(losses.isotropic_loss(scale, marker, alive)) < 1e-6
    scale2 = scale * 2.0
    assert float(losses.isotropic_loss(scale2, marker, alive)) > 0.5


def _synthetic_frames(rng, cfg, n_frames=3):
    """RGB-D frames of a fixed random particle scene viewed from slightly
    different poses (points rendered as squares via nearest-pixel splat)."""
    n_pts = 120
    pts = np.stack([
        rng.uniform(-1.2, 1.2, n_pts), rng.uniform(-0.9, 0.9, n_pts),
        rng.uniform(2.0, 4.0, n_pts)], -1).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, (n_pts, 3)).astype(np.float32)
    frames = []
    for i in range(n_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 0.05 * i
        cam = Camera.create(w2c, cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                            cfg.width, cfg.height)
        uv, z = cam.project(jnp.asarray(pts))
        uv = np.asarray(uv).round().astype(int)
        z = np.asarray(z)
        rgb = np.full((cfg.height, cfg.width, 3), 0.3, np.float32)
        dep = np.full((cfg.height, cfg.width), 3.0, np.float32)
        order = np.argsort(-z)
        for j in order:
            u, v = uv[j]
            if 1 <= u < cfg.width - 1 and 1 <= v < cfg.height - 1:
                rgb[v - 1:v + 2, u - 1:u + 2] = cols[j]
                dep[v - 1:v + 2, u - 1:u + 2] = z[j]
        score = np.zeros((cfg.height, cfg.width), np.float32)
        score[::7, ::7] = 0.5
        frames.append((rgb, dep, score, w2c))
    return frames


@pytest.mark.slow
def test_mapping_trainer_end_to_end(rng):
    """Full mapping slice: add keyframes, optimize, PSNR must improve, then
    color refinement must improve it further."""
    # densify once at iter 35 with a mild opacity threshold (the reference's
    # 0.7-at-iter-50 schedule assumes opacities had ~50 iters of lr=0.05 to
    # rise; this small test run densifies earlier)
    cfg = MappingConfig(width=48, height=36, fx=40.0, fy=40.0, cx=24.0,
                        cy=18.0, window_size=2, tile_chunk=3,
                        max_per_tile=256, kp_budget=64, nonkp_budget=512,
                        pcd_downsample=2, gaussian_update_every=40,
                        gaussian_update_offset=35, gaussian_th=0.3,
                        gaussian_reset=10 ** 9)
    trainer = MappingTrainer(cfg, capacity=4096, frame_capacity=8)
    frames = _synthetic_frames(rng, cfg)

    def psnr():
        from splatloc_tpu.raster import render
        rgb, dep, score, w2c = frames[0]
        cam = trainer.camera.replace_pose(jnp.asarray(w2c))
        out = render(trainer.scene, cam, cfg.raster_config())
        mse = float(jnp.mean((out["render"] - jnp.asarray(rgb)) ** 2))
        return -10 * np.log10(mse + 1e-12)

    for rgb, dep, score, w2c in frames:
        trainer.add_keyframe(rgb, dep, score, w2c)
    assert int(trainer.scene.num_alive) > 100
    p0 = psnr()
    l0 = trainer.map(iters=1)
    trainer.map(iters=39)
    l1 = trainer.map(iters=1)
    p1 = psnr()
    # init is already image-colored, so gains are modest at 40 iters with the
    # reference LRs — require a real descent plus PSNR improvement
    assert l1 < 0.8 * l0, (l0, l1)
    assert p1 > p0 + 0.3, (p0, p1)
    trainer.color_refinement(total_iters=20)
    p2 = psnr()
    assert p2 > p1 - 0.5  # refinement must not regress


def test_framestore_roundtrip(rng):
    fs = FrameStore(4, 8, 8)
    rgb = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 3, (8, 8)).astype(np.float32)
    score = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    fs.append(rgb, depth, score, w2c)
    got = fs.gather(jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(got["rgb"][0]) / 255.0, rgb,
                               atol=1 / 255.0)
    np.testing.assert_allclose(np.asarray(got["depth_mm"][0]) / 1000.0, depth,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["score"][0]).astype(np.float32),
                               score, atol=1e-3)


def test_checkpoint_resume(rng, tmp_path):
    """Save/load must restore bit-identical training trajectories."""
    from splatloc_tpu.train import checkpoint
    cfg = MappingConfig(width=32, height=24, fx=25.0, fy=25.0, cx=16.0,
                        cy=12.0, window_size=2, tile_chunk=2,
                        max_per_tile=128, kp_budget=32, nonkp_budget=256,
                        pcd_downsample=2, gaussian_reset=10 ** 9,
                        gaussian_update_every=10 ** 9)
    def mk():
        return MappingTrainer(cfg, capacity=1024, frame_capacity=4, seed=3)

    t1 = mk()
    frames = _synthetic_frames(np.random.default_rng(5), cfg, n_frames=2)
    for f in frames:
        t1.add_keyframe(*f)
    t1.map(iters=5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(t1, path)

    # continue original
    t1.map(iters=5)

    # restore into a fresh trainer and continue identically
    t2 = mk()
    checkpoint.load(t2, path)
    t2.map(iters=5)
    np.testing.assert_allclose(np.asarray(t2.scene.xyz),
                               np.asarray(t1.scene.xyz), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t2.scene.opacity),
                               np.asarray(t1.scene.opacity), atol=1e-7)
    assert t2.iteration == t1.iteration


def test_mapping_determinism(rng):
    """Two trainers with the same seed must produce identical scenes — the
    deterministic-compositing correctness invariant (SURVEY §5)."""
    cfg = MappingConfig(width=32, height=24, fx=25.0, fy=25.0, cx=16.0,
                        cy=12.0, window_size=2, tile_chunk=2,
                        max_per_tile=128, kp_budget=32, nonkp_budget=256,
                        pcd_downsample=2, gaussian_reset=10 ** 9,
                        gaussian_update_every=10 ** 9)
    frames = _synthetic_frames(np.random.default_rng(9), cfg, n_frames=2)

    def run():
        t = MappingTrainer(cfg, capacity=1024, frame_capacity=4, seed=11)
        for f in frames:
            t.add_keyframe(*f)
        t.map(iters=6)
        return t

    t1, t2 = run(), run()
    np.testing.assert_array_equal(np.asarray(t1.scene.xyz),
                                  np.asarray(t2.scene.xyz))
    np.testing.assert_array_equal(np.asarray(t1.scene.opacity),
                                  np.asarray(t2.scene.opacity))


@pytest.mark.slow
def test_mapping_no_nans_long(rng):
    """NaN guard: an extended run with densify + opacity reset stays finite."""
    cfg = MappingConfig(width=32, height=24, fx=25.0, fy=25.0, cx=16.0,
                        cy=12.0, window_size=2, tile_chunk=2,
                        max_per_tile=128, kp_budget=32, nonkp_budget=256,
                        pcd_downsample=2, gaussian_update_every=11,
                        gaussian_update_offset=5, gaussian_th=0.3,
                        gaussian_reset=17)
    t = MappingTrainer(cfg, capacity=2048, frame_capacity=4, seed=2)
    for f in _synthetic_frames(np.random.default_rng(4), cfg, n_frames=2):
        t.add_keyframe(*f)
    t.map(iters=40)
    for k in t.scene.PARAM_FIELDS:
        arr = np.asarray(getattr(t.scene, k))
        alive = np.asarray(t.scene.alive)
        assert np.isfinite(arr[alive]).all(), k


def test_visible_cap_tiering(rng):
    """The trainer keeps cfg.visible_cap at the smallest capacity-fraction
    tier above the alive count (+headroom) at every alive-changing point,
    and no step ever reports visible Gaussians dropped to it."""
    cfg = MappingConfig(width=48, height=36, fx=40.0, fy=40.0, cx=24.0,
                        cy=18.0, window_size=2, tile_chunk=3,
                        max_per_tile=256, kp_budget=64, nonkp_budget=512,
                        pcd_downsample=2, gaussian_update_every=10,
                        gaussian_update_offset=5, gaussian_th=0.3,
                        gaussian_reset=10 ** 9)
    trainer = MappingTrainer(cfg, capacity=4096, frame_capacity=8)
    assert trainer.cfg.visible_cap is not None        # tiered at init
    for rgb, dep, score, w2c in _synthetic_frames(rng, cfg):
        trainer.add_keyframe(rgb, dep, score, w2c)
        alive = int(trainer.scene.num_alive)
        k = trainer.cfg.visible_cap
        assert k is None or k >= alive, (k, alive)
    trainer.map(iters=12)                             # through one densify
    alive = int(trainer.scene.num_alive)
    k = trainer.cfg.visible_cap
    assert k is None or k >= alive, (k, alive)
    # every step's overflow counter must be zero (pending list holds
    # [dropped, trunc, vis] per step since the last densify check)
    for arr in trainer._pending_dropped:
        assert int(np.asarray(arr)[2]) == 0
    # hysteresis: a cap that still covers the need is kept — refreshing
    # without an alive-count change must not swap out the compiled step
    step_fn = trainer._mapping_step
    trainer._refresh_visible_cap()
    assert trainer.cfg.visible_cap == k
    assert trainer._mapping_step is step_fn


def test_tighten_pair_cap_probe(rng):
    """Probe-driven pair-cap tightening (refinement entry): the override
    must shrink the aligned pair array, leave the render bit-identical
    (no drops), and be CLEARED by escalation when the budget overflows."""
    from splatloc_tpu.raster import pairs, render

    cfg = MappingConfig(width=48, height=36, fx=40.0, fy=40.0, cx=24.0,
                        cy=18.0, window_size=2, tile_chunk=3,
                        max_per_tile=256, kp_budget=64, nonkp_budget=512,
                        pcd_downsample=2, pair_cap_factor=12)
    trainer = MappingTrainer(cfg, capacity=4096, frame_capacity=8)
    for rgb, dep, score, w2c in _synthetic_frames(rng, cfg):
        trainer.add_keyframe(rgb, dep, score, w2c)

    rcfg0 = trainer.cfg.raster_config()
    n_ranks = rcfg0.visible_cap or trainer.scene.capacity
    cap0 = pairs.aligned_cap(rcfg0, n_ranks, cfg.width, cfg.height)
    cam = trainer.camera.replace_pose(jnp.asarray(np.eye(4, dtype=np.float32)))
    img0 = render(trainer.scene, cam, rcfg0)["render"]

    assert trainer.tighten_pair_cap()
    assert trainer.cfg.pair_cap_override is not None
    rcfg1 = trainer.cfg.raster_config()
    cap1 = pairs.aligned_cap(rcfg1, n_ranks, cfg.width, cfg.height)
    assert cap1 < cap0, (cap0, cap1)
    img1 = render(trainer.scene, cam, rcfg1)["render"]
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))

    # a second call with no slack left is a no-op
    assert not trainer.tighten_pair_cap()

    # refinement surfaces drops and escalation clears the override: force an
    # absurdly small override, run a few refinement steps, expect the warn +
    # cleared override
    import dataclasses
    import warnings
    trainer.cfg = dataclasses.replace(trainer.cfg, pair_cap_override=128)
    from splatloc_tpu.train.mapping import make_refinement_step
    trainer._refine_step = make_refinement_step(trainer.cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        trainer.color_refinement(total_iters=2, probe_caps=False)
    assert any("dropped" in str(x.message) for x in w)
    assert trainer.cfg.pair_cap_override is None


def test_growth_ladder_pair_cap(rng):
    """The growth-phase pair-cap ladder (_ladder_pair_cap): probes the
    stored keyframes, sets a zero-slack-ish pair_cap_override when the
    factor-based budget carries >=25% slack, respects the recompile
    min-interval, and the tightened step still drops no pairs."""
    # max_per_tile high: the CPU XLA fallback's per-tile list cap is
    # orthogonal to the pair-cap ladder under test and would drop pairs
    cfg = MappingConfig(width=48, height=36, fx=40.0, fy=40.0, cx=24.0,
                        cy=18.0, window_size=2, tile_chunk=3,
                        max_per_tile=4096, kp_budget=64, nonkp_budget=512,
                        pcd_downsample=2)
    trainer = MappingTrainer(cfg, capacity=4096, frame_capacity=8)
    for rgb, dep, score, w2c in _synthetic_frames(rng, cfg):
        trainer.add_keyframe(rgb, dep, score, w2c)

    from splatloc_tpu.raster import pairs
    rcfg = trainer.cfg.raster_config()
    n_ranks = rcfg.visible_cap or trainer.scene.capacity
    cur = pairs.aligned_cap(rcfg, n_ranks, cfg.width, cfg.height)

    trainer.iteration = 1000          # past the min-interval guard
    trainer._ladder_pair_cap()
    assert trainer.cfg.pair_cap_override is not None
    rcfg2 = trainer.cfg.raster_config()
    new = pairs.aligned_cap(rcfg2, n_ranks, cfg.width, cfg.height)
    assert new < cur * 0.75, (new, cur)

    # the tightened step must still render without drops
    trainer.map(2)
    trainer._check_pair_truncation()
    assert trainer.n_dropped_total == 0

    # min-interval hysteresis: an immediate re-probe is a no-op
    override = trainer.cfg.pair_cap_override
    trainer._ladder_pair_cap()
    assert trainer.cfg.pair_cap_override == override
