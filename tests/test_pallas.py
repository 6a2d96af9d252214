"""Parity tests for the Pallas pair-walk rasterizer (interpret mode on CPU)
against the XLA tiled path — forward and every gradient."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize, RasterConfig
from splatloc_tpu.raster import binning, pairs, project

W, H = 64, 48
CFG_X = RasterConfig(tile_size=16, max_per_tile=512, tile_chunk=4)
CFG_P = RasterConfig(tile_size=16, max_per_tile=512, tile_chunk=4,
                     use_pallas=True)


def make_scene(rng, n=300):
    means = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                      rng.uniform(1, 5, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))


def make_camera():
    return Camera.create(np.eye(4, dtype=np.float32), 50.0, 50.0, W / 2,
                         H / 2, W, H)


def test_build_pairs_counts(rng):
    """Pair segments must cover exactly the per-tile overlap sets of the
    XLA binning."""
    means, scales, quats, opac, colors = make_scene(rng, 100)
    cam = make_camera()
    proj = project.project_gaussians(means, scales, quats, cam, CFG_X)
    order = binning.depth_sort(proj)
    lists, counts_x, _ = binning.tile_lists(proj, order, W, H, CFG_X)
    pr = pairs.build_pairs(proj.xy[order], proj.radius_xy[order],
                           proj.visible[order], W, H, CFG_X)
    np.testing.assert_array_equal(np.asarray(pr["counts"]),
                                  np.asarray(counts_x))
    assert int(pr["n_dropped"]) == 0
    # segment contents must equal the per-tile lists (same depth order)
    pi = np.asarray(pr["pair_idx"])
    st = np.asarray(pr["starts"])
    ct = np.asarray(pr["counts"])
    lx = np.asarray(lists)
    for t in [0, 3, 7]:
        np.testing.assert_array_equal(pi[st[t]:st[t] + ct[t]],
                                      lx[t][:ct[t]])


def test_pallas_forward_parity(rng):
    sc = make_scene(rng)
    cam = make_camera()
    bg = jnp.asarray([0.1, 0.2, 0.3, 0.0])
    out_x = rasterize(*sc, cam, CFG_X, bg=bg)
    out_p = rasterize(*sc, cam, CFG_P, bg=bg)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_x.depth), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), atol=5e-5)


def test_pallas_gradient_parity(rng, monkeypatch):
    # strict float-eps parity pins the kernel MATH with exact-f32 slabs;
    # the default bf16 slab's (documented, bounded) rounding is covered by
    # test_grad_slab_bf16_accuracy
    from splatloc_tpu.raster import pallas_raster
    monkeypatch.setattr(pallas_raster, "GRAD_SLAB_DTYPE", jnp.float32)
    sc = make_scene(rng)
    cam = make_camera()
    bg = jnp.zeros(4)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 4)).astype(np.float32))

    def loss(cfg):
        def f(means, scales, quats, opac, colors, w2c):
            c = cam.replace_pose(w2c)
            o = rasterize(means, scales, quats, opac, colors, c, cfg, bg=bg)
            return jnp.mean((o.image - target) ** 2) + 0.05 * jnp.mean(o.depth)
        return f

    args = sc + (jnp.eye(4),)
    g_x = jax.grad(loss(CFG_X), argnums=tuple(range(6)))(*args)
    g_p = jax.grad(loss(CFG_P), argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_x, g_p)):
        scale = max(float(jnp.abs(a).max()), 1e-12)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6 * max(scale, 1.0) + 1e-9,
                                   rtol=1e-4, err_msg=f"grad arg {i}")


def test_grad_slab_bf16_accuracy(rng, monkeypatch):
    """GRAD_SLAB_DTYPE=bf16 halves the backward glue's biggest HBM passes
    (slab write + rank gather); the per-pair rounding happens BEFORE the
    f32 segmented reduction, so the resulting per-parameter grads must
    stay within ~1% relative L2 of the f32-slab grads."""
    from splatloc_tpu.raster import pallas_raster

    sc = make_scene(rng)
    cam = make_camera()
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 4)).astype(np.float32))

    def f(means, scales, quats, opac, colors):
        o = rasterize(means, scales, quats, opac, colors, cam, CFG_P)
        return jnp.mean((o.image - target) ** 2) + 0.05 * jnp.mean(o.depth)

    grad = jax.grad(f, argnums=tuple(range(5)))
    monkeypatch.setattr(pallas_raster, "GRAD_SLAB_DTYPE", jnp.float32)
    g32 = grad(*sc)
    monkeypatch.setattr(pallas_raster, "GRAD_SLAB_DTYPE", jnp.bfloat16)
    g16 = grad(*sc)
    for i, (a, b) in enumerate(zip(g32, g16)):
        num = float(jnp.linalg.norm((b - a).ravel()))
        den = max(float(jnp.linalg.norm(a.ravel())), 1e-12)
        assert num / den < 1.5e-2, (i, num / den)


def test_pallas_means2d_offset_grad(rng):
    sc = make_scene(rng, 80)
    cam = make_camera()

    def f(off):
        out = rasterize(*sc, cam, CFG_P, means2d_offset=off)
        return jnp.sum(out.image ** 2)

    g = np.asarray(jax.grad(f)(jnp.zeros((80, 2))))
    out = rasterize(*sc, cam, CFG_P)
    radii = np.asarray(out.radii)
    assert np.all(g[radii == 0] == 0)
    assert np.any(np.abs(g[radii > 0]) > 0)


def test_multichannel_feature_rendering(rng, monkeypatch):
    from splatloc_tpu.raster import pallas_raster
    monkeypatch.setattr(pallas_raster, "GRAD_SLAB_DTYPE", jnp.float32)
    """20-channel compositing (descriptor rendering) — exercises the
    32-row gdata layout — must match the XLA path."""
    n = 120
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
                      rng.uniform(1.5, 4, n)], -1).astype(np.float32)
    scales = np.full((n, 3), 0.06, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    feats = rng.normal(size=(n, 20)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, feats)))
    cam = make_camera()
    out_x = rasterize(*args, cam, CFG_X)
    out_p = rasterize(*args, cam, CFG_P)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=5e-5)
    # gradient parity on the feature channels
    def loss(cfg):
        def f(feats):
            o = rasterize(args[0], args[1], args[2], args[3], feats, cam, cfg)
            return jnp.sum(o.image ** 2)
        return f
    g_x = jax.grad(loss(CFG_X))(args[4])
    g_p = jax.grad(loss(CFG_P))(args[4])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=3e-5,
                               rtol=5e-4)


def test_giant_splat_extension(rng, monkeypatch):
    from splatloc_tpu.raster import pallas_raster
    monkeypatch.setattr(pallas_raster, "GRAD_SLAB_DTYPE", jnp.float32)
    """A splat whose tile rect far exceeds max_tiles must not drop pairs:
    the top-K extension emits its remaining tiles (VERDICT r2: the trainer
    previously escalated max_tiles/pair_cap unboundedly and OOM'd)."""
    means, scales, quats, opac, colors = make_scene(rng, 64)
    # one huge foreground splat covering most of the screen
    means = means.at[0].set(jnp.array([0.0, 0.0, 1.0]))
    scales = scales.at[0].set(jnp.array([1.2, 1.2, 0.01]))
    opac = opac.at[0].set(0.35)
    cam = make_camera()
    cfg_small = CFG_X.replace(max_tiles=4, big_k=8)
    proj = project.project_gaussians(means, scales, quats, cam, cfg_small)
    order = binning.depth_sort(proj)
    pr = pairs.build_pairs(proj.xy[order], proj.radius_xy[order],
                           proj.visible[order], W, H, cfg_small)
    area_max = int(jnp.max((proj.radius * 2 / cfg_small.tile_size + 2) ** 2))
    assert area_max > 4          # the scene genuinely exceeds max_tiles
    assert int(pr["n_dropped"]) == 0
    assert int(pr["n_trunc"]) == 0
    # stats agree with the sort-based builder
    kept, nd, nt = pairs.pair_stats(proj.xy, proj.radius_xy, proj.visible,
                                    W, H, cfg_small)
    assert int(nd) == 0 and int(nt) == 0
    assert int(kept) == int(jnp.sum(pr["counts"]))
    # and rendering through the extension path matches the XLA oracle,
    # forward and backward
    cfg_p = CFG_P.replace(max_tiles=4, big_k=8)
    sc = (means, scales, quats, opac, colors)
    out_x = rasterize(*sc, cam, CFG_X)
    out_p = rasterize(*sc, cam, cfg_p)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=5e-5)

    def loss(cfg):
        return lambda op: jnp.sum(
            rasterize(means, scales, quats, op, colors, cam, cfg).image)
    g_x = jax.grad(loss(CFG_X))(opac)
    g_p = jax.grad(loss(cfg_p))(opac)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=5e-5,
                               rtol=5e-4)


def test_truncation_reported_when_extension_exhausted(rng):
    """With big_k=0 and a tiny max_tiles, drops must be reported as
    truncation (the signal the trainer's escalation keys on)."""
    means, scales, quats, opac, colors = make_scene(rng, 64)
    means = means.at[0].set(jnp.array([0.0, 0.0, 1.0]))
    scales = scales.at[0].set(jnp.array([1.2, 1.2, 0.01]))
    cam = make_camera()
    cfg = CFG_X.replace(max_tiles=4, big_k=0)
    proj = project.project_gaussians(means, scales, quats, cam, cfg)
    _, nd, nt = pairs.pair_stats(proj.xy, proj.radius_xy, proj.visible,
                                 W, H, cfg)
    assert int(nt) > 0
    assert int(nd) >= int(nt)


def test_render_output_drop_counters_match_pair_stats(rng):
    """rasterize's n_dropped/n_trunc come from the pair build inside
    blend_pairs (round 2: the separate pair_stats call was removed from the
    hot path) — they must still agree with pair_stats exactly."""
    means, scales, quats, opac, colors = make_scene(rng, 96)
    means = means.at[0].set(jnp.array([0.0, 0.0, 1.0]))
    scales = scales.at[0].set(jnp.array([1.2, 1.2, 0.01]))
    cam = make_camera()
    cfg = CFG_P.replace(max_tiles=4, big_k=0)    # force some truncation
    out = rasterize(means, scales, quats, opac, colors, cam, cfg)
    proj = project.project_gaussians(means, scales, quats, cam, cfg)
    _, nd, nt = pairs.pair_stats(proj.xy, proj.radius_xy, proj.visible,
                                 W, H, cfg)
    assert int(out.n_dropped) == int(nd)
    assert int(out.n_trunc) == int(nt)
    assert int(out.n_trunc) > 0


def test_pallas_segmented_scan_matches_xla():
    """The one-pass pallas segmented scan (backward reduction) must equal
    the Hillis-Steele XLA fallback, including runs that span block
    boundaries and runs longer than any roll distance."""
    from splatloc_tpu.raster import pallas_raster as pr
    r = np.random.default_rng(0)
    PC, rows = 128 * 128 * 2 + 640, 16   # 2 full blocks + a partial tail
    # ascending run ids with wildly varying run lengths (some > 16384)
    lengths = np.concatenate([r.integers(1, 40, 600), [20000, 9000],
                              r.integers(1, 7, 800)])
    ids = np.repeat(np.arange(len(lengths)), lengths)[:PC]
    ids = np.pad(ids, (0, max(PC - len(ids), 0)), constant_values=ids[-1])
    x = r.standard_normal((rows, PC)).astype(np.float32)
    si = jnp.asarray(ids.astype(np.int32))
    xj = jnp.asarray(x)
    y_p = np.asarray(jax.jit(
        lambda a, s: pr._segscan(a, s, interpret=True))(xj, si))
    # XLA reference: full-length Hillis-Steele
    pos = jnp.arange(PC, dtype=jnp.int32)
    y = xj
    k = 1
    while k < PC:
        same = (jnp.roll(si, k) == si) & (pos >= k)
        y = jnp.where(same[None, :], y + jnp.roll(y, k, axis=1), y)
        k *= 2
    np.testing.assert_allclose(y_p, np.asarray(y), atol=1e-4, rtol=1e-5)


def test_gradient_parity_with_pallas_segscan(rng, monkeypatch):
    """Full backward with the pallas segmented scan swapped in must be
    BIT-IDENTICAL to the XLA Hillis-Steele fallback (same summation tree)."""
    from splatloc_tpu.raster import pallas_raster as pr
    sc = make_scene(rng, 200)
    cam = make_camera()

    def loss(args):
        out = rasterize(*args, cam, CFG_P)
        return jnp.sum(out.image ** 2) + jnp.sum(out.depth)

    monkeypatch.setattr(pr, "SEGSCAN_MODE", "xla")
    g_ref = jax.grad(loss)(sc)
    monkeypatch.setattr(pr, "SEGSCAN_MODE", "pallas")
    g_p = jax.grad(loss)(sc)
    for a, b in zip(g_p, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_power_keep_eps_scales_with_coefficients():
    """The keep-test epsilon must track the limb-split MXU dot's ABSOLUTE
    error bound (sum |a_i||b_i| * 2^-16 with margin): a small splat far from
    the tile origin has quadratic coefficients ~1e3 that cancel to power ~0
    at its center, and a fixed 1e-5 epsilon dropped those centers on the
    real chip (ONCHIP_r03 tpu_parity_check: image_max_diff 0.44)."""
    from splatloc_tpu.raster import pallas_raster as pr

    rows, ts = 16, 16
    g = jnp.zeros((rows, pr.CHUNK), jnp.float32)
    # pair 0: sigma ~ 1px splat at tile-local (30, 25) -> conic ~ 1,
    # |c0| ~ 0.5*(30^2+25^2) ~ 760
    g = g.at[pr.R_X, 0].set(30.0).at[pr.R_Y, 0].set(25.0)
    g = g.at[pr.R_CA, 0].set(1.0).at[pr.R_CC, 0].set(1.0)
    # pair 1: all-zero attrs (padding sentinel)
    c8, eps, _ = pr._power_coeffs(g, 0.0, 0.0, rows, ts)
    eps = np.asarray(eps)[0]
    mag = 0.5 * (30.0 ** 2 + 25.0 ** 2) + 15.0 * (30.0 + 25.0) + 225.0
    assert eps[0] >= mag * 2.0 ** -14 * 0.999      # documented bound
    assert eps[0] > 0.05                           # >> the old fixed 1e-5
    assert eps[1] == pr._POWER_KEEP_EPS            # floor for inert pairs


def test_visible_cap_exact_and_counted(rng):
    """cfg.visible_cap slices the depth-sorted active set: with K >= the
    visible count the render and ALL grads are bit-identical to uncapped
    (invisible Gaussians sort to the end), and with K below it the overflow
    is surfaced via n_vis_dropped (the trainer's tier-escalation signal)."""
    sc = make_scene(rng, 300)
    cam = make_camera()
    alive = jnp.arange(300) < 200

    def run(cfg):
        def loss(args):
            out = rasterize(*args, cam, cfg, alive=alive)
            return jnp.sum(out.image ** 2), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(sc)
        return out, g

    out0, g0 = run(CFG_P)
    out1, g1 = run(CFG_P.replace(visible_cap=256))
    assert int(out1.n_vis_dropped) == 0
    np.testing.assert_array_equal(np.asarray(out0.image),
                                  np.asarray(out1.image))
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out2, _ = run(CFG_P.replace(visible_cap=128))
    assert int(out2.n_vis_dropped) > 0
    assert bool(jnp.isfinite(out2.image).all())


@pytest.mark.slow
def test_pair_cap_override_zero_slack(rng):
    """Probe-driven static pair budget (RasterConfig.pair_cap_override):
    pairs.pair_need measures the scene's exact aligned pair-array need, and
    compiling with override = need - T*ALIGN yields a ZERO-SLACK pair array
    whose render and grads are bit-identical to the default budget."""
    from splatloc_tpu.raster import binning, project

    sc = make_scene(rng, 400)
    cam = make_camera()

    proj = project.project_gaussians(sc[0], sc[1], sc[2], cam, CFG_P)
    order = binning.depth_sort(proj)
    rect_xy = jnp.take(proj.xy, order, axis=0)
    rect_r = jnp.take(proj.radius_xy, order, axis=0)
    rect_v = jnp.take(proj.visible, order)
    need = int(pairs.pair_need(rect_xy, rect_r, rect_v, cam.width,
                               cam.height, CFG_P))
    ts = CFG_P.tile_size
    T = (-(-cam.width // ts)) * (-(-cam.height // ts))
    cfg2 = CFG_P.replace(pair_cap_override=max(need - T * pairs.ALIGN, 128))
    assert pairs.aligned_cap(cfg2, 400, cam.width, cam.height) <= need + 640
    assert (pairs.aligned_cap(cfg2, 400, cam.width, cam.height)
            < pairs.aligned_cap(CFG_P, 400, cam.width, cam.height))

    def run(cfg):
        def loss(args):
            out = rasterize(*args, cam, cfg)
            return jnp.sum(out.image ** 2) + jnp.sum(out.depth), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(sc)
        return out, g

    out0, g0 = run(CFG_P)
    out1, g1 = run(cfg2)
    assert int(out1.n_dropped) == 0
    np.testing.assert_array_equal(np.asarray(out0.image),
                                  np.asarray(out1.image))
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aabb_binning_output_preserving(rng):
    """The opacity-aware ellipse-AABB binning rect (project.radius_xy) must
    emit strictly fewer pairs than the reference square-radius rect for
    anisotropic splats while leaving the render and gradients unchanged up
    to f32 accumulation order: every tile the AABB excludes has
    alpha < alpha_min at all its pixels, which the kernel's alpha cut zeroes.
    The exactness claim is asserted within ONE backend (Pallas with AABB
    rects vs Pallas with square rects — same kernel, different pair sets);
    the cross-backend Pallas-vs-XLA comparison uses the looser tolerance the
    TPU-lowering numeric noise floor demands."""
    means, scales, quats, opac, colors = make_scene(rng, 200)
    # make splats strongly anisotropic and opaque (worst case for the cull)
    scales = scales.at[:, 0].mul(6.0)
    opac = jnp.clip(opac * 1.05, 0.05, 0.98)
    cam = make_camera()

    proj = project.project_gaussians(means, scales, quats, cam, CFG_P,
                                     opacities=opac)
    sq = jnp.stack([proj.radius, proj.radius], -1)
    kept_sq, _, _ = pairs.pair_stats(proj.xy, sq, proj.visible, W, H, CFG_P)
    kept_ab, _, _ = pairs.pair_stats(proj.xy, proj.radius_xy, proj.visible,
                                     W, H, CFG_P)
    assert int(kept_ab) < int(kept_sq), (int(kept_ab), int(kept_sq))

    # cross-backend sanity (noise floor, not the exactness claim)
    out_x = rasterize(means, scales, quats, opac, colors, cam, CFG_X)
    out_p = rasterize(means, scales, quats, opac, colors, cam, CFG_P)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_x.depth), atol=5e-4)

    # same-backend exactness: Pallas AABB rects vs Pallas square rects
    CFG_SQ = CFG_P.replace(aabb_binning=False)
    out_sq = rasterize(means, scales, quats, opac, colors, cam, CFG_SQ)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_sq.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_sq.depth), atol=1e-5)

    def loss(cfg):
        def f(means, scales, quats, opac):
            out = rasterize(means, scales, quats, opac, colors, cam, cfg)
            return jnp.sum(out.image * out.image) + jnp.sum(out.depth)
        return f
    g_p = jax.grad(loss(CFG_P), argnums=(0, 1, 2, 3))(means, scales, quats,
                                                      opac)
    g_sq = jax.grad(loss(CFG_SQ), argnums=(0, 1, 2, 3))(means, scales,
                                                        quats, opac)
    # rtol 3e-3 / atol 5e-4: the two pair layouts order the backward's
    # segmented grad accumulation differently, so per-Gaussian sums differ
    # by f32 accumulation order (observed <=0.15% rel, <=1.4e-4 abs on this
    # worst-case scene).
    for a, b in zip(g_p, g_sq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=3e-3)


def test_tile_rect_includes_boundary_pixel():
    """Regression: exclusive-max tile index must be floor((u+r)/ts)+1.
    floor((u+r+ts-1)/ts) drops the last tile when frac(u+r) < 1 — a pixel
    at x=32 with u+rx=32.9 lives in tile 2 and must be binned."""
    xy = jnp.array([[30.57, 24.0]])
    rxy = jnp.array([[2.35, 2.0]])
    rminx, rmaxx, rminy, rmaxy = pairs._tile_rects(
        xy, rxy, W, H, 16)
    assert int(rmaxx[0]) == 3   # tiles {1, 2}: pixel 32 <= 30.57+2.35
    assert int(rminx[0]) == 1
