import os

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.knn import knn_exact, mean_dist2_3nn, mean_dist2_3nn_approx
from splatloc_tpu.scene import GaussianScene, densify, init_rgbd, optim, ply


def test_knn_exact_vs_bruteforce(rng):
    pts_np = rng.normal(size=(200, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    exact = np.asarray(knn_exact(pts, block=64))
    d2 = ((pts_np[:, None, :] - pts_np[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    brute = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(exact, brute, rtol=1e-4, atol=1e-7)


def test_knn_morton_vs_exact(rng):
    pts = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32))
    approx = np.asarray(mean_dist2_3nn_approx(pts, window=32))
    exact = np.asarray(knn_exact(pts, block=128))
    # Morton window search is approximate: it can only overestimate, and
    # should be close in aggregate (used only for huge-N scale init).
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    assert (rel < 1e-4).mean() > 0.45
    assert np.median(rel) < 1e-4
    # window search can only overestimate (up to the matmul-expansion
    # cancellation error of the exact path, ~1e-6 relative)
    assert (approx >= exact * (1 - 1e-4) - 1e-6).all()


def test_knn_valid_mask(rng):
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    valid = jnp.arange(100) < 60
    out = np.asarray(mean_dist2_3nn(pts, valid, block=64))
    assert (out[60:] == 0).all()
    # invalid points must not serve as neighbors
    exact = np.asarray(knn_exact(pts[:60], block=64))
    np.testing.assert_allclose(out[:60], exact, rtol=1e-5, atol=1e-8)


def test_scene_insert_and_free_slots():
    scene = GaussianScene.empty(32)
    vals = {
        "xyz": jnp.ones((8, 3)), "f_dc": jnp.ones((8, 1, 3)),
        "f_rest": jnp.zeros((8, 0, 3)), "scaling": jnp.zeros((8, 3)),
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (8, 1)),
        "opacity": jnp.zeros((8, 1)), "marker": jnp.zeros((8, 1)),
        "kp_score": jnp.zeros((8, 1)),
    }
    scene2 = scene.insert(vals, jnp.ones(8, bool))
    assert int(scene2.num_alive) == 8
    # partial validity
    scene3 = scene2.insert(vals, jnp.arange(8) < 3)
    assert int(scene3.num_alive) == 11
    # capacity overflow drops extras
    big_vals = {k: jnp.tile(v, (8,) + (1,) * (v.ndim - 1)) for k, v in vals.items()}
    scene4 = scene3.insert(big_vals, jnp.ones(64, bool))
    assert int(scene4.num_alive) == 32


def test_adam_matches_torch_semantics():
    """One Adam step must match torch.optim.Adam(eps=1e-15)."""
    import torch
    p0 = np.array([[1.0, 2.0], [3.0, -1.0]], np.float32)
    g0 = np.array([[0.1, -0.2], [0.05, 0.4]], np.float32)
    lr = 0.01

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for _ in range(3):
        topt.zero_grad()
        tp.grad = torch.tensor(g0)
        topt.step()

    params = {"x": jnp.asarray(p0)}
    state = optim.init(params)
    for _ in range(3):
        params, state = optim.update(params, {"x": jnp.asarray(g0)}, state,
                                     {"x": lr})
    np.testing.assert_allclose(np.asarray(params["x"]),
                               tp.detach().numpy(), atol=1e-6)


def test_xyz_lr_schedule():
    # endpoints of the log-lerp
    np.testing.assert_allclose(
        float(optim.xyz_lr(0, 1e-3, 1e-5, max_steps=100)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(
        float(optim.xyz_lr(100, 1e-3, 1e-5, max_steps=100)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        float(optim.xyz_lr(50, 1e-3, 1e-5, max_steps=100)), 1e-4, rtol=1e-5)


def test_ply_roundtrip(tmp_path, rng):
    scene = GaussianScene.empty(64)
    n = 20
    scene = scene.replace(
        xyz=scene.xyz.at[:n].set(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))),
        opacity=scene.opacity.at[:n].set(0.3),
        marker=scene.marker.at[:n].set(0.7),
        kp_score=scene.kp_score.at[:n].set(0.2),
        scaling=scene.scaling.at[:n].set(-2.0),
        alive=jnp.arange(64) < n,
    )
    path = str(tmp_path / "pc.ply")
    ply.save_scene(scene, path)
    back = ply.load_scene(path, sh_degree=0, capacity=64)
    assert int(back.num_alive) == n
    np.testing.assert_allclose(np.asarray(back.xyz[:n]),
                               np.asarray(scene.xyz[:n]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.marker[:n]), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.kp_score[:n]), 0.2, atol=1e-6)


def test_ply_sh3_roundtrip(tmp_path, rng):
    scene = GaussianScene.empty(16, sh_degree=3)
    f_rest = jnp.asarray(rng.normal(size=(16, 15, 3)).astype(np.float32))
    scene = scene.replace(f_rest=f_rest, alive=jnp.ones(16, bool))
    path = str(tmp_path / "pc3.ply")
    ply.save_scene(scene, path)
    back = ply.load_scene(path, sh_degree=3)
    np.testing.assert_allclose(np.asarray(back.f_rest), np.asarray(f_rest),
                               atol=1e-6)


def test_frame_to_gaussians(rng):
    H, W = 24, 32
    cam = Camera.create(np.eye(4, dtype=np.float32), 20.0, 20.0, W / 2, H / 2, W, H)
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.full((H, W), 2.0)
    score = jnp.zeros((H, W)).at[5, 7].set(0.9).at[10, 20].set(0.8)
    vals, valid = init_rgbd.frame_to_gaussians(
        rgb, depth, score, cam, jax.random.PRNGKey(0),
        kp_budget=16, nonkp_budget=64, downsample=4)
    valid = np.asarray(valid)
    # 2 keypoint pixels + (24*32-2)//4 non-kp, capped at budget 64
    assert valid[:16].sum() == 2
    assert valid[16:].sum() == min((H * W - 2) // 4, 64)
    xyz = np.asarray(vals["xyz"])[valid[: 16].nonzero()[0]]
    # keypoint at pixel (row5, col7) backprojects to depth 2
    assert np.allclose(np.asarray(vals["xyz"])[0, 2], 2.0, atol=1e-5)
    # marker carries the score
    assert np.isclose(np.asarray(vals["marker"])[0, 0], 0.9)


def test_render_scene_dict(rng):
    """render() on a GaussianScene returns the reference dict contract."""
    from splatloc_tpu.raster import render, RasterConfig
    H, W = 16, 16
    cam = Camera.create(np.eye(4, dtype=np.float32), 20.0, 20.0, W / 2, H / 2, W, H)
    scene = GaussianScene.empty(64)
    n = 10
    scene = scene.replace(
        xyz=scene.xyz.at[:n].set(jnp.asarray(
            rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32) + np.array([0, 0, 2.0], np.float32))),
        scaling=scene.scaling.at[:n].set(np.log(0.05)),
        opacity=scene.opacity.at[:n].set(2.0),
        kp_score=scene.kp_score.at[:n].set(1.5),
        alive=jnp.arange(64) < n,
    )
    out = render(scene, cam, RasterConfig(tile_chunk=2))
    assert set(out) >= {"render", "kp_prob", "visibility_filter", "radii",
                        "depth", "opacity", "means2d"}
    assert out["render"].shape == (H, W, 3)
    assert out["kp_prob"].shape == (H, W)
    assert bool(jnp.any(out["visibility_filter"][:n]))
    # kp_prob channel composites the raw kp_score
    a = np.asarray(out["opacity"])
    kp = np.asarray(out["kp_prob"])
    np.testing.assert_allclose(kp, a * 1.5, atol=1e-5)


def test_add_frame_and_densify(rng):
    H, W = 16, 16
    cam = Camera.create(np.eye(4, dtype=np.float32), 20.0, 20.0, W / 2, H / 2, W, H)
    scene = GaussianScene.empty(512)
    state = optim.init(scene.params())
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.full((H, W), 2.0)
    score = jnp.zeros((H, W))
    scene, state, n = init_rgbd.add_frame(scene, state, rgb, depth, score, cam,
                                          jax.random.PRNGKey(1),
                                          kp_budget=8, nonkp_budget=128,
                                          downsample=4)
    n0 = int(scene.num_alive)
    assert n0 == int(n) and n0 > 0

    # force a densify: large stats on the first n0 gaussians
    stats = densify.DensifyStats.zeros(512)
    stats = stats.replace(
        xyz_gradient_accum=jnp.where(scene.alive, 1.0, 0.0),
        denom=jnp.where(scene.alive, 1.0, 0.0))
    scene2, stats2, state2, info = densify.densify_and_prune(
        scene, stats, state, jax.random.PRNGKey(2),
        max_grad=0.0002, min_opacity=0.005, extent=6.0,
        max_screen_size=None, percent_dense=0.01, primitive_reg=False,
        clone_budget=256, split_budget=256)
    # every gaussian is hi-grad: it either cloned (small) or split (big)
    assert int(info["n_cloned"]) + int(info["n_split"]) > 0
    assert int(scene2.num_alive) > 0
    # high opacity threshold prunes everything except protected
    scene3, _, _, info3 = densify.densify_and_prune(
        scene2, densify.DensifyStats.zeros(512), state2, jax.random.PRNGKey(3),
        max_grad=1e9, min_opacity=0.99, extent=6.0, max_screen_size=None,
        percent_dense=0.01, primitive_reg=False,
        clone_budget=16, split_budget=16)
    assert int(scene3.num_alive) == 0


def test_densify_key_primitive_protection(rng):
    scene = GaussianScene.empty(64)
    n = 10
    scene = scene.replace(
        xyz=scene.xyz.at[:n].set(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))),
        opacity=scene.opacity.at[:n].set(-5.0),   # low opacity -> prunable
        marker=scene.marker.at[:n, 0].set(
            jnp.where(jnp.arange(n) < 4, 0.5, 0.0)),  # 4 key primitives
        alive=jnp.arange(64) < n,
    )
    state = optim.init(scene.params())
    out, _, _, _ = densify.densify_and_prune(
        scene, densify.DensifyStats.zeros(64), state, jax.random.PRNGKey(0),
        max_grad=1e9, min_opacity=0.7, extent=6.0, max_screen_size=None,
        percent_dense=0.01, primitive_reg=True,
        clone_budget=8, split_budget=8)
    assert int(out.num_alive) == 4   # key primitives survive


def test_reset_opacity_nonvisible():
    scene = GaussianScene.empty(8)
    scene = scene.replace(opacity=jnp.full((8, 1), 2.0),
                          alive=jnp.ones(8, bool))
    state = optim.init(scene.params())
    state = state.replace(m={**state.m, "opacity": jnp.ones((8, 1))})
    vis = jnp.arange(8) < 3
    scene2, state2 = densify.reset_opacity_nonvisible(scene, state, vis)
    op = np.asarray(scene2.opacity_activated())
    np.testing.assert_allclose(op[3:], 0.4, atol=1e-6)
    np.testing.assert_allclose(op[:3], 1 / (1 + np.exp(-2.0)), atol=1e-6)
    assert np.all(np.asarray(state2.m["opacity"]) == 0)


def test_insert_budget_exceeds_capacity_compacts_valid():
    """Regression: with budget > capacity and sparse validity, ALL valid
    entries must land (invalid positions must not waste free slots)."""
    scene = GaussianScene.empty(16)
    B = 64
    vals = {
        "xyz": jnp.tile(jnp.arange(B, dtype=jnp.float32)[:, None], (1, 3)),
        "f_dc": jnp.ones((B, 1, 3)), "f_rest": jnp.zeros((B, 0, 3)),
        "scaling": jnp.zeros((B, 3)),
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (B, 1)),
        "opacity": jnp.zeros((B, 1)), "marker": jnp.zeros((B, 1)),
        "kp_score": jnp.zeros((B, 1)),
    }
    # 10 valid entries scattered across the budget, some beyond capacity pos
    valid = jnp.zeros((B,), bool).at[jnp.array([1, 5, 20, 30, 40, 45, 50,
                                                55, 60, 63])].set(True)
    out = scene.insert(vals, valid)
    assert int(out.num_alive) == 10
    got = sorted(np.asarray(out.xyz[np.asarray(out.alive), 0]).tolist())
    assert got == [1, 5, 20, 30, 40, 45, 50, 55, 60, 63]
