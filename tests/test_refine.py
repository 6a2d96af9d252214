"""Quantified render-loss 6-DoF pose refinement (the north-star capability;
the reference only carries vestigial pose-opt hooks, utils/camera_utils.py:
174-183). Perturb a known gt pose by a known epsilon, refine, and require a
measured error reduction — not just a loss decrease."""
import numpy as np
import jax.numpy as jnp
import pytest

from splatloc_tpu.core import transforms
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.match.localize import refine_pose
from splatloc_tpu.raster import rasterize, render, RasterConfig
from splatloc_tpu.scene.gaussians import GaussianScene


def _make_scene(rng, n=220, cap=256):
    xyz = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
                    rng.uniform(2.0, 5.0, n)], -1).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scene = GaussianScene.empty(cap)
    return scene.replace(
        xyz=scene.xyz.at[:n].set(xyz),
        scaling=scene.scaling.at[:n].set(
            rng.uniform(-3.6, -2.6, (n, 3)).astype(np.float32)),
        rotation=scene.rotation.at[:n].set(quats),
        opacity=scene.opacity.at[:n].set(2.0),
        f_dc=scene.f_dc.at[:n].set(
            ((colors - 0.5) / 0.28209479177387814)[:, None, :]),
        alive=scene.alive.at[:n].set(True))


def _pose_err(w2c_est, w2c_gt):
    dR = np.asarray(w2c_est)[:3, :3] @ np.asarray(w2c_gt)[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    # camera-center error, the metric eval_pose reports
    c_est = -np.asarray(w2c_est)[:3, :3].T @ np.asarray(w2c_est)[:3, 3]
    c_gt = -np.asarray(w2c_gt)[:3, :3].T @ np.asarray(w2c_gt)[:3, 3]
    return np.linalg.norm(c_est - c_gt), ang


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.slow
def test_refine_pose_reduces_known_perturbation(rng, seed):
    r = np.random.default_rng(seed)
    scene = _make_scene(r)
    cam = Camera.create(np.eye(4, dtype=np.float32), 120.0, 120.0, 80.0,
                        60.0, 160, 120)
    gt = render(scene, cam, RasterConfig(tile_chunk=8))["render"]

    # known perturbation: ~4 cm translation, ~1.5 deg rotation
    xi_true = np.array([0.025, -0.02, 0.015, 0.012, -0.015, 0.014],
                       np.float32)
    w2c_pert = np.asarray(transforms.se3_exp(jnp.asarray(xi_true))
                          @ np.eye(4, dtype=np.float32))
    t0, r0 = _pose_err(w2c_pert, np.eye(4))
    assert t0 > 0.02 and r0 > 1.0  # the perturbation is material

    xi, info = refine_pose(scene, cam, w2c_pert, gt, iters=120, lr=4e-3)
    w2c_ref = np.asarray(transforms.se3_exp(xi) @ jnp.asarray(w2c_pert))
    t1, r1 = _pose_err(w2c_ref, np.eye(4))

    assert float(info["loss"]) < 0.5 * float(info["loss0"])
    assert t1 < t0 / 3.0, (t0, t1)
    assert r1 < r0 / 3.0, (r0, r1)
    assert float(info["iters"]) <= 120


@pytest.mark.slow
def test_refine_pose_noop_at_gt(rng):
    """Starting at the exact gt pose, refinement must not walk away."""
    r = np.random.default_rng(1)
    scene = _make_scene(r)
    cam = Camera.create(np.eye(4, dtype=np.float32), 120.0, 120.0, 80.0,
                        60.0, 160, 120)
    gt = render(scene, cam, RasterConfig(tile_chunk=8))["render"]
    xi, info = refine_pose(scene, cam, np.eye(4, dtype=np.float32), gt,
                           iters=40, lr=2e-3)
    t1, r1 = _pose_err(np.asarray(transforms.se3_exp(xi)), np.eye(4))
    assert t1 < 2e-3 and r1 < 0.1
    # already converged: the finest level's final loss is ~0 (loss0 is the
    # COARSE pyramid level's start loss — a downscale render differs from
    # the pooled full-res target even at the exact gt pose)
    assert float(info["loss"]) < 1e-5


@pytest.mark.slow
def test_refine_pose_pyramid_converges_from_5deg(rng):
    """The coarse-to-fine pyramid widens the basin: a ~5.5cm/5deg start —
    outside the full-resolution basin — must still converge (the reference
    use-case is polishing PnP poses, but retrieval-only poses are this far
    off)."""
    r = np.random.default_rng(7)
    scene = _make_scene(r, n=500, cap=512)
    cam = Camera.create(np.eye(4, dtype=np.float32), 120.0, 120.0, 80.0,
                        60.0, 160, 120)
    gt = render(scene, cam, RasterConfig(tile_chunk=8))["render"]

    ax = np.array([0.5, -0.6, 0.62])
    ax = ax / np.linalg.norm(ax) * np.radians(5.0)
    xi_true = np.concatenate([[0.03, -0.03, 0.03], ax]).astype(np.float32)
    w2c_pert = np.asarray(transforms.se3_exp(jnp.asarray(xi_true))
                          @ np.eye(4, dtype=np.float32))
    t0, r0 = _pose_err(w2c_pert, np.eye(4))
    assert r0 > 4.5

    xi, info = refine_pose(scene, cam, w2c_pert, gt, iters=120, lr=4e-3)
    w2c_ref = np.asarray(transforms.se3_exp(xi) @ jnp.asarray(w2c_pert))
    t1, r1 = _pose_err(w2c_ref, np.eye(4))
    assert t1 < t0 / 3.0, (t0, t1)
    assert r1 < r0 / 3.0, (r0, r1)


@pytest.mark.slow
def test_refine_pose_multistart_converges_from_10deg(rng):
    """Round-4 basin widening (VERDICT r3 #5): a ~10cm/10deg start — outside
    the pyramid-only basin (round-3 refine_table: 10cm/8deg landed at
    20.3cm) — must converge via the coarse-level multi-start seeding."""
    r = np.random.default_rng(11)
    scene = _make_scene(r, n=500, cap=512)
    cam = Camera.create(np.eye(4, dtype=np.float32), 120.0, 120.0, 80.0,
                        60.0, 160, 120)
    gt = render(scene, cam, RasterConfig(tile_chunk=8))["render"]

    ax = np.array([0.55, -0.66, 0.1])   # mostly pitch/yaw, slight roll
    ax = ax / np.linalg.norm(ax) * np.radians(10.0)
    xi_true = np.concatenate([[0.06, -0.05, 0.05], ax]).astype(np.float32)
    w2c_pert = np.asarray(transforms.se3_exp(jnp.asarray(xi_true))
                          @ np.eye(4, dtype=np.float32))
    t0, r0 = _pose_err(w2c_pert, np.eye(4))
    assert r0 > 9.0 and t0 > 0.08, (t0, r0)

    xi, info = refine_pose(scene, cam, w2c_pert, gt, iters=120, lr=4e-3)
    w2c_ref = np.asarray(transforms.se3_exp(xi) @ jnp.asarray(w2c_pert))
    t1, r1 = _pose_err(w2c_ref, np.eye(4))
    assert t1 < t0 / 3.0, (t0, t1)
    assert r1 < r0 / 3.0, (r0, r1)
