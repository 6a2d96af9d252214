"""Offscreen 3-D localization replay (eval/replay3d.py) — the headless
equivalent of the reference interactive viewer
(visualizations/render_localization_with_matches.py:206-425)."""
import os

import numpy as np
import pytest

from splatloc_tpu.eval import replay3d
from splatloc_tpu.fields.mesh import save_mesh_ply


def _sphere_mesh(n=800, r=1.0):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    verts = (v * r).astype(np.float32)
    normals = v.astype(np.float32)
    colors = np.full((n, 3), 200, np.uint8)
    return verts, normals, colors


def _poses(n=4):
    poses = []
    for i in range(n):
        ang = 0.3 * i
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [2.5 * np.sin(ang), 0.0, -2.5 * np.cos(ang)]
        poses.append(c2w)
    return np.stack(poses)


def test_mesh_view_renders_geometry():
    verts, normals, colors = _sphere_mesh()
    K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 3.0     # sphere centered 3m ahead
    img = replay3d.render_mesh_view(verts, normals, None, K, w2c, 320, 240)
    assert img.shape == (240, 320, 3)
    # sphere covers the image center, not the far corners
    assert img[110:130, 150:170].sum() > 0
    assert img[:10, :10].sum() == 0
    # painter's algorithm: visible shading values are bounded + finite
    assert np.isfinite(img).all() and img.max() <= 1.0


def test_replay_frame_draws_frusta_and_rays():
    verts, normals, colors = _sphere_mesh()
    gt = _poses()
    pred = gt.copy()
    pred[:, 0, 3] += 0.15
    K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]], np.float32)
    w2c = replay3d.look_at_viewpoint(np.zeros(3, np.float32), 6.0)
    base = replay3d.replay3d_frame((verts, normals, None), K, w2c, 320, 240,
                                   gt, pred, 2)
    rays = replay3d.replay3d_frame(
        (verts, normals, None), K, w2c, 320, 240, gt, pred, 2,
        matches={"pt3d": verts[:20], "kp2d": np.tile([160.0, 120.0], (20, 1))},
        K_query=K)
    assert base.shape == (240, 320, 3) and base.dtype == np.uint8
    # frusta/trajectory overlays add colored (green/orange) pixels
    assert (base.astype(int) != replay3d.render_mesh_view(
        verts, normals, None, K, w2c, 320, 240)[..., 0:1]).any()
    # match rays add green-dominant pixels beyond the base frame
    green_base = ((base[..., 1] > 180) & (base[..., 0] < 100)).sum()
    green_rays = ((rays[..., 1] > 180) & (rays[..., 0] < 100)).sum()
    assert green_rays > green_base


def test_full_replay_writes_sequence(tmp_path):
    verts, normals, colors = _sphere_mesh()
    faces = np.zeros((1, 3), np.int64)
    mesh_path = os.path.join(tmp_path, "mesh.ply")
    save_mesh_ply(mesh_path, verts, faces, normals, colors)

    gt = _poses(3)
    pred = gt.copy()
    pred[:, 0, 3] += 0.1
    mdir = os.path.join(tmp_path, "save_match")
    os.makedirs(mdir)
    np.save(os.path.join(mdir, "q1.npy"),
            {"success": True, "2d": np.tile([160.0, 120.0], (5, 1)),
             "3d": verts[:5]})

    frames = replay3d.render_localization_replay(
        mesh_path, gt, pred, os.path.join(tmp_path, "replay"),
        width=320, height=240, matches_dir=mdir,
        query_names=["q0", "q1", "q2"])
    assert len(frames) == 3
    assert os.path.exists(os.path.join(tmp_path, "replay", "frame_00001.png"))


def test_replay_cli(tmp_path):
    """cli.replay consumes the save_pose/save_match artifact layout that
    cli.test writes (reference __main__ flow)."""
    from splatloc_tpu.cli import replay as replay_cli

    verts, normals, colors = _sphere_mesh()
    mesh_path = os.path.join(tmp_path, "mesh.ply")
    save_mesh_ply(mesh_path, verts, np.zeros((1, 3), np.int64), normals,
                  colors)
    gt = _poses(4)
    pred = gt.copy()
    pred[:, 0, 3] += 0.02          # within the outlier gate
    pred[3, 0, 3] += 5.0           # one outlier to filter
    pdir = os.path.join(tmp_path, "save_pose")
    os.makedirs(pdir)
    np.save(os.path.join(pdir, "gt.npy"), gt)
    np.save(os.path.join(pdir, "match_r.npy"), pred[:, :3, :3])
    np.save(os.path.join(pdir, "match_t.npy"), pred[:, :3, 3])
    out = os.path.join(tmp_path, "replay3d")
    replay_cli.main(["--save_dir", str(tmp_path), "--mesh", mesh_path,
                     "--out", out, "--width", "160", "--height", "120"])
    assert os.path.exists(os.path.join(out, "frame_00002.png"))
    assert not os.path.exists(os.path.join(out, "frame_00003.png"))
