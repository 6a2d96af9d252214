"""Mesh extraction (fields/mesh.py) — the reference get_mesh/meshwrite
parity surface (utils/fusion_utils.py:35-66,271-289)."""
import numpy as np
import pytest

from splatloc_tpu.fields import fusion
from splatloc_tpu.fields.mesh import (get_mesh, load_mesh_ply, marching_tets,
                                      save_mesh_ply)


def _sphere_sdf(n=40, r=12.0):
    g = np.mgrid[:n, :n, :n].astype(np.float32)
    return np.sqrt(((g - n / 2.0) ** 2).sum(0)) - r


def test_sphere_mesh_geometry():
    n, r = 40, 12.0
    v, f, nm = marching_tets(np.clip(_sphere_sdf(n, r) / 3.0, -1, 1))
    assert v.shape[0] > 1000 and f.shape[0] > 1000
    rad = np.linalg.norm(v - n / 2.0, axis=1)
    assert abs(rad.mean() - r) < 0.05
    assert np.abs(rad - r).max() < 0.2


def test_sphere_mesh_watertight_and_oriented():
    n = 40
    v, f, nm = marching_tets(np.clip(_sphere_sdf(n) / 3.0, -1, 1))
    # every edge shared by exactly two faces
    edges = np.sort(f[:, [[0, 1], [1, 2], [2, 0]]].reshape(-1, 2), axis=1)
    uq, cnt = np.unique(edges, axis=0, return_counts=True)
    assert (cnt == 2).all()
    # sphere topology
    assert v.shape[0] - uq.shape[0] + f.shape[0] == 2
    # outward winding (normals toward positive tsdf)
    fc = v[f].mean(1)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    assert ((fn * (fc - n / 2.0)).sum(1) > 0).all()
    # vertex normals outward, unit
    assert ((nm * (v - n / 2.0)).sum(1) > 0).all()
    np.testing.assert_allclose(np.linalg.norm(nm, axis=1), 1.0, atol=1e-5)


def test_unobserved_voxels_excluded():
    sdf = np.clip(_sphere_sdf(40) / 3.0, -1, 1)
    w = np.ones_like(sdf)
    w[:, :, :20] = 0.0                       # half the volume unobserved
    v, f, _ = marching_tets(sdf, weight=w, min_weight=1.0)
    v_full, _, _ = marching_tets(sdf)
    assert 0 < v.shape[0] < v_full.shape[0]
    assert (v[:, 2] >= 19.0).all()


def test_empty_and_degenerate():
    v, f, nm = marching_tets(np.ones((8, 8, 8), np.float32))
    assert v.shape == (0, 3) and f.shape == (0, 3)
    v, f, nm = marching_tets(np.ones((1, 5, 5), np.float32))
    assert v.shape == (0, 3)


def test_get_mesh_from_fused_volume(tmp_path):
    # fuse a synthetic fronto-parallel wall at z=1.0 from two viewpoints
    vol = fusion.TSDFVolume.create(
        np.array([[-0.6, 0.6], [-0.6, 0.6], [0.5, 1.4]], np.float32), 0.04)
    H = W = 64
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 1.0, np.float32)
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[..., 0] = 1.0                         # red wall
    for dz in (0.0, 0.05):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = dz
        vol = fusion.integrate_frame(vol, depth, rgb, K, c2w)
    verts, faces, norms, colors = get_mesh(vol)
    assert verts.shape[0] > 50 and faces.shape[0] > 50
    # surface near z=1.0 (both viewpoints agree)
    assert np.abs(verts[:, 2] - 1.0).max() < 0.1
    assert colors.dtype == np.uint8
    assert colors[:, 0].mean() > 150          # red dominates

    path = str(tmp_path / "mesh.ply")
    save_mesh_ply(path, verts, faces, norms, colors)
    v2, f2, n2, c2 = load_mesh_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    assert (f2 == faces).all()
    assert (c2 == colors).all()
