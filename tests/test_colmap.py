"""COLMAP sparse-model I/O: text/binary round-trips, pose math, and the
pipeline adapters (utils/colmap_utils.py parity; format per the public
COLMAP spec)."""
import dataclasses

import numpy as np
import pytest

from splatloc_tpu.data import colmap


def _model(rng):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([320.0, 321.0, 319.5, 239.5]))}
    images = {}
    for i in (1, 2):
        ax = rng.normal(size=3)
        ax = ax / np.linalg.norm(ax) * 0.3 * i
        th = np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        R = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K
        q = colmap.rotmat_to_qvec(R)
        m = 3 * i
        images[i] = colmap.ColmapImage(
            i, q, rng.normal(size=3), 1, f"frame_{i:04d}.png",
            rng.uniform(0, 640, (m, 2)), rng.integers(-1, 5, m))
    points = {7: colmap.ColmapPoint3D(
        7, rng.normal(size=3), np.array([10, 200, 30], np.uint8), 0.5,
        np.array([1, 2], np.int32), np.array([0, 2], np.int32))}
    return cams, images, points


def _assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert ca.keys() == cb.keys() and ia.keys() == ib.keys()
    for k in ca:
        assert ca[k].model == cb[k].model
        assert (ca[k].width, ca[k].height) == (cb[k].width, cb[k].height)
        np.testing.assert_allclose(ca[k].params, cb[k].params, rtol=1e-12)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec, rtol=1e-12)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec, rtol=1e-12)
        assert ia[k].name == ib[k].name
        np.testing.assert_allclose(ia[k].xys, ib[k].xys, rtol=1e-12)
        np.testing.assert_array_equal(ia[k].point3d_ids, ib[k].point3d_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz, rtol=1e-12)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_model_round_trip(tmp_path, rng, ext):
    model = _model(rng)
    colmap.write_model(str(tmp_path), *model, ext=ext)
    back = colmap.read_model(str(tmp_path), ext)
    _assert_models_equal(model, back)
    # auto-detection picks the right encoding
    auto = colmap.read_model(str(tmp_path))
    _assert_models_equal(model, auto)


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_zero_point_image_round_trip(tmp_path, rng, ext):
    """An image with an EMPTY POINTS2D row must not desync the pairing
    (COLMAP and write_images_text both emit the blank line)."""
    cams, images, points = _model(rng)
    images[1] = colmap.ColmapImage(
        1, images[1].qvec, images[1].tvec, 1, images[1].name,
        np.zeros((0, 2)), np.zeros((0,), np.int64))
    colmap.write_model(str(tmp_path), cams, images, points, ext=ext)
    back = colmap.read_model(str(tmp_path), ext)
    _assert_models_equal((cams, images, points), back)
    assert back[1][1].xys.shape == (0, 2)
    assert back[1][2].name == images[2].name  # image 2 parsed intact


def test_model_to_poses_rejects_multi_camera(rng):
    cams, images, _ = _model(rng)
    cams[2] = colmap.ColmapCamera(2, "PINHOLE", 320, 240,
                                  np.array([160.0, 160.0, 159.5, 119.5]))
    images[2] = dataclasses.replace(images[2], camera_id=2)
    with pytest.raises(ValueError, match="single shared camera"):
        colmap.model_to_poses(cams, images)


def test_qvec_rotmat_round_trip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(colmap.rotmat_to_qvec(R), q, atol=1e-9)


def test_pipeline_adapters(tmp_path, rng):
    cams, images, points = _model(rng)
    names, c2w, K, (w, h) = colmap.model_to_poses(cams, images)
    assert names == ["frame_0001.png", "frame_0002.png"]
    assert (w, h) == (640, 480)
    np.testing.assert_allclose(K[0, 0], 320.0)
    # c2w really inverts the stored w2c
    for i, im in enumerate(sorted(images.values(), key=lambda x: x.name)):
        np.testing.assert_allclose(c2w[i] @ im.w2c(), np.eye(4), atol=1e-10)
    xyz, rgb = colmap.points_array(points)
    assert xyz.shape == (1, 3) and rgb.shape == (1, 3)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
