"""Native IO runtime tests (skipped cleanly if the toolchain is absent)."""
import numpy as np
import pytest
from PIL import Image

from splatloc_tpu.data import native_io

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native lib unavailable")


def test_png_roundtrip(tmp_path, rng):
    rgb = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(rgb).save(p)
    back = native_io.png_read_rgb(p, 32, 24)
    np.testing.assert_array_equal(back, rgb)

    dep = rng.integers(0, 65535, (24, 32)).astype(np.uint16)
    p2 = str(tmp_path / "dep.png")
    Image.fromarray(dep).save(p2)
    back2 = native_io.png_read_depth16(p2, 32, 24)
    np.testing.assert_array_equal(back2, dep)


def test_ply_roundtrip_native(tmp_path, rng):
    data = rng.normal(size=(100, 5)).astype(np.float32)
    names = ["x", "y", "z", "a", "b"]
    p = str(tmp_path / "t.ply")
    assert native_io.ply_write_f32(p, names, data)
    got = native_io.ply_read_f32(p)
    assert got is not None
    names2, data2 = got
    assert names2 == names
    np.testing.assert_array_equal(data2, data)


def test_ply_native_matches_python_codec(tmp_path, rng):
    """The python codec must read what native wrote and vice versa."""
    from splatloc_tpu.scene import ply as ply_mod
    data = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "x.ply")
    native_io.ply_write_f32(p, ["x", "y", "z"], data)
    v = ply_mod.read_ply_vertices(p)
    np.testing.assert_array_equal(v["x"], data[:, 0])


def test_frame_prefetcher(tmp_path, rng):
    paths_rgb, paths_dep = [], []
    rgbs, deps = [], []
    for i in range(6):
        rgb = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        dep = rng.integers(0, 5000, (16, 16)).astype(np.uint16)
        pr = str(tmp_path / f"r{i}.png")
        pd = str(tmp_path / f"d{i}.png")
        Image.fromarray(rgb).save(pr)
        Image.fromarray(dep).save(pd)
        paths_rgb.append(pr)
        paths_dep.append(pd)
        rgbs.append(rgb)
        deps.append(dep)
    pf = native_io.FramePrefetcher(paths_rgb, paths_dep, 16, 16,
                                   n_threads=2, read_ahead=3)
    for i in range(6):
        r, d = pf.get(i)
        np.testing.assert_array_equal(r, rgbs[i])
        np.testing.assert_array_equal(d, deps[i])
    pf.close()
