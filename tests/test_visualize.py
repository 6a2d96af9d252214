import numpy as np

from splatloc_tpu.eval import visualize


def test_colormap_jet():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    rgb = visualize.colormap_jet(x)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # jet: low -> blue-ish, high -> red-ish
    assert rgb[0, 0, 2] > rgb[0, 0, 0]
    assert rgb[-1, -1, 0] > rgb[-1, -1, 2]


def test_draw_matches(rng):
    a = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    kpa = rng.uniform(0, 39, (10, 2)).astype(np.float32)
    kpb = rng.uniform(0, 39, (10, 2)).astype(np.float32)
    img = visualize.draw_matches(a, b, kpa, kpb,
                                 inliers=np.arange(10) % 2 == 0)
    assert img.shape == (32, 80, 3)


def test_feature_pca(rng):
    feat = rng.normal(size=(16, 16, 32)).astype(np.float32)
    rgb = visualize.feature_pca_rgb(feat)
    assert rgb.shape == (16, 16, 3)
    assert 0 <= rgb.min() and rgb.max() <= 1


def test_debug_renders(tmp_path, rng):
    import jax.numpy as jnp
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster.types import RasterConfig
    from splatloc_tpu.scene import GaussianScene
    scene = GaussianScene.empty(64)
    scene = scene.replace(
        xyz=scene.xyz.at[:10].set(
            jnp.asarray(rng.uniform(-0.3, 0.3, (10, 3)).astype(np.float32)
                        + np.array([0, 0, 2], np.float32))),
        scaling=scene.scaling.at[:10].set(np.log(0.05)),
        opacity=scene.opacity.at[:10].set(1.0),
        alive=jnp.arange(64) < 10)
    cam = Camera.create(np.eye(4, dtype=np.float32), 20.0, 20.0, 16.0, 12.0,
                        32, 24)
    visualize.save_debug_renders(scene, cam, str(tmp_path), 0,
                                 RasterConfig(tile_chunk=2))
    import os
    assert os.path.exists(str(tmp_path / "rendering/rgb/rgb_0.png"))
    assert os.path.exists(str(tmp_path / "rendering/depth/depth_0.png"))


def test_replay_frame(rng):
    render = rng.uniform(0, 1, (24, 32, 3))
    query = rng.uniform(0, 1, (24, 32, 3))
    gt = rng.normal(size=(5, 3)).astype(np.float32)
    pred = gt + 0.05
    frame = visualize.replay_frame(render, query, gt, pred, 2)
    assert frame.shape == (24, 96, 3)
