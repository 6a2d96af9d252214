"""Multi-device tests on the virtual 8-device CPU mesh: tile-sharded
rasterization parity (fwd + grad) and the sharded mapping train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.dist.sharded_raster import rasterize_sharded
from splatloc_tpu.raster import rasterize, RasterConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 devices")


def _scene(rng, n=250):
    means = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
                      rng.uniform(1, 5, n)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))


@pytest.mark.slow
def test_tile_sharded_raster_parity(rng):
    sc = _scene(rng)
    cam = Camera.create(np.eye(4, dtype=np.float32), 50.0, 50.0, 32.0, 24.0,
                        64, 48)
    cfg = RasterConfig(tile_size=16, tile_chunk=4, use_pallas=True)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tile",))

    out_s = rasterize(*sc, cam, cfg)
    out_m = rasterize_sharded(*sc, cam, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out_m.image),
                               np.asarray(out_s.image), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_m.depth),
                               np.asarray(out_s.depth), atol=1e-5)

    def loss(fn):
        def f(means):
            o = fn(means, *sc[1:], cam, cfg)
            return jnp.mean(o.image ** 2) + 0.1 * jnp.mean(o.depth)
        return f

    g_s = jax.grad(loss(lambda *a: rasterize(*a)))(sc[0])
    g_m = jax.grad(loss(lambda *a: rasterize_sharded(*a, mesh)))(sc[0])
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_s), atol=1e-6)


def test_sharded_backward_comm_volume(rng):
    """Scaling-efficiency invariant, testable without hardware: the sharded
    backward's only sizeable collective is the per-Gaussian [n, rows] psum
    — never a pair-sized grad slab (which at map scale would be ~280 MB vs
    ~6 MB). Asserted on the compiled HLO's all-reduce operand shapes."""
    import re

    n = 250
    sc = _scene(rng, n)
    cam = Camera.create(np.eye(4, dtype=np.float32), 50.0, 50.0, 32.0, 24.0,
                        64, 48)
    cfg = RasterConfig(tile_size=16, tile_chunk=4, use_pallas=True)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tile",))

    def loss(means):
        o = rasterize_sharded(means, *sc[1:], cam, cfg, mesh)
        return jnp.mean(o.image ** 2) + 0.1 * jnp.mean(o.depth)

    txt = jax.jit(jax.grad(loss)).lower(sc[0]).compile().as_text()
    dbytes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "pred": 1,
              "bf16": 2, "f16": 2}
    sizes = []
    for m in re.finditer(r"= (\w+)\[([\d,]*)\][^=]*? all-reduce", txt):
        dims = [int(d) for d in m.group(2).split(",") if d] or [1]
        size = dbytes.get(m.group(1), 4)
        for d in dims:
            size *= d
        sizes.append(size)
    assert sizes, "expected at least the [n, rows] gradient psum"
    rows = 16  # _rows_for(C=4)
    gauss_psum = n * rows * 4
    assert max(sizes) <= 2 * gauss_psum, (
        f"oversized collective: {max(sizes)} B (all-reduces: {sizes}); "
        f"the per-Gaussian psum is {gauss_psum} B")


def test_sharded_mapping_step_runs(rng):
    """The pjit-annotated mapping step over a (data, gauss) mesh compiles
    and matches the unsharded step."""
    from splatloc_tpu.dist import make_mesh, make_sharded_mapping_step, \
        shard_scene
    from splatloc_tpu.scene import GaussianScene, densify, optim
    from splatloc_tpu.train.mapping import (FrameStore, MappingConfig,
                                            make_mapping_step)

    mesh = make_mesh(data=2, gauss=2)
    cfg = MappingConfig(width=32, height=32, fx=30.0, fy=30.0, cx=16.0,
                        cy=16.0, window_size=2, tile_chunk=2,
                        max_per_tile=128)
    cap = 128
    scene = GaussianScene.empty(cap)
    n = 64
    scene = scene.replace(
        xyz=scene.xyz.at[:n].set(jnp.asarray(
            rng.uniform(-1, 1, (n, 3)).astype(np.float32)
            + np.array([0, 0, 2.5], np.float32))),
        scaling=scene.scaling.at[:n].set(np.log(0.05)),
        opacity=scene.opacity.at[:n].set(0.5),
        alive=jnp.arange(cap) < n)
    opt_state = optim.init(scene.params())
    stats = densify.DensifyStats.zeros(cap)

    fs = FrameStore(2, 32, 32)
    for i in range(2):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 0.02 * i
        fs.append(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32),
                  np.full((32, 32), 2.5, np.float32),
                  np.zeros((32, 32), np.float32), w2c)
    frames = fs.gather(jnp.arange(2))

    ref_step = make_mapping_step(cfg)
    s1, _, _, loss1, _, _ = ref_step(scene, opt_state, stats, frames,
                                     jnp.asarray(1))

    sh_scene = shard_scene(mesh, scene)
    sh_step = make_sharded_mapping_step(cfg, mesh)
    s2, _, _, loss2, _, _ = sh_step(sh_scene, opt_state, stats, frames,
                                    jnp.asarray(1))
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s1.xyz),
                               atol=1e-5)
