import functools

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize, RasterConfig
from splatloc_tpu.raster.reference import rasterize_reference

# One shared geometry/config across tests => jit cache hits within the run
# and persistent-cache hits across runs.
N = 200
W, H = 64, 48
CFG = RasterConfig(tile_size=16, max_per_tile=256, tile_chunk=4)


@functools.partial(jax.jit, static_argnums=())
def _raster(means, scales, quats, opac, colors, w2c, alive, off, bg):
    cam = Camera.create(np.eye(4, dtype=np.float32), 50.0, 50.0, W / 2, H / 2, W, H)
    cam = cam.replace_pose(w2c)
    return rasterize(means, scales, quats, opac, colors, cam, CFG, bg=bg,
                     alive=alive, means2d_offset=off)


def raster(means, scales, quats, opac, colors, w2c=None, alive=None, off=None,
           bg=None):
    n = means.shape[0]
    if w2c is None:
        w2c = jnp.eye(4)
    if alive is None:
        alive = jnp.ones((n,), bool)
    if off is None:
        off = jnp.zeros((n, 2))
    if bg is None:
        bg = jnp.zeros((colors.shape[-1],))
    return _raster(means, scales, quats, opac, colors, w2c, alive, off, bg)


def make_scene(rng, n=N, c=4):
    means = np.stack([
        rng.uniform(-1.5, 1.5, n),
        rng.uniform(-1.0, 1.0, n),
        rng.uniform(1.0, 5.0, n),
    ], axis=-1).astype(np.float32)
    scales = np.exp(rng.uniform(-4.5, -2.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, c)).astype(np.float32)
    return map(jnp.asarray, (means, scales, quats, opac, colors))


def pad_scene(means, scales, quats, opac, colors, n=N):
    """Pad a smaller scene to the shared size with dead gaussians."""
    k = means.shape[0]
    pad = n - k
    means = jnp.concatenate([means, jnp.zeros((pad, 3))])
    scales = jnp.concatenate([scales, jnp.full((pad, 3), 1e-3)])
    quats = jnp.concatenate([quats, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (pad, 1))])
    opac = jnp.concatenate([opac, jnp.zeros((pad,))])
    colors = jnp.concatenate([colors, jnp.zeros((pad, colors.shape[-1]))])
    alive = jnp.arange(n) < k
    return means, scales, quats, opac, colors, alive


def make_camera():
    return Camera.create(w2c=np.eye(4, dtype=np.float32), fx=50.0, fy=50.0,
                         cx=W / 2, cy=H / 2, width=W, height=H)


def test_tiled_matches_reference(rng):
    means, scales, quats, opac, colors = make_scene(rng)
    out = raster(means, scales, quats, opac, colors)
    img_r, dep_r, alp_r, rad_r = rasterize_reference(
        means, scales, quats, opac, colors, make_camera(), CFG)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(dep_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(alp_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(rad_r))


def test_background_composite(rng):
    sc = make_scene(rng, n=5)
    means, scales, quats, opac, colors, alive = pad_scene(*sc)
    bg = jnp.array([1.0, 0.5, 0.25, 0.0])
    out = raster(means, scales, quats, opac, colors, alive=alive, bg=bg)
    alpha = np.asarray(out.alpha)
    img = np.asarray(out.image)
    empty = alpha == 0.0
    assert empty.any()
    np.testing.assert_allclose(
        img[empty], np.broadcast_to(np.asarray(bg), img[empty].shape), atol=1e-6)


def test_alive_mask(rng):
    means, scales, quats, opac, colors = make_scene(rng)
    alive = jnp.arange(N) < N // 2
    out_masked = raster(means, scales, quats, opac, colors, alive=alive)
    sub = pad_scene(means[:N // 2], scales[:N // 2], quats[:N // 2],
                    opac[:N // 2], colors[:N // 2])
    out_subset = raster(*sub[:5], alive=sub[5])
    np.testing.assert_allclose(np.asarray(out_masked.image),
                               np.asarray(out_subset.image), atol=1e-5)
    assert np.all(np.asarray(out_masked.radii[N // 2:]) == 0)


def test_depth_ordering():
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    scales = jnp.full((2, 3), 0.05)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    opac = jnp.array([0.95, 0.95])
    colors = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    args = pad_scene(means, scales, quats, opac, colors)
    out = raster(*args[:5], alive=args[5])
    center = np.asarray(out.image)[H // 2, W // 2]
    assert center[0] > center[1]  # red (near) dominates
    # flipping storage order must not change the result
    args2 = pad_scene(means[::-1], scales, quats, opac[::-1], colors[::-1])
    out2 = raster(*args2[:5], alive=args2[5])
    np.testing.assert_allclose(np.asarray(out2.image), np.asarray(out.image),
                               atol=1e-6)


def test_capacity_overflow_drops_farthest(rng):
    """With tiny per-tile capacity the nearest Gaussians must win: with
    opacity 0.6 the transmittance after 16 layers is 0.4**16 ~ 4e-7 < the
    1e-4 cutoff, so keeping only the nearest 16 is exact."""
    n = 64
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(2.0, 6.0, n)
    # huge scale => alpha ~ opacity across the whole image, so transmittance
    # really does hit the cutoff after ~16 layers at every pixel
    scales = np.full((n, 3), 10.0, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.6, np.float32)
    colors = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    cam = make_camera()
    full = rasterize(*map(jnp.asarray, (means, scales, quats, opac, colors)),
                     cam, RasterConfig(max_per_tile=64, tile_chunk=2))
    cropped = rasterize(*map(jnp.asarray, (means, scales, quats, opac, colors)),
                        cam, RasterConfig(max_per_tile=16, tile_chunk=2))
    np.testing.assert_allclose(np.asarray(cropped.image), np.asarray(full.image),
                               atol=1e-5)


def test_gradients_finite_difference(rng):
    """Autodiff grads of the full rasterizer vs directional finite differences
    for every input group including the camera pose."""
    means, scales, quats, opac, colors = make_scene(rng, n=40)
    means, scales, quats, opac, colors, alive = pad_scene(
        means, scales, quats, opac, colors)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 4)).astype(np.float32))

    @jax.jit
    def loss_fn(means, scales, quats, opac, colors, w2c):
        out = _raster(means, scales, quats, opac, colors, w2c, alive,
                      jnp.zeros((N, 2)), jnp.zeros((4,)))
        return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.depth)

    args = (means, scales, quats, opac, colors, jnp.eye(4))
    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    grads = grad_fn(*args)

    rng2 = np.random.default_rng(2)
    # Args whose perturbation crosses sorting/binning/cutoff discontinuities
    # (means/scales/quats/pose) get a looser FD tolerance than the smooth
    # ones (opacity, colors).
    # Boundary-transport terms (the alpha_min cutoff and tile-rect jumps move
    # with the parameters) are seen by FD but deliberately ignored by the
    # analytic gradient — exactly like the reference CUDA backward. They bias
    # small-magnitude grads (quats) the most; grad *correctness* of the tiled
    # path is pinned tightly by test_grad_parity_with_reference below.
    tols = [0.15, 0.15, 0.35, 0.05, 0.02, 0.15]
    epss = [1e-3, 1e-3, 5e-3, 1e-3, 1e-3, 1e-3]
    for i, (g, a) in enumerate(zip(grads, args)):
        g = np.asarray(g)
        assert np.isfinite(g).all(), f"arg {i} grad not finite"
        d = rng2.normal(size=np.asarray(a).shape).astype(np.float32)
        if i == 5:
            d[3, :] = 0  # keep homogeneous row fixed
        eps = epss[i]
        fp = float(loss_fn(*[jnp.asarray(np.asarray(x) + eps * d) if j == i else x
                             for j, x in enumerate(args)]))
        fm = float(loss_fn(*[jnp.asarray(np.asarray(x) - eps * d) if j == i else x
                             for j, x in enumerate(args)]))
        fd = (fp - fm) / (2 * eps)
        an = float(np.sum(g * d))
        denom = max(abs(fd), abs(an), 1e-4)
        assert abs(fd - an) / denom < tols[i], (
            f"arg {i}: fd={fd:.6g} analytic={an:.6g}")


def test_grad_parity_with_reference(rng):
    """Gradients of the tiled rasterizer must match gradients of the exact
    per-pixel oracle for every input group (same math, independent binning
    implementations)."""
    means, scales, quats, opac, colors = make_scene(rng, n=60)
    means, scales, quats, opac, colors, alive = pad_scene(
        means, scales, quats, opac, colors)
    cam = make_camera()
    target = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (H, W, 4)).astype(np.float32))

    def loss_tiled(m, s, q, o, c):
        out = _raster(m, s, q, o, c, jnp.eye(4), alive,
                      jnp.zeros((N, 2)), jnp.zeros((4,)))
        return jnp.mean((out.image - target) ** 2) + 0.05 * jnp.mean(out.depth)

    def loss_ref(m, s, q, o, c):
        img, dep, alp, rad = rasterize_reference(m, s, q, o, c, cam, CFG,
                                                 alive=alive)
        return jnp.mean((img - target) ** 2) + 0.05 * jnp.mean(dep)

    args = (means, scales, quats, opac, colors)
    g_t = jax.jit(jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4)))(*args)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(*args)
    for i, (a, b) in enumerate(zip(g_t, g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4,
                                   err_msg=f"grad arg {i}")


def test_means2d_offset_grad(rng):
    """means2d_offset gradient: nonzero for visible gaussians, zero for
    invisible ones (densification-stats contract)."""
    means, scales, quats, opac, colors = make_scene(rng)
    means = means.at[:5, 2].set(-3.0)  # behind the camera
    alive = jnp.ones((N,), bool)

    @jax.jit
    def loss_fn(off):
        out = _raster(means, scales, quats, opac, colors, jnp.eye(4), alive,
                      off, jnp.zeros((4,)))
        return jnp.sum(out.image ** 2)

    g = np.asarray(jax.grad(loss_fn)(jnp.zeros((N, 2))))
    out = raster(means, scales, quats, opac, colors)
    radii = np.asarray(out.radii)
    assert np.all(g[radii == 0] == 0)
    assert np.any(np.abs(g[radii > 0]) > 0)
