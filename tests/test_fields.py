import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.fields import (FeatureFieldConfig, cosine_loss, decode,
                                 encode, init_decoder, init_hashgrid,
                                 HashGridConfig)


def small_cfg():
    return FeatureFieldConfig(
        bound=((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0)),
        num_layers=3, hidden_dim=32, final_dim=16,
        grid=HashGridConfig(n_levels=4, n_features=2, base_resolution=4,
                            log2_hashmap_size=10, desired_resolution=32))


def test_hashgrid_shapes_and_continuity(rng):
    cfg = HashGridConfig(n_levels=4, n_features=2, base_resolution=4,
                         log2_hashmap_size=10, desired_resolution=32)
    table = init_hashgrid(cfg, jax.random.PRNGKey(0), scale=0.1)
    pos = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
    out = encode(table, pos, cfg)
    assert out.shape == (32, cfg.out_dim)
    # trilinear interpolation is continuous: nearby points -> nearby features
    eps = 1e-4
    out2 = encode(table, pos + eps, cfg)
    assert float(jnp.abs(out - out2).max()) < 0.05


def test_hashgrid_interpolates_corners():
    """At integer grid coordinates the encoding equals the corner feature."""
    cfg = HashGridConfig(n_levels=1, n_features=2, base_resolution=4,
                         log2_hashmap_size=10, desired_resolution=4)
    table = init_hashgrid(cfg, jax.random.PRNGKey(1), scale=0.1)
    # position exactly at grid node (2,1,3) of the 4^3 grid (dense indexing)
    pos = jnp.array([[2 / 4, 1 / 4, 3 / 4]])
    out = encode(table, pos, cfg)
    idx = (2 * 5 + 1) * 5 + 3
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0, idx]),
                               atol=1e-6)


def test_decoder_output_normalized(rng):
    cfg = small_cfg()
    params = init_decoder(cfg, jax.random.PRNGKey(0))
    pos = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    out = decode(params, pos, cfg)
    assert out.shape == (64, 16)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(out, axis=-1)),
                               1.0, atol=1e-3)


def test_cosine_loss():
    a = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    assert float(cosine_loss(a, a)) < 1e-6
    assert abs(float(cosine_loss(a, -a)) - 2.0) < 1e-6


def test_decoder_training_fits_field(rng):
    """The field must memorize descriptors of a small point cloud."""
    from splatloc_tpu.train.decoder_train import train_decoder
    cfg = small_cfg()
    n = 512
    xyz = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    # ground-truth descriptors: 4 clusters with distinct directions
    dirs = rng.normal(size=(4, 16)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    labels = (xyz[:, 0] > 0).astype(int) * 2 + (xyz[:, 1] > 0).astype(int)
    feats = dirs[labels]
    params, loss = train_decoder(cfg, xyz, feats, num_epochs=30, batch=128,
                                 log_every=0)
    assert loss < 0.05, loss
    # held-out nearby points decode to the right cluster direction
    test = xyz[:32] + rng.normal(0, 0.01, (32, 3)).astype(np.float32)
    pred = np.asarray(decode(params, jnp.asarray(test), cfg))
    sim = (pred * feats[:32]).sum(-1)
    assert sim.mean() > 0.9


def test_params_save_load(tmp_path):
    from splatloc_tpu.train.decoder_train import load_params, save_params
    cfg = small_cfg()
    params = init_decoder(cfg, jax.random.PRNGKey(0))
    p = str(tmp_path / "ckpt.npz")
    save_params(params, p)
    back = load_params(p)
    np.testing.assert_allclose(np.asarray(back["table"]),
                               np.asarray(params["table"]))
    assert len(back["layers"]) == len(params["layers"])


def test_autoencoder_roundtrip(rng):
    from splatloc_tpu.fields import autoencoder as ae
    params = ae.init_autoencoder(jax.random.PRNGKey(0),
                                 encoder_dims=(64, 16),
                                 decoder_dims=(64, 64), in_dim=64)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    z = ae.encode(params, x)
    y = ae.forward(params, x)
    assert z.shape == (8, 16) and y.shape == (8, 64)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(z, axis=-1)), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(y, axis=-1)), 1.0,
                               atol=1e-5)


def test_tsdf_volume_save_load(tmp_path, rng):
    from splatloc_tpu.fields import fusion
    bound = np.array([[-1, 1], [-1, 1], [0, 2]], np.float32)
    vol = fusion.TSDFVolume.create(bound, voxel_size=0.1)
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    vol = fusion.integrate_frame(vol, np.full((24, 32), 1.5, np.float32),
                                 np.full((24, 32, 3), 0.5, np.float32), K,
                                 np.eye(4, dtype=np.float32))
    p = str(tmp_path / "vol.npz")
    fusion.save_volume(vol, p)
    back = fusion.load_volume(p)
    np.testing.assert_array_equal(np.asarray(back.tsdf), np.asarray(vol.tsdf))
    assert back.voxel_size == vol.voxel_size


def test_grad_mask(rng):
    from splatloc_tpu.data.grad_mask import compute_grad_mask
    rgb = np.full((64, 64, 3), 0.5, np.float32)
    rgb[:, 32:] = 0.9   # vertical edge
    mask = np.asarray(compute_grad_mask(jnp.asarray(rgb), dataset_type="replica",
                                        rows=4, cols=4))
    assert mask.shape == (64, 64)
    # the edge column must be flagged
    assert mask[:, 31:33].mean() > 0.5
    assert mask[:, :16].mean() < 0.2
