"""SuperPoint / NetVLAD architecture tests (random weights) + TSDF fusion +
preprocessing pipeline smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.match import netvlad, superpoint


def test_superpoint_shapes_and_nms(rng):
    params = superpoint.init_params(jax.random.PRNGKey(0), desc_dim=64)
    img = jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32))
    out = superpoint.extract(params, img, max_keypoints=128)
    assert out["keypoints"].shape == (128, 2)
    assert out["descriptors"].shape == (64, 128)
    assert out["dense_scores"].shape == (64, 96)
    # descriptors are unit-norm
    n = np.linalg.norm(np.asarray(out["descriptors"]), axis=0)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    # NMS: selected keypoints are local maxima -> pairwise distance > 0
    kps = np.asarray(out["keypoints"])[np.asarray(out["valid"])]
    if len(kps) > 1:
        d = np.linalg.norm(kps[:, None] - kps[None], axis=-1)
        np.fill_diagonal(d, 99)
        assert d.min() >= 1.0
    # border suppression
    assert (kps[:, 0] >= 4).all() and (kps[:, 1] >= 4).all()


def test_superpoint_dense_scores_sum():
    """The 64-way cell softmax (+dustbin) bounds per-cell scores."""
    params = superpoint.init_params(jax.random.PRNGKey(1), desc_dim=64)
    img = jnp.zeros((32, 32))
    scores, desc = superpoint.dense_outputs(params, img)
    s = np.asarray(scores).reshape(4, 8, 4, 8).transpose(0, 2, 1, 3)
    cell_sums = s.reshape(16, 64).sum(-1)
    assert (cell_sums <= 1.0 + 1e-5).all()
    assert desc.shape == (4, 4, 64)


def test_netvlad_descriptor(rng):
    params = netvlad.init_params(jax.random.PRNGKey(0), whiten_dim=256)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    d = netvlad.global_descriptor(params, img)
    assert d.shape == (256,)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-4)
    # different images -> different descriptors; same image -> identical
    img2 = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    d2 = netvlad.global_descriptor(params, img2)
    assert float(jnp.abs(d - d2).max()) > 1e-4
    d3 = netvlad.global_descriptor(params, img)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d3), atol=1e-6)


def test_top_k_retrieval():
    db = jnp.eye(4)
    q = jnp.asarray([[0.9, 0.1, 0, 0], [0, 0, 0.2, 0.9]])
    idx, sims = netvlad.top_k_retrieval(q, db, k=2)
    assert int(idx[0, 0]) == 0
    assert int(idx[1, 0]) == 3


def test_tsdf_fusion_plane(rng):
    """Fusing views of a plane must produce surface points on the plane."""
    from splatloc_tpu.fields import fusion
    bound = np.array([[-1, 1], [-1, 1], [0, 3]], np.float32)
    vol = fusion.TSDFVolume.create(bound, voxel_size=0.05)
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0, np.float32)   # plane at z=2
    rgb = np.full((48, 64, 3), 0.5, np.float32)
    for dx in (-0.05, 0.0, 0.05):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = dx
        vol = fusion.integrate_frame(vol, depth, rgb, K, c2w)
    pts, cols = fusion.extract_surface_points(vol)
    assert pts.shape[0] > 50
    assert np.abs(pts[:, 2] - 2.0).max() < 0.08   # within ~1.5 voxels

    # feature fusion: constant feature map -> every point gets it
    feat = np.full((48, 64, 8), 0.25, np.float32)
    feats, w = fusion.fuse_point_features(
        pts, [(feat, depth, np.eye(4, dtype=np.float32))], K, 8)
    vis = w > 0
    assert vis.sum() > 30
    np.testing.assert_allclose(feats[vis], 0.25, atol=1e-5)


def test_preprocess_pipeline_smoke(tmp_path, rng):
    """extract-features + gen-retrieval + gen-fusion on the synthetic set
    with random SP/NetVLAD weights (architecture plumbing, not quality)."""
    import os
    from splatloc_tpu.data import synthetic
    from splatloc_tpu.cli import preprocess

    root = str(tmp_path)
    config = synthetic.generate(root, n_train=6, n_test=2, width=64,
                                height=48, n_gauss=150, n_landmarks=20,
                                desc_dim=64)
    wdir = os.path.join(root, "weights")
    os.makedirs(wdir)
    sp = superpoint.init_params(jax.random.PRNGKey(0), desc_dim=64)
    np.savez(os.path.join(wdir, "sp.npz"),
             **{k: np.asarray(v) for k, v in sp.items()})
    nv = netvlad.init_params(jax.random.PRNGKey(1), whiten_dim=128)
    np.savez(os.path.join(wdir, "nv.npz"),
             **{k: np.asarray(v) for k, v in nv.items()})

    preprocess.extract_features(config, os.path.join(wdir, "sp.npz"),
                                max_keypoints=64)
    gen = os.path.join(root, "generated", "scene")
    assert os.path.exists(os.path.join(gen, "score_map", "rgb_0_score.npy"))
    assert os.path.exists(os.path.join(gen, "query_features", "rgb_0.npz"))

    preprocess.gen_retrieval(config, os.path.join(wdir, "nv.npz"))
    table = open(os.path.join(gen, "netvlad_retrieval.txt")).read()
    assert "rgb_0" in table

    preprocess.gen_fusion(config, os.path.join(wdir, "sp.npz"),
                          voxel_size=0.1, feat_dim=64)
    pts = np.load(os.path.join(gen, "sp_inloc_feat.npy"))
    assert pts.shape[1] == 64 and pts.shape[0] > 10
