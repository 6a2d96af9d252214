"""Architecture cross-validation against hand-built torch references with
SHARED random weights — verifies conv wiring (strides/padding/pooling/heads)
so that converted public checkpoints will evaluate identically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_lpips_alexnet_features_match_torch(rng):
    """Our AlexNet feature trunk must equal torch's (torchvision .features
    topology) with identical weights."""
    from splatloc_tpu.eval.metrics import _ALEX_CFG, _alex_features

    convs = []
    cin = 3
    params = {}
    for i, (cout, k, s, p) in enumerate(_ALEX_CFG):
        w = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        b = rng.normal(0, 0.05, cout).astype(np.float32)
        conv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            conv.bias.copy_(torch.from_numpy(b))
        convs.append(conv)
        params[f"conv{i}_w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        params[f"conv{i}_b"] = jnp.asarray(b)
        cin = cout

    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)

    # torch forward replicating torchvision alexnet.features with relu and
    # maxpool(3,2) after stages 0 and 1
    feats_t = []
    h = torch.from_numpy(x)
    with torch.no_grad():
        for i, conv in enumerate(convs):
            h = torch.relu(conv(h))
            feats_t.append(h.numpy())
            if i in (0, 1):
                h = torch.nn.functional.max_pool2d(h, 3, 2)

    feats_j = _alex_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats_j) == len(feats_t)
    for i, (a, b) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(np.asarray(a),
                                   b.transpose(0, 2, 3, 1),
                                   atol=1e-4, err_msg=f"stage {i}")


def test_superpoint_matches_torch(rng):
    """Our SuperPoint must equal the MagicLeap SuperPointNet topology
    (shared random weights): encoder convs with pools after 1b/2b/3b,
    65-way detector softmax + dustbin removal + pixel shuffle, descriptor
    head with L2 norm."""
    from splatloc_tpu.match import superpoint as sp

    params = sp.init_params(jax.random.PRNGKey(0), desc_dim=64)

    def t_conv(name, stride=1, pad=None):
        w = np.asarray(params[f"{name}_w"])          # HWIO
        b = np.asarray(params[f"{name}_b"])
        k = w.shape[0]
        conv = torch.nn.Conv2d(w.shape[2], w.shape[3], k, stride=stride,
                               padding=k // 2 if pad is None else pad)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(w, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(b))
        return conv

    img = rng.uniform(0, 1, (32, 40)).astype(np.float32)
    h = torch.from_numpy(img)[None, None]
    with torch.no_grad():
        for name, _ in sp._ENCODER:
            h = torch.relu(t_conv(name)(h))
            if name in sp._POOL_AFTER:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
        cPa = torch.relu(t_conv("convPa")(h))
        semi = t_conv("convPb", pad=0)(cPa)
        dense = torch.softmax(semi, dim=1)[:, :-1]     # drop dustbin
        hc, wc = dense.shape[2], dense.shape[3]
        nodust = dense.permute(0, 2, 3, 1).reshape(1, hc, wc, 8, 8)
        heat = nodust.permute(0, 1, 3, 2, 4).reshape(hc * 8, wc * 8).numpy()
        cDa = torch.relu(t_conv("convDa")(h))
        desc = t_conv("convDb", pad=0)(cDa)
        desc = desc / desc.norm(dim=1, keepdim=True)
        desc = desc[0].permute(1, 2, 0).numpy()

    scores_j, desc_j = sp.dense_outputs(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(scores_j), heat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(desc_j), desc, atol=1e-5)


def test_netvlad_vgg_trunk_matches_torch(rng):
    """The VGG16-conv5 trunk (no relu after conv5_3, hloc convention) must
    equal a torch build with shared weights."""
    from splatloc_tpu.match import netvlad as nv

    params = nv.init_params(jax.random.PRNGKey(1), whiten_dim=None)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)

    h = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        for name, _ in nv._VGG:
            if name == "pool":
                h = torch.nn.functional.max_pool2d(h, 2, 2)
                continue
            w = np.asarray(params[f"{name}_w"])
            conv = torch.nn.Conv2d(w.shape[2], w.shape[3], 3, padding=1)
            conv.weight.copy_(torch.from_numpy(np.transpose(w, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(np.asarray(params[f"{name}_b"])))
            h = conv(h)
            if name != "conv5_3":
                h = torch.relu(h)
        feat_t = h[0].permute(1, 2, 0).numpy()

    # jax trunk (reuse global_descriptor internals up to the feature map)
    import jax.numpy as jnp
    x = jnp.asarray(img)[None]
    for name, _ in nv._VGG:
        if name == "pool":
            import jax as _jax
            x = _jax.lax.reduce_window(x, -jnp.inf, _jax.lax.max,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            x = nv._conv(x, params[f"{name}_w"], params[f"{name}_b"])
            if name != "conv5_3":
                x = jax.nn.relu(x)
    np.testing.assert_allclose(np.asarray(x[0]), feat_t, atol=2e-4)
