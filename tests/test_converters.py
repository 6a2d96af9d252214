"""Weight-converter golden-fixture tests (VERDICT r2 #6).

No pretrained checkpoints exist in this zero-egress image, so each test
synthesizes a torch state_dict with the EXACT reference layout (MagicLeap
superpoint_v1 keys, hloc NetVLAD keys, torchvision alexnet.features + lpips
lin-head keys), runs the in-repo converter on it, and asserts the JAX
forward with the converted weights matches an independent torch forward on
the same inputs — upgrading "converter exists" to "converter proven".

The last test exercises the reference 0.4 cosine threshold
(utils/match_utils.py:16) with SuperPoint-like descriptor statistics
(unit-norm 256-d; true matches ~0.7 sim, background ~N(0, 1/16)).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")  # converters live in tools/ (not a package)
import convert_lpips  # noqa: E402
import convert_netvlad  # noqa: E402
import convert_superpoint  # noqa: E402


def _t(rng, *shape, scale=0.05):
    return torch.from_numpy(rng.normal(0, scale, shape).astype(np.float32))


def test_superpoint_converter_round_trip(rng):
    """superpoint_v1.pth layout (MagicLeap names, OIHW convs) -> converter
    -> our JAX forward == torch forward at the real layer shapes."""
    from splatloc_tpu.match import superpoint as sp

    shapes = {  # name -> (out, in, k)
        "conv1a": (64, 1, 3), "conv1b": (64, 64, 3),
        "conv2a": (64, 64, 3), "conv2b": (64, 64, 3),
        "conv3a": (128, 64, 3), "conv3b": (128, 128, 3),
        "conv4a": (128, 128, 3), "conv4b": (128, 128, 3),
        "convPa": (256, 128, 3), "convPb": (65, 256, 1),
        "convDa": (256, 128, 3), "convDb": (256, 256, 1),
    }
    sd = {}
    for name, (co, ci, k) in shapes.items():
        sd[f"{name}.weight"] = _t(rng, co, ci, k, k)
        sd[f"{name}.bias"] = _t(rng, co, scale=0.02)

    params = {k: jnp.asarray(v) for k, v in
              convert_superpoint.convert(sd).items()}

    img = rng.uniform(0, 1, (32, 40)).astype(np.float32)

    def conv(h, name, pad):
        w, b = sd[f"{name}.weight"], sd[f"{name}.bias"]
        return torch.nn.functional.conv2d(h, w, b, padding=pad)

    h = torch.from_numpy(img)[None, None]
    with torch.no_grad():
        for name, _ in sp._ENCODER:
            h = torch.relu(conv(h, name, 1))
            if name in sp._POOL_AFTER:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
        semi = conv(torch.relu(conv(h, "convPa", 1)), "convPb", 0)
        dense = torch.softmax(semi, dim=1)[:, :-1]
        hc, wc = dense.shape[2], dense.shape[3]
        heat = (dense.permute(0, 2, 3, 1).reshape(1, hc, wc, 8, 8)
                .permute(0, 1, 3, 2, 4).reshape(hc * 8, wc * 8).numpy())
        desc = conv(torch.relu(conv(h, "convDa", 1)), "convDb", 0)
        desc = desc / desc.norm(dim=1, keepdim=True)
        desc = desc[0].permute(1, 2, 0).numpy()

    scores_j, desc_j = sp.dense_outputs(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(scores_j), heat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(desc_j), desc, atol=1e-5)


def test_netvlad_converter_round_trip(rng):
    """hloc NetVLAD layout (backbone.N.* VGG16 conv indices,
    netvlad.score_proj / centers [D, K], whiten Linear) -> converter -> our
    global_descriptor == torch forward."""
    from splatloc_tpu.match import netvlad as nv

    vgg_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
    K, wdim = 64, 32
    sd = {}
    for i, (ci, co) in zip(vgg_idx, chans):
        sd[f"backbone.{i}.weight"] = _t(rng, co, ci, 3, 3)
        sd[f"backbone.{i}.bias"] = _t(rng, co, scale=0.02)
    sd["netvlad.score_proj.weight"] = _t(rng, K, 512, 1, 1, scale=0.2)
    sd["netvlad.score_proj.bias"] = _t(rng, K, scale=0.02)
    sd["netvlad.centers"] = _t(rng, 512, K, scale=0.3)
    sd["whiten.weight"] = _t(rng, wdim, K * 512, scale=0.02)
    sd["whiten.bias"] = _t(rng, wdim, scale=0.02)

    params = {k: jnp.asarray(v) for k, v in
              convert_netvlad.convert(sd).items()}

    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)

    h = torch.from_numpy(img.transpose(2, 0, 1))[None]
    pool_before = {5, 10, 17, 24}   # VGG16 pool positions (before these)
    with torch.no_grad():
        for i in vgg_idx:
            if i in pool_before:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
            h = torch.nn.functional.conv2d(
                h, sd[f"backbone.{i}.weight"], sd[f"backbone.{i}.bias"],
                padding=1)
            if i != vgg_idx[-1]:          # hloc: no relu after conv5_3
                h = torch.relu(h)
        feat = torch.nn.functional.normalize(h, dim=1)          # [1,512,h,w]
        a = torch.nn.functional.conv2d(
            feat, sd["netvlad.score_proj.weight"],
            sd["netvlad.score_proj.bias"])
        a = torch.softmax(a, dim=1)                             # [1,K,h,w]
        f = feat[0].reshape(512, -1)                            # [512, M]
        aM = a[0].reshape(K, -1)                                # [K, M]
        centers = sd["netvlad.centers"]                         # [512, K]
        vlad = aM @ f.T - aM.sum(1)[:, None] * centers.T        # [K, 512]
        vlad = torch.nn.functional.normalize(vlad, dim=1)
        v = torch.nn.functional.normalize(vlad.reshape(-1), dim=0)
        v = sd["whiten.weight"] @ v + sd["whiten.bias"]
        v = torch.nn.functional.normalize(v, dim=0).numpy()

    v_j = nv.global_descriptor(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(v_j), v, atol=2e-4)


def test_lpips_converter_round_trip(rng):
    """torchvision alexnet.features + lpips lin-head layout -> converter ->
    our lpips_fn == the torch LPIPS formula (normalize, squared diff,
    1x1 lin weighting, spatial mean, stage sum)."""
    from splatloc_tpu.eval.metrics import _ALEX_CFG, _SCALE, _SHIFT, lpips_fn

    conv_idx = convert_lpips._CONV_IDX
    cin = 3
    alex_sd, lins = {}, {}
    for i, (cout, k, s, p) in enumerate(_ALEX_CFG):
        alex_sd[f"{conv_idx[i]}.weight"] = _t(rng, cout, cin, k, k)
        alex_sd[f"{conv_idx[i]}.bias"] = _t(rng, cout, scale=0.02)
        lins[f"lin{i}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.2, (1, cout, 1, 1)).astype(np.float32))
        cin = cout

    params = {k: jnp.asarray(v) for k, v in
              convert_lpips.convert(alex_sd, lins).items()}

    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    def feats_torch(x):
        h = torch.from_numpy(
            ((x * 2 - 1 - _SHIFT) / _SCALE).transpose(2, 0, 1))[None]
        out = []
        for i, (cout, k, s, p) in enumerate(_ALEX_CFG):
            h = torch.relu(torch.nn.functional.conv2d(
                h, alex_sd[f"{conv_idx[i]}.weight"],
                alex_sd[f"{conv_idx[i]}.bias"], stride=s, padding=p))
            out.append(h)
            if i in (0, 1):
                h = torch.nn.functional.max_pool2d(h, 3, 2)
        return out

    with torch.no_grad():
        total = 0.0
        for i, (fa, fb) in enumerate(zip(feats_torch(a), feats_torch(b))):
            an = fa / fa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            bn = fb / fb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            d = (an - bn) ** 2 * lins[f"lin{i}.model.1.weight"]
            total += float(d.sum(dim=1).mean())

    got = float(lpips_fn(params)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, total, rtol=1e-4)


def test_match_chain_superpoint_statistics(rng):
    """The retrieval->match->PnP chain at the reference 0.4 cosine threshold
    with realistic descriptor statistics: unit-norm 256-d, true matches at
    ~0.7 cosine, background pairs ~N(0, 1/sqrt(256)). The threshold must
    kill background assignments while true matches survive and PnP recovers
    the pose (utils/match_utils.py:16, test.py:304-377)."""
    from splatloc_tpu.match.hungarian import hungarian_solve
    from splatloc_tpu.match.pnp import solve_pnp_ransac

    D, n_true, n_distract = 256, 60, 40
    base = rng.normal(0, 1, (n_true, D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    def perturb(x, cos_target):
        n = rng.normal(0, 1, x.shape).astype(np.float32)
        n -= (n * x).sum(1, keepdims=True) * x
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        return cos_target * x + np.sqrt(1 - cos_target ** 2) * n

    # query = 2D side (true + distractors), train = 3D side (true only)
    q = np.concatenate([perturb(base, 0.7),
                        rng.normal(0, 1, (n_distract, D)).astype(np.float32)])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = base

    # background stats sanity: random unit 256-d pairs almost never reach 0.4
    bg = q[n_true:] @ t.T
    assert np.abs(bg).max() < 0.4, np.abs(bg).max()

    matches, sims = hungarian_solve(q.T, t.T, sim_thresh=0.4)
    kept = sims > 0.0            # zeroed-below-threshold pairs drop out
    assert kept.sum() >= 0.95 * n_true
    correct = matches[0][kept] == matches[1][kept]
    assert correct.mean() > 0.95, correct.mean()
    # every surviving similarity is a true-match similarity, not background
    assert sims[kept].min() >= 0.4

    # 3D points + camera; PnP on the surviving matches recovers the pose
    pts3d = rng.uniform(-1, 1, (n_true, 3)).astype(np.float32)
    pts3d[:, 2] += 4.0
    K = np.array([[320.0, 0, 160], [0, 320, 120], [0, 0, 1]], np.float32)
    Rz = np.array([[np.cos(0.1), -np.sin(0.1), 0],
                   [np.sin(0.1), np.cos(0.1), 0], [0, 0, 1]], np.float32)
    t_w2c = np.array([0.1, -0.05, 0.2], np.float32)
    pc = pts3d @ Rz.T + t_w2c
    uv = (pc @ K.T)[:, :2] / (pc @ K.T)[:, 2:3]

    mk = matches[:, kept & (matches[0] < n_true)]
    ret = solve_pnp_ransac(uv[mk[0]].astype(np.float32), pts3d[mk[1]], K,
                           n_hypotheses=256)
    assert ret["success"]
    Rc2w, tc2w = Rz.T, -Rz.T @ t_w2c
    assert np.linalg.norm(ret["t"] - tc2w) < 0.02
    cos = (np.trace(ret["r"].T @ Rc2w) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
