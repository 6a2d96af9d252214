"""Weight-conversion fire drill (VERDICT r4 #6).

test_converters.py proves the conversion MATH against torch forwards on
in-memory state_dicts; this drill proves the day-one OPERATIONAL path: a
checkpoint FILE with the exact upstream schema (torch.save of MagicLeap
superpoint_v1 keys / hloc NetVLAD keys / torchvision alexnet.features +
lpips lin-head keys, at the real layer shapes) -> the tools/convert_*.py
``main()`` entry points -> npz on disk -> the package loaders -> a real
pipeline call (SuperPoint extraction feeding the preprocess CLI, NetVLAD
retrieval, LPIPS inside a rendering report).

NetVLAD's whitening layer is schema-exact but width-reduced (512 instead
of hloc's 4096): the real Linear(32768->4096) alone is half a gigabyte,
and the converter path is shape-generic in that dimension.

Reference checkpoint consumers:
/root/reference/pre_process/extract_save_sp_feature.py:56-67 (superpoint),
/root/reference/pre_process/gen_netvlad_retrieval.py:15-42 (netvlad),
/root/reference/utils/eval_utils.py:12 (lpips alex).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")

SP_SHAPES = {  # real superpoint_v1.pth layer shapes: name -> (out, in, k)
    "conv1a": (64, 1, 3), "conv1b": (64, 64, 3),
    "conv2a": (64, 64, 3), "conv2b": (64, 64, 3),
    "conv3a": (128, 64, 3), "conv3b": (128, 128, 3),
    "conv4a": (128, 128, 3), "conv4b": (128, 128, 3),
    "convPa": (256, 128, 3), "convPb": (65, 256, 1),
    "convDa": (256, 128, 3), "convDb": (256, 256, 1),
}
VGG_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG_CHANS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
             (512, 512), (512, 512), (512, 512)]
ALEX = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
        (256, 256, 3)]


def _t(rng, *shape, scale=0.05):
    return torch.from_numpy(rng.normal(0, scale, shape).astype(np.float32))


def _run_converter(script, *args):
    r = subprocess.run([sys.executable, os.path.join(TOOLS, script), *args],
                       capture_output=True, text=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, (r.stdout, r.stderr)


def test_superpoint_checkpoint_file_drill(tmp_path, rng):
    sd = {}
    for name, (co, ci, k) in SP_SHAPES.items():
        sd[f"{name}.weight"] = _t(rng, co, ci, k, k)
        sd[f"{name}.bias"] = _t(rng, co, scale=0.02)
    src = str(tmp_path / "superpoint_v1.pth")
    dst = str(tmp_path / "superpoint.npz")
    torch.save(sd, src)

    _run_converter("convert_superpoint.py", src, dst)

    import jax.numpy as jnp
    from splatloc_tpu.match import superpoint
    params = superpoint.load_params(dst)
    img = jnp.asarray(rng.uniform(0, 1, (48, 64)).astype(np.float32))
    out = superpoint.extract(params, img, max_keypoints=64)
    kps = np.asarray(out["keypoints"])
    assert np.isfinite(kps).all()
    desc = np.asarray(out["descriptors"])
    assert desc.shape[0] == 256 and np.isfinite(desc).all()
    # descriptors are unit-norm in the reference descriptor space
    np.testing.assert_allclose(np.linalg.norm(desc, axis=0), 1.0, atol=1e-4)

    # converted file drives the real preprocess CLI end-to-end
    import yaml
    from splatloc_tpu.data import synthetic
    root = str(tmp_path / "scene")
    config = synthetic.generate(root, n_train=3, n_test=1, width=64,
                                height=48, n_gauss=50, n_landmarks=10,
                                desc_dim=256)
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    from splatloc_tpu.cli import preprocess
    preprocess.main(["extract-features", "--config", cfg_path,
                     "--superpoint", dst])
    score_dir = os.path.join(root, "generated", "scene", "score_map")
    scores = [f for f in os.listdir(score_dir) if f.endswith("_score.npy")]
    assert len(scores) >= 3
    assert np.isfinite(np.load(os.path.join(score_dir, scores[0]))).all()


def test_netvlad_checkpoint_file_drill(tmp_path, rng):
    K, wdim = 64, 512
    sd = {}
    for i, (ci, co) in zip(VGG_IDX, VGG_CHANS):
        sd[f"backbone.{i}.weight"] = _t(rng, co, ci, 3, 3)
        sd[f"backbone.{i}.bias"] = _t(rng, co, scale=0.02)
    sd["netvlad.score_proj.weight"] = _t(rng, K, 512, 1, 1, scale=0.2)
    sd["netvlad.score_proj.bias"] = _t(rng, K, scale=0.02)
    sd["netvlad.centers"] = _t(rng, 512, K, scale=0.3)
    sd["whiten.weight"] = _t(rng, wdim, K * 512, scale=0.02)
    sd["whiten.bias"] = _t(rng, wdim, scale=0.02)
    src = str(tmp_path / "netvlad.pth")
    dst = str(tmp_path / "netvlad.npz")
    torch.save(sd, src)

    _run_converter("convert_netvlad.py", src, dst)

    import jax.numpy as jnp
    from splatloc_tpu.match import netvlad
    params = netvlad.load_params(dst)
    imgs = [jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
            for _ in range(3)]
    descs = np.stack([np.asarray(netvlad.global_descriptor(params, im))
                      for im in imgs])
    assert descs.shape == (3, wdim) and np.isfinite(descs).all()
    np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0,
                               atol=1e-4)
    # retrieval: each image's own descriptor is its top-1
    idx, _ = netvlad.top_k_retrieval(jnp.asarray(descs), jnp.asarray(descs),
                                     k=2)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], [0, 1, 2])


def test_lpips_checkpoint_file_drill(tmp_path, rng, monkeypatch):
    alex_sd, lin_sd = {}, {}
    conv_idx = [0, 3, 6, 8, 10]
    for i, (co, ci, k) in enumerate(ALEX):
        alex_sd[f"{conv_idx[i]}.weight"] = _t(rng, co, ci, k, k)
        alex_sd[f"{conv_idx[i]}.bias"] = _t(rng, co, scale=0.02)
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.2, (1, co, 1, 1)).astype(np.float32))
    alex_src = str(tmp_path / "alex_features.pth")
    lin_src = str(tmp_path / "lins.pth")
    dst = str(tmp_path / "lpips_alex.npz")
    torch.save(alex_sd, alex_src)
    torch.save(lin_sd, lin_src)

    _run_converter("convert_lpips.py", dst, alex_src, lin_src)

    import jax.numpy as jnp
    from splatloc_tpu.eval import metrics
    params = metrics.load_lpips_params(dst)
    assert params is not None
    lp = metrics.lpips_fn(params)
    a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    b = jnp.clip(a + 0.1, 0, 1)
    va, vb = float(lp(a, b)), float(lp(a, a))
    assert np.isfinite(va) and va > vb >= 0.0

    # the converted file feeds the rendering-report path (the reference's
    # eval_rendering LPIPS column, utils/eval_utils.py:22-72)
    report = str(tmp_path / "eval_rendering.txt")
    metrics.write_rendering_report(report, 30.0, 0.9, va)
    txt = open(report).read()
    assert "mean_lpips" in txt and "UNAVAILABLE" not in txt
