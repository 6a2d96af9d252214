"""Full-protocol CLI integration test (reference replica.sh:1-7).

Drives the REAL command-line entry points — argparse and all — over a
hermetic synthetic Replica-format dataset with randomly initialised
SuperPoint/NetVLAD weights (the zero-egress stand-in for the pretrained
checkpoints, see weights/README.md):

    preprocess extract-features / gen-retrieval / gen-fusion
    -> train_gaussians -> train_decoder
    -> test --eval_pose --eval_rendering --eval_selection

and asserts the three eval artifacts (test.py:506-513,
utils/eval_utils.py:64-70) exist and parse with finite medians. Accuracy is
NOT asserted: random-weight descriptors carry no calibrated metric space;
this test pins the end-to-end artifact contract, not the numbers.
"""
import os
import re

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def _parse_pose_report(path):
    txt = open(path).read()
    # two rows (Retrieval, Match) x two numbers
    flat = [float(x) for pair in re.findall(
        r"Trans\.\(cm\): ([-\d.e+]+)\. Rotation\(deg\): ([-\d.e+]+)\.", txt)
        for x in pair]
    assert len(flat) == 4, txt
    return flat


def test_full_cli_protocol(tmp_path):
    import jax
    from splatloc_tpu.data import synthetic
    from splatloc_tpu.match import netvlad, superpoint

    root = str(tmp_path)
    config = synthetic.generate(root, n_train=6, n_test=2, width=64,
                                height=48, n_gauss=200, n_landmarks=30,
                                desc_dim=256)
    # small iteration counts for the hermetic run
    config["Training"]["init_itr_num"] = 20
    config["Training"]["mapping_itr_num"] = 8
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    # random-init network weights in the converters' npz format
    sp_path = os.path.join(root, "superpoint.npz")
    nv_path = os.path.join(root, "netvlad.npz")
    np.savez(sp_path, **{k: np.asarray(v) for k, v in
                         superpoint.init_params(jax.random.key(0)).items()})
    np.savez(nv_path, **{k: np.asarray(v) for k, v in
                         netvlad.init_params(jax.random.key(1)).items()})

    from splatloc_tpu.cli import preprocess
    preprocess.main(["extract-features", "--config", cfg_path,
                     "--superpoint", sp_path])
    preprocess.main(["gen-retrieval", "--config", cfg_path,
                     "--netvlad", nv_path])
    preprocess.main(["gen-fusion", "--config", cfg_path,
                     "--superpoint", sp_path, "--voxel_size", "0.08"])
    gen = os.path.join(root, "generated", "scene")
    assert os.path.exists(os.path.join(gen, "netvlad_retrieval.txt"))
    assert os.path.exists(os.path.join(gen, "sp_inloc_pc.ply"))
    assert os.path.exists(os.path.join(gen, "sp_inloc_feat.npy"))
    assert os.path.exists(os.path.join(gen, "mesh.ply"))

    from splatloc_tpu.cli import train_gaussians
    train_gaussians.main(["--config", cfg_path, "--capacity", "8192",
                          "--refinement_iters", "20"])
    from splatloc_tpu.cli.config import save_dir_for
    save_dir = save_dir_for(config)
    ply_path = os.path.join(save_dir, "point_cloud", "final",
                            "point_cloud.ply")
    assert os.path.exists(ply_path)

    from splatloc_tpu.cli import train_decoder
    train_decoder.main(["--config", cfg_path, "--num_epochs", "60"])
    assert os.path.exists(os.path.join(save_dir, "train_feat", "ckpt.npz"))

    from splatloc_tpu.cli import test as cli_test
    cli_test.main(["--config", cfg_path, "--eval_pose", "--eval_rendering",
                   "--eval_selection", "--landmark_num", "20"])

    # the three artifact files of the reference protocol
    pose_file = os.path.join(save_dir, "eval_pose.txt")
    rend_file = os.path.join(save_dir, "eval_rendering.txt")
    sel_file = os.path.join(save_dir, "eval_selection_20.txt")
    for p in (pose_file, rend_file, sel_file):
        assert os.path.exists(p), p

    for p in (pose_file, sel_file):
        flat = _parse_pose_report(p)
        assert all(np.isfinite(v) for v in flat), (p, flat)

    txt = open(rend_file).read()
    m = re.search(r"mean_psnr: ([-\d.e+]+)", txt)
    s = re.search(r"mean_ssim: ([-\d.e+]+)", txt)
    assert m and s, txt
    assert np.isfinite(float(m.group(1))) and float(m.group(1)) > 10.0
    assert np.isfinite(float(s.group(1)))
    assert "mean_lpips:" in txt  # present, UNAVAILABLE without weights
