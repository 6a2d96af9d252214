"""Hermetic end-to-end pipeline test: synthetic Replica-format dataset ->
scene mapping -> descriptor training -> pose evaluation (retrieval +
Hungarian + PnP), exercising the CLI-level orchestration."""
import os

import numpy as np
import pytest

from splatloc_tpu.data import synthetic


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    config = synthetic.generate(root, n_train=6, n_test=3, width=64,
                                height=48, n_gauss=250, n_landmarks=40,
                                desc_dim=64)
    return root, config


def test_dataset_loader_contract(dataset):
    from splatloc_tpu.data import load_dataset
    root, config = dataset
    train = load_dataset(config, train=True)
    test = load_dataset(config, train=False)
    assert len(train) == 2  # every 5th of 6 frames -> indices 0, 5
    assert len(test) == 3
    f = train.get_frame(0)
    assert f["rgb"].shape == (48, 64, 3)
    assert f["depth"].shape == (48, 64)
    assert f["valid"]
    assert "sp_kp_score" in f and f["sp_kp_score"].shape == (48, 64)
    assert np.isfinite(f["c2w"]).all()
    # depth quantization round-trips within 1mm
    assert f["depth"].max() > 1.0


def test_full_pipeline(dataset):
    root, config = dataset
    # denser keyframes for the tiny run
    config["Training"]["mapping_itr_num"] = 8

    from splatloc_tpu.cli import test as cli_test
    from splatloc_tpu.cli import train_decoder, train_gaussians
    from splatloc_tpu.cli.config import save_dir_for

    save_dir = save_dir_for(config)
    os.makedirs(save_dir, exist_ok=True)

    ply_path = train_gaussians.run(config, save_dir, capacity=8192,
                                   refinement_iters=30, log_every=0)
    assert os.path.exists(ply_path)

    # tiny cloud => one optimizer step per epoch; needs many epochs to
    # memorize the 40 random descriptors
    ckpt = train_decoder.run(config, save_dir, num_epochs=400)
    assert os.path.exists(ckpt)

    session = cli_test.EvalSession(config, save_dir)
    out = session.eval_rendering(max_frames=2)
    assert out["mean_psnr"] > 14.0, out

    m_t, m_r = session.eval_pose()
    assert len(m_t) >= 2, "most queries should localize"
    # toy-scale accuracy: the matched 3D points come from KD-snapped mapped
    # Gaussians (0.1m snap radius) at a 6x shorter focal than Replica, so
    # expect decimeter/sub-10-degree, not the centimeter regime of full runs
    assert np.median(m_t) < 0.5, m_t
    assert np.median(m_r) < 10.0, m_r
