import jax.numpy as jnp
import numpy as np

from splatloc_tpu.eval import metrics, selection


def test_psnr_masked():
    gt = jnp.ones((8, 8, 3)) * 0.5
    img = gt + 0.1
    p = float(metrics.psnr_masked(img, gt))
    np.testing.assert_allclose(p, 20.0, atol=0.01)
    # masked pixels (gt == 0) must not count
    gt2 = gt.at[0, :, :].set(0.0)
    img2 = img.at[0, :, :].set(0.9)
    np.testing.assert_allclose(float(metrics.psnr_masked(img2, gt2)), 20.0,
                               atol=0.01)


def test_pose_errors():
    from splatloc_tpu.core import transforms
    gt = np.eye(4, dtype=np.float32)
    th = np.deg2rad(5.0)
    R = np.asarray(transforms.so3_exp(jnp.asarray([0, 0, th])))
    t = np.array([0.1, 0, 0], np.float32)
    r_err, t_err = metrics.pose_errors(R, t, gt)
    np.testing.assert_allclose(r_err, 5.0, atol=1e-3)
    np.testing.assert_allclose(t_err, 0.1, atol=1e-6)


def test_report_formats(tmp_path):
    p1 = str(tmp_path / "eval_rendering.txt")
    metrics.write_rendering_report(p1, 30.0, 0.9, 0.1)
    txt = open(p1).read()
    assert "mean_psnr: 30.0" in txt and "mean_lpips: 0.1" in txt
    p2 = str(tmp_path / "eval_pose.txt")
    metrics.write_pose_report(p2, [0.01, 0.03], [0.5, 1.5], [0.005, 0.015],
                              [0.2, 0.6])
    txt = open(p2).read()
    assert "Retrieval: Trans.(cm): 2.0" in txt
    assert "Match    : Trans.(cm): 1.0" in txt


def test_rendering_report_marks_missing_lpips(tmp_path):
    """Without converted LPIPS weights the report carries an explicit
    marker — never a silent NaN column (reference writes a real value,
    utils/eval_utils.py:64-70)."""
    p = str(tmp_path / "eval_rendering.txt")
    metrics.write_rendering_report(p, 30.0, 0.9, None)
    txt = open(p).read()
    assert "mean_lpips: UNAVAILABLE" in txt
    assert "nan" not in txt.lower()


def _toy_views(n_views=6):
    """Cameras on a circle looking at the origin region."""
    K = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)
    w2cs = []
    for i in range(n_views):
        ang = 0.4 * (i - n_views / 2) / n_views
        c = np.array([2.0 * np.sin(ang), 0, -2.0 * np.cos(ang)], np.float32)
        # camera looks along +z toward origin: w2c = [R|t], x_cam = R x + t
        R = np.eye(3, dtype=np.float32)
        t = -R @ c
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        w2cs.append(w2c)
    return K, np.stack(w2cs)


def test_saliency_scores_prefer_consistent_points():
    K, w2cs = _toy_views()
    # depth maps: constant plane at z-distance 2 from each camera
    depths = np.full((w2cs.shape[0], 48, 64), 2.0, np.float32)
    # point A on the surface (depth-consistent), point B floating 0.2m off
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.2]], np.float32)
    scores = selection.saliency_scores(pts, w2cs, K, depths, view_chunk=4)
    assert scores[0] > scores[1]


def test_greedy_pick_spreads(rng):
    pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
    scores = rng.uniform(0, 1, 500).astype(np.float32)
    sel = selection.greedy_pick(pts, scores, 20, radius=4.0)
    assert sel.shape == (20, 3)
    # top-scored point must be selected first
    np.testing.assert_allclose(sel[0], pts[np.argmax(scores)])
    # selected points must be distinct
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-6
