import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core import transforms
from splatloc_tpu.match import (backproject_mask, frustum_key_points,
                                hungarian_solve, nearest_neighbor,
                                solve_pnp_ransac)


def test_hungarian_matches_scipy_cost(rng):
    """Auction assignment total cost must match scipy's optimum closely."""
    d1 = rng.normal(size=(32, 40)).astype(np.float32)
    d2 = rng.normal(size=(32, 60)).astype(np.float32)
    m_a, s_a = hungarian_solve(d1, d2)
    m_s, s_s = hungarian_solve(d1, d2, use_scipy=True)
    assert m_a.shape == m_s.shape == (2, 40)
    assert s_a.sum() >= s_s.sum() - 1e-2  # near-optimal total similarity


def test_hungarian_identity(rng):
    """Matching a descriptor set against itself must return the identity."""
    d = rng.normal(size=(16, 25)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    m, s = hungarian_solve(d, d)
    np.testing.assert_array_equal(m[0], m[1])
    assert (s > 0.99).all()


def test_hungarian_empty():
    m, s = hungarian_solve(np.zeros((16, 0)), np.zeros((16, 5)))
    assert m.shape == (2, 0)


def test_nearest_neighbor(rng):
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    q = np.asarray(pts[:5]) + 0.001
    d, i = nearest_neighbor(jnp.asarray(q), pts, jnp.ones(100, bool), block=32)
    np.testing.assert_array_equal(np.asarray(i), np.arange(5))
    assert (np.asarray(d) < 0.01).all()


def make_pnp_problem(rng, n=200, outlier_frac=0.3, noise=0.5):
    K = np.array([[320.0, 0, 320], [0, 320, 240], [0, 0, 1]], np.float32)
    pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(2, 6, n)], -1).astype(np.float32)
    xi = np.array([0.1, -0.2, 0.05, 0.1, -0.05, 0.08], np.float32)
    T = np.asarray(transforms.se3_exp(jnp.asarray(xi)))  # w2c
    cam = pts3d @ T[:3, :3].T + T[:3, 3]
    uv = cam[:, :2] / cam[:, 2:3] * np.array([K[0, 0], K[1, 1]]) + \
        np.array([K[0, 2], K[1, 2]])
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    uv[:n_out] += rng.uniform(50, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return uv.astype(np.float32), pts3d, K, T


def test_pnp_ransac_recovers_pose(rng):
    uv, pts3d, K, T_w2c = make_pnp_problem(rng)
    ret = solve_pnp_ransac(uv, pts3d, K, n_hypotheses=512)
    assert ret["success"]
    # compare to ground-truth c2w
    Rc2w = T_w2c[:3, :3].T
    tc2w = -Rc2w @ T_w2c[:3, 3]
    t_err = np.linalg.norm(ret["t"] - tc2w)
    cos = (np.trace(ret["r"].T @ Rc2w) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert t_err < 0.02, t_err       # < 2 cm
    assert r_err < 0.5, r_err        # < 0.5 deg
    assert ret["num_inliers"] > 100


def test_pnp_degenerate():
    ret = solve_pnp_ransac(np.zeros((3, 2), np.float32),
                           np.zeros((3, 3), np.float32),
                           np.eye(3, dtype=np.float32))
    assert not ret["success"]


def test_backproject_mask():
    K = np.array([[100.0, 0, 16], [0, 100, 12], [0, 0, 1]], np.float32)
    mask = np.zeros((24, 32), bool)
    mask[12, 16] = True   # principal point -> straight ahead
    depth = np.full((24, 32), 2.0, np.float32)
    c2w = np.eye(4, dtype=np.float32)
    pts = backproject_mask(mask, depth, K, c2w)
    np.testing.assert_allclose(pts, [[0, 0, 2.0]], atol=1e-6)


def test_frustum_key_points(rng):
    K = np.array([[100.0, 0, 16], [0, 100, 12], [0, 0, 1]], np.float32)
    xyz = np.stack([rng.uniform(-0.2, 0.2, 50), rng.uniform(-0.15, 0.15, 50),
                    rng.uniform(1.5, 2.5, 50)], -1).astype(np.float32)
    xyz[0] = [0, 0, -5.0]   # behind camera
    marker = np.full(50, 0.5, np.float32)
    marker[1] = 0.0          # not a key primitive
    w2c = np.eye(4, dtype=np.float32)
    p3, p2 = frustum_key_points(xyz, marker, w2c, K, 32, 24)
    assert p3.shape[0] == 48  # all except behind-camera and non-key
    # with snapping: db keypoint at a gaussian position snaps to it
    mask = np.zeros((24, 12 + 20), bool)
    mask[12, 16] = True
    depth = np.full((24, 32), float(xyz[2, 2]), np.float32)
    # place gaussian 2 exactly on the backprojected ray
    xyz[2] = [0, 0, xyz[2, 2]]
    p3s, p2s = frustum_key_points(xyz, marker, w2c, K, 32, 24,
                                  db_mask=mask, db_depth=depth,
                                  c2w=np.eye(4, dtype=np.float32))
    assert p3s.shape[0] == 1
    np.testing.assert_allclose(p3s[0], xyz[2], atol=1e-5)
