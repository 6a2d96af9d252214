import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core import transforms as tf


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    R = tf.quat_to_matrix(jnp.asarray(q))
    q2 = tf.matrix_to_quat(R)
    # quaternion double cover: q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotation_matrix_orthonormal(rng):
    q = random_quats(rng, 32)
    R = np.asarray(tf.quat_to_matrix(jnp.asarray(q)))
    eye = np.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
    R = tf.so3_exp(jnp.asarray(w))
    w2 = tf.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
    R = tf.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)


def test_se3_exp_inverse(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32) * 0.5
    T = tf.se3_exp(jnp.asarray(xi))
    Tinv = tf.invert_se3(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4)[None].repeat(8, 0),
                               atol=1e-5)


def test_quat_angle():
    a = jnp.array([1.0, 0, 0, 0])
    th = np.deg2rad(30.0)
    b = jnp.array([np.cos(th / 2), np.sin(th / 2), 0, 0], dtype=jnp.float32)
    ang = tf.quat_angle_deg(a, b)
    np.testing.assert_allclose(float(ang), 30.0, atol=1e-3)
    # double cover
    ang2 = tf.quat_angle_deg(a, -b)
    np.testing.assert_allclose(float(ang2), 30.0, atol=1e-3)


def test_rotation_6d(rng):
    q = random_quats(rng, 16)
    R = tf.quat_to_matrix(jnp.asarray(q))
    d6 = jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)
    R2 = tf.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = tf.se3_exp(jnp.asarray(xi))
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = tf.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_se3_log_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(5):
        xi = jnp.asarray(rng.normal(scale=0.7, size=6).astype(np.float32))
        T = tf.se3_exp(xi)
        xi_back = tf.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi),
                                   atol=2e-5, rtol=1e-4)
    # small-angle branch
    xi = jnp.asarray([1e-9, -2e-9, 1e-9, 1e-10, 0.0, -1e-10])
    np.testing.assert_allclose(
        np.asarray(tf.se3_log(tf.se3_exp(xi))),
        np.asarray(xi), atol=1e-12)
