import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdslam_v2_tpu.core import se3


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3))
    return se3.exp_so3(jnp.asarray(w, jnp.float32))


def test_exp_log_so3_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.uniform(-2.5, 2.5, size=(64, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    w2 = se3.log_so3(R)
    R2 = se3.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_exp_so3_small_angle():
    w = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)


def test_rotation_orthonormal():
    R = random_rotations(32)
    eye = jnp.eye(3)[None]
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye).repeat(32, 0), atol=1e-5
    )
    assert np.allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_exp_log_se3_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.uniform(-1.5, 1.5, size=(64, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    xi2 = se3.log_se3(T)
    T2 = se3.exp_se3(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=3e-5)


def test_se3_inverse_compose():
    rng = np.random.default_rng(3)
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    I = se3.compose(T, se3.inv(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4)[None].repeat(16, 0), atol=1e-5)


def test_apply_points():
    R = se3.exp_so3(jnp.array([0.0, 0.0, np.pi / 2], jnp.float32))
    T = se3.from_rt(R, jnp.array([0.5, -0.2, 0.1], jnp.float32))
    p = jnp.array([[1.0, 0.0, 0.0]])
    out = se3.apply(T, p)
    # 90 deg about z: (1,0,0) -> (0,1,0), plus translation
    np.testing.assert_allclose(np.asarray(out[0]), [0.5, 0.8, 0.1], atol=1e-5)


def test_quat_roundtrip_including_near_pi():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(100, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    angles = np.concatenate(
        [rng.uniform(0, np.pi, 50), np.full(50, np.pi - 1e-4)]
    ).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w * angles[:, None]))
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
    assert np.all(np.asarray(q)[:, 3] >= 0)


def test_quat_vs_scipy():
    scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
    rng = np.random.default_rng(5)
    w = rng.normal(size=(32, 3))
    R_ref = scipy_rot.from_rotvec(w).as_matrix().astype(np.float32)
    q_ref = scipy_rot.from_rotvec(w).as_quat()  # xyzw
    q_ref = q_ref * np.where(q_ref[:, 3:] < 0, -1.0, 1.0)
    q = np.asarray(se3.rot_to_quat(jnp.asarray(R_ref)))
    np.testing.assert_allclose(q, q_ref, atol=1e-4)


def test_relative_and_angles():
    A = se3.exp_se3(jnp.array([1.0, 0, 0, 0, 0, 0.3], jnp.float32))
    B = se3.exp_se3(jnp.array([1.0, 0, 0, 0, 0, 0.8], jnp.float32))
    rel = se3.relative(A, B)
    assert np.isclose(float(se3.rotation_angle(rel)), 0.5, atol=1e-5)


def test_jit_and_vmap():
    xi = jnp.ones((8, 6), jnp.float32) * 0.1
    f = jax.jit(jax.vmap(se3.exp_se3))
    T = f(xi)
    assert T.shape == (8, 4, 4)
