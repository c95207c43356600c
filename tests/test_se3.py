import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from racing_slam_tpu.ops import se3


def test_exp_log_roundtrip(rng):
    rvecs = rng.uniform(-2.5, 2.5, (64, 3)).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(rvecs))
    R_ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=2e-5)

    # log returns the principal value; compare as rotations, and as vectors
    # only where the input is already principal (|rvec| < pi).
    back = np.asarray(se3.log_so3(R))
    R_back = Rotation.from_rotvec(back).as_matrix()
    np.testing.assert_allclose(R_back, R_ref, atol=1e-4)
    principal = np.linalg.norm(rvecs, axis=-1) < np.pi - 1e-3
    np.testing.assert_allclose(back[principal], rvecs[principal], atol=2e-4)


def test_exp_small_angle():
    tiny = jnp.array([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]])
    R = se3.exp_so3(tiny)
    np.testing.assert_allclose(np.asarray(R), np.stack([np.eye(3)] * 2), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(se3.log_so3(R))))


def test_log_near_pi(rng):
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    rvec = (axis * (np.pi - 1e-4)).astype(np.float32)
    R = Rotation.from_rotvec(rvec).as_matrix().astype(np.float32)
    back = np.asarray(se3.log_so3(jnp.asarray(R)))
    # log is defined up to sign at pi; compare rotations, not vectors
    R_back = Rotation.from_rotvec(back).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=1e-2)


def test_pose_matrix_inverse_compose(rng):
    rvec = jnp.asarray(rng.uniform(-1, 1, (3,)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-2, 2, (3,)).astype(np.float32))
    T = se3.pose_matrix(rvec, t)
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)

    r2, t2 = se3.rt_from_matrix(T)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rvec), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_transform_and_center(rng):
    T = jnp.asarray(np.eye(4, dtype=np.float32))
    T = T.at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    X = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    Y = se3.transform_points(T, X)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(X) + np.array([1, 2, 3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.camera_center(T)), [-1, -2, -3], atol=1e-6)
