"""Parity of the fused Pallas LM kernels vs the XLA solvers (interpret mode).

The Pallas kernels must be drop-in replacements: same residual, same Huber
IRLS, same lambda schedule and stopping rule as ops.ba. These tests run the
kernels in interpreter mode on CPU and compare against the XLA while_loop
implementations on identical problems.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from racing_slam_tpu.ops.ba import motion_ba
from racing_slam_tpu.ops.pallas.motion_ba_kernel import (
    motion_ba_planes,
    pack_motion_planes,
)
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene


def _run_pallas_motion(cam, rv0, t0, uv, X, valid, max_iters=10,
                       huber_delta=float(jnp.sqrt(5.991))):
    data = pack_motion_planes(cam, jnp.asarray(uv), jnp.asarray(X),
                              jnp.asarray(valid))
    pose0 = jnp.concatenate(
        [jnp.asarray(rv0, jnp.float32), jnp.asarray(t0, jnp.float32),
         jnp.asarray([1e-4, 0.0], jnp.float32)]
    )
    return motion_ba_planes(pose0, data, max_iters, huber_delta, 1e-6,
                            interpret=True)


def _problem(rng, n=150, outliers=0):
    cam = default_camera()
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = Rotation.from_rotvec([0.03, -0.1, 0.02]).as_matrix()
    T_gt[:3, 3] = [0.3, -0.1, 0.2]
    X = synthetic_scene(rng, n)
    uv = project_np(cam, T_gt, X)
    if outliers:
        uv[:outliers] += rng.uniform(80, 200, (outliers, 2)).astype(np.float32)
    rv0 = Rotation.from_matrix(T_gt[:3, :3]).as_rotvec().astype(np.float32)
    rv0 += np.float32([0.02, -0.015, 0.01])
    t0 = T_gt[:3, 3] + np.float32([0.05, -0.04, 0.06])
    return cam, T_gt, X, uv, rv0, t0


def test_motion_kernel_matches_xla(rng):
    cam, T_gt, X, uv, rv0, t0 = _problem(rng)
    valid = np.ones(len(X), bool)
    ref = motion_ba(cam, jnp.asarray(rv0), jnp.asarray(t0), jnp.asarray(uv),
                    jnp.asarray(X), jnp.asarray(valid), backend="xla")
    out = _run_pallas_motion(cam, rv0, t0, uv, X, valid)
    # Both converge to the same optimum (exact float equality is not expected:
    # reduction orders differ).
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(ref.rvec),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[3:6]), np.asarray(ref.t),
                               atol=1e-4)
    assert float(out[6]) <= float(ref.cost) * 1.01 + 1e-10


def test_motion_kernel_recovers_pose(rng):
    cam, T_gt, X, uv, rv0, t0 = _problem(rng)
    out = _run_pallas_motion(cam, rv0, t0, uv, X, np.ones(len(X), bool))
    rv_gt = Rotation.from_matrix(T_gt[:3, :3]).as_rotvec()
    np.testing.assert_allclose(np.asarray(out[:3]), rv_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[3:6]), T_gt[:3, 3], atol=1e-3)
    assert float(out[6]) < 1e-8


def test_motion_kernel_huber_and_mask(rng):
    cam, T_gt, X, uv, rv0, t0 = _problem(rng, n=150, outliers=15)
    valid = np.ones(len(X), bool)
    out = _run_pallas_motion(cam, rv0, t0, uv, X, valid,
                             huber_delta=2.45 / cam.fx)
    np.testing.assert_allclose(np.asarray(out[3:6]), T_gt[:3, 3], atol=5e-3)
    # Masking the outliers entirely gives an exact fit.
    valid[:15] = False
    out2 = _run_pallas_motion(cam, rv0, t0, uv, X, valid)
    assert float(out2[6]) < 1e-8


def test_motion_kernel_all_invalid_is_identity(rng):
    cam, T_gt, X, uv, rv0, t0 = _problem(rng, n=64)
    out = _run_pallas_motion(cam, rv0, t0, uv, X, np.zeros(len(X), bool))
    np.testing.assert_allclose(np.asarray(out[:3]), rv0, atol=0)
    np.testing.assert_allclose(np.asarray(out[3:6]), t0, atol=0)
