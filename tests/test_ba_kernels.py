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


# ---------------------------------------------------------------------------
# structure_ba kernel (single free camera + free points Schur LM)
# ---------------------------------------------------------------------------

from racing_slam_tpu.ops.ba import BAProblem, structure_ba
from racing_slam_tpu.ops.pallas.structure_ba_kernel import (
    pack_structure_problem,
    structure_ba_planes,
    unpack_points,
)
from tests.test_ba import _make_rig, _problem_from_rig


def _run_pallas_structure(cam, prob, free_slot, max_iters=10,
                          huber_delta=float(jnp.sqrt(5.991))):
    P, O = prob.obs_cam.shape
    pose0, obs, pts, _ = pack_structure_problem(cam, prob,
                                                jnp.int32(free_slot))
    out_pose, out_pts = structure_ba_planes(
        pose0, obs, pts, O, max_iters, huber_delta, 1e-6, interpret=True
    )
    return out_pose, unpack_points(out_pts, P)


def _perturbed_rig(rng):
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    poses_pert = [p.copy() for p in poses]
    poses_pert[2][:3, 3] += np.float32([0.06, -0.04, 0.05])
    R_p = (Rotation.from_rotvec([0.01, 0.02, -0.01]).as_matrix()
           @ poses_pert[2][:3, :3])
    poses_pert[2][:3, :3] = R_p.astype(np.float32)
    X_noisy = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
    prob = _problem_from_rig(cam, poses_pert, X_noisy, obs_cam, obs_uv,
                             obs_valid,
                             cam_free=np.array([False, False, True]),
                             point_free=np.ones(len(X), bool))
    return cam, poses, X, prob


def test_structure_kernel_matches_xla(rng):
    cam, poses, X, prob = _perturbed_rig(rng)
    ref = structure_ba(cam, prob, jnp.int32(2), backend="xla")
    out_pose, out_X = _run_pallas_structure(cam, prob, 2)
    np.testing.assert_allclose(np.asarray(out_pose[:3]),
                               np.asarray(ref.cam_rvec)[2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pose[3:6]),
                               np.asarray(ref.cam_t)[2], atol=1e-4)
    assert float(out_pose[6]) <= float(ref.cost) * 1.01 + 1e-10
    err = np.linalg.norm(out_X - np.asarray(ref.points), axis=-1)
    assert np.median(err) < 1e-4


def test_structure_kernel_recovers_truth(rng):
    cam, poses, X, prob = _perturbed_rig(rng)
    out_pose, out_X = _run_pallas_structure(cam, prob, 2)
    np.testing.assert_allclose(np.asarray(out_pose[3:6]), poses[2][:3, 3],
                               atol=2e-3)
    err = np.linalg.norm(out_X - X, axis=-1)
    assert np.median(err) < 5e-3


def test_structure_kernel_respects_freeze_masks(rng):
    cam, poses, X, prob = _perturbed_rig(rng)
    frozen = np.zeros(len(X), bool)
    frozen[:20] = True  # freeze the first 20 points
    prob = prob._replace(point_free=jnp.asarray(~frozen))
    out_pose, out_X = _run_pallas_structure(cam, prob, 2)
    np.testing.assert_array_equal(out_X[:20], np.asarray(prob.points)[:20])
    # The rest still move (non-zero update on noisy points).
    assert np.linalg.norm(out_X[20:] - np.asarray(prob.points)[20:]) > 1e-4


def test_structure_kernel_dispatch_through_ba(rng):
    """The structure_ba(backend=...) result plumbing: full cam arrays with
    only the free slot updated, points unpacked to [P, 3]."""
    cam, poses, X, prob = _perturbed_rig(rng)
    # interpret-mode kernel via direct call; dispatch path itself is XLA on
    # CPU, so drive the pallas branch explicitly through the packers above
    # and compare container shapes from the xla branch.
    ref = structure_ba(cam, prob, jnp.int32(2), backend="xla")
    assert ref.cam_rvec.shape == prob.cam_rvec.shape
    assert ref.points.shape == prob.points.shape
    np.testing.assert_array_equal(np.asarray(ref.cam_t)[:2],
                                  np.asarray(prob.cam_t)[:2])
