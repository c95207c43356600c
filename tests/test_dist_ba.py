"""Distributed BA on the virtual 8-device CPU mesh vs the single-chip solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from racing_slam_tpu.ops.ba import BAProblem, full_ba
from racing_slam_tpu.parallel.dist_ba import distributed_full_ba
from racing_slam_tpu.parallel.mesh import make_mesh
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene
from tests.test_ba import _make_rig, _problem_from_rig, _rvec


def _perturbed_problem(rng, n_points=128):
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(
        rng, n_cams=3, n_points=n_points
    )
    poses_pert = [p.copy() for p in poses]
    poses_pert[2][:3, 3] += np.float32([0.05, -0.03, 0.04])
    X_noisy = X + rng.normal(0, 0.02, X.shape).astype(np.float32)
    prob = _problem_from_rig(
        cam, poses_pert, X_noisy, obs_cam, obs_uv, obs_valid,
        cam_free=np.array([False, False, True]),
        point_free=np.ones(n_points, bool),
    )
    return cam, poses, X, prob


def test_distributed_matches_single_chip(rng):
    cam, poses, X, prob = _perturbed_problem(rng)
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh({"lm": 8})

    res_single = full_ba(cam, prob)
    res_dist = distributed_full_ba(cam, prob, mesh)

    # Same optimum up to reduction-order fp differences.
    np.testing.assert_allclose(
        np.asarray(res_dist.cam_t), np.asarray(res_single.cam_t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_dist.cam_rvec), np.asarray(res_single.cam_rvec), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_dist.points), np.asarray(res_single.points), atol=1e-3
    )
    assert int(res_dist.num_residuals) == int(res_single.num_residuals)
    # And the distributed result actually converged to the ground truth.
    np.testing.assert_allclose(
        np.asarray(res_dist.cam_t)[2], poses[2][:3, 3], atol=2e-3
    )


def test_distributed_respects_freeze(rng):
    cam, poses, X, prob = _perturbed_problem(rng)
    mesh = make_mesh({"lm": 8})
    res = distributed_full_ba(cam, prob, mesh)
    np.testing.assert_array_equal(
        np.asarray(res.cam_t)[:2], np.asarray(prob.cam_t)[:2]
    )


def test_indivisible_capacity_rejected(rng):
    cam, poses, X, prob = _perturbed_problem(rng, n_points=126)  # not /8
    mesh = make_mesh({"lm": 8})
    with pytest.raises(ValueError):
        distributed_full_ba(cam, prob, mesh)
