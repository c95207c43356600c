import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from racing_slam_tpu.ops import se3
from racing_slam_tpu.ops.ba import BAProblem, full_ba, motion_ba, structure_ba
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene


def _rvec(R):
    return Rotation.from_matrix(R).as_rotvec().astype(np.float32)


def _make_rig(rng, n_cams=3, n_points=80, O=4):
    """Cameras on a small arc all seeing the same cloud; every point observed
    by every camera (up to O)."""
    cam = default_camera()
    poses = []
    for i in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_rotvec([0, 0.05 * i, 0]).as_matrix()
        T[:3, 3] = [0.4 * i, 0.02 * i, 0.01 * i]
        poses.append(T)
    X = synthetic_scene(rng, n_points)
    obs_cam = np.zeros((n_points, O), np.int32)
    obs_uv = np.zeros((n_points, O, 2), np.float32)
    obs_valid = np.zeros((n_points, O), bool)
    for o in range(min(O, n_cams)):
        obs_cam[:, o] = o
        obs_uv[:, o] = project_np(cam, poses[o], X)
        obs_valid[:, o] = True
    return cam, poses, X, obs_cam, obs_uv, obs_valid


def test_motion_ba_recovers_pose(rng):
    cam = default_camera()
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = Rotation.from_rotvec([0.03, -0.1, 0.02]).as_matrix()
    T_gt[:3, 3] = [0.3, -0.1, 0.2]
    X = synthetic_scene(rng, 120)
    uv = project_np(cam, T_gt, X)

    # Perturb the pose, then optimize it back with points fixed.
    rv0 = _rvec(T_gt[:3, :3]) + np.float32([0.02, -0.015, 0.01])
    t0 = T_gt[:3, 3] + np.float32([0.05, -0.04, 0.06])
    res = motion_ba(cam, jnp.asarray(rv0), jnp.asarray(t0),
                    jnp.asarray(uv), jnp.asarray(X), jnp.ones(120, bool))
    np.testing.assert_allclose(np.asarray(res.rvec), _rvec(T_gt[:3, :3]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.t), T_gt[:3, 3], atol=1e-3)
    assert float(res.cost) < 1e-8


def test_motion_ba_huber_resists_outliers(rng):
    cam = default_camera()
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.2, 0.0, 0.1]
    X = synthetic_scene(rng, 150)
    uv = project_np(cam, T_gt, X)
    uv[:15] += rng.uniform(80, 200, (15, 2)).astype(np.float32)  # gross outliers

    rv0 = np.zeros(3, np.float32)
    t0 = T_gt[:3, 3] + np.float32([0.08, 0.05, -0.06])
    res = motion_ba(cam, jnp.asarray(rv0), jnp.asarray(t0),
                    jnp.asarray(uv), jnp.asarray(X), jnp.ones(150, bool),
                    huber_delta=2.45 / cam.fx)  # pixel-meaningful robust scale
    # Pose still recovered despite 10% corrupted observations.
    np.testing.assert_allclose(np.asarray(res.t), T_gt[:3, 3], atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.rvec), np.zeros(3), atol=2e-3)


def test_motion_ba_respects_valid_mask(rng):
    cam = default_camera()
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.1, 0.05, 0.0]
    X = synthetic_scene(rng, 100)
    uv = project_np(cam, T_gt, X)
    # Rows 50+ are garbage but masked out.
    uv[50:] = rng.uniform(0, 600, (50, 2)).astype(np.float32)
    valid = np.arange(100) < 50
    res = motion_ba(cam, jnp.zeros(3), jnp.zeros(3),
                    jnp.asarray(uv), jnp.asarray(X), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(res.t), T_gt[:3, 3], atol=1e-3)
    assert int(res.num_residuals) == 50


def _problem_from_rig(cam, poses, X, obs_cam, obs_uv, obs_valid,
                      cam_free, point_free, cam_in_problem=None,
                      point_in_problem=None):
    F = len(poses)
    rvecs = np.stack([_rvec(T[:3, :3]) for T in poses])
    ts = np.stack([T[:3, 3] for T in poses]).astype(np.float32)
    P = X.shape[0]
    return BAProblem(
        cam_rvec=jnp.asarray(rvecs), cam_t=jnp.asarray(ts),
        points=jnp.asarray(X),
        obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(obs_valid),
        cam_free=jnp.asarray(cam_free),
        cam_in_problem=jnp.asarray(
            np.ones(F, bool) if cam_in_problem is None else cam_in_problem),
        point_free=jnp.asarray(point_free),
        point_in_problem=jnp.asarray(
            np.ones(P, bool) if point_in_problem is None else point_in_problem),
    )


def test_full_ba_structure_only_recovers_points(rng):
    """Both cameras frozen, noisy points free -> converge to ground truth."""
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    X_noisy = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    prob = _problem_from_rig(cam, poses, X_noisy, obs_cam, obs_uv, obs_valid,
                             cam_free=np.zeros(3, bool),
                             point_free=np.ones(len(X), bool))
    # Points observed by free frames only enter; with no free frame the
    # reference adds nothing — here we explicitly mark all in-problem to test
    # the solver itself.
    res = full_ba(cam, prob)
    err = np.linalg.norm(np.asarray(res.points) - X, axis=-1)
    assert np.median(err) < 1e-3
    # Frozen cameras unchanged.
    np.testing.assert_array_equal(np.asarray(res.cam_rvec), np.asarray(prob.cam_rvec))
    np.testing.assert_array_equal(np.asarray(res.cam_t), np.asarray(prob.cam_t))


def test_full_ba_keyframe_semantics(rng):
    """Reference global-BA shape: all previous KFs frozen, newest free,
    points free (src/Slam.cpp:202-213). Newest pose + points must converge."""
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    poses_pert = [p.copy() for p in poses]
    poses_pert[2][:3, 3] += np.float32([0.06, -0.04, 0.05])
    R_p = Rotation.from_rotvec([0.01, 0.02, -0.01]).as_matrix() @ poses_pert[2][:3, :3]
    poses_pert[2][:3, :3] = R_p.astype(np.float32)
    X_noisy = X + rng.normal(0, 0.03, X.shape).astype(np.float32)

    prob = _problem_from_rig(cam, poses_pert, X_noisy, obs_cam, obs_uv, obs_valid,
                             cam_free=np.array([False, False, True]),
                             point_free=np.ones(len(X), bool))
    res = full_ba(cam, prob)
    np.testing.assert_allclose(np.asarray(res.cam_t)[2], poses[2][:3, 3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.cam_rvec)[2],
                               _rvec(poses[2][:3, :3]), atol=1e-3)
    err = np.linalg.norm(np.asarray(res.points) - X, axis=-1)
    assert np.median(err) < 5e-3
    # Frozen cameras must be bit-identical.
    np.testing.assert_array_equal(np.asarray(res.cam_t)[:2],
                                  np.stack([p[:3, 3] for p in poses_pert[:2]]))


def test_structure_ba_matches_full_ba(rng):
    """The single-free-camera fast path (structure_ba, used by the pipeline's
    keyframe BA) must agree with the generic Schur solver on the exact
    problem shape the pipeline builds (one free cam + free points)."""
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    poses_pert = [p.copy() for p in poses]
    poses_pert[2][:3, 3] += np.float32([0.06, -0.04, 0.05])
    X_noisy = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
    prob = _problem_from_rig(cam, poses_pert, X_noisy, obs_cam, obs_uv, obs_valid,
                             cam_free=np.array([False, False, True]),
                             point_free=np.ones(len(X), bool))
    res_f = full_ba(cam, prob)
    res_s = structure_ba(cam, prob, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(res_s.cam_t), np.asarray(res_f.cam_t),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_s.cam_rvec),
                               np.asarray(res_f.cam_rvec), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_s.points),
                               np.asarray(res_f.points), atol=1e-3)
    # And it converges to ground truth on its own.
    np.testing.assert_allclose(np.asarray(res_s.cam_t)[2], poses[2][:3, 3],
                               atol=2e-3)


def test_full_ba_frozen_points_anchor(rng):
    """optimize_points=False: only the free pose moves (motion-only via the
    full solver). Points bit-identical."""
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    poses_pert = [p.copy() for p in poses]
    poses_pert[2][:3, 3] += np.float32([0.05, 0.03, -0.04])
    prob = _problem_from_rig(cam, poses_pert, X, obs_cam, obs_uv, obs_valid,
                             cam_free=np.array([False, False, True]),
                             point_free=np.zeros(len(X), bool))
    res = full_ba(cam, prob)
    np.testing.assert_array_equal(np.asarray(res.points), X)
    np.testing.assert_allclose(np.asarray(res.cam_t)[2], poses[2][:3, 3], atol=1e-3)


def test_full_ba_out_of_problem_points_ignored(rng):
    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=3)
    # Corrupt observations of the excluded half; solver must not care.
    P = len(X)
    excl = np.arange(P) >= P // 2
    obs_uv_bad = obs_uv.copy()
    obs_uv_bad[excl] += 500.0
    prob = _problem_from_rig(cam, poses, X, obs_cam, obs_uv_bad, obs_valid,
                             cam_free=np.array([False, False, True]),
                             point_free=~excl, point_in_problem=~excl)
    res = full_ba(cam, prob)
    np.testing.assert_allclose(np.asarray(res.cam_t)[2], poses[2][:3, 3], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(res.points)[excl], X[excl])


def test_analytic_jacobians_match_autodiff(rng):
    """residual_and_jacobians must equal jacfwd of the packed residual."""
    import jax
    import jax.numpy as jnp

    from racing_slam_tpu.ops.ba import (
        _residual_packed,
        residual_and_jacobians,
    )

    fx, cx, cy = 400.0, 160.0, 120.0
    n = 64
    rv = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    X = jnp.asarray(synthetic_scene(rng, n))
    uv = jnp.asarray(rng.uniform(0, 300, (n, 2)).astype(np.float32))

    r, Jc, Jp = residual_and_jacobians(rv, tt, X, uv, fx, cx, cy)

    p9 = jnp.concatenate([rv, tt, X], axis=-1)
    res_fn = jax.vmap(lambda p, u: _residual_packed(p, u, fx, cx, cy))
    jac_fn = jax.vmap(jax.jacfwd(lambda p, u: _residual_packed(p, u, fx, cx, cy)))
    r_ref = res_fn(p9, uv)
    J_ref = jac_fn(p9, uv)

    # rtol: the scalar-expanded formulation associates f32 products in a
    # different order than autodiff of the matrix form.
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(J_ref[..., :6]),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(J_ref[..., 6:]),
                               atol=5e-5, rtol=1e-3)


def test_window_ba_matches_full_ba(rng):
    """window_ba with the free set {1, 2} must agree with the generic Schur
    solver given the same free mask, and leave frozen cameras bit-identical."""
    from racing_slam_tpu.ops.ba import window_ba

    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=4)
    poses_pert = [p.copy() for p in poses]
    for i in (2, 3):
        poses_pert[i][:3, 3] += rng.normal(0, 0.04, 3).astype(np.float32)
    X_noisy = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
    prob = _problem_from_rig(cam, poses_pert, X_noisy, obs_cam, obs_uv, obs_valid,
                             cam_free=np.array([False, False, True, True]),
                             point_free=np.ones(len(X), bool))
    res_f = full_ba(cam, prob)
    res_w = window_ba(cam, prob, jnp.asarray([3, 2, -1], jnp.int32))
    np.testing.assert_allclose(np.asarray(res_w.cam_t), np.asarray(res_f.cam_t),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_w.cam_rvec),
                               np.asarray(res_f.cam_rvec), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_w.points), np.asarray(res_f.points),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(res_w.cam_t)[:2],
                                  np.stack([p[:3, 3] for p in poses_pert[:2]]))


def test_window_ba_recovers_window_poses(rng):
    """Two perturbed newest cameras + noisy points -> converge to GT with the
    two oldest frozen as anchors."""
    from racing_slam_tpu.ops.ba import window_ba

    cam, poses, X, obs_cam, obs_uv, obs_valid = _make_rig(rng, n_cams=4)
    poses_pert = [p.copy() for p in poses]
    for i in (2, 3):
        poses_pert[i][:3, 3] += np.float32([0.05, -0.03, 0.04])
    X_noisy = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
    prob = _problem_from_rig(cam, poses_pert, X_noisy, obs_cam, obs_uv, obs_valid,
                             cam_free=np.zeros(4, bool),  # ignored by window_ba
                             point_free=np.ones(len(X), bool))
    res = window_ba(cam, prob, jnp.asarray([3, 2, -1], jnp.int32))
    for i in (2, 3):
        np.testing.assert_allclose(np.asarray(res.cam_t)[i], poses[i][:3, 3],
                                   atol=3e-3)
        np.testing.assert_allclose(np.asarray(res.cam_rvec)[i],
                                   _rvec(poses[i][:3, :3]), atol=2e-3)
    err = np.linalg.norm(np.asarray(res.points) - X, axis=-1)
    assert np.median(err) < 5e-3
