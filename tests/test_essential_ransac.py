import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from racing_slam_tpu.ops import camera as cam_ops
from racing_slam_tpu.ops.essential import decompose, eight_point, sampson_error_sq
from racing_slam_tpu.ops.ransac import estimate_relative_pose
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene


def _relative_setup(rng, n=300, rot=0.1, trans=(1.0, 0.1, 0.05)):
    cam = default_camera()
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[:3, :3] = Rotation.from_rotvec([0, rot, 0]).as_matrix()
    pose2[:3, 3] = trans
    X = synthetic_scene(rng, n)
    uv1 = project_np(cam, pose1, X)
    uv2 = project_np(cam, pose2, X)
    return cam, pose1, pose2, X, uv1, uv2


def test_eight_point_noise_free(rng):
    cam, pose1, pose2, X, uv1, uv2 = _relative_setup(rng)
    x1 = cam_ops.normalize_pixels(cam, jnp.asarray(uv1))
    x2 = cam_ops.normalize_pixels(cam, jnp.asarray(uv2))
    w = jnp.ones(len(uv1))
    E = eight_point(x1, x2, w)
    err = np.asarray(sampson_error_sq(E, x1, x2))
    # Noise-free correspondences should have ~zero Sampson error.
    assert np.median(np.sqrt(err)) * cam.fx < 0.05  # px


def test_decompose_contains_truth(rng):
    cam, pose1, pose2, X, uv1, uv2 = _relative_setup(rng)
    x1 = cam_ops.normalize_pixels(cam, jnp.asarray(uv1))
    x2 = cam_ops.normalize_pixels(cam, jnp.asarray(uv2))
    E = eight_point(x1, x2, jnp.ones(len(uv1)))
    Rs, ts = decompose(E)
    R_true = pose2[:3, :3]
    t_true = pose2[:3, 3] / np.linalg.norm(pose2[:3, 3])
    best_r = min(np.linalg.norm(np.asarray(R) - R_true) for R in Rs)
    best_t = min(
        min(np.linalg.norm(np.asarray(t) - t_true), np.linalg.norm(np.asarray(t) + t_true))
        for t in ts
    )
    assert best_r < 5e-2
    assert best_t < 5e-2


def test_ransac_with_outliers(rng):
    cam, pose1, pose2, X, uv1, uv2 = _relative_setup(rng, n=400)
    uv2_corrupt = uv2.copy()
    out_idx = rng.choice(400, 120, replace=False)
    uv2_corrupt[out_idx] = rng.uniform(0, 600, (120, 2)).astype(np.float32)
    mask = np.ones(400, bool)

    est = estimate_relative_pose(
        cam, jnp.asarray(uv1), jnp.asarray(uv2_corrupt), jnp.asarray(mask),
        jax.random.PRNGKey(0),
    )
    inl = np.asarray(est.inliers)
    # Outlier rows must be rejected, most clean rows kept.
    assert inl[out_idx].mean() < 0.05
    clean = np.setdiff1d(np.arange(400), out_idx)
    assert inl[clean].mean() > 0.8

    # Pose correct: rotation close, translation direction close (unit scale).
    pose = np.asarray(est.pose)
    R_err = np.linalg.norm(pose[:3, :3] - pose2[:3, :3])
    t_est = pose[:3, 3] / np.linalg.norm(pose[:3, 3])
    t_true = pose2[:3, 3] / np.linalg.norm(pose2[:3, 3])
    assert R_err < 0.02
    assert np.linalg.norm(t_est - t_true) < 0.05


def test_ransac_respects_padding(rng):
    cam, pose1, pose2, X, uv1, uv2 = _relative_setup(rng, n=200)
    pad = 56
    uv1p = np.concatenate([uv1, np.zeros((pad, 2), np.float32)])
    uv2p = np.concatenate([uv2, np.zeros((pad, 2), np.float32)])
    mask = np.concatenate([np.ones(200, bool), np.zeros(pad, bool)])
    est = estimate_relative_pose(
        cam, jnp.asarray(uv1p), jnp.asarray(uv2p), jnp.asarray(mask),
        jax.random.PRNGKey(1),
    )
    assert not np.asarray(est.inliers)[200:].any()
    assert int(est.num_inliers) > 150


def test_ransac_999_confidence_at_50pct_outliers(rng):
    """Reference parity bar (src/PoseEstimation.cpp:73-79, confidence 0.999):
    with the bootstrap batch H=2048, the 8-point RANSAC must recover the pose
    at 50% outliers on (effectively) every seed. 100 seeds, one vmapped jit
    call: P(>=1 failure | per-seed success 0.9997) ~ 3%, so a single rerun
    tolerance is NOT applied — all 100 must pass the loose pose gate."""
    cam, pose1, pose2, X, uv1, uv2 = _relative_setup(rng, n=400)
    uv2_corrupt = uv2.copy()
    out_idx = rng.choice(400, 200, replace=False)
    uv2_corrupt[out_idx] = rng.uniform(0, 600, (200, 2)).astype(np.float32)
    mask = np.ones(400, bool)

    est_fn = jax.vmap(
        lambda k: estimate_relative_pose(
            cam, jnp.asarray(uv1), jnp.asarray(uv2_corrupt), jnp.asarray(mask),
            k, num_hypotheses=2048,
        )
    )
    ests = est_fn(jax.random.split(jax.random.PRNGKey(7), 100))
    poses = np.asarray(ests.pose)
    R_err = np.linalg.norm(poses[:, :3, :3] - pose2[:3, :3], axis=(1, 2))
    t_est = poses[:, :3, 3] / np.linalg.norm(poses[:, :3, 3], axis=1, keepdims=True)
    t_true = pose2[:3, 3] / np.linalg.norm(pose2[:3, 3])
    ok = (R_err < 0.05) & (np.linalg.norm(t_est - t_true, axis=1) < 0.1)
    assert ok.sum() == 100, f"only {ok.sum()}/100 seeds recovered the pose"
