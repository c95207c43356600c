"""End-to-end pipeline tests on synthetic sequences (golden-trajectory style).

The reference has no tests (SURVEY.md §4); this is the integration tier of
the from-scratch strategy: known camera trajectories through a sprite world,
the full engine loop, ATE bounds after Sim(3) alignment.
"""

import numpy as np
import pytest

from racing_slam_tpu.ops.camera import Camera
from racing_slam_tpu.slam.config import SlamConfig
from racing_slam_tpu.slam.pipeline import Slam
from racing_slam_tpu.utils.metrics import ate_rmse, camera_centers
from racing_slam_tpu.utils.synthetic import make_sequence
from racing_slam_tpu.utils.video import ArraySource


def _small_cam():
    return Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(42)
    return make_sequence(
        rng,
        n_frames=16,
        cam=_small_cam(),
        n_sprites=140,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )


def _run(seq, cfg, max_frames=None):
    slam = Slam(seq.cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    slam.run(max_frames)
    return slam


def test_full_pipeline_trajectory(seq):
    cfg = SlamConfig(
        triangulate_points=True,
        bundle_adjust=True,
        optimize_pose=True,
        cull_points=True,
        max_keyframes=16,
        map_capacity=2048,
    )
    slam = _run(seq, cfg)
    kf_idx = slam.keyframe_indices()
    assert len(kf_idx) >= 4
    est = slam.poses()
    gt = seq.poses[kf_idx]
    ate = ate_rmse(est, gt)
    length = np.linalg.norm(camera_centers(gt)[-1] - camera_centers(gt)[0])
    assert ate < 0.05 * length, f"ATE {ate} vs trajectory length {length}"
    # Monitoring metric stays sub-2px like the reference's implicit bars.
    assert slam.reprojection_error() < 2.0
    # Map grew beyond the initial bootstrap.
    infos = slam.infos
    assert int(infos[-1].n_points) > int(infos[0].n_points)


def test_reference_default_config(seq):
    """The reference main hard-codes {triangulate=0, BA=1, optimize_pose=1,
    cull=0, essential=0} (src/main.cpp:53-59). Tracking must hold while the
    bootstrap map stays visible."""
    cfg = SlamConfig(max_keyframes=16, map_capacity=2048)
    slam = _run(seq, cfg, max_frames=6)
    # No triangulation: the number of map points never grows.
    n_pts = [int(i.n_points) for i in slam.infos]
    assert all(n == n_pts[0] for n in n_pts)
    est = slam.poses()
    kf_idx = slam.keyframe_indices()
    ate = ate_rmse(est, seq.poses[kf_idx])
    length = np.linalg.norm(
        camera_centers(seq.poses[kf_idx])[-1] - camera_centers(seq.poses[kf_idx])[0]
    )
    assert ate < 0.08 * max(length, 0.5)


def test_tracking_pose_accuracy_per_frame(seq):
    """Every tracked frame's pose (not only keyframes) vs ground truth."""
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, cull_points=True,
        max_keyframes=16, map_capacity=2048,
    )
    slam = Slam(seq.cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    import jax.numpy as jnp

    from racing_slam_tpu.ops import se3

    est_all, gt_all = [], []
    fidx = int(slam.state.frame_count)
    while (info := slam.step()) is not None:
        est_all.append(np.asarray(se3.pose_matrix(info.rvec, info.t)))
        gt_all.append(seq.poses[fidx])
        fidx += 1
    ate = ate_rmse(np.stack(est_all), np.stack(gt_all))
    length = np.linalg.norm(
        camera_centers(np.stack(gt_all))[-1] - camera_centers(np.stack(gt_all))[0]
    )
    assert ate < 0.06 * length, f"per-frame ATE {ate} vs length {length}"


def test_initialization_rejects_static_start():
    """Frames with no baseline must not initialize on the first pairs; the
    initializer keeps consuming frames (ref-chance logic, src/Init.cpp:31-37)
    until motion appears."""
    rng = np.random.default_rng(3)
    cam = _small_cam()
    static = make_sequence(rng, n_frames=2, cam=cam, n_sprites=100,
                           step_t=np.zeros(3, np.float32), yaw_per_frame=0.0)
    moving = make_sequence(np.random.default_rng(3), n_frames=10, cam=cam,
                           n_sprites=100,
                           step_t=np.array([0.12, 0.0, 0.15], np.float32))
    # 4 identical frames then motion (same world since same seed).
    frames = [static.frames[0]] * 4 + moving.frames
    cfg = SlamConfig(max_keyframes=8, map_capacity=1024)
    slam = Slam(cam, ArraySource(frames), cfg)
    assert slam.initialize()
    # Should have skipped the static prefix: ref or query index >= 4.
    kf_idx = slam.keyframe_indices()
    assert kf_idx[1] >= 4
