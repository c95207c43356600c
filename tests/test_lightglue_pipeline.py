"""LightGlue attention matcher wired into the SLAM pipeline.

The reference's deep path routes extraction through lightglue-cpp
(src/features/DeepFeatureExtractor.cpp:8); here the attention matcher
(models/lightglue.py) replaces the classical mutual-1NN at every
frame<->frame matching site (bootstrap pairing, essential-path tracking,
keyframe-commit triangulation) via SlamConfig.matcher="lightglue".
"""

from pathlib import Path

import numpy as np
import pytest

from racing_slam_tpu.models import lightglue, train
from racing_slam_tpu.ops.camera import Camera
from racing_slam_tpu.slam.config import SlamConfig
from racing_slam_tpu.slam.pipeline import Slam
from racing_slam_tpu.utils.metrics import ate_rmse
from racing_slam_tpu.utils.synthetic import make_sequence
from racing_slam_tpu.utils.video import ArraySource

WEIGHTS = Path(__file__).resolve().parent.parent / "racing_slam_tpu" / "weights" / "lightglue.npz"


def _cam():
    return Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)


def _cfg(**kw):
    base = dict(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=8, map_capacity=1024,
        max_observations=4, ba_iters=4, motion_ba_iters=4,
        ransac_hypotheses=128, reinit_on_lost=False,
    )
    base.update(kw)
    return SlamConfig(**base)


def _run(cfg, seq, cam):
    slam = Slam(cam, ArraySource(seq.frames), cfg)
    assert slam.initialize(), "bootstrap failed"
    slam.run()
    kf_idx = slam.keyframe_indices()
    return ate_rmse(slam.poses(), seq.poses[kf_idx]), int(slam.state.num_kf)


@pytest.mark.skipif(not WEIGHTS.exists(), reason="no committed weights")
def test_lightglue_matcher_wiring(tmp_path):
    """The matcher must carry the full pipeline end-to-end — bootstrap
    (try_initialize), tracking, and keyframe-commit triangulation all route
    frame matching through LightGlueMatcher — loading weights from an
    explicit (non-default) path."""
    params = lightglue.load_params(WEIGHTS)
    wpath = tmp_path / "lg.npz"
    lightglue.save_params(wpath, params)

    cam = _cam()
    seq = make_sequence(
        np.random.default_rng(3), n_frames=10, cam=cam, n_sprites=140,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )
    ate, n_kf = _run(
        _cfg(matcher="lightglue", lightglue_weights=str(wpath)), seq, cam
    )
    assert n_kf >= 2
    assert np.isfinite(ate)


@pytest.mark.skipif(not WEIGHTS.exists(), reason="no committed weights")
def test_committed_weights_track_accurately():
    """The committed weights (models/train.py, homography self-training on
    real frontend descriptors) must track the synthetic benchmark world with
    ATE comparable to the classical matcher."""
    cam = _cam()
    seq = make_sequence(
        np.random.default_rng(11), n_frames=14, cam=cam, n_sprites=160,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )
    ate_cl, _ = _run(_cfg(), seq, cam)
    ate_lg, n_kf = _run(_cfg(matcher="lightglue"), seq, cam)
    length = float(np.linalg.norm(seq.poses[-1][:3, 3] - seq.poses[0][:3, 3]))
    assert n_kf >= 2
    # Parity bar: within 2x of classical and under 10% of trajectory length.
    assert ate_lg < max(2.0 * ate_cl, 0.1 * max(length, 1.0))


SP_WEIGHTS = WEIGHTS.parent / "superpoint.npz"


@pytest.mark.skipif(not SP_WEIGHTS.exists(), reason="no committed weights")
def test_superpoint_frontend_tracks():
    """The committed SuperPoint weights (from-scratch self-training,
    models/train.py) must carry the full pipeline: extraction -> matching ->
    BA -> keyframing. Accuracy bar is loose — 400 CPU training steps give a
    usable but not classical-grade detector (measured ATE ~0.24 on this
    world vs ~0.05 classical)."""
    from racing_slam_tpu.models.superpoint import SuperPointFrontend, load_params

    cam = _cam()
    seq = make_sequence(
        np.random.default_rng(3), n_frames=10, cam=cam, n_sprites=140,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )
    fe = SuperPointFrontend(params=load_params(SP_WEIGHTS))
    slam = Slam(cam, ArraySource(seq.frames), _cfg(), frontend=fe)
    assert slam.initialize(), "bootstrap failed with learned frontend"
    slam.run()
    kf_idx = slam.keyframe_indices()
    ate = ate_rmse(slam.poses(), seq.poses[kf_idx])
    length = float(np.linalg.norm(seq.poses[-1][:3, 3] - seq.poses[0][:3, 3]))
    assert int(slam.state.num_kf) >= 2
    assert np.isfinite(ate) and ate < 0.3 * max(length, 1.0)


LGSP_WEIGHTS = WEIGHTS.parent / "lightglue_superpoint.npz"


@pytest.mark.skipif(
    not (SP_WEIGHTS.exists() and LGSP_WEIGHTS.exists()),
    reason="no committed weights",
)
def test_full_deep_path_tracks():
    """The reference's FULL deep path — learned extractor feeding the learned
    matcher (src/features/DeepFeatureExtractor.cpp:8 + the lightglue
    submodule) — with both committed weight sets: SuperPoint descriptors
    (256-d) into the jointly-trained LightGlue (lightglue_superpoint.npz,
    selected automatically by Slam when the frontend is non-128-d)."""
    from racing_slam_tpu.models.superpoint import SuperPointFrontend, load_params

    cam = _cam()
    seq = make_sequence(
        np.random.default_rng(3), n_frames=10, cam=cam, n_sprites=140,
        step_t=np.array([0.10, 0.01, 0.16], np.float32),
    )
    fe = SuperPointFrontend(params=load_params(SP_WEIGHTS))
    # From-scratch SuperPoint descriptors need the looser acceptance
    # threshold to reach the bootstrap's 50-triangulation bar.
    slam = Slam(cam, ArraySource(seq.frames),
                _cfg(matcher="lightglue", lightglue_threshold=0.2),
                frontend=fe)
    # The dimension-aware default must have picked the 256-d weights.
    assert slam.frontend.matcher.params.in_proj_w.shape[0] == fe.descriptor_dim
    assert slam.initialize(), "bootstrap failed with full deep path"
    slam.run()
    kf_idx = slam.keyframe_indices()
    ate = ate_rmse(slam.poses(), seq.poses[kf_idx])
    length = float(np.linalg.norm(seq.poses[-1][:3, 3] - seq.poses[0][:3, 3]))
    assert int(slam.state.num_kf) >= 2
    assert np.isfinite(ate) and ate < 0.3 * max(length, 1.0)


def test_mismatched_lightglue_weights_raise(tmp_path):
    """Loading 128-d LightGlue weights with a 256-d frontend must fail fast
    with a clear error, not an opaque shape mismatch at runtime."""
    from racing_slam_tpu.models.superpoint import SuperPointFrontend

    cam = _cam()
    fe = SuperPointFrontend()  # random weights fine — init raises before use
    with pytest.raises(ValueError, match="descriptors"):
        Slam(cam, ArraySource([]), _cfg(
            matcher="lightglue", lightglue_weights=str(WEIGHTS)
        ), frontend=fe)
