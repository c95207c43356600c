"""Data-parallel multi-sequence tracking on the virtual 8-device CPU mesh.

Verifies the deployment-shape scale-out path (parallel/multi_seq.py): S
independent sequences stepped in lockstep over a 'seq' mesh axis must produce
the SAME trajectories as S single-chip engines run one at a time.
"""

import jax
import numpy as np
import pytest

from racing_slam_tpu.ops.camera import Camera
from racing_slam_tpu.parallel.mesh import make_mesh
from racing_slam_tpu.parallel.multi_seq import MultiSlam
from racing_slam_tpu.slam.config import SlamConfig
from racing_slam_tpu.slam.pipeline import Slam
from racing_slam_tpu.utils.synthetic import make_sequence
from racing_slam_tpu.utils.video import ArraySource


def _tiny_cfg():
    return SlamConfig(
        triangulate_points=True,
        bundle_adjust=True,
        optimize_pose=True,
        cull_points=True,
        max_keyframes=4,
        map_capacity=256,
        max_observations=4,
        ba_iters=2,
        motion_ba_iters=2,
        ransac_hypotheses=64,
        reinit_on_lost=False,
    )


@pytest.fixture(scope="module")
def tiny_world():
    cam = Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)
    seqs = [
        make_sequence(
            np.random.default_rng(42 + i), n_frames=10, cam=cam, n_sprites=140,
            step_t=np.array([0.10, 0.01, 0.16], np.float32),
        )
        for i in range(2)
    ]
    return cam, seqs


def test_multi_seq_matches_single(tiny_world):
    cam, seqs = tiny_world
    cfg = _tiny_cfg()
    assert len(jax.devices()) == 8
    mesh = make_mesh({"seq": 2, "lm": 4})

    # Reference: each sequence on the single-chip driver (batch mode so the
    # device program matches the multi-seq step's slam_step_batch).
    single_states = []
    for i, s in enumerate(seqs):
        slam = Slam(cam, ArraySource(s.frames), cfg, seed=i)
        assert slam.initialize()
        slam.run_batched(max_frames=6, batch=3)
        single_states.append(slam.state)

    ms = MultiSlam(cam, [ArraySource(s.frames) for s in seqs], mesh, cfg)
    assert ms.initialize()
    n = ms.run_batched(max_frames=6, batch=3)
    assert n == 6
    states = ms.states_per_sequence()

    for got, want in zip(states, single_states):
        # Identical keyframe structure; poses equal up to fp reduction order
        # (different PRNG folding would diverge — seeds match by construction).
        np.testing.assert_array_equal(
            np.asarray(got.kfs.valid), np.asarray(want.kfs.valid)
        )
        assert int(got.num_kf) == int(want.num_kf)
        np.testing.assert_allclose(
            np.asarray(got.last_t), np.asarray(want.last_t), atol=5e-2
        )


def test_multi_seq_state_is_sharded(tiny_world):
    cam, seqs = tiny_world
    cfg = _tiny_cfg()
    mesh = make_mesh({"seq": 2, "lm": 4})
    ms = MultiSlam(cam, [ArraySource(s.frames) for s in seqs], mesh, cfg)
    assert ms.initialize()
    ms.run_batched(max_frames=3, batch=3)
    # Every leaf's leading axis must be split over the seq axis.
    sh = ms.states.map.pos.sharding
    assert sh.spec[0] == "seq"


def test_multi_seq_loss_recovery():
    """Per-sequence failure recovery (MultiSlam._check_lost): a hard scene
    cut in ONE sequence re-bootstraps only that sequence; the other keeps
    tracking its map undisturbed."""
    cam = Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)
    step = np.array([0.10, 0.01, 0.16], np.float32)
    # Loss detection reads the PREVIOUS batch's counts (lag-1, stall-free —
    # see MultiSlam.run_batched), so sequence 0 needs enough post-cut frames
    # to be detected one batch late and still re-bootstrap before EOF.
    # Inlier-based loss detection (StepInfo.n_inliers) fires a batch or two
    # earlier than the old raw-match rule, so the post-cut world needs
    # enough frames for detection + the re-bootstrap to land before EOF.
    a = make_sequence(np.random.default_rng(5), n_frames=8, cam=cam,
                      n_sprites=140, step_t=step)
    b = make_sequence(np.random.default_rng(99), n_frames=20, cam=cam,
                      n_sprites=140, step_t=step)
    c = make_sequence(np.random.default_rng(7), n_frames=28, cam=cam,
                      n_sprites=140, step_t=step)
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=8, map_capacity=1024,
        max_observations=4, ba_iters=2, motion_ba_iters=2,
        ransac_hypotheses=64, reinit_on_lost=True, lost_check_interval=1,
    )
    mesh = make_mesh({"seq": 2, "lm": 4})
    ms = MultiSlam(
        cam,
        [ArraySource(a.frames + b.frames), ArraySource(c.frames)],
        mesh,
        cfg,
    )
    assert ms.initialize()
    ms.run_batched(batch=4)
    # Sequence 0 hit the cut: its segment was archived and it re-bootstrapped.
    assert len(ms.segments) >= 1
    assert all(seg["seq"] == 0 for seg in ms.segments)
    assert ms.segments[0]["poses"].shape[0] >= 2
    states = ms.states_per_sequence()
    # Both sequences end with live two-view-or-better maps.
    assert int(states[0].num_kf) >= 2
    assert int(states[1].num_kf) >= 2
