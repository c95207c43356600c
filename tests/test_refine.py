"""Landmark-sharded global refinement integrated into the live engine.

Two tiers:
- unit: build_global_problem/apply_refinement on a hand-built SlamState with
  known ground truth — perturbed poses/points must be recovered exactly
  (the two gauge anchors are left at ground truth, so recovery is absolute);
- integration: MultiSlam with refine_every on the 2-D (seq x lm) CPU mesh
  tracks a drifting sequence at least as accurately as the unrefined engine,
  and the refinement cost is finite and decreasing.

This is the engine-integrated replacement for the reference's single-process
global BA (src/Optimization.cpp:151-153) — and goes beyond it: the reference
freezes every previous keyframe at commit time (src/Slam.cpp:202-213), so its
early pose drift is permanent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racing_slam_tpu.ops import se3
from racing_slam_tpu.ops.camera import Camera
from racing_slam_tpu.parallel.mesh import make_mesh
from racing_slam_tpu.parallel.multi_seq import MultiSlam
from racing_slam_tpu.parallel.refine import (
    apply_refinement,
    build_global_problem,
    gauge_anchor_mask,
    make_refine_step,
)
from racing_slam_tpu.slam.config import SlamConfig
from racing_slam_tpu.slam.pipeline import Slam
from racing_slam_tpu.slam.state import SlamState
from racing_slam_tpu.utils.metrics import ate_rmse, camera_centers
from racing_slam_tpu.utils.synthetic import make_sequence
from racing_slam_tpu.utils.video import ArraySource

CAM = Camera(fx=200.0, fy=200.0, cx=64.0, cy=64.0, width=128, height=128)


def _gt_state(rng, F=4, P=64, O=4, K=64, noise=0.0):
    """SlamState with F keyframes observing P points; optionally perturbed."""
    X = np.stack(
        [rng.uniform(-1, 1, P), rng.uniform(-1, 1, P), rng.uniform(4, 7, P)],
        axis=-1,
    ).astype(np.float32)
    rvecs = np.zeros((F, 3), np.float32)
    rvecs[:, 1] = np.linspace(0, 0.04, F)  # slight yaw
    ts = (np.linspace(0, 0.9, F)[:, None] * np.array([1.0, 0.1, 0.0])).astype(
        np.float32
    )
    state = SlamState.create(F=F, P=P, O=O, K=K, D=8)
    kp_xy = np.zeros((F, K, 2), np.float32)
    obs_kf = np.zeros((P, O), np.int32)
    obs_kp = np.zeros((P, O), np.int32)
    for f in range(F):
        R = np.asarray(se3.exp_so3(jnp.asarray(rvecs[f])))
        Xc = X @ R.T + ts[f]
        uv = Xc[:, :2] / Xc[:, 2:3] * CAM.fx + np.array([CAM.cx, CAM.cy])
        kp_xy[f, :P] = uv
    for o in range(O):
        obs_kf[:, o] = o % F
        obs_kp[:, o] = np.arange(P)
    pert_r = rvecs + noise * rng.standard_normal((F, 3)).astype(np.float32)
    pert_t = ts + 3 * noise * rng.standard_normal((F, 3)).astype(np.float32)
    pert_X = X + 3 * noise * rng.standard_normal((P, 3)).astype(np.float32)
    # Gauge anchors (two oldest by frame_index = slots 0, 1) stay exact.
    pert_r[:2], pert_t[:2] = rvecs[:2], ts[:2]
    state = state._replace(
        kfs=state.kfs._replace(
            rvec=jnp.asarray(pert_r),
            t=jnp.asarray(pert_t),
            kp_xy=jnp.asarray(kp_xy),
            kp_valid=jnp.ones((F, K), bool),
            valid=jnp.ones((F,), bool),
            frame_index=jnp.arange(F, dtype=jnp.int32),
        ),
        map=state.map._replace(
            pos=jnp.asarray(pert_X),
            valid=jnp.ones((P,), bool),
            obs_kf=jnp.asarray(obs_kf),
            obs_kp=jnp.asarray(obs_kp),
            obs_valid=jnp.ones((P, O), bool),
        ),
        num_kf=jnp.int32(F),
        last_kf_slot=jnp.int32(F - 1),
        last_rvec=jnp.asarray(pert_r[F - 1]),
        last_t=jnp.asarray(pert_t[F - 1]),
    )
    return state, rvecs, ts, X


def test_gauge_anchor_mask():
    valid = jnp.asarray([True, True, True, False])
    fidx = jnp.asarray([7, 2, 5, 0], jnp.int32)  # slot 1 oldest, slot 2 next
    m = np.asarray(gauge_anchor_mask(valid, fidx))
    assert m.tolist() == [False, True, True, False]


def test_refine_recovers_ground_truth(rng):
    state, gt_r, gt_t, gt_X = _gt_state(rng, noise=5e-3)
    prob = build_global_problem(state)
    # Anchors frozen, others free.
    assert np.asarray(prob.cam_free).tolist() == [False, False, True, True]

    from racing_slam_tpu.ops.ba import full_ba

    res = full_ba(CAM, prob, max_iters=15)
    st2 = apply_refinement(state, res)
    np.testing.assert_allclose(np.asarray(st2.kfs.rvec), gt_r, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st2.kfs.t), gt_t, atol=6e-4)
    np.testing.assert_allclose(np.asarray(st2.map.pos), gt_X, atol=5e-3)
    # last pose (== keyframe F-1's perturbed pose) received the same
    # correction as the keyframe itself.
    np.testing.assert_allclose(
        np.asarray(st2.last_t), np.asarray(st2.kfs.t[-1]), atol=1e-5
    )


def test_refine_step_sharded_matches_single(rng):
    """The jitted (seq x lm)-sharded refine step equals single-chip full_ba."""
    mesh = make_mesh({"seq": 2, "lm": 4})
    s1, *_ = _gt_state(rng, noise=4e-3)
    s2, *_ = _gt_state(rng, noise=4e-3)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), s1, s2)
    refine = make_refine_step(CAM, mesh, max_iters=6)
    out, cost = refine(states)
    assert np.isfinite(np.asarray(cost)).all()

    from racing_slam_tpu.ops.ba import full_ba

    for i, s in enumerate([s1, s2]):
        res = full_ba(CAM, build_global_problem(s), max_iters=6)
        want = apply_refinement(s, res)
        np.testing.assert_allclose(
            np.asarray(out.kfs.t)[i], np.asarray(want.kfs.t), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.map.pos)[i], np.asarray(want.map.pos), atol=1e-3
        )


def _drift_cfg(**kw):
    return SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=8, map_capacity=256,
        max_observations=4, ba_iters=4, motion_ba_iters=4,
        ransac_hypotheses=64, reinit_on_lost=False, **kw,
    )


def test_multislam_refine_improves_or_matches_ate():
    """Engine-integrated periodic refinement on the 2-D mesh: tracked
    trajectory ATE with refinement <= without (same seeds, same frames)."""
    cam = Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)
    seqs = [
        make_sequence(
            np.random.default_rng(60 + i), n_frames=14, cam=cam, n_sprites=140,
            step_t=np.array([0.10, 0.01, 0.16], np.float32),
        )
        for i in range(2)
    ]
    mesh = make_mesh({"seq": 2, "lm": 4})
    cfg = _drift_cfg()

    def run(refine_every):
        ms = MultiSlam(
            cam, [ArraySource(s.frames) for s in seqs], mesh, cfg,
            refine_every=refine_every, refine_iters=6,
        )
        assert ms.initialize()
        ms.run_batched(max_frames=10, batch=5)
        ates = []
        for st, s in zip(ms.states_per_sequence(), seqs):
            v = np.asarray(st.kfs.valid)
            fi = np.asarray(st.kfs.frame_index)
            slots = np.nonzero(v)[0]
            slots = slots[np.argsort(fi[slots])]
            est = np.asarray(se3.pose_matrix(st.kfs.rvec[slots], st.kfs.t[slots]))
            gt = s.poses[fi[slots]]
            ates.append(ate_rmse(est, gt))
        return np.array(ates), ms

    base_ate, _ = run(refine_every=0)
    ref_ate, ms = run(refine_every=1)
    assert len(ms.refine_costs) >= 2
    assert np.isfinite(np.asarray(ms.refine_costs)).all()
    # Refinement never hurts; on these drifting sequences it helps on average.
    assert ref_ate.mean() <= base_ate.mean() * 1.05
    assert (ref_ate <= base_ate * 1.25).all()
