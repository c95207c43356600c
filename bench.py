"""Benchmark harness: tracking throughput of the full SLAM pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline note (see BASELINE.md): the reference publishes no numbers, and its
C++/OpenCV/Ceres/Pangolin stack cannot be built in this image (vcpkg deps
unavailable offline; benchmark videos absent from the snapshot). The
vs_baseline denominator is therefore the documented 30 frames/s estimate for
the reference's single-threaded CPU loop (GFTT+ORB extraction + BFMatcher +
Ceres SPARSE_SCHUR per frame at 480p). All diagnostics go to stderr; stdout
carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 30.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.pipeline import Slam
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    log("devices:", jax.devices())
    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    t0 = time.time()
    seq = make_sequence(
        rng,
        n_frames=112,
        cam=cam,
        n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32),
        yaw_per_frame=0.002,
    )
    log(f"rendered {len(seq.frames)} frames in {time.time() - t0:.1f}s")

    cfg = SlamConfig(
        triangulate_points=True,
        bundle_adjust=True,
        optimize_pose=True,
        cull_points=True,
        max_keyframes=32,
        map_capacity=4096,
        max_observations=8,
    )
    # Dispatch granularity: one device program per BATCH frames. Over the
    # remote-chip tunnel each dispatch costs tens of ms of latency, so a
    # larger batch amortizes it; 48 measured best (beyond that, decode+upload
    # stops overlapping with compute).
    BATCH = 48
    slam = Slam(cam, ArraySource(seq.frames), cfg)
    t0 = time.time()
    assert slam.initialize(), "initialization failed"
    log(f"initialized in {time.time() - t0:.1f}s")

    # Warmup pass: run the WHOLE sequence once so every program (full and
    # padded final batch, keyframe + tracking branches) is compiled.
    t0 = time.time()
    warm = slam.run_batched(batch=BATCH)
    jax.block_until_ready(slam.state)
    log(f"warmup: {warm} steps in {time.time() - t0:.1f}s")

    # Measured pass: reset world state and replay the SAME full sequence with
    # everything compiled — initialization + tracking, batched dispatch (the
    # deployment driver, Slam.run_batched). This measures a fixed workload
    # (112 frames from bootstrap) rather than whatever suffix warmup left.
    from racing_slam_tpu.slam.state import SlamState

    K = slam.frontend.num_keypoints(cam.height, cam.width)
    slam.state = SlamState.create(
        F=cfg.max_keyframes, P=cfg.map_capacity, O=cfg.max_observations,
        K=K, D=slam.frontend.descriptor_dim,
    )
    slam.video = iter(ArraySource(seq.frames))
    slam._frame_idx = 0
    slam._prefetched = None
    t0 = time.time()
    assert slam.initialize(), "re-initialization failed"
    t_init = time.time() - t0
    t0 = time.time()
    n = slam.run_batched(batch=BATCH)
    jax.block_until_ready(slam.state)
    dt = time.time() - t0
    fps = n / dt
    log(
        f"measured: {n} frames in {dt:.2f}s -> {fps:.2f} fps "
        f"(+{t_init:.2f}s bootstrap); "
        f"kf={int(slam.state.num_kf)} pts={int(slam.state.map.num_points())} "
        f"reproj={slam.reprojection_error():.2f}px"
    )

    # Accuracy sanity: ATE over keyframes (report in stderr; throughput with a
    # broken trajectory would be meaningless).
    from racing_slam_tpu.utils.metrics import ate_rmse, camera_centers

    kf_idx = slam.keyframe_indices()
    est = slam.poses()
    gt = seq.poses[kf_idx]
    ate = ate_rmse(est, gt)
    length = float(
        np.linalg.norm(camera_centers(gt)[-1] - camera_centers(gt)[0])
    )
    log(f"ATE {ate:.4f} over trajectory length {length:.2f}")
    if not np.isfinite(fps) or ate > 0.1 * max(length, 1.0):
        log(f"FATAL: accuracy check failed (ATE {ate:.4f} > 10% of length "
            f"{length:.2f}); a broken trajectory's fps is meaningless")
        sys.exit(1)

    # BA solver throughput in isolation (BASELINE.json's "BA iters/s"
    # metric): the keyframe-commit structure BA at its real shapes on the
    # final world state, iterations/second over repeated solves.
    import jax.numpy as jnp
    from functools import partial

    from racing_slam_tpu.ops.ba import BAProblem, structure_ba

    st = slam.state
    K = st.last_feat.xy.shape[0]
    Pc = min(cfg.map_capacity, -(-K // 128) * 128)
    slot = st.last_kf_slot
    sel, sel_ok = st.map.ba_point_selection(slot, Pc)
    obs_kf = st.map.obs_kf[sel]
    obs_kp = st.map.obs_kp[sel]
    prob = BAProblem(
        cam_rvec=st.kfs.rvec, cam_t=st.kfs.t, points=st.map.pos[sel],
        obs_cam=obs_kf, obs_uv=st.kfs.kp_xy[obs_kf, obs_kp],
        obs_valid=st.map.obs_valid[sel] & sel_ok[:, None],
        cam_free=jnp.arange(cfg.max_keyframes) == slot,
        cam_in_problem=st.kfs.valid,
        point_free=sel_ok, point_in_problem=sel_ok,
    )
    sba = jax.jit(partial(structure_ba, max_iters=cfg.ba_iters))
    jax.block_until_ready(sba(cam, prob, slot))  # compile
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = sba(cam, prob, slot)
    jax.block_until_ready(out)
    ba_iters_per_s = reps * cfg.ba_iters / (time.time() - t0)
    log(f"BA throughput: {ba_iters_per_s:.0f} LM iters/s "
        f"({cfg.ba_iters} iters/solve, {Pc} points, {int(st.num_kf)} cams)")

    print(
        json.dumps(
            {
                "metric": "tracking_fps_640x480_full_pipeline",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
                "ate": round(float(ate), 4),
                "ba_iters_per_s": round(ba_iters_per_s, 1),
                # Literal measured re-run of the reference loop on this host
                # (tools/reference_baseline.py; see BASELINE.md) — the 30 fps
                # vs_baseline denominator is a reference-favorable bound.
                "reference_rerun_fps": 1.91,
            }
        )
    )


if __name__ == "__main__":
    main()
