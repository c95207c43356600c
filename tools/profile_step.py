"""Per-stage wall-clock + roofline profile of the tracking step.

Times each stage of slam_step in isolation (jitted, block_until_ready) at the
bench.py shapes, so optimization effort lands on the real bottleneck, and —
via XLA's own cost model (compiled.cost_analysis()) — reports each stage's
achieved FLOP/s and bytes/s against the chip's peaks: the speed-of-light
table BASELINE.md publishes. Run on the TPU chip (default backend) — CPU
numbers are not representative.

Usage: python tools/profile_step.py [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Chip peaks for the roofline denominator, keyed on jax.devices()[0].device_kind.
# TPU v5e: 197 TFLOP/s bf16 MXU (f32 runs at ~1/4 of that), 819 GB/s HBM.
CHIP_PEAKS = {
    "TPU v5 lite": dict(flops_bf16=197e12, flops_f32=49e12, hbm=819e9),
    "TPU v5e": dict(flops_bf16=197e12, flops_f32=49e12, hbm=819e9),
    "TPU v4": dict(flops_bf16=275e12, flops_f32=69e12, hbm=1228e9),
}

ROWS: list[dict] = []


def timeit(name, fn, *args, reps=30):
    fn(*args)  # compile
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    flops = bytes_ = None
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if ca:
            flops = ca.get("flops")
            bytes_ = ca.get("bytes accessed")
    except Exception:
        pass
    ROWS.append(dict(name=name, ms=dt, flops=flops, bytes=bytes_))
    print(f"{name:38s} {dt:8.3f} ms")
    return dt


def roofline_table():
    kind = jax.devices()[0].device_kind
    peaks = CHIP_PEAKS.get(kind)
    print(f"\n== speed-of-light table ({kind}) ==")
    if peaks is None:
        print(f"no peak numbers for '{kind}'; raw achieved rates only")
    hdr = (f"{'stage':38s} {'ms':>8s} {'GFLOP':>8s} {'MB':>8s} "
           f"{'GF/s':>8s} {'GB/s':>7s} {'%MXU':>6s} {'%HBM':>6s}  bound")
    print(hdr)
    for r in ROWS:
        if r["flops"] is None or r["ms"] <= 0:
            print(f"{r['name']:38s} {r['ms']:8.3f} {'-':>8s}")
            continue
        t = r["ms"] * 1e-3
        gf = r["flops"] / 1e9
        mb = (r["bytes"] or 0) / 1e6
        gfs = gf / t
        gbs = (r["bytes"] or 0) / 1e9 / t
        if peaks:
            # f32 MXU peak: the pipeline's matmuls are bf16-input where it
            # matters (matching), f32 elsewhere; report against the f32 MXU
            # peak as the conservative compute ceiling.
            pct_mxu = 100 * gfs * 1e9 / peaks["flops_f32"]
            pct_hbm = 100 * gbs * 1e9 / peaks["hbm"]
            bound = "compute" if pct_mxu > pct_hbm else "memory"
            sol = max(pct_mxu, pct_hbm)
            print(f"{r['name']:38s} {r['ms']:8.3f} {gf:8.2f} {mb:8.1f} "
                  f"{gfs:8.1f} {gbs:7.1f} {pct_mxu:6.1f} {pct_hbm:6.1f}  "
                  f"{bound} ({sol:.0f}% of light)")
        else:
            print(f"{r['name']:38s} {r['ms']:8.3f} {gf:8.2f} {mb:8.1f} "
                  f"{gfs:8.1f} {gbs:7.1f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from functools import partial

    from racing_slam_tpu.ops.ba import motion_ba, structure_ba, BAProblem
    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.ops.matching import match_frames, match_map_to_frame
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.frontend import ClassicalFrontend
    from racing_slam_tpu.slam.pipeline import Slam, slam_step
    from racing_slam_tpu.slam.state import SlamState
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    cfg = SlamConfig(
        triangulate_points=True,
        bundle_adjust=True,
        optimize_pose=True,
        cull_points=True,
        max_keyframes=32,
        map_capacity=4096,
        max_observations=8,
    )
    seq = make_sequence(
        rng, n_frames=40, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    slam = Slam(cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    slam.run(max_frames=20)  # build up a realistic map
    state = slam.state
    frontend = slam.frontend
    print(f"map points={int(state.map.num_points())} kf={int(state.num_kf)}")

    img_u8 = jax.device_put(
        np.clip(seq.frames[30] * 255, 0, 255).astype(np.uint8)
    )
    img = jnp.asarray(seq.frames[30], jnp.float32)
    key = jax.random.PRNGKey(0)

    # --- stages ---
    reps = args.reps
    extract = jax.jit(lambda im: frontend.extract(im, None))
    timeit("extract (frontend)", extract, img, reps=reps)

    from racing_slam_tpu.ops.corners import detect_corners, shi_tomasi_response
    timeit("  shi_tomasi_response", jax.jit(shi_tomasi_response), img, reps=reps)
    timeit("  detect_corners", jax.jit(partial(detect_corners, cell=16, n_per_cell=2)), img, reps=reps)
    feat = extract(img)
    from racing_slam_tpu.ops.descriptors import extract_descriptors_cells
    timeit(
        "  descriptors_cells",
        jax.jit(partial(extract_descriptors_cells, cell=16, n_per_cell=2)),
        img, feat.xy, reps=reps,
    )

    from racing_slam_tpu.ops import se3
    P = cfg.map_capacity
    pose = se3.pose_matrix(state.last_rvec, state.last_t)
    obs_desc = state.obs_desc
    obs_dvalid = state.map.obs_valid & state.map.valid[:, None]
    nokp = jnp.zeros(feat.valid.shape, bool)
    nopt = jnp.zeros((P,), bool)
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    match_fn = jax.jit(partial(
        match_map_to_frame, max_distance=frontend.max_distance, backend=backend,
    ))
    timeit(
        f"match_map_to_frame ({backend})", match_fn,
        cam, pose, state.map.pos, state.map.valid, obs_desc, obs_dvalid,
        feat.xy, feat.desc, feat.valid, nokp, nopt, reps=reps,
    )

    mm = match_fn(
        cam, pose, state.map.pos, state.map.valid, obs_desc, obs_dvalid,
        feat.xy, feat.desc, feat.valid, nokp, nopt,
    )
    matches = jnp.where(mm.valid, mm.point_idx, -1)
    mba = jax.jit(partial(motion_ba, max_iters=cfg.motion_ba_iters))
    timeit(
        "motion_ba (<=10 iters)", mba,
        cam, state.last_rvec, state.last_t, feat.xy,
        state.map.pos[jnp.clip(matches, 0)], matches >= 0, reps=reps,
    )

    timeit(
        "match_frames (K x K)",
        jax.jit(partial(match_frames, max_distance=frontend.max_distance)),
        state.last_feat.desc, state.last_feat.valid, feat.desc, feat.valid,
        reps=reps,
    )

    # structure BA at commit shapes
    K = feat.xy.shape[0]
    Pc = min(P, -(-K // 128) * 128)
    slot = state.last_kf_slot
    sel, sel_ok = state.map.ba_point_selection(slot, Pc)
    obs_kf = state.map.obs_kf[sel]
    obs_kp = state.map.obs_kp[sel]
    prob = BAProblem(
        cam_rvec=state.kfs.rvec, cam_t=state.kfs.t, points=state.map.pos[sel],
        obs_cam=obs_kf, obs_uv=state.kfs.kp_xy[obs_kf, obs_kp],
        obs_valid=state.map.obs_valid[sel] & sel_ok[:, None],
        cam_free=jnp.arange(cfg.max_keyframes) == slot,
        cam_in_problem=state.kfs.valid,
        point_free=sel_ok, point_in_problem=sel_ok,
    )
    sba = jax.jit(partial(structure_ba, max_iters=cfg.ba_iters))
    timeit("structure_ba (commit path)", sba, cam, prob, slot, reps=reps)

    # full fused step
    step = jax.jit(partial(slam_step, cam=cam, cfg=cfg, frontend=frontend))
    timeit("slam_step (fused, uint8 in)", step, state, img_u8, key, None, reps=reps)

    # batched scan step, per frame
    from racing_slam_tpu.slam.pipeline import slam_step_batch
    B = 16
    imgs = jnp.broadcast_to(img_u8, (B,) + img_u8.shape)
    keys = jax.random.split(key, B)
    active = jnp.ones((B,), bool)
    stepb = jax.jit(partial(slam_step_batch, cam=cam, cfg=cfg, frontend=frontend))
    dt = timeit("slam_step_batch (16)", stepb, state, imgs, keys, active, None, reps=max(3, reps // 4))
    print(f"  -> per frame: {dt / B:.3f} ms ({1e3 / (dt / B):.1f} fps)")

    # periodic global refinement (full_ba over all live keyframes + points)
    from racing_slam_tpu.ops.ba import full_ba
    from racing_slam_tpu.parallel.refine import build_global_problem

    gprob = jax.jit(build_global_problem)(state)
    fba = jax.jit(partial(full_ba, max_iters=10))
    timeit("full_ba (global refine, 10 iters)", fba, cam, gprob, reps=reps)

    roofline_table()


if __name__ == "__main__":
    main()
