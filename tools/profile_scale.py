"""Large-map (P=16384) scale profile: where does the 4x-capacity cost live?

Measures per-frame cost of the BATCHED tracking step at P=16384/F=32 vs the
P=4096/F=32 baseline on the SAME world, with ablations that isolate the
P-proportional passes (cull sweep, triangulation/create, commit path, banded
matcher). The engine state is built by running the live pipeline until the
map is well-populated (the bench's 150-frame scale rows carry ~4k live
points), so commit-path costs appear at their natural rate.

Run on the TPU chip:  python tools/profile_scale.py [ablation ...]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_state(cam, cfg, seq, n_frames):
    from racing_slam_tpu.slam.pipeline import Slam
    from racing_slam_tpu.utils.video import ArraySource

    slam = Slam(cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    slam.run_batched(max_frames=n_frames, batch=24)
    jax.block_until_ready(slam.state)
    return slam


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from functools import partial

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.pipeline import slam_step_batch
    from racing_slam_tpu.utils.synthetic import make_sequence

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(3)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)

    def cfg_for(P, F, backend="banded"):
        return SlamConfig(
            triangulate_points=True, bundle_adjust=True, optimize_pose=True,
            cull_points=True, max_keyframes=F, map_capacity=P,
            max_observations=8, pose_prediction="constant_velocity",
            match_radius_px=28.0, keyframe_match_ratio=0.8,
            local_ba_window=4, refine_every_frames=0,
            matching_backend=backend,
        )

    seq = make_sequence(
        rng, n_frames=150, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    seq.frames = [np.clip(f * 255, 0, 255).astype(np.uint8) for f in seq.frames]

    B = 32
    results = {}

    def bench_cfg(name, cfg, slam, state, reps=6):
        imgs = jax.device_put(np.stack(seq.frames[100:100 + B]))
        keys = jax.random.split(jax.random.PRNGKey(3), B)
        active = jnp.ones((B,), bool)
        fn = jax.jit(partial(
            slam_step_batch, cam=cam, cfg=cfg, frontend=slam.frontend))
        out = fn(state, imgs, keys, active, None)
        jax.block_until_ready(out)
        # CHAIN state through the reps (each call consumes the previous
        # call's output): identical-argument redispatches can be served
        # from a backend-side cache on this tunnel, which silently turns a
        # min-of-reps into a dispatch-latency measurement.
        st = out[0]
        t0 = time.perf_counter()
        for _ in range(reps):
            st, infos = fn(st, imgs, keys, active, None)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / reps / B * 1e3
        nkf = int(np.asarray(out[1].is_keyframe).sum())
        npts = int(np.asarray(out[0].map.num_points()))
        print(f"{name:44s} {dt:7.3f} ms/frame  (kf {nkf}/{B}, pts {npts})",
              flush=True)
        results[name] = dt
        return dt

    ablations = {
        "no_cull": dict(cull_points=False),
        "no_triangulation": dict(triangulate_points=False),
        "no_structure_ba": dict(bundle_adjust=False),
        "commit_bare": dict(
            bundle_adjust=False, triangulate_points=False, cull_points=False
        ),
        "no_motion_ba": dict(optimize_pose=False),
    }

    for P, F in ((4096, 32), (16384, 32)):
        cfg = cfg_for(P, F)
        print(f"\n=== P={P} F={F} (banded) ===", flush=True)
        t0 = time.time()
        slam = build_state(cam, cfg, seq, n_frames=100)
        print(f"state built in {time.time()-t0:.0f}s: "
              f"{int(slam.state.map.num_points())} live points, "
              f"{int(slam.state.num_kf)} keyframes", flush=True)
        names = sys.argv[1:] or ["full"] + list(ablations)
        for name in names:
            if name == "full":
                bench_cfg(f"P{P} full", cfg, slam, slam.state)
            else:
                bench_cfg(f"P{P} {name}",
                          dataclasses.replace(cfg, **ablations[name]),
                          slam, slam.state)

    if "P4096 full" in results and "P16384 full" in results:
        r = results["P4096 full"] / results["P16384 full"]
        print(f"\nP16384 runs at {100*r:.0f}% of the P4096 rate "
              f"({results['P16384 full']:.2f} vs {results['P4096 full']:.2f} "
              f"ms/frame)")


if __name__ == "__main__":
    main()
