"""Config-ablation profile of the BATCHED tracking step with real frames.

Standalone stage timings carry per-dispatch overhead that the fused scan
doesn't pay, so this tool measures what actually matters: per-frame cost of
slam_step_batch on real (differing) sequence frames — commits included at
their natural rate — under config ablations. The deltas attribute the batched
per-frame cost to stages. Run on the TPU chip.
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from functools import partial

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.pipeline import Slam, slam_step_batch
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    base = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=32, map_capacity=4096, max_observations=8,
    )
    seq = make_sequence(
        rng, n_frames=112, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    slam = Slam(cam, ArraySource(seq.frames), base)
    assert slam.initialize()
    slam.run_batched(max_frames=40, batch=8)
    jax.block_until_ready(slam.state)
    state = slam.state

    B = 32
    imgs = jax.device_put(
        np.stack([np.clip(f * 255, 0, 255).astype(np.uint8)
                  for f in seq.frames[60:60 + B]])
    )
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    active = jnp.ones((B,), bool)

    def bench_cfg(name, cfg, reps=5):
        fn = jax.jit(partial(
            slam_step_batch, cam=cam, cfg=cfg, frontend=slam.frontend))
        out = fn(state, imgs, keys, active, None)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(state, imgs, keys, active, None)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps / B * 1e3
        nkf = int(np.asarray(out[1].is_keyframe).sum())
        print(f"{name:40s} {dt:7.3f} ms/frame  (kf {nkf}/{B})")
        return dt

    ablations = {
        "no_motion_ba": dict(optimize_pose=False),
        "no_structure_ba": dict(bundle_adjust=False),
        "no_triangulation": dict(triangulate_points=False),
        "no_cull": dict(cull_points=False),
        "commit_bare": dict(
            bundle_adjust=False, triangulate_points=False, cull_points=False
        ),
        "xla_matching": dict(matching_backend="xla"),
        "motion_ba_5it": dict(motion_ba_iters=5),
        "structure_ba_5it": dict(ba_iters=5),
    }
    names = sys.argv[1:] or ["full"] + list(ablations)
    for name in names:
        if name == "full":
            bench_cfg("full (bench config)", base)
        else:
            bench_cfg(name, dataclasses.replace(base, **ablations[name]))


if __name__ == "__main__":
    main()
