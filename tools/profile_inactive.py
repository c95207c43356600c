"""Check the cost of inactive (padded) slots in slam_step_batch.

If lax.cond(active, step, null) skips work, an all-False batch should cost
~nothing. If it doesn't, final partial batches pay full price for padding.
"""

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

    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=32, map_capacity=4096, max_observations=8,
    )
    seq = make_sequence(
        rng, n_frames=60, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    slam = Slam(cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    slam.run_batched(max_frames=40, batch=8)
    jax.block_until_ready(slam.state)

    B = 48
    imgs = jax.device_put(
        np.stack([np.clip(seq.frames[50] * 255, 0, 255).astype(np.uint8)] * B)
    )
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    fn = jax.jit(partial(slam_step_batch, cam=cam, cfg=cfg, frontend=slam.frontend))

    for frac, label in [(1.0, "all active"), (13 / 48, "13/48 active"),
                        (0.0, "all inactive")]:
        active = jnp.asarray(np.arange(B) < int(round(frac * B)))
        out = fn(slam.state, imgs, keys, active, None)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(slam.state, imgs, keys, active, None)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"{label:16s}: {dt * 1e3:7.1f} ms ({dt / B * 1e3:.2f} ms/slot)")


if __name__ == "__main__":
    main()
