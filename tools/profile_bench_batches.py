"""Per-batch timing of the exact bench.py flow, with keyframe counts.

Explains the gap between the bench's end-to-end ms/frame and the ablation
profile's device-side ms/frame: prints every batch's wall time, frames, and
keyframe commits so the cost model (base + commit_cost * kf_rate) can be
fitted against reality.
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

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.pipeline import Slam
    from racing_slam_tpu.slam.state import SlamState
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    seq = make_sequence(
        rng, n_frames=112, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=32, map_capacity=4096, max_observations=8,
    )
    BATCH = 48
    # Pre-convert to u8 once (a real decoder hands over u8 natively).
    frames_u8 = [np.clip(f * 255, 0, 255).astype(np.uint8) for f in seq.frames]

    slam = Slam(cam, ArraySource(frames_u8), cfg)
    assert slam.initialize()
    warm = slam.run_batched(batch=BATCH)
    jax.block_until_ready(slam.state)

    # Replay with per-batch timing.
    K = slam.state.last_feat.xy.shape[0]
    slam.state = SlamState.create(
        F=cfg.max_keyframes, P=cfg.map_capacity, O=cfg.max_observations,
        K=K, D=slam.frontend.descriptor_dim,
    )
    slam.video = iter(ArraySource(frames_u8))
    slam._frame_idx = 0
    t0 = time.perf_counter()
    assert slam.initialize()
    print(f"init: {(time.perf_counter() - t0) * 1e3:.0f} ms "
          f"(frames consumed: {slam._frame_idx})")

    total_t = 0.0
    total_n = 0
    while True:
        frames = slam._decode_batch(BATCH)
        if not frames:
            break
        n = len(frames)
        if n < BATCH:
            frames = frames + [frames[-1]] * (BATCH - n)
        t0 = time.perf_counter()
        imgs = jax.device_put(np.stack(frames))
        keys = jax.random.split(slam._subkey(), BATCH)
        active = jnp.asarray(np.arange(BATCH) < n)
        slam.state, infos = slam._step_batch(
            slam.state, imgs, keys, active, None
        )
        jax.block_until_ready(slam.state)
        dt = time.perf_counter() - t0
        nkf = int(np.asarray(infos.is_keyframe)[:n].sum())
        niter_hint = ""
        print(f"batch n={n:3d}: {dt * 1e3:7.1f} ms = {dt / n * 1e3:6.2f} ms/frame"
              f"  kf={nkf:2d} ({n / max(nkf, 1):.1f} fr/kf){niter_hint}")
        total_t += dt
        total_n += n
    print(f"TOTAL {total_n} frames, {total_t:.2f}s -> "
          f"{total_n / total_t:.1f} fps ({total_t / total_n * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
