"""Profile the keyframe-commit path in isolation + keyframe frequency.

The tracking-only step costs ~4.2 ms/frame batched; bench averages ~11.3 ms.
This tool quantifies the gap: how often keyframes fire in the bench sequence
and what the commit path costs end-to-end, so optimization lands on the right
sub-stage. Run on the TPU chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from functools import partial

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.slam.pipeline import Slam, _commit_keyframe, slam_step
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(7)
    cam = Camera(fx=480.0, fy=480.0, cx=320.0, cy=240.0, width=640, height=480)
    cfg = SlamConfig(
        triangulate_points=True, bundle_adjust=True, optimize_pose=True,
        cull_points=True, max_keyframes=32, map_capacity=4096, max_observations=8,
    )
    seq = make_sequence(
        rng, n_frames=112, cam=cam, n_sprites=260,
        step_t=np.array([0.05, 0.005, 0.10], np.float32), yaw_per_frame=0.002,
    )
    slam = Slam(cam, ArraySource(seq.frames), cfg)
    assert slam.initialize()
    t0 = time.time()
    slam.run_batched(batch=48)
    jax.block_until_ready(slam.state)
    print(f"run_batched full seq: {time.time() - t0:.2f}s (compile included)")
    n_kf = sum(int(np.asarray(i.is_keyframe).sum()) for i in slam.batch_infos)
    n_fr = sum(int(np.asarray(i.is_keyframe).size) for i in slam.batch_infos)
    print(f"keyframes committed: {n_kf} / {n_fr} frames "
          f"({n_fr / max(n_kf,1):.1f} frames per keyframe)")

    # Isolate: a tracking step forced NOT to commit vs forced commit.
    state = slam.state
    img_u8 = jax.device_put(np.clip(seq.frames[60] * 255, 0, 255).astype(np.uint8))
    key = jax.random.PRNGKey(1)

    step = jax.jit(partial(slam_step, cam=cam, cfg=cfg, frontend=slam.frontend))
    timeit("slam_step (whatever branch)", step, state, img_u8, key, None)

    # commit path alone at realistic shapes
    feat = slam._extract(img_u8, None)
    commit = jax.jit(partial(_commit_keyframe, cam=cam, cfg=cfg))
    timeit(
        "_commit_keyframe (full)", commit,
        state, img_u8.astype(jnp.float32) / 255.0, feat,
        state.last_rvec, state.last_t, state.last_matches,
    )

    # commit sub-stages via config ablation
    for name, kw in [
        ("commit w/o BA", dict(bundle_adjust=False)),
        ("commit w/o triangulation", dict(triangulate_points=False)),
        ("commit w/o cull", dict(cull_points=False)),
        ("commit bare (assoc+evict+obs_desc only)",
         dict(bundle_adjust=False, triangulate_points=False, cull_points=False)),
    ]:
        import dataclasses
        c2 = dataclasses.replace(cfg, **kw)
        commit2 = jax.jit(partial(_commit_keyframe, cam=cam, cfg=c2))
        timeit(name, commit2, state, img_u8.astype(jnp.float32) / 255.0, feat,
               state.last_rvec, state.last_t, state.last_matches)


if __name__ == "__main__":
    main()
