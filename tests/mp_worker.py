"""Worker process for the true multi-process test (test_multiprocess.py).

Launched twice by the parent test with SLAM_COORDINATOR / SLAM_NUM_PROCESSES /
SLAM_PROCESS_ID set; each worker owns 4 virtual CPU devices (XLA_FLAGS) and
ONE of the two sequences. Exercises the real multi-host code paths:
jax.distributed.initialize via parallel.mesh.initialize_distributed, the
make_array_from_process_local_data branch of mesh.put_sharded, lockstep
run_batched over a 2-process {seq: 2, lm: 4} mesh, and the addressable-shard
readbacks of MultiSlam. Writes this process's final per-sequence state
summary to <outdir>/proc<pid>.npz for the parent to compare against a
single-process run.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def main(outdir: str) -> None:
    # jax.distributed.initialize must run BEFORE any backend use — and
    # importing the engine modules creates device constants (e.g. ops.ba's
    # HUBER_DELTA), so only parallel.mesh (jax+numpy only) may be imported
    # first.
    from racing_slam_tpu.parallel.mesh import initialize_distributed, make_mesh

    n_proc = initialize_distributed()

    from racing_slam_tpu.ops.camera import Camera
    from racing_slam_tpu.parallel.multi_seq import MultiSlam, local_row_indices
    from racing_slam_tpu.slam.config import SlamConfig
    from racing_slam_tpu.utils.synthetic import make_sequence
    from racing_slam_tpu.utils.video import ArraySource

    assert n_proc == 2, n_proc
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()

    cam = Camera(fx=240.0, fy=240.0, cx=160.0, cy=120.0, width=320, height=240)
    # Both processes synthesize both worlds deterministically (cheap at this
    # size) and keep only their own rows' videos.
    seqs = [
        make_sequence(
            np.random.default_rng(42 + i), n_frames=10, cam=cam, n_sprites=140,
            step_t=np.array([0.10, 0.01, 0.16], np.float32),
        )
        for i in range(2)
    ]
    cfg = SlamConfig(
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
    mesh = make_mesh({"seq": 2, "lm": 4})
    rows = local_row_indices(mesh, 2)
    assert len(rows) == 1, rows
    ms = MultiSlam(cam, [ArraySource(seqs[g].frames) for g in rows], mesh, cfg)
    assert ms.initialize()
    n = ms.run_batched(max_frames=6, batch=3)
    assert n == 6, n
    states = ms.states_per_sequence()
    out = {}
    for j, g in enumerate(rows):
        st = states[j]
        out[f"seq{g}_last_t"] = np.asarray(st.last_t)
        out[f"seq{g}_kf_valid"] = np.asarray(st.kfs.valid)
        out[f"seq{g}_num_kf"] = np.asarray(st.num_kf)
    np.savez(os.path.join(outdir, f"proc{jax.process_index()}.npz"), **out)
    print(f"proc {jax.process_index()} ok rows={rows}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
