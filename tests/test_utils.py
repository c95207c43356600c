import numpy as np
import jax
import jax.numpy as jnp

from racing_slam_tpu.slam.state import SlamState
from racing_slam_tpu.utils.checkpoint import load_state, save_state
from racing_slam_tpu.utils.metrics import ate_rmse, umeyama_sim3
from racing_slam_tpu.utils import viz


def test_checkpoint_roundtrip(tmp_path, rng):
    state = SlamState.create(F=4, P=32, O=4, K=16, D=8)
    state = state._replace(
        num_kf=jnp.int32(2),
        map=state.map._replace(
            pos=jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32)),
            valid=jnp.asarray(rng.random(32) > 0.5),
        ),
        last_rvec=jnp.asarray([0.1, 0.2, 0.3]),
    )
    p = tmp_path / "state.npz"
    save_state(p, state)
    restored = load_state(p)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.num_kf) == 2


def test_checkpoint_v1_migration(tmp_path, rng):
    """A v1 positional checkpoint (pre-archive schema, leaf_N layout) loads
    via the migration path: shared fields restored exactly, appended fields
    (archive, last_inliers) backfilled at the requested capacity."""
    from racing_slam_tpu.utils.checkpoint import _V1_ABSENT, _named_leaves

    state = SlamState.create(F=4, P=32, O=4, K=16, D=8)
    state = state._replace(
        num_kf=jnp.int32(3),
        last_rvec=jnp.asarray([0.4, 0.5, 0.6]),
        map=state.map._replace(
            pos=jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32)),
        ),
    )
    # Write the file exactly as the v1 save_state did: positional leaves of
    # the pre-archive field set, bf16 stored as f32 under a __bf16 suffix.
    named = _named_leaves(state)
    v1 = [(n, x) for n, x in named.items() if n not in _V1_ABSENT]
    out = {}
    for i, (_, x) in enumerate(v1):
        a = np.asarray(x)
        if a.dtype.name == "bfloat16":
            out[f"leaf_{i}__bf16"] = a.astype(np.float32)
        else:
            out[f"leaf_{i}"] = a
    p = tmp_path / "v1.npz"
    np.savez_compressed(p, **out)

    restored = load_state(p, archive_capacity=7)
    rest_named = _named_leaves(restored)
    for n, x in v1:
        np.testing.assert_array_equal(np.asarray(x), np.asarray(rest_named[n]))
    assert restored.arch_frame_index.shape == (7,)
    assert int(restored.arch_count) == 0
    assert int(restored.num_kf) == 3


def test_umeyama_recovers_similarity(rng):
    src = rng.standard_normal((50, 3))
    from scipy.spatial.transform import Rotation

    R_gt = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_gt * (R_gt @ src.T).T + t_gt
    s, R, t = umeyama_sim3(src, dst)
    assert abs(s - s_gt) < 1e-6
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)


def test_ate_zero_for_similar_trajectories(rng):
    n = 20
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 5, n)
    scaled = poses.copy()
    scaled[:, 0, 3] *= 3.0  # pure scale difference -> Sim3 alignment kills it
    assert ate_rmse(scaled, poses) < 1e-6
    assert ate_rmse(poses, poses, align=False) < 1e-12


def test_viz_outputs(tmp_path, rng):
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5) * 0.1
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    viz.save_trajectory_plot(tmp_path / "t.png", poses, pts)
    viz.export_ply(tmp_path / "m.ply", pts, poses=poses)
    viz.save_trajectory_tum(tmp_path / "t.tum", poses)
    assert (tmp_path / "t.png").stat().st_size > 1000
    ply = (tmp_path / "m.ply").read_text()
    assert ply.startswith("ply") and f"element vertex {30 + 5}" in ply
    assert len((tmp_path / "t.tum").read_text().splitlines()) == 5


def test_cli_synthetic(tmp_path):
    from racing_slam_tpu.run import main

    rc = main([
        "--synthetic", "--synthetic-frames", "10", "--max-frames", "6",
        "--out", str(tmp_path / "out"), "--quiet",
        "--max-keyframes", "8", "--map-capacity", "1024",
    ])
    assert rc == 0
    out = tmp_path / "out"
    for f in ["trajectory.png", "map.ply", "trajectory.tum", "state.npz", "metrics.jsonl"]:
        assert (out / f).exists(), f


def test_native_video_loader(tmp_path):
    """The C++ threaded decoder must produce the same frames as cv2."""
    import cv2

    from racing_slam_tpu.native_bindings import available

    if not available():
        import pytest

        pytest.skip("native library not built")
    from racing_slam_tpu.native_bindings import NativeVideoLoader

    path = str(tmp_path / "t.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    rng = np.random.default_rng(0)
    raw = [(rng.random((48, 64, 3)) * 255).astype(np.uint8) for _ in range(8)]
    for f in raw:
        w.write(f)
    w.release()

    vl = NativeVideoLoader(path)
    assert (vl.width, vl.height) == (64, 48)
    got = list(vl)
    vl.close()
    assert len(got) == 8

    cap = cv2.VideoCapture(path)
    for g in got:
        ok, f = cap.read()
        assert ok
        ref = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(g, ref)
