import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.ops.triangulation import triangulate_points
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene


def _two_view_setup(rng, n=150, baseline=1.0):
    cam = default_camera()
    pose1 = np.eye(4, dtype=np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[:3, 3] = [-baseline, 0.05, 0.02]  # translate camera right in world
    X = synthetic_scene(rng, n)
    uv1 = project_np(cam, pose1, X)
    uv2 = project_np(cam, pose2, X)
    return cam, pose1, pose2, X, uv1, uv2


def test_triangulate_recovers_points(rng):
    cam, pose1, pose2, X, uv1, uv2 = _two_view_setup(rng)
    tri = triangulate_points(cam, jnp.asarray(pose1), jnp.asarray(pose2),
                             jnp.asarray(uv1), jnp.asarray(uv2))
    valid = np.asarray(tri.valid)
    assert valid.mean() > 0.95
    err = np.linalg.norm(np.asarray(tri.points)[valid] - X[valid], axis=-1)
    assert np.median(err) < 0.02


def test_low_parallax_rejected(rng):
    # Nearly identical cameras -> parallax filter kills everything.
    cam, pose1, _, X, uv1, _ = _two_view_setup(rng)
    pose2 = pose1.copy()
    pose2[:3, 3] = [-1e-6, 0, 0]
    uv2 = project_np(cam, pose2, X)
    tri = triangulate_points(cam, jnp.asarray(pose1), jnp.asarray(pose2),
                             jnp.asarray(uv1), jnp.asarray(uv2))
    assert np.asarray(tri.valid).sum() == 0


def test_behind_camera_rejected(rng):
    cam, pose1, pose2, X, uv1, uv2 = _two_view_setup(rng, n=50)
    # Swap correspondences so triangulation lands behind the cameras for many
    # rows; at minimum no *valid* point may be behind either camera.
    tri = triangulate_points(cam, jnp.asarray(pose1), jnp.asarray(pose2),
                             jnp.asarray(uv2), jnp.asarray(uv1))
    pts = np.asarray(tri.points)
    valid = np.asarray(tri.valid)
    if valid.any():
        z1 = pts[valid][:, 2]
        assert (z1 > 0).all()


def test_noisy_matches_filtered(rng):
    cam, pose1, pose2, X, uv1, uv2 = _two_view_setup(rng)
    uv2_noisy = uv2.copy()
    uv2_noisy[:30] += rng.uniform(20, 50, (30, 2)).astype(np.float32)  # gross outliers
    tri = triangulate_points(cam, jnp.asarray(pose1), jnp.asarray(pose2),
                             jnp.asarray(uv1), jnp.asarray(uv2_noisy))
    valid = np.asarray(tri.valid)
    # Reprojection filter (2 px, Triangulation.cpp:90) rejects the corrupted rows.
    assert valid[:30].sum() == 0
    assert valid[30:].mean() > 0.9


def test_input_mask_respected(rng):
    cam, pose1, pose2, X, uv1, uv2 = _two_view_setup(rng, n=40)
    mask = np.ones(40, bool)
    mask[::2] = False
    tri = triangulate_points(cam, jnp.asarray(pose1), jnp.asarray(pose2),
                             jnp.asarray(uv1), jnp.asarray(uv2), mask=jnp.asarray(mask))
    assert not np.asarray(tri.valid)[~mask].any()
