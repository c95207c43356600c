import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.ops import camera as cam_ops
from tests.geometry_fixtures import default_camera, project_np, random_pose, synthetic_scene


def test_project_matches_reference_formula(rng):
    cam = default_camera()
    pose = jnp.asarray(random_pose(rng))
    X = synthetic_scene(rng, 100)
    uv = cam_ops.project(cam, pose, jnp.asarray(X))
    uv_ref = project_np(cam, np.asarray(pose), X)
    np.testing.assert_allclose(np.asarray(uv), uv_ref, atol=2e-2)


def test_in_image_bounds():
    cam = default_camera(640, 480)
    uv = jnp.array([[0.0, 0.0], [639.9, 479.9], [640.0, 100.0], [-0.1, 5.0], [320, 480]])
    got = np.asarray(cam_ops.is_in_image(cam, uv))
    np.testing.assert_array_equal(got, [True, True, False, False, False])


def test_normalize_roundtrip(rng):
    cam = default_camera()
    uv = jnp.asarray(rng.uniform(0, 600, (50, 2)).astype(np.float32))
    x = cam_ops.normalize_pixels(cam, uv)
    back = jnp.stack([x[:, 0] * cam.fx + cam.cx, x[:, 1] * cam.fy + cam.cy], axis=-1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-3)


def test_projection_matrix(rng):
    cam = default_camera()
    pose = random_pose(rng)
    P = np.asarray(cam_ops.projection_matrix(cam, jnp.asarray(pose)))
    K = np.asarray(cam.K)
    np.testing.assert_allclose(P, K @ pose[:3, :4], atol=1e-4)
