"""Shared synthetic-rig helpers for geometry tests (closed-form ground truth)."""

from __future__ import annotations

import numpy as np

from racing_slam_tpu.ops.camera import Camera


def default_camera(width=640, height=480) -> Camera:
    return Camera(fx=500.0, fy=500.0, cx=width / 2, cy=height / 2, width=width, height=height)


def random_pose(rng: np.random.Generator, max_angle=0.3, max_trans=1.0) -> np.ndarray:
    """Random world->camera 4x4 with bounded rotation."""
    from scipy.spatial.transform import Rotation

    rvec = rng.uniform(-max_angle, max_angle, 3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(rvec).as_matrix()
    T[:3, 3] = rng.uniform(-max_trans, max_trans, 3)
    return T


def synthetic_scene(
    rng: np.random.Generator,
    n_points=200,
    depth_range=(4.0, 10.0),
    spread=3.0,
):
    """Points in front of the identity camera."""
    X = np.stack(
        [
            rng.uniform(-spread, spread, n_points),
            rng.uniform(-spread, spread, n_points),
            rng.uniform(*depth_range, n_points),
        ],
        axis=-1,
    ).astype(np.float32)
    return X


def project_np(cam: Camera, pose: np.ndarray, X: np.ndarray) -> np.ndarray:
    """NumPy reference projection for ground truth."""
    Xc = X @ pose[:3, :3].T + pose[:3, 3]
    u = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
    v = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
    return np.stack([u, v], axis=-1).astype(np.float32)
