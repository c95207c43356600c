"""Pinhole camera model (no distortion), mirroring the reference camera.

Reference: src/Camera.{h,cpp} — intrinsics K built from (fx, fy, cx, cy)
(src/Camera.cpp:5-13), projection = hnormalize(K [R|t] X) (src/Camera.cpp:25-29),
in-image bounds test (src/Camera.cpp:31-34).

Camera is a small static pytree; all ops broadcast over leading batch dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .precision import f32_precision

from . import se3


class Camera(NamedTuple):
    """Pinhole intrinsics. Static per-sequence; safe to close over in jit."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


@f32_precision
def project_camera_points(cam: Camera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points [..., 3] -> pixel coords [..., 2].

    No cheirality handling here; callers mask on depth separately (the
    reference behaves identically: projection is unconditional, validity is
    checked by is_in_image / z>0 filters).
    """
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


@f32_precision
def project(cam: Camera, pose: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """World points [..., N, 3] through world->camera pose [..., 4, 4] -> pixels.

    Equivalent to the reference Camera::project (src/Camera.cpp:25-29).
    """
    Xc = se3.transform_points(pose, X)
    return project_camera_points(cam, Xc)


@f32_precision
def project_with_depth(
    cam: Camera, pose: jnp.ndarray, X: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Like project, but also returns camera-space depth [..., N]."""
    Xc = se3.transform_points(pose, X)
    return project_camera_points(cam, Xc), Xc[..., 2]


def is_in_image(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Bounds test for pixel coords [..., 2] -> bool [...].

    Reference: src/Camera.cpp:31-34 (0 <= u < width, 0 <= v < height).
    """
    u, v = uv[..., 0], uv[..., 1]
    return (u >= 0.0) & (u < cam.width) & (v >= 0.0) & (v < cam.height)


@f32_precision
def normalize_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] -> normalized image plane coords ((u-cx)/fx, (v-cy)/fy)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


@f32_precision
def projection_matrix(cam: Camera, pose: jnp.ndarray) -> jnp.ndarray:
    """3x4 projection matrix K [R|t] (reference cv_utils::projection_mat_cv,
    src/Camera.cpp:42-56)."""
    return jnp.einsum("ij,...jk->...ik", cam.K, pose[..., :3, :4])
