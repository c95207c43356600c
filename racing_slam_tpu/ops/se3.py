"""SE(3) / SO(3) utilities on static-shape JAX arrays.

Pose convention follows the reference engine: a pose is a 4x4 float32
world->camera transform (reference: src/Frame.cpp:7, src/Camera.cpp:25-29).
For optimization we use the (rvec, t) angle-axis + translation packing the
reference feeds Ceres (reference: src/Optimization.cpp:89-100).

All functions are batched-friendly (leading dims broadcast) and jit-safe
(no data-dependent control flow; small-angle branches via jnp.where).
"""

from __future__ import annotations

import jax.numpy as jnp

from .precision import f32_precision

_EPS = 1e-8


@f32_precision
def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x for w[..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


@f32_precision
def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] skew -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


@f32_precision
def exp_so3(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: angle-axis [..., 3] -> rotation matrix [..., 3, 3].

    Small-angle safe via 2nd-order Taylor expansion of sin/cos coefficients.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # a = sin(t)/t, b = (1-cos(t))/t^2, Taylor for tiny t
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(rvec)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


@f32_precision
def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3].

    Robust near theta=0 (Taylor) and near theta=pi (axis from the diagonal of
    (R + I)/2, sign fixed from the off-diagonal skew part).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin_theta = 0.5 * jnp.linalg.norm(w_skew, axis=-1)
    # atan2 is well conditioned everywhere (arccos is not near cos = ±1).
    theta = jnp.arctan2(sin_theta, cos_theta)

    # Generic branch: theta / (2 sin theta) * vee(R - R^T); Taylor for tiny.
    small = theta < 1e-4
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta + _EPS),
    )
    w_generic = scale[..., None] * w_skew

    # Near-pi branch (sin theta too small for the skew part to carry the
    # axis): the symmetric part obeys (R + R^T)/2 - cos(theta) I =
    # (1 - cos(theta)) a a^T exactly, so its best-conditioned column (largest
    # diagonal) is parallel to the axis. Global sign aligned with the skew
    # part (arbitrary at exactly pi, where both signs are valid logs).
    near_pi = sin_theta < 1e-2
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    M = S - cos_theta[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=R.dtype), R.shape
    )
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(M, k[..., None, None], axis=-1)[..., 0]  # [..., 3]
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    align = jnp.sum(axis * w_skew, axis=-1)
    sign = jnp.where(align < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign[..., None]

    # Only substitute the pi-branch when the rotation is actually large;
    # sin(theta) is also small near theta = 0, where w_generic is correct.
    use_pi = near_pi & (cos_theta < 0.0)
    return jnp.where(use_pi[..., None], w_pi, w_generic)


@f32_precision
def pose_matrix(rvec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(rvec[..., 3], t[..., 3]) -> 4x4 world->camera transform [..., 4, 4]."""
    R = exp_so3(rvec)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


@f32_precision
def rt_from_matrix(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """4x4 [..., 4, 4] -> (rvec[..., 3], t[..., 3])."""
    return log_so3(T[..., :3, :3]), T[..., :3, 3]


@f32_precision
def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid 4x4 transform (R^T, -R^T t)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Rt, t))
    out = out.at[..., 3, 3].set(1.0)
    return out


@f32_precision
def compose(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Ta @ Tb with broadcasting (applies Tb first)."""
    return jnp.einsum("...ij,...jk->...ik", Ta, Tb)


@f32_precision
def transform_points(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] transform to a batch of points [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]


@f32_precision
def transform_point(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] transform to a single point [..., 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, X) + t


@f32_precision
def camera_center(T: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center of a world->camera pose: -R^T t.

    Mirrors the reference's pose.inverse().block<3,1>(0,3) usage
    (src/Triangulation.cpp:77-78).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)
