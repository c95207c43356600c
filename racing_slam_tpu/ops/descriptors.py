"""Patch descriptors: normalized intensity patches projected to 128-d.

Replacement for the reference's ORB descriptors (upright BRIEF over a 31 px
patch — src/features/OrbFeatureExtractor.cpp:18-22; GFTT leaves keypoint
angle unset so ORB::compute produces *upright* descriptors). The TPU design
uses a dense float descriptor instead of binary Hamming: a Gaussian-blurred
S x S intensity patch around each keypoint, mean/variance normalized
(photometric invariance), projected by a fixed random orthonormal matrix to
D = 128 (the TPU lane width) and L2-normalized. Matching distance is then
Euclidean in [0, 2], analogous to the reference's deep-descriptor path
(L2 norm, max distance 0.7 — src/features/DeepFeatureExtractor.h:12-19).

All of it is gathers + one [K, S^2] x [S^2, D] matmul — pure MXU food.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur
from .precision import f32_precision

PATCH_SIZE = 16  # samples per side
PATCH_SPACING = 1.5  # px between samples => ~24 px support (ORB patch is 31)
DESCRIPTOR_DIM = 128
BLUR_SIGMA = 2.0
# Default match gate for these descriptors (L2 on unit vectors, in [0, 2]);
# analogous role to max_distance() in the reference extractors.
MAX_DISTANCE = 0.8


def _projection_matrix() -> np.ndarray:
    """Fixed random orthonormal [S^2, D] projection (seeded, reproducible)."""
    rng = np.random.default_rng(1234)
    A = rng.standard_normal((PATCH_SIZE * PATCH_SIZE, PATCH_SIZE * PATCH_SIZE))
    Q, _ = np.linalg.qr(A)
    return Q[:, :DESCRIPTOR_DIM].astype(np.float32)


_PROJ = _projection_matrix()


def _patch_offsets() -> np.ndarray:
    """[S^2, 2] (dx, dy) sampling grid centered on the keypoint."""
    r = (PATCH_SIZE - 1) / 2.0
    lin = (np.arange(PATCH_SIZE) - r) * PATCH_SPACING
    dx, dy = np.meshgrid(lin, lin)
    return np.stack([dx.ravel(), dy.ravel()], axis=-1).astype(np.float32)


_OFFSETS = _patch_offsets()


# Side of the square window fetched around each keypoint. Must cover the
# sampling support (PATCH_SIZE * PATCH_SPACING = 24 px) + 1 px for bilinear;
# 32 keeps the minor dims tile-aligned.
PATCH_T = 32


@f32_precision
def extract_descriptors(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Compute descriptors for keypoints.

    Args:
      img: [H, W] grayscale float32 (unblurred; blurring happens here).
      xy: [K, 2] keypoint pixel coords.
    Returns: [K, D] L2-normalized float32 descriptors.

    TPU note: instead of 4 scalar gathers per sample (K * S^2 * 4 random
    loads — the dominant cost of the naive bilinear formulation), this
    fetches one contiguous [T, T] window per keypoint (a single XLA gather
    of K tiles via vmapped dynamic_slice) and expresses the fractional
    sampling grid as two small per-keypoint interpolation matmuls — the
    separable structure of bilinear interpolation. Everything downstream of
    the window fetch is MXU work.
    """
    H, W = img.shape
    K = xy.shape[0]
    S = PATCH_SIZE
    T = PATCH_T
    blurred = gaussian_blur(img, BLUR_SIGMA)

    r = (S - 1) / 2.0
    lin = jnp.asarray((np.arange(S) - r) * PATCH_SPACING, jnp.float32)  # [S]
    x = jnp.clip(xy[:, 0], 0.0, W - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.001)
    ox = jnp.clip(jnp.floor(x).astype(jnp.int32) - T // 2 + 1, 0, W - T)
    oy = jnp.clip(jnp.floor(y).astype(jnp.int32) - T // 2 + 1, 0, H - T)
    patches = jax.vmap(
        lambda oy_, ox_: jax.lax.dynamic_slice(blurred, (oy_, ox_), (T, T))
    )(oy, ox)  # [K, T, T]

    def interp_matrix(coord, origin):
        """Bilinear weights of the S sample positions over the T window
        columns: [K, S, T] with two nonzeros per row."""
        s = coord[:, None] + lin[None, :] - origin[:, None].astype(jnp.float32)
        s = jnp.clip(s, 0.0, T - 1.001)
        s0 = jnp.floor(s)
        f = (s - s0)[..., None]  # [K, S, 1]
        s0i = s0.astype(jnp.int32)[..., None]  # [K, S, 1]
        cols = jnp.arange(T, dtype=jnp.int32)
        return (cols == s0i) * (1.0 - f) + (cols == s0i + 1) * f

    Ry = interp_matrix(y, oy)  # [K, S, T]
    Cx = interp_matrix(x, ox)  # [K, S, T]
    rows = jnp.einsum("kiy,kyx->kix", Ry, patches)  # [K, S, T]
    sampled = jnp.einsum("kix,kjx->kij", rows, Cx)  # [K, S(y), S(x)]
    # Flatten in (dy-major, dx-minor) order, matching _OFFSETS/meshgrid.
    patches_flat = sampled.reshape(K, S * S)
    mean = jnp.mean(patches_flat, axis=-1, keepdims=True)
    std = jnp.std(patches_flat, axis=-1, keepdims=True) + 1e-6
    normed = (patches_flat - mean) / std
    desc = normed @ jnp.asarray(_PROJ)  # [K, D]
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
