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

from .image import bilinear_sample, gaussian_blur
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


@f32_precision
def extract_descriptors(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Compute descriptors for keypoints.

    Args:
      img: [H, W] grayscale float32 (unblurred; blurring happens here).
      xy: [K, 2] keypoint pixel coords.
    Returns: [K, D] L2-normalized float32 descriptors.
    """
    blurred = gaussian_blur(img, BLUR_SIGMA)
    coords = xy[:, None, :] + jnp.asarray(_OFFSETS)[None, :, :]  # [K, S^2, 2]
    patches = bilinear_sample(blurred, coords)  # [K, S^2]
    mean = jnp.mean(patches, axis=-1, keepdims=True)
    std = jnp.std(patches, axis=-1, keepdims=True) + 1e-6
    normed = (patches - mean) / std
    desc = normed @ jnp.asarray(_PROJ)  # [K, D]
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
