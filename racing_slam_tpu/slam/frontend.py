"""Feature frontends: classical (corner + patch descriptor) and learned.

The reference has two interchangeable extractors behind
BaseFeatureExtractor (src/features/FeatureExtractor.h:43-59):
OrbFeatureExtractor (GFTT + ORB) and DeepFeatureExtractor (lightglue-cpp
SuperPoint-style). Here a frontend is a small object exposing

    extract(img, mask) -> Features      (jit-safe, static K)
    max_distance                        (match gate for its descriptor space)

The classical frontend corresponds to the ORB path; the learned frontend
(models/superpoint.py) plugs in behind the same interface.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.corners import detect_corners
from ..ops.descriptors import MAX_DISTANCE, extract_descriptors_cells
from .state import Features


class ClassicalFrontend:
    """Shi-Tomasi grid corners + normalized patch descriptors."""

    def __init__(
        self,
        cell: int = 16,
        n_per_cell: int = 2,
        max_distance: float = MAX_DISTANCE,
    ):
        self.cell = cell
        self.n_per_cell = n_per_cell
        self.max_distance = max_distance
        from ..ops.descriptors import DESCRIPTOR_DIM

        self.descriptor_dim = DESCRIPTOR_DIM

    def num_keypoints(self, height: int, width: int) -> int:
        return self.n_per_cell * (-(-height // self.cell)) * (-(-width // self.cell))

    def extract(self, img: jnp.ndarray, mask: jnp.ndarray | None = None) -> Features:
        c = detect_corners(
            img, mask=mask, cell=self.cell, n_per_cell=self.n_per_cell
        )
        # Cell-ordered keypoints -> gather-free descriptor extraction.
        d = extract_descriptors_cells(img, c.xy, self.cell, self.n_per_cell)
        return Features(xy=c.xy, desc=d, valid=c.valid, score=c.score)
