"""Mesh helpers.

The reference is single-process with no communication backend (SURVEY.md
§2.12-bis); scale-out here is jax.sharding over ICI/DCN: landmark shards for
bundle adjustment ('lm' axis) and independent sequences for data parallelism
('seq' axis). Collectives are XLA psum/all_gather inserted via shard_map —
no hand-written backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: dict[str, int] | None = None) -> Mesh:
    """Build a mesh from {axis: size}; default: all devices on 'lm'."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = {"lm": len(devices)}
    sizes = tuple(shape.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {shape} needs {np.prod(sizes)} devices, have {len(devices)}"
        )
    return Mesh(devices.reshape(sizes), tuple(shape.keys()))
