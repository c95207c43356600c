"""Checkpoint / resume of the full SLAM state.

The reference keeps map and trajectory only in memory (src/Slam.h:42-47) —
no persistence. Here the whole world state is one pytree of arrays, so
checkpointing is a flat npz dump (fast, dependency-free) with an orbax
backend available for async multi-host use. Saving every keyframe gives
crash-recoverable sessions; `load_state` restores bit-identical state.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..slam.state import Features, KeyframeStore, MapState, SlamState


def save_state(path: str | Path, state: SlamState) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    out = {}
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        if a.dtype.name == "bfloat16":  # npz cannot serialize ml_dtypes
            out[f"leaf_{i}__bf16"] = a.astype(np.float32)
        else:
            out[f"leaf_{i}"] = a
    np.savez_compressed(path, **out)


def load_state(path: str | Path) -> SlamState:
    import jax.numpy as _jnp

    with np.load(path) as data:
        leaves = []
        for i in range(len(data.files)):
            if f"leaf_{i}" in data:
                leaves.append(data[f"leaf_{i}"])
            else:
                leaves.append(
                    _jnp.asarray(data[f"leaf_{i}__bf16"], _jnp.bfloat16)
                )
    # Rebuild the pytree structure from a template with matching shapes.
    import jax.numpy as jnp

    template_treedef = jax.tree_util.tree_structure(
        SlamState(
            kfs=KeyframeStore(*([0] * 8)),
            map=MapState(*([0] * 6)),
            num_kf=0,
            last_kf_slot=0,
            last_rvec=0,
            last_t=0,
            prev_rvec=0,
            prev_t=0,
            last_feat=Features(0, 0, 0, 0),
            last_matches=0,
            frame_count=0,
            obs_desc=0,
            reproj_px=0,
        )
    )
    return jax.tree_util.tree_unflatten(
        template_treedef, [jnp.asarray(x) for x in leaves]
    )


def save_state_orbax(path: str | Path, state: SlamState) -> None:
    """Orbax backend (async-capable, multi-host-aware)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), state)
    ckptr.wait_until_finished()


def load_state_orbax(path: str | Path, template: SlamState) -> SlamState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), template)
