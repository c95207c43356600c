"""Checkpoint / resume of the full SLAM state.

The reference keeps map and trajectory only in memory (src/Slam.h:42-47) —
no persistence. Here the whole world state is one pytree of arrays, so
checkpointing is a flat npz dump (fast, dependency-free) with an orbax
backend available for async multi-host use. Saving every keyframe gives
crash-recoverable sessions; `load_state` restores bit-identical state.

Format (v2): each leaf is stored under its STABLE pytree key path
("kfs.rvec", "map.pos", ...), plus a `__format_version__` marker. Fields
added to SlamState in later releases are backfilled from
`SlamState.create` defaults on load, so old checkpoints keep loading
(the positional leaf_N layout of v1 broke on any schema change).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..slam.state import SlamState

FORMAT_VERSION = 2


def _named_leaves(state: SlamState) -> dict:
    """Flatten a SlamState to {dotted-path: array} with stable names."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for path, leaf in flat:
        name = ".".join(
            p.name if hasattr(p, "name") else str(p.idx) for p in path
        )
        out[name] = leaf
    return out


def save_state(path: str | Path, state: SlamState) -> None:
    out = {"__format_version__": np.int64(FORMAT_VERSION)}
    for name, x in _named_leaves(state).items():
        a = np.asarray(x)
        if a.dtype.name == "bfloat16":  # npz cannot serialize ml_dtypes
            out[f"{name}__bf16"] = a.astype(np.float32)
        else:
            out[name] = a
    np.savez_compressed(path, **out)


# v1 (positional leaf_N) stored the pre-archive SlamState: the current
# field order MINUS these appended-later fields. Their absence defines the
# leaf_i -> dotted-name mapping the migration loader below relies on.
_V1_ABSENT = (
    "arch_rvec", "arch_t", "arch_frame_index", "arch_count", "last_inliers",
)


def _load_v1(data, jnp) -> dict:
    """Map a v1 positional checkpoint's leaves onto current field names.
    The v1 schema is a strict prefix of the current one (all later fields
    were appended), so position i corresponds to the i-th current name
    after dropping the appended fields."""
    template = SlamState.create(F=1, P=1, O=1, K=1, D=1, A=1)
    names = [n for n in _named_leaves(template) if n not in _V1_ABSENT]
    n_leaves = len(data.files)
    if n_leaves != len(names):
        raise ValueError(
            f"v1 checkpoint has {n_leaves} leaves; this release's v1 "
            f"migration expects {len(names)} (pre-archive SlamState) — "
            "the file was written by an unknown intermediate schema"
        )
    stored = {}
    for i, name in enumerate(names):
        if f"leaf_{i}" in data:
            stored[name] = data[f"leaf_{i}"]
        else:
            stored[name] = jnp.asarray(data[f"leaf_{i}__bf16"], jnp.bfloat16)
    return stored


def load_state(
    path: str | Path, archive_capacity: int | None = None
) -> SlamState:
    """Restore a SlamState. `archive_capacity` sizes the backfilled archive
    when the file predates the archive fields (defaults to 512); pass the
    engine's SlamConfig.archive_capacity so the loaded state matches the
    compiled shapes."""
    import jax.numpy as jnp

    with np.load(path) as data:
        files = set(data.files)
        if "__format_version__" not in files:
            # Pre-v2 positional checkpoint: best-effort migration (the v1
            # leaf order is known — see _V1_ABSENT).
            stored = _load_v1(data, jnp)
        else:
            stored = {}
            for f in files:
                if f == "__format_version__":
                    continue
                if f.endswith("__bf16"):
                    stored[f[: -len("__bf16")]] = jnp.asarray(
                        data[f], jnp.bfloat16
                    )
                else:
                    stored[f] = data[f]

    # Template with the checkpoint's shapes; fields absent from the file
    # (added after it was written) keep their create() defaults.
    F, K, D = stored["kfs.desc"].shape
    P, O = stored["map.obs_kf"].shape
    A = (
        stored["arch_frame_index"].shape[0]
        if "arch_frame_index" in stored
        else (archive_capacity if archive_capacity is not None else 512)
    )
    template = SlamState.create(F=F, P=P, O=O, K=K, D=D, A=A)
    names = list(_named_leaves(template).keys())
    unknown = set(stored) - set(names)
    if unknown:
        raise ValueError(
            f"{path} contains fields not in this release's SlamState: "
            f"{sorted(unknown)}"
        )
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = [
        jnp.asarray(stored[n], x.dtype) if n in stored else x
        for n, x in zip(names, flat)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
