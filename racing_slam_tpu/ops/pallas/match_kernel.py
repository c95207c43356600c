"""Fused guided-matching kernel (map points -> frame keypoints) in Pallas.

This is the TPU re-design of the reference's single most important inner loop
(src/features/FeatureExtractor.cpp:26-92, traced in SURVEY.md §3.5): for each
map point, find the best-matching keypoint among those within a radius of its
projection, scoring against the minimum distance over the point's stored
observation descriptors.

Kernel shape: attention-style. Grid over (point tiles, keypoint tiles); per
(TP, TK) block it
- computes the pixel-distance gate [TP, TK] from projected point uvs vs
  keypoint uvs (VPU broadcasts),
- runs O descriptor-distance matmuls [TP, D] x [D, TK] on the MXU,
  min-accumulating over the observation axis in VMEM,
- applies gates and merges the block's per-point argmin into a running
  (best_d, best_k) scratch carried across keypoint tiles,
all without spilling any [TP, O, K] intermediate to HBM (the XLA fallback in
ops/matching.py materializes them chunk-by-chunk). Keypoint tiling keeps the
VMEM working set bounded for any K — 480p (K=2400) runs as one K tile,
matching the round-2 kernel exactly; 720p (K=7200) runs four.

The second reduction (best point per keypoint + de-dup) is a tiny scatter-min
left to XLA. Outputs are bit-compatible with the XLA path's stage 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _kernel(
    uv_p_ref,  # [TP, 2] projected point pixels
    gate_p_ref,  # [TP, 1] f32 0/1
    obs_desc_ref,  # [TP * O, D]
    obs_valid_ref,  # [TP, O] f32 0/1
    kp_uv_ref,  # [TK, 2]
    kp_desc_ref,  # [TK, D]
    kp_ok_ref,  # [TK, 1] f32 0/1
    best_k_ref,  # [TP, 1] i32 out
    best_d_ref,  # [TP, 1] f32 out (squared distance)
    acc_ref,  # [TP, TK] f32 scratch: running min over observations
    run_d_ref,  # [TP, 1] f32 scratch: best distance across K tiles
    run_k_ref,  # [TP, 1] i32 scratch: best keypoint across K tiles
    *,
    O: int,
    radius_sq: float,
    tile_k: int,
    n_k: int,
):
    TP = uv_p_ref.shape[0]
    TK = kp_uv_ref.shape[0]
    k_id = pl.program_id(1)

    # Pixel gate [TP, TK].
    du = uv_p_ref[:, 0:1] - kp_uv_ref[:, 0][None, :]
    dv = uv_p_ref[:, 1:2] - kp_uv_ref[:, 1][None, :]
    px_ok = (du * du + dv * dv) <= radius_sq

    kp_desc = kp_desc_ref[:]  # [TK, D] bf16
    kp_f32 = kp_desc.astype(jnp.float32)
    kp_n2 = jnp.sum(kp_f32 * kp_f32, axis=-1)[None, :]  # [1, TK]

    acc_ref[:] = jnp.full((TP, TK), _BIG, jnp.float32)
    for o in range(O):
        od = obs_desc_ref[pl.ds(o * TP, TP), :]  # [TP, D] bf16 (obs o per point)
        od_f32 = od.astype(jnp.float32)
        on2 = jnp.sum(od_f32 * od_f32, axis=-1)[:, None]  # [TP, 1]
        cross = jax.lax.dot_general(
            od,
            kp_desc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Explicit DEFAULT: the surrounding f32_precision context sets
            # HIGHEST, which Mosaic rejects for bf16 operands ("Bad lhs
            # type") — bf16 x bf16 -> f32 accumulate IS the intended op.
            precision=jax.lax.Precision.DEFAULT,
        )  # [TP, TK] (see matching._pairwise_sq_dists for the bf16 rationale)
        dd = jnp.maximum(on2 + kp_n2 - 2.0 * cross, 0.0)
        ov = obs_valid_ref[:, o][:, None] > 0.0
        acc_ref[:] = jnp.minimum(acc_ref[:], jnp.where(ov, dd, _BIG))

    ok = px_ok & (gate_p_ref[:] > 0.0) & (kp_ok_ref[:, 0][None, :] > 0.0)
    dd = jnp.where(ok, acc_ref[:], _BIG)
    loc_d = jnp.min(dd, axis=-1, keepdims=True)  # [TP, 1]
    loc_k = (
        jnp.argmin(dd, axis=-1).astype(jnp.int32)[:, None] + k_id * tile_k
    )

    @pl.when(k_id == 0)
    def _():
        run_d_ref[:] = jnp.full((TP, 1), _BIG, jnp.float32)
        run_k_ref[:] = jnp.zeros((TP, 1), jnp.int32)

    better = loc_d < run_d_ref[:]
    run_d_ref[:] = jnp.where(better, loc_d, run_d_ref[:])
    run_k_ref[:] = jnp.where(better, loc_k, run_k_ref[:])

    @pl.when(k_id == n_k - 1)
    def _():
        best_d_ref[:] = run_d_ref[:]
        best_k_ref[:] = run_k_ref[:]


@partial(
    jax.jit,
    static_argnames=("tile_p", "radius_px", "interpret"),
)
def guided_match_stage1(
    uv_p: jnp.ndarray,  # [P, 2]
    gate_p: jnp.ndarray,  # [P] bool
    obs_desc: jnp.ndarray,  # [P, O, D]
    obs_valid: jnp.ndarray,  # [P, O] bool
    kp_uv: jnp.ndarray,  # [K, 2]
    kp_desc: jnp.ndarray,  # [K, D]
    kp_ok: jnp.ndarray,  # [K] bool
    radius_px: float = 20.0,
    tile_p: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point best keypoint + squared descriptor distance.

    Returns (best_k [P] i32, best_d_sq [P] f32 — _BIG where nothing passed
    the gates). Matches the XLA fallback's stage-1 semantics exactly.
    """
    P, O, D = obs_desc.shape
    K = kp_uv.shape[0]
    if P % tile_p != 0:
        raise ValueError(f"P={P} must be a multiple of tile_p={tile_p}")

    # Keypoint tiling: one tile up to 2560 (the measured 480p K=2400 shape
    # compiles in one tile at ~14 MB VMEM); beyond that, split so every
    # [tile_p, TK] plane stays bounded (full 720p K=7200 OOM'd at 28 MB).
    if K <= 2560:
        n_k, tile_k = 1, K
    else:
        tile_k = 2048
        n_k = -(-K // tile_k)
    Kp = n_k * tile_k
    if Kp != K:
        pad = Kp - K
        kp_uv = jnp.concatenate(
            [kp_uv, jnp.full((pad, 2), 1e7, kp_uv.dtype)], axis=0
        )
        kp_desc = jnp.concatenate(
            [kp_desc, jnp.zeros((pad, D), kp_desc.dtype)], axis=0
        )
        kp_ok = jnp.concatenate([kp_ok, jnp.zeros((pad,), bool)], axis=0)

    # Layout: observation-major rows grouped per tile so the kernel can slice
    # [o*TP:(o+1)*TP] contiguously: [P/TP, O, TP, D] -> [(P/TP)*O*TP, D].
    n_tiles = P // tile_p
    obs_rows = (
        obs_desc.reshape(n_tiles, tile_p, O, D)
        .transpose(0, 2, 1, 3)
        .reshape(n_tiles * O * tile_p, D)
    )

    grid = (n_tiles, n_k)
    out = pl.pallas_call(
        partial(
            _kernel, O=O, radius_sq=radius_px * radius_px,
            tile_k=tile_k, n_k=n_k,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, 2), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_p * O, D), lambda i, k: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tile_p, O), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 2), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, D), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_p, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_p, tile_k), jnp.float32),
            pltpu.VMEM((tile_p, 1), jnp.float32),
            pltpu.VMEM((tile_p, 1), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * P * O * Kp * D,
            bytes_accessed=P * O * D * 4 + Kp * D * 4 + P * Kp * 4,
            transcendentals=0,
        ),
    )(
        uv_p.astype(jnp.float32),
        gate_p.astype(jnp.float32)[:, None],
        obs_rows.astype(jnp.bfloat16),
        obs_valid.astype(jnp.float32),
        kp_uv.astype(jnp.float32),
        kp_desc.astype(jnp.bfloat16),
        kp_ok.astype(jnp.float32)[:, None],
    )
    best_k, best_d = out
    return best_k[:, 0], best_d[:, 0]


# ---------------------------------------------------------------------------
# Banded (grid-hash) variant: work ~ gated points x keypoint band, not P x K
# ---------------------------------------------------------------------------


def _banded_kernel(
    starts_ref,  # scalar prefetch: [n_tiles] i32 first kp tile per point tile
    nact_ref,  # scalar prefetch: [1] i32 number of ACTIVE point tiles
    uv_p_ref,  # [TP, 2]
    gate_p_ref,  # [TP, 1]
    obs_desc_ref,  # [TP * O, D]
    obs_valid_ref,  # [TP, O]
    kp_uv_ref,  # [TK, 2]
    kp_desc_ref,  # [TK, D]
    kp_ok_ref,  # [TK, 1]
    best_k_ref,  # [TP, 1] i32 out
    best_d_ref,  # [TP, 1] f32 out
    acc_ref,  # [TP, TK] f32 scratch
    run_d_ref,  # [TP, 1] f32 scratch
    run_k_ref,  # [TP, 1] i32 scratch
    *,
    O: int,
    radius_sq: float,
    tile_k: int,
    n_band: int,
):
    """Same contract as _kernel, but keypoint tiles come from a per-point-tile
    band (starts_ref[i] + j) over y-sorted keypoints, and the O descriptor
    matmuls are skipped entirely for inactive (all-ungated) point tiles —
    the grid-hash replacement for the reference's KD-tree
    (src/KDTree.cpp:45-82): spatial pruning via sorted-order banding."""
    TP = uv_p_ref.shape[0]
    TK = kp_uv_ref.shape[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    k_tile = starts_ref[i] + j

    du = uv_p_ref[:, 0:1] - kp_uv_ref[:, 0][None, :]
    dv = uv_p_ref[:, 1:2] - kp_uv_ref[:, 1][None, :]
    px_ok = (du * du + dv * dv) <= radius_sq

    kp_desc = kp_desc_ref[:]
    kp_f32 = kp_desc.astype(jnp.float32)
    kp_n2 = jnp.sum(kp_f32 * kp_f32, axis=-1)[None, :]

    acc_ref[:] = jnp.full((TP, TK), _BIG, jnp.float32)

    @pl.when(i < nact_ref[0])
    def _():
        for o in range(O):
            od = obs_desc_ref[pl.ds(o * TP, TP), :]
            od_f32 = od.astype(jnp.float32)
            on2 = jnp.sum(od_f32 * od_f32, axis=-1)[:, None]
            cross = jax.lax.dot_general(
                od,
                kp_desc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            dd = jnp.maximum(on2 + kp_n2 - 2.0 * cross, 0.0)
            ov = obs_valid_ref[:, o][:, None] > 0.0
            acc_ref[:] = jnp.minimum(acc_ref[:], jnp.where(ov, dd, _BIG))

    ok = px_ok & (gate_p_ref[:] > 0.0) & (kp_ok_ref[:, 0][None, :] > 0.0)
    dd = jnp.where(ok, acc_ref[:], _BIG)
    loc_d = jnp.min(dd, axis=-1, keepdims=True)
    loc_k = (
        jnp.argmin(dd, axis=-1).astype(jnp.int32)[:, None] + k_tile * tile_k
    )

    @pl.when(j == 0)
    def _():
        run_d_ref[:] = jnp.full((TP, 1), _BIG, jnp.float32)
        run_k_ref[:] = jnp.zeros((TP, 1), jnp.int32)

    better = loc_d < run_d_ref[:]
    run_d_ref[:] = jnp.where(better, loc_d, run_d_ref[:])
    run_k_ref[:] = jnp.where(better, loc_k, run_k_ref[:])

    @pl.when(j == n_band - 1)
    def _():
        best_d_ref[:] = run_d_ref[:]
        best_k_ref[:] = run_k_ref[:]


@partial(
    jax.jit,
    static_argnames=("tile_p", "tile_k", "band_tiles", "radius_px", "interpret"),
)
def guided_match_stage1_banded(
    uv_p: jnp.ndarray,  # [P, 2] SORTED: gated points first, ascending y
    gate_p: jnp.ndarray,  # [P] bool (sorted order)
    obs_desc: jnp.ndarray,  # [P, O, D] (sorted order)
    obs_valid: jnp.ndarray,  # [P, O] (sorted order)
    kp_uv: jnp.ndarray,  # [K, 2] SORTED by ascending y
    kp_desc: jnp.ndarray,  # [K, D] (sorted order)
    kp_ok: jnp.ndarray,  # [K] bool (sorted order)
    starts: jnp.ndarray,  # [P/tile_p] i32 first kp tile per point tile
    n_active_tiles: jnp.ndarray,  # i32 point tiles containing gated points
    radius_px: float = 20.0,
    tile_p: int = 256,
    tile_k: int = 512,
    band_tiles: int = 2,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Banded stage 1 over pre-sorted inputs (see matching.py's banded
    backend for the sorting/banding wrapper). Returns (best_k [P] i32 into
    the SORTED keypoint order, best_d_sq [P] f32)."""
    P, O, D = obs_desc.shape
    K = kp_uv.shape[0]
    if P % tile_p != 0:
        raise ValueError(f"P={P} must be a multiple of tile_p={tile_p}")
    if K % tile_k != 0:
        raise ValueError(f"K={K} must be padded to a multiple of {tile_k}")

    n_tiles = P // tile_p
    obs_rows = (
        obs_desc.reshape(n_tiles, tile_p, O, D)
        .transpose(0, 2, 1, 3)
        .reshape(n_tiles * O * tile_p, D)
    )

    grid = (n_tiles, band_tiles)
    out = pl.pallas_call(
        partial(
            _banded_kernel, O=O, radius_sq=radius_px * radius_px,
            tile_k=tile_k, n_band=band_tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_p, 2), lambda i, j, s, n: (i, 0)),
                pl.BlockSpec((tile_p, 1), lambda i, j, s, n: (i, 0)),
                pl.BlockSpec((tile_p * O, D), lambda i, j, s, n: (i, 0)),
                pl.BlockSpec((tile_p, O), lambda i, j, s, n: (i, 0)),
                pl.BlockSpec((tile_k, 2), lambda i, j, s, n: (s[i] + j, 0)),
                pl.BlockSpec((tile_k, D), lambda i, j, s, n: (s[i] + j, 0)),
                pl.BlockSpec((tile_k, 1), lambda i, j, s, n: (s[i] + j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile_p, 1), lambda i, j, s, n: (i, 0)),
                pl.BlockSpec((tile_p, 1), lambda i, j, s, n: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_p, tile_k), jnp.float32),
                pltpu.VMEM((tile_p, 1), jnp.float32),
                pltpu.VMEM((tile_p, 1), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * P * O * band_tiles * tile_k * D,
            bytes_accessed=P * O * D * 2 + K * D * 2 + P * band_tiles * tile_k * 4,
            transcendentals=0,
        ),
    )(
        starts.astype(jnp.int32),
        jnp.asarray(n_active_tiles, jnp.int32).reshape(1),
        uv_p.astype(jnp.float32),
        gate_p.astype(jnp.float32)[:, None],
        obs_rows.astype(jnp.bfloat16),
        obs_valid.astype(jnp.float32),
        kp_uv.astype(jnp.float32),
        kp_desc.astype(jnp.bfloat16),
        kp_ok.astype(jnp.float32)[:, None],
    )
    best_k, best_d = out
    return best_k[:, 0], best_d[:, 0]
