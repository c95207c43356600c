"""Dense masked feature matching: frame-to-frame and map-to-frame.

TPU-native replacement for the reference matchers:

- frame<->frame: cv::BFMatcher 1-NN with cross-check + distance gate
  (src/features/FeatureExtractor.cpp:9-24) becomes one dense [K1, K2]
  distance matrix (a single MXU matmul for L2-normalized descriptors) with
  argmin reductions both ways and a mutuality test.

- map->frame: the reference's per-point loop (project -> KD-tree 20 px radius
  query -> compare against ALL observations of the point -> best keypoint per
  point -> best point per keypoint with de-dup,
  src/features/FeatureExtractor.cpp:26-92) becomes a masked [P, K] min
  reduction: the KD-tree is replaced by a projected-distance mask (<= 20 px,
  src/features/FeatureExtractor.cpp:55), the observation comparison by a min
  over the point's O stored descriptors, and the two greedy reductions by
  argmin over K then scatter-min over P. Work is chunked over P to bound the
  [chunk*O, K] intermediates.

Outputs are static-shape index arrays with validity masks (no compaction).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import Camera, is_in_image, project_with_depth
from .precision import f32_precision

SEARCH_RADIUS_PX = 20.0  # FeatureExtractor.cpp:55
_BIG = jnp.float32(1e9)


class FrameMatches(NamedTuple):
    """Per-query-keypoint match into the train (previous) frame."""

    train_idx: jnp.ndarray  # [K2] i32 index into frame-1 keypoints
    distance: jnp.ndarray  # [K2] f32
    valid: jnp.ndarray  # [K2] bool


class MapMatches(NamedTuple):
    """Per-keypoint match into the map."""

    point_idx: jnp.ndarray  # [K] i32 map-point slot (undefined where ~valid)
    distance: jnp.ndarray  # [K] f32
    valid: jnp.ndarray  # [K] bool


def _pairwise_sq_dists(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """[N1, D], [N2, D] -> [N1, N2] squared L2 distances via one matmul.

    The cross term runs as a bf16 MXU matmul with f32 accumulation:
    descriptors are unit vectors, so the ~0.4% bf16 input rounding moves
    squared distances by <~1e-2 — far below the match gate (0.64) and the
    separation between true and distractor matches. Norms stay f32 (exact for
    unit descriptors). This halves both MXU time and HBM traffic of the
    matchers, which profile as the largest tracking-step cost after the
    frontend.
    """
    b1 = d1.astype(jnp.bfloat16)
    b2 = d2.astype(jnp.bfloat16)
    f1 = b1.astype(jnp.float32)
    f2 = b2.astype(jnp.float32)
    n1 = jnp.sum(f1 * f1, axis=-1)  # norms of the ROUNDED vectors so the
    n2 = jnp.sum(f2 * f2, axis=-1)  # XLA and Pallas backends agree exactly
    cross = jax.lax.dot_general(
        b1,
        b2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(n1[:, None] + n2[None, :] - 2.0 * cross, 0.0)


@f32_precision
def match_frames(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    max_distance: float,
) -> FrameMatches:
    """Mutual 1-NN descriptor matching with a distance gate.

    Mirrors BaseFeatureExtractor::match_features(prev, cur)
    (src/features/FeatureExtractor.cpp:9-24): queries are frame-2 keypoints,
    trains are frame-1; a match survives iff it is the nearest neighbour in
    BOTH directions (BFMatcher crossCheck) and dist < max_distance.
    """
    d2 = _pairwise_sq_dists(desc1, desc2)  # [K1, K2]
    d2 = jnp.where(valid1[:, None] & valid2[None, :], d2, _BIG)

    best1_for_2 = jnp.argmin(d2, axis=0)  # [K2] train index per query
    best2_for_1 = jnp.argmin(d2, axis=1)  # [K1] query index per train
    mutual = best2_for_1[best1_for_2] == jnp.arange(d2.shape[1])
    dist = jnp.sqrt(jnp.take_along_axis(d2, best1_for_2[None, :], axis=0)[0])
    ok = mutual & (dist < max_distance) & valid2
    return FrameMatches(train_idx=best1_for_2, distance=dist, valid=ok)


@partial(
    jax.jit,
    static_argnames=("chunk", "max_distance", "radius_px", "backend"),
)
@f32_precision
def match_map_to_frame(
    cam: Camera,
    pose: jnp.ndarray,
    point_xyz: jnp.ndarray,
    point_mask: jnp.ndarray,
    obs_desc: jnp.ndarray,
    obs_valid: jnp.ndarray,
    kp_uv: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_already_matched: jnp.ndarray,
    point_already_matched: jnp.ndarray,
    max_distance: float,
    radius_px: float = SEARCH_RADIUS_PX,
    chunk: int = 1024,
    backend: str = "xla",
) -> MapMatches:
    """Match map points into a frame by guided projection search.

    Equivalent of the reference map->frame matcher
    (src/features/FeatureExtractor.cpp:26-92) with the KD-tree replaced by a
    dense projected-distance gate.

    Args:
      pose: [4, 4] current frame pose (world->camera).
      point_xyz: [P, 3]; point_mask: [P] bool (valid & caller filter, e.g.
        observed-by-last-keyframe — src/Slam.cpp:138-150).
      obs_desc: [P, O, D] stored descriptors of each point's observations.
      obs_valid: [P, O] bool.
      kp_uv/kp_desc/kp_valid: [K, 2], [K, D], [K] current frame features.
      kp_already_matched: [K] bool — keypoints with existing map matches
        (final de-dup, FeatureExtractor.cpp:83-91).
      point_already_matched: [P] bool — points already matched in this frame.
    Returns per-keypoint MapMatches.
    """
    P = point_xyz.shape[0]
    K = kp_uv.shape[0]
    O = obs_desc.shape[1]
    r2 = radius_px * radius_px

    uv_p, depth = project_with_depth(cam, pose, point_xyz)  # [P, 2], [P]
    gate_p = (
        point_mask
        & ~point_already_matched
        & is_in_image(cam, uv_p)
        & (depth > 0.0)
    )

    kp_ok = kp_valid & ~kp_already_matched  # [K]

    if backend == "banded":
        interpret = jax.default_backend() != "tpu"
        best_k, best_d = _banded_stage1(
            uv_p, gate_p, obs_desc, obs_valid, kp_uv, kp_desc, kp_ok,
            radius_px=radius_px, interpret=interpret,
        )
        best_d = jnp.sqrt(jnp.minimum(best_d, _BIG))
        best_d = jnp.where(best_d < max_distance, best_d, _BIG)
        return _stage2(best_k, best_d, P, K)

    if backend == "pallas":
        from .pallas.match_kernel import guided_match_stage1

        interpret = jax.default_backend() != "tpu"
        # VMEM is bounded by the kernel's keypoint tiling (large K runs as
        # multiple [tile, TK] blocks with a running argmin), so the
        # measured-optimal point tile holds at any resolution.
        tile = min(chunk, 256)
        pad_p = (-P) % tile
        def padp(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad_p,) + x.shape[1:], fill, x.dtype)], axis=0
            ) if pad_p else x
        bk, bd = guided_match_stage1(
            padp(uv_p), padp(gate_p, False), padp(obs_desc),
            padp(obs_valid, False), kp_uv, kp_desc, kp_ok,
            radius_px=radius_px, tile_p=tile, interpret=interpret,
        )
        best_k = bk[:P]
        best_d = jnp.sqrt(jnp.minimum(bd[:P], _BIG))
        best_d = jnp.where(best_d < max_distance, best_d, _BIG)
        return _stage2(best_k, best_d, P, K)

    n_chunks = -(-P // chunk)
    Pp = n_chunks * chunk
    pad = Pp - P

    def pad0(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad else x

    uv_pc = pad0(uv_p).reshape(n_chunks, chunk, 2)
    gate_pc = pad0(gate_p, False).reshape(n_chunks, chunk)
    obs_desc_c = pad0(obs_desc).reshape(n_chunks, chunk, O, -1)
    obs_valid_c = pad0(obs_valid, False).reshape(n_chunks, chunk, O)

    def per_chunk(args):
        uv_c, g_c, od_c, ov_c = args
        # Pixel gating [chunk, K].
        duv = uv_c[:, None, :] - kp_uv[None, :, :]
        px_ok = jnp.sum(duv * duv, axis=-1) <= r2
        # Descriptor distances: min over the point's observations.
        dd = _pairwise_sq_dists(od_c.reshape(chunk * O, -1), kp_desc)
        dd = dd.reshape(chunk, O, K)
        dd = jnp.where(ov_c[:, :, None], dd, _BIG)
        dd = jnp.min(dd, axis=1)  # [chunk, K]
        dd = jnp.where(px_ok & g_c[:, None] & kp_ok[None, :], dd, _BIG)
        # Stage 1 (reference :58-75): best keypoint per point.
        best_k = jnp.argmin(dd, axis=-1)  # [chunk]
        best_d = jnp.min(dd, axis=-1)
        return best_k.astype(jnp.int32), best_d

    best_k, best_d = jax.lax.map(
        per_chunk, (uv_pc, gate_pc, obs_desc_c, obs_valid_c)
    )
    best_k = best_k.reshape(-1)[:P]
    best_d = jnp.sqrt(jnp.minimum(best_d.reshape(-1)[:P], _BIG))
    best_d = jnp.where(best_d < max_distance, best_d, _BIG)
    return _stage2(best_k, best_d, P, K)


def _banded_stage1(
    uv_p: jnp.ndarray,
    gate_p: jnp.ndarray,
    obs_desc: jnp.ndarray,
    obs_valid: jnp.ndarray,
    kp_uv: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_ok: jnp.ndarray,
    *,
    radius_px: float,
    interpret: bool,
    tile_p: int = 256,
    tile_k: int = 512,
    band_tiles: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-hash stage 1: the TPU-idiomatic replacement for the reference's
    KD-tree radius query (src/KDTree.cpp:45-82) at scale.

    Both sides are sorted spatially (points: gated first, ascending
    projected y; keypoints: ascending y), so each point tile only needs the
    keypoint tiles covering its y-range +- radius — a contiguous BAND in
    sorted order, found by searchsorted. The banded Pallas kernel then does
    work proportional to (gated points) x (band width) instead of P x K:
    at P=16384 map capacity with ~2k gated points this is ~20x less compute
    than the dense kernel. Exactness: the pixel gate already rejects
    out-of-radius pairs, so visiting a SUPERSET of the necessary band is
    exact; when some tile's band does not fit (pathologically spread-out
    points), the whole call falls back to the dense kernel under lax.cond —
    never silently losing matches.

    Tie-breaking: stage 1's argmin runs over the y-SORTED keypoint order, so
    on exact descriptor-distance ties it may pick a different (equally
    optimal) keypoint than the dense path's lowest-original-index winner.
    Both results are correct 1-NN matches; backend parity is exact except on
    duplicate-descriptor ties (vanishing-probability on float descriptors).
    """
    from .pallas.match_kernel import (
        guided_match_stage1,
        guided_match_stage1_banded,
    )

    P, O, D = obs_desc.shape
    K = kp_uv.shape[0]
    far = jnp.float32(1e8)

    # Pad P to the tile grid (padding rows are ungated -> sorted to the end).
    pad_p = (-P) % tile_p
    def padp(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad_p,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad_p else x
    uv_pp = padp(uv_p)
    gate_pp = padp(gate_p, False)
    Pp = P + pad_p
    # Bounded sorted prefix: gated points sort first, so only the first G
    # rows can ever be active — gathering [G, O, D] instead of [Pp, O, D]
    # through the sort order halves the dominant per-frame HBM traffic of
    # the banded path at 4x map capacity (the kernel also only DMAs G
    # rows). Exactness: if gated points overflow G, `fits` below fails and
    # the call falls back to the dense kernel, same as a too-wide band.
    G = Pp if Pp < 8192 else max(tile_p, (Pp // 2 // tile_p) * tile_p)
    n_tiles = G // tile_p

    # Keypoints sorted by y (invalid ones to the end), padded to the K grid.
    n_k = max(-(-K // tile_k), band_tiles)
    Kp = n_k * tile_k
    kp_y = jnp.where(kp_ok, kp_uv[:, 1], far)
    kp_order = jnp.argsort(kp_y)
    pad_k = Kp - K
    def padk(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad_k,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad_k else x
    kp_y_s = padk(kp_y[kp_order], 1e8)
    kp_uv_s = padk(kp_uv[kp_order], 1e7)
    kp_desc_s = padk(kp_desc[kp_order])
    kp_ok_s = padk(kp_ok[kp_order], False)

    # Points sorted gated-first by projected y; only the first G sorted
    # rows are gathered/visited (see G above).
    p_y = jnp.where(gate_pp, uv_pp[:, 1], far)
    p_order = jnp.argsort(p_y)
    p_sel = p_order[:G]
    p_y_s = p_y[p_sel]

    # Per point tile: covering keypoint band.
    y_t = p_y_s.reshape(n_tiles, tile_p)
    g_t = y_t < far
    has = jnp.any(g_t, axis=1)
    lo = jnp.min(jnp.where(g_t, y_t, jnp.inf), axis=1) - radius_px
    hi = jnp.max(jnp.where(g_t, y_t, -jnp.inf), axis=1) + radius_px
    lo_idx = jnp.searchsorted(kp_y_s, lo, side="left")
    hi_idx = jnp.searchsorted(kp_y_s, hi, side="right")
    start = (lo_idx // tile_k).astype(jnp.int32)
    end = (jnp.maximum(hi_idx - 1, lo_idx) // tile_k).astype(jnp.int32)
    needed = jnp.where(has, end - start + 1, 1)
    start = jnp.clip(start, 0, n_k - band_tiles)
    n_gated = jnp.sum(gate_pp)
    fits = jnp.all(needed <= band_tiles) & (n_gated <= G)
    n_act = -(-n_gated // tile_p)

    def banded(_):
        bk_s, bd_s = guided_match_stage1_banded(
            uv_pp[p_sel], gate_pp[p_sel],
            padp(obs_desc)[p_sel], padp(obs_valid, False)[p_sel],
            kp_uv_s, kp_desc_s, kp_ok_s, start, n_act,
            radius_px=radius_px, tile_p=tile_p, tile_k=tile_k,
            band_tiles=band_tiles, interpret=interpret,
        )
        # Back to original keypoint / point numbering.
        kp_order_p = padk(kp_order.astype(jnp.int32), 0)
        bk = kp_order_p[jnp.clip(bk_s, 0, Kp - 1)]
        out_k = jnp.zeros((Pp,), jnp.int32).at[p_sel].set(bk)
        out_d = jnp.full((Pp,), _BIG).at[p_sel].set(bd_s)
        return out_k[:P], out_d[:P]

    def dense(_):
        bk, bd = guided_match_stage1(
            uv_pp, gate_pp, padp(obs_desc), padp(obs_valid, False),
            kp_uv, kp_desc, kp_ok,
            radius_px=radius_px, tile_p=tile_p, interpret=interpret,
        )
        return bk[:P], bd[:P]

    return jax.lax.cond(fits, banded, dense, None)


def _stage2(best_k: jnp.ndarray, best_d: jnp.ndarray, P: int, K: int) -> MapMatches:
    """Stage 2 (reference :76-80): best point per keypoint via scatter-min,
    winner id = lowest point index among the distance minimizers."""
    kp_best_d = jnp.full((K,), _BIG).at[best_k].min(best_d)
    pid = jnp.arange(P, dtype=jnp.int32)
    is_winner = best_d <= kp_best_d[best_k]
    kp_point = (
        jnp.full((K,), jnp.int32(P))
        .at[best_k]
        .min(jnp.where(is_winner & (best_d < _BIG), pid, jnp.int32(P)))
    )
    valid = (kp_best_d < _BIG) & (kp_point < P)
    return MapMatches(
        point_idx=jnp.where(valid, kp_point, -1),
        distance=kp_best_d,
        valid=valid,
    )


def unmatched_mask(
    matches: FrameMatches,
    kp1_matched: jnp.ndarray,
    kp2_matched: jnp.ndarray,
) -> jnp.ndarray:
    """Filter frame-matches whose endpoints already have map associations.

    Equivalent of features::unmatched_features
    (src/features/FeatureExtractor.cpp:94-105): keeps matches where neither
    the train keypoint (frame 1) nor the query keypoint (frame 2) is matched
    to a map point.
    """
    t = matches.train_idx
    return matches.valid & ~kp1_matched[t] & ~kp2_matched[jnp.arange(t.shape[0])]
