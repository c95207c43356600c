"""Distributed Schur-complement bundle adjustment over landmark shards.

The scale-out design mandated by BASELINE.json: the factor graph is sharded
landmark-wise (points and their observation rows split across the mesh 'lm'
axis; camera parameters replicated — cameras are few, points are many).
Each shard eliminates its own landmarks and produces a local contribution to
the reduced camera system (S, g); one psum over the mesh combines them; the
dense [6F, 6F] solve is computed replicated on every device; point updates
back-substitute shard-locally with zero further communication. Per LM
iteration the wire traffic is exactly one all-reduce of F*F*36 + F*6 floats
— independent of the number of points.

This reuses ops/ba.py's pure per-shard builder (build_reduced_system), so the
single-chip and distributed solvers cannot drift apart semantically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.ba import (
    HUBER_DELTA,
    MAX_ITERS,
    BAProblem,
    BAResult,
    back_substitute_points,
    build_reduced_system,
    _problem_cost,
    solve_camera_system,
)
from ..ops.camera import Camera
from ..ops.precision import f32_precision


@f32_precision
def _lm_loop_sharded(
    cam: Camera,
    prob: BAProblem,
    axis_name: str | None,
    max_iters: int,
    init_lambda: float,
    huber_delta: float,
) -> BAResult:
    """LM loop where `prob`'s point axis holds only this shard's landmarks.

    Identical control flow to ops.ba.full_ba, with psum(axis_name) combining
    the reduced system and costs across shards. With axis_name=None this IS
    the single-chip solver (used to keep both paths one implementation).
    """

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    n_res_local = jnp.sum(
        prob.obs_valid
        & prob.cam_in_problem[jnp.clip(prob.obs_cam, 0, prob.cam_rvec.shape[0] - 1)]
        & prob.point_in_problem[:, None]
    )
    n_res = allreduce(n_res_local)

    def step(state, _):
        cam_rvec, cam_t, points, lam, cost = state
        cur = prob._replace(cam_rvec=cam_rvec, cam_t=cam_t, points=points)
        rs, _ = build_reduced_system(cam, cur, lam, huber_delta)
        S = allreduce(rs.S)
        g_red = allreduce(rs.g_red)
        delta_c = solve_camera_system(S, g_red, prob.cam_free)  # replicated
        safe_cam = jnp.clip(prob.obs_cam, 0, prob.cam_rvec.shape[0] - 1)
        delta_p = back_substitute_points(rs, delta_c, safe_cam)  # local

        cam_rvec_new = cam_rvec + delta_c[:, :3] * prob.cam_free[:, None]
        cam_t_new = cam_t + delta_c[:, 3:] * prob.cam_free[:, None]
        points_new = points + delta_p * prob.point_free[:, None]

        new_cost = allreduce(
            _problem_cost(
                cam,
                prob._replace(
                    cam_rvec=cam_rvec_new, cam_t=cam_t_new, points=points_new
                ),
                huber_delta,
            )
        )
        accept = new_cost < cost
        cam_rvec = jnp.where(accept, cam_rvec_new, cam_rvec)
        cam_t = jnp.where(accept, cam_t_new, cam_t)
        points = jnp.where(accept, points_new, points)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 2.5)
        cost = jnp.where(accept, new_cost, cost)
        return (cam_rvec, cam_t, points, lam, cost), None

    cost0 = allreduce(_problem_cost(cam, prob, huber_delta))
    # Derive lam's initial value from cost0 so its varying-manual-axes type
    # matches the loop-carried value under any mesh (lam becomes seq-varying
    # when the reduced cost only psums over the lm axis).
    lam0 = jnp.float32(init_lambda) + 0.0 * cost0
    init = (prob.cam_rvec, prob.cam_t, prob.points, lam0, cost0)
    (cam_rvec, cam_t, points, _, cost), _ = jax.lax.scan(
        step, init, None, length=max_iters
    )
    return BAResult(
        cam_rvec=cam_rvec, cam_t=cam_t, points=points, cost=cost, num_residuals=n_res
    )


def distributed_full_ba(
    cam: Camera,
    prob: BAProblem,
    mesh: Mesh,
    axis: str = "lm",
    max_iters: int = MAX_ITERS,
    init_lambda: float = 1e-4,
    huber_delta: float = HUBER_DELTA,
) -> BAResult:
    """Run full BA with points sharded over `mesh` axis `axis`.

    The point capacity P must be divisible by the axis size (pad the problem
    with obs_valid=False rows — padding contributes nothing).
    """
    n = mesh.shape[axis]
    P_total = prob.points.shape[0]
    if P_total % n != 0:
        raise ValueError(f"point capacity {P_total} not divisible by {n} shards")

    point_spec = P(axis)
    repl = P()
    in_specs = BAProblem(
        cam_rvec=repl,
        cam_t=repl,
        points=point_spec,
        obs_cam=point_spec,
        obs_uv=point_spec,
        obs_valid=point_spec,
        cam_free=repl,
        cam_in_problem=repl,
        point_free=point_spec,
        point_in_problem=point_spec,
    )
    out_specs = BAResult(
        cam_rvec=repl, cam_t=repl, points=point_spec, cost=repl, num_residuals=repl
    )

    fn = shard_map(
        partial(
            _lm_loop_sharded,
            cam,
            axis_name=axis,
            max_iters=max_iters,
            init_lambda=init_lambda,
            huber_delta=huber_delta,
        ),
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
    )
    return jax.jit(fn)(prob)


def batched_distributed_full_ba(
    cam: Camera,
    prob_batch: BAProblem,
    mesh: Mesh,
    seq_axis: str = "seq",
    lm_axis: str = "lm",
    max_iters: int = MAX_ITERS,
    init_lambda: float = 1e-4,
    huber_delta: float = HUBER_DELTA,
) -> BAResult:
    """2-D sharding: independent BA problems data-parallel over `seq_axis`,
    each problem's landmarks sharded over `lm_axis`.

    This is the multi-sequence scale-out shape (BASELINE.json config 5:
    concurrent sequences with keyframes/map sharded across hosts): every leaf
    of `prob_batch` carries a leading batch dim B divisible by the seq-axis
    size; point-major leaves are additionally split over lm. Collectives ride
    only the lm axis (one psum of the reduced system per LM iteration); the
    seq axis is fully independent.
    """
    B = prob_batch.points.shape[0]
    n_seq = mesh.shape[seq_axis]
    n_lm = mesh.shape[lm_axis]
    if B % n_seq != 0:
        raise ValueError(f"batch {B} not divisible by seq axis {n_seq}")
    if prob_batch.points.shape[1] % n_lm != 0:
        raise ValueError(
            f"point capacity {prob_batch.points.shape[1]} not divisible by {n_lm}"
        )

    seq = P(seq_axis)
    seq_lm = P(seq_axis, lm_axis)
    in_specs = BAProblem(
        cam_rvec=seq, cam_t=seq, points=seq_lm,
        obs_cam=seq_lm, obs_uv=seq_lm, obs_valid=seq_lm,
        cam_free=seq, cam_in_problem=seq,
        point_free=seq_lm, point_in_problem=seq_lm,
    )
    out_specs = BAResult(
        cam_rvec=seq, cam_t=seq, points=seq_lm, cost=seq, num_residuals=seq
    )

    inner = jax.vmap(
        partial(
            _lm_loop_sharded,
            cam,
            axis_name=lm_axis,
            max_iters=max_iters,
            init_lambda=init_lambda,
            huber_delta=huber_delta,
        )
    )
    fn = shard_map(inner, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs)
    return jax.jit(fn)(prob_batch)
