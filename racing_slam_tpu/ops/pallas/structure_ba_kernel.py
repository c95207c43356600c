"""Fused single-free-camera Schur bundle adjustment in one Pallas kernel.

This replaces the XLA while_loop of ops.ba.structure_ba — the dominant cost of
every keyframe commit (src/Slam.cpp:202-213: all previous keyframes frozen,
the new one free, points free). Each LM iteration there lowers to hundreds of
small VPU kernels over [Pc, O] tensors; here the ENTIRE loop (residuals,
Jacobians, per-point 3x3 Hessians, landmark elimination, the reduced 6x6
solve, back-substitution, lambda control, early exit) runs in one Pallas
program, all operands VMEM-resident.

The enabling observation: with a single free camera, the frozen cameras'
rotations never change during the loop. The wrapper pre-gathers per-observation
frozen rotation matrices and translations ONCE ([Pc, O] planes); per iteration
the kernel computes one Rodrigues for the free pose and selects
`where(is_free, R_free, R_frozen)` per observation — no in-kernel gathers.

Data layout: everything is lane-planar. Per observation slot o (a static
Python loop, O blocks) there are 16 [Rp, 128] planes (R00..R22, t0..t2, nx,
ny, include, is_free) packed into one [O*16*Rp, 128] VMEM input; point state
(Xx, Xy, Xz, free) is [4*Rp, 128]. Point positions are carried through the LM
while_loop as three [Rp, 128] values.

Semantics match ops.ba.structure_ba (same residual/Huber/damping/stopping
rule); parity in tests/test_ba_kernels.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .motion_ba_kernel import (
    LANES,
    _huber_cost,
    _huber_weight,
    _rodrigues_planes,
    _rotation_planes,
    _solve6_scalar,
)

N_OBS_PLANES = 16  # R00..R22, t0..t2, nx, ny, include, is_free


def _sym3_inv_planes(a, b, c, d, e, f):
    """Inverse of the symmetric 3x3 [[a,b,c],[b,d,e],[c,e,f]] per lane.
    Returns the 6 unique entries (i00,i01,i02,i11,i12,i22)."""
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    i00 = A * inv_det
    i01 = B * inv_det
    i02 = C * inv_det
    i11 = (a * f - c * c) * inv_det
    i12 = (b * c - a * e) * inv_det
    i22 = (a * d - b * b) * inv_det
    return i00, i01, i02, i11, i12, i22


def _kernel(
    pose0_ref,  # SMEM [1, 8]: free-cam wx wy wz tx ty tz lam0 pad
    obs_ref,  # VMEM [O*16*Rp, 128]
    pts_ref,  # VMEM [4*Rp, 128]: Xx Xy Xz free
    out_pose_ref,  # SMEM [1, 8]: pose, cost, iters
    out_pts_ref,  # VMEM [3*Rp, 128]
    *,
    O,
    Rp,
    huber_delta,
    ftol,
):
    # Iteration cap as runtime data (pose0_ref[0, 7]): Mosaic unrolls
    # statically-bounded while_loops, making compile time scale with
    # max_iters (see motion_ba_kernel._kernel).
    def oplane(o, k):
        base = (o * N_OBS_PLANES + k) * Rp
        return obs_ref[base : base + Rp, :]

    free_p = pts_ref[3 * Rp : 4 * Rp, :]

    def splat(s):
        return jnp.broadcast_to(jnp.reshape(s, (1, 1)), (1, LANES)).astype(
            jnp.float32
        )

    def obs_geometry(o, Rf, tf, X):
        """Effective per-obs projection for obs slot o. Rf/tf: free-cam
        rotation (9 (1,128) planes) and translation (3); X: (Xx,Xy,Xz)."""
        isf = oplane(o, 15)
        R = [jnp.where(isf > 0.0, Rf[k], oplane(o, k)) for k in range(9)]
        t = [jnp.where(isf > 0.0, tf[k], oplane(o, 9 + k)) for k in range(3)]
        Xx, Xy, Xz = X
        px = R[0] * Xx + R[1] * Xy + R[2] * Xz + t[0]
        py = R[3] * Xx + R[4] * Xy + R[5] * Xz + t[1]
        pz = R[6] * Xx + R[7] * Xy + R[8] * Xz + t[2]
        z_safe = jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
        inv_z = 1.0 / z_safe
        gx = px * inv_z
        gy = py * inv_z
        r0 = gx - oplane(o, 12)
        r1 = gy - oplane(o, 13)
        return R, gx, gy, inv_z, r0, r1, isf

    def total_cost(pose6, X):
        wx, wy, wz, tx, ty, tz = [splat(p) for p in pose6]
        a, b, _ = _rodrigues_planes(wx, wy, wz)
        Rf = _rotation_planes(a, b, wx, wy, wz)
        tf = (tx, ty, tz)
        cost = jnp.float32(0.0)
        for o in range(O):
            _, _, _, _, r0, r1, _ = obs_geometry(o, Rf, tf, X)
            s = r0 * r0 + r1 * r1
            cost = cost + jnp.sum(oplane(o, 14) * _huber_cost(s, huber_delta))
        return cost

    def body(st):
        (wx_s, wy_s, wz_s, tx_s, ty_s, tz_s, lam, cost, it, _done,
         Xx, Xy, Xz) = st
        wx, wy, wz = splat(wx_s), splat(wy_s), splat(wz_s)
        txv, tyv, tzv = splat(tx_s), splat(ty_s), splat(tz_s)
        a, b, B = _rodrigues_planes(wx, wy, wz)
        Rf = _rotation_planes(a, b, wx, wy, wz)
        tf = (txv, tyv, tzv)
        # Right Jacobian of the free pose (A coefficient equals b).
        A_c = b
        Jr = [
            1.0 - B * (wy * wy + wz * wz),
            A_c * wz + B * wx * wy,
            -A_c * wy + B * wx * wz,
            -A_c * wz + B * wx * wy,
            1.0 - B * (wx * wx + wz * wz),
            A_c * wx + B * wy * wz,
            A_c * wy + B * wx * wz,
            -A_c * wx + B * wy * wz,
            1.0 - B * (wx * wx + wy * wy),
        ]

        X = (Xx, Xy, Xz)
        zero = jnp.zeros((Rp, LANES), jnp.float32)
        # Per-point accumulators (over obs): symmetric Hpp (6), g_p (3),
        # coupling Y (6x3 = 18), plus plane accumulators for the free-camera
        # block Hcc (21), g_c (6) reduced to scalars after the o loop.
        Hpp = [zero] * 6  # h00 h01 h02 h11 h12 h22
        g_p = [zero] * 3
        Y = [[zero] * 3 for _ in range(6)]
        Hcc_acc = [[zero] * 6 for _ in range(6)]
        g_c_acc = [zero] * 6

        for o in range(O):
            R, gx, gy, inv_z, r0, r1, isf = obs_geometry(o, Rf, tf, X)
            s = r0 * r0 + r1 * r1
            w = oplane(o, 14) * _huber_weight(s, huber_delta)
            # Point Jacobian rows (2x3), from the effective rotation.
            Jp0 = [
                inv_z * (R[0] - gx * R[6]),
                inv_z * (R[1] - gx * R[7]),
                inv_z * (R[2] - gx * R[8]),
            ]
            Jp1 = [
                inv_z * (R[3] - gy * R[6]),
                inv_z * (R[4] - gy * R[7]),
                inv_z * (R[5] - gy * R[8]),
            ]
            k = 0
            for i in range(3):
                for j in range(i, 3):
                    Hpp[k] = Hpp[k] + w * (Jp0[i] * Jp0[j] + Jp1[i] * Jp1[j])
                    k += 1
            for i in range(3):
                g_p[i] = g_p[i] + w * (Jp0[i] * r0 + Jp1[i] * r1)

            # Free-camera Jacobian rows (2x6); only live where is_free.
            wf = w * isf
            Xx_, Xy_, Xz_ = X
            M = [
                Rf[1] * Xz_ - Rf[2] * Xy_,
                Rf[2] * Xx_ - Rf[0] * Xz_,
                Rf[0] * Xy_ - Rf[1] * Xx_,
                Rf[4] * Xz_ - Rf[5] * Xy_,
                Rf[5] * Xx_ - Rf[3] * Xz_,
                Rf[3] * Xy_ - Rf[4] * Xx_,
                Rf[7] * Xz_ - Rf[8] * Xy_,
                Rf[8] * Xx_ - Rf[6] * Xz_,
                Rf[6] * Xy_ - Rf[7] * Xx_,
            ]
            D = [
                -(M[0] * Jr[0] + M[1] * Jr[3] + M[2] * Jr[6]),
                -(M[0] * Jr[1] + M[1] * Jr[4] + M[2] * Jr[7]),
                -(M[0] * Jr[2] + M[1] * Jr[5] + M[2] * Jr[8]),
                -(M[3] * Jr[0] + M[4] * Jr[3] + M[5] * Jr[6]),
                -(M[3] * Jr[1] + M[4] * Jr[4] + M[5] * Jr[7]),
                -(M[3] * Jr[2] + M[4] * Jr[5] + M[5] * Jr[8]),
                -(M[6] * Jr[0] + M[7] * Jr[3] + M[8] * Jr[6]),
                -(M[6] * Jr[1] + M[7] * Jr[4] + M[8] * Jr[7]),
                -(M[6] * Jr[2] + M[7] * Jr[5] + M[8] * Jr[8]),
            ]
            Jc0 = [
                inv_z * (D[0] - gx * D[6]),
                inv_z * (D[1] - gx * D[7]),
                inv_z * (D[2] - gx * D[8]),
                inv_z,
                zero,
                -gx * inv_z,
            ]
            Jc1 = [
                inv_z * (D[3] - gy * D[6]),
                inv_z * (D[4] - gy * D[7]),
                inv_z * (D[5] - gy * D[8]),
                zero,
                inv_z,
                -gy * inv_z,
            ]
            for i in range(6):
                for j in range(i, 6):
                    Hcc_acc[i][j] = Hcc_acc[i][j] + wf * (
                        Jc0[i] * Jc0[j] + Jc1[i] * Jc1[j]
                    )
                g_c_acc[i] = g_c_acc[i] + wf * (Jc0[i] * r0 + Jc1[i] * r1)
                for j in range(3):
                    Y[i][j] = Y[i][j] + wf * (Jc0[i] * Jp0[j] + Jc1[i] * Jp1[j])

        # Damped per-point Hessian inverse, zeroed for frozen points.
        one_lam = splat(1.0 + lam)  # (1,128): scalar-in-vector-op via splat
        hd0 = Hpp[0] * one_lam + 1e-9
        hd3 = Hpp[3] * one_lam + 1e-9
        hd5 = Hpp[5] * one_lam + 1e-9
        i00, i01, i02, i11, i12, i22 = _sym3_inv_planes(
            hd0, Hpp[1], Hpp[2], hd3, Hpp[4], hd5
        )
        i00, i01, i02, i11, i12, i22 = [
            v * free_p for v in (i00, i01, i02, i11, i12, i22)
        ]
        Hinv = [[i00, i01, i02], [i01, i11, i12], [i02, i12, i22]]

        # Z = Y Hpp_inv; S = Hcc_d - sum_p Z Y^T; g_red = g_c - Z g_p.
        Z = [
            [sum(Y[i][k] * Hinv[k][l] for k in range(3)) for l in range(3)]
            for i in range(6)
        ]
        Hcc = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                h = jnp.sum(Hcc_acc[i][j])
                Hcc[i][j] = h
                Hcc[j][i] = h
        S = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                coup = jnp.sum(sum(Z[i][l] * Y[j][l] for l in range(3)))
                sij = Hcc[i][j] - coup
                if i == j:
                    sij = sij + lam * Hcc[i][i] + 1e-9
                S[i][j] = sij
                S[j][i] = sij
        g_red = [
            jnp.sum(g_c_acc[i]) - jnp.sum(sum(Z[i][l] * g_p[l] for l in range(3)))
            for i in range(6)
        ]
        dc = _solve6_scalar(S, g_red)  # NOTE: delta_c = -dc

        # Back-substitution: delta_p = -Hinv (g_p + Y^T delta_c)
        #                            = -Hinv (g_p - Y^T dc).
        rhs = [
            g_p[l] - sum(Y[i][l] * splat(dc[i]) for i in range(6))
            for l in range(3)
        ]
        dX = [
            -sum(Hinv[l][m] * rhs[m] for m in range(3)) * free_p
            for l in range(3)
        ]

        wx_n = wx_s - dc[0]
        wy_n = wy_s - dc[1]
        wz_n = wz_s - dc[2]
        tx_n = tx_s - dc[3]
        ty_n = ty_s - dc[4]
        tz_n = tz_s - dc[5]
        Xx_n = Xx + dX[0]
        Xy_n = Xy + dX[1]
        Xz_n = Xz + dX[2]
        new_cost = total_cost(
            (wx_n, wy_n, wz_n, tx_n, ty_n, tz_n), (Xx_n, Xy_n, Xz_n)
        )

        accept = new_cost < cost
        done = (accept & (cost - new_cost <= ftol * cost)) | (lam > 1e8)
        av = splat(jnp.where(accept, 1.0, 0.0))
        return (
            jnp.where(accept, wx_n, wx_s),
            jnp.where(accept, wy_n, wy_s),
            jnp.where(accept, wz_n, wz_s),
            jnp.where(accept, tx_n, tx_s),
            jnp.where(accept, ty_n, ty_s),
            jnp.where(accept, tz_n, tz_s),
            jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 2.5),
            jnp.where(accept, new_cost, cost),
            it + 1,
            done,
            Xx + av * dX[0],
            Xy + av * dX[1],
            Xz + av * dX[2],
        )

    pose6 = tuple(pose0_ref[0, k] for k in range(6))
    lam0 = pose0_ref[0, 6]
    max_iters = pose0_ref[0, 7].astype(jnp.int32)
    Xx0 = pts_ref[0 * Rp : 1 * Rp, :]
    Xy0 = pts_ref[1 * Rp : 2 * Rp, :]
    Xz0 = pts_ref[2 * Rp : 3 * Rp, :]
    cost0 = total_cost(pose6, (Xx0, Xy0, Xz0))

    st = jax.lax.while_loop(
        lambda st: (st[8] < max_iters) & ~st[9],
        body,
        pose6
        + (lam0, cost0, jnp.int32(0), jnp.bool_(False), Xx0, Xy0, Xz0),
    )
    for k in range(6):
        out_pose_ref[0, k] = st[k]
    out_pose_ref[0, 6] = st[7]
    out_pose_ref[0, 7] = st[8].astype(jnp.float32)
    out_pts_ref[0 * Rp : 1 * Rp, :] = st[10]
    out_pts_ref[1 * Rp : 2 * Rp, :] = st[11]
    out_pts_ref[2 * Rp : 3 * Rp, :] = st[12]


@partial(
    jax.jit,
    static_argnames=("O", "max_iters", "huber_delta", "ftol", "interpret"),
)
def structure_ba_planes(
    pose0: jnp.ndarray,  # [8] f32 free-cam pose + lam0
    obs: jnp.ndarray,  # [O*16*Rp, 128] f32
    pts: jnp.ndarray,  # [4*Rp, 128] f32
    O: int,
    max_iters: int,
    huber_delta: float,
    ftol: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ([8] pose+cost+iters, [3*Rp, 128] refined point planes)."""
    Rp = pts.shape[0] // 4
    # Ship the iteration cap as data (pose0[7]) — see _kernel.
    pose0 = pose0.at[7].set(jnp.float32(max_iters))
    out_pose, out_pts = pl.pallas_call(
        partial(
            _kernel,
            O=O,
            Rp=Rp,
            huber_delta=huber_delta,
            ftol=ftol,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
            jax.ShapeDtypeStruct((3 * Rp, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pose0.reshape(1, 8), obs, pts)
    return out_pose[0], out_pts


def _rotations_from_rvecs(rv: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] angle-axis -> [..., 9] flattened rotation (XLA-side, once)."""
    wx, wy, wz = rv[..., 0], rv[..., 1], rv[..., 2]
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(theta2 + 1e-24)
    small = theta2 < 1e-8
    safe1 = jnp.where(small, 1.0, theta)
    safe2 = jnp.where(small, 1.0, theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / safe1)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    return jnp.stack(
        [
            1.0 - b * (wy * wy + wz * wz),
            b * wx * wy - a * wz,
            b * wx * wz + a * wy,
            b * wx * wy + a * wz,
            1.0 - b * (wx * wx + wz * wz),
            b * wy * wz - a * wx,
            b * wx * wz - a * wy,
            b * wy * wz + a * wx,
            1.0 - b * (wx * wx + wy * wy),
        ],
        axis=-1,
    )


def pack_structure_problem(cam, prob, free_slot, init_lambda: float = 1e-4):
    """BAProblem (single free camera) -> kernel operands.

    Pre-gathers per-observation frozen rotations/translations (they never
    change during the LM loop — only the free camera moves) and normalizes
    observation pixels. Returns (pose0 [8], obs [O*16*Rp,128], pts [4*Rp,128],
    pad) with the point axis padded to Rp*128.
    """
    P, O = prob.obs_cam.shape
    F = prob.cam_rvec.shape[0]
    Pp = -(-P // LANES) * LANES
    Rp = Pp // LANES
    pad = Pp - P

    safe_cam = jnp.clip(prob.obs_cam, 0, F - 1)
    Rm = _rotations_from_rvecs(prob.cam_rvec[safe_cam])  # [P, O, 9]
    tm = prob.cam_t[safe_cam]  # [P, O, 3]
    nx = (prob.obs_uv[..., 0] - cam.cx) / cam.fx
    ny = (prob.obs_uv[..., 1] - cam.cy) / cam.fx
    include = (
        prob.obs_valid
        & prob.cam_in_problem[safe_cam]
        & prob.point_in_problem[:, None]
    ).astype(jnp.float32)
    is_free = (safe_cam == free_slot).astype(jnp.float32)

    comp = jnp.concatenate(
        [
            Rm,
            tm,
            nx[..., None],
            ny[..., None],
            include[..., None],
            is_free[..., None],
        ],
        axis=-1,
    )  # [P, O, 16]
    comp = jnp.pad(comp.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    # [P, O, 16] -> [O, 16, Rp, 128] -> [O*16*Rp, 128]
    obs = comp.reshape(Rp, LANES, O, N_OBS_PLANES).transpose(2, 3, 0, 1)
    obs = obs.reshape(O * N_OBS_PLANES * Rp, LANES)

    ptsc = jnp.concatenate(
        [
            prob.points.astype(jnp.float32),
            prob.point_free.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )  # [P, 4]
    ptsc = jnp.pad(ptsc, ((0, pad), (0, 0)))
    pts = ptsc.reshape(Rp, LANES, 4).transpose(2, 0, 1).reshape(4 * Rp, LANES)

    pose0 = jnp.concatenate(
        [
            prob.cam_rvec[free_slot].astype(jnp.float32),
            prob.cam_t[free_slot].astype(jnp.float32),
            jnp.asarray([init_lambda, 0.0], jnp.float32),
        ]
    )
    return pose0, obs, pts, pad


def unpack_points(out_pts: jnp.ndarray, P: int) -> jnp.ndarray:
    """[3*Rp, 128] planes -> [P, 3] positions."""
    Rp = out_pts.shape[0] // 3
    return (
        out_pts.reshape(3, Rp, LANES).transpose(1, 2, 0).reshape(Rp * LANES, 3)[:P]
    )
