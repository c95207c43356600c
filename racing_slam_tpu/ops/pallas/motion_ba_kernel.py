"""Fused motion-only bundle adjustment (one free pose, fixed points) in Pallas.

motion_ba runs TWICE per tracking frame (src/Slam.cpp:165-175) and profiled as
the single largest slice of the fused step: the XLA while_loop lowers each LM
iteration to ~a hundred small VPU kernels over [K]-shaped tensors (residuals,
analytic Jacobians, 28 reductions, the 6x6 solve), each paying dispatch and
HBM round-trip overhead on tensors that total <100 KB. This kernel runs the
ENTIRE Levenberg-Marquardt loop — both per-iteration passes (H/g assembly at
the current pose, robust cost at the candidate pose), the scalar 6x6 block
solve, lambda control, and Ceres-style function-tolerance early exit — in ONE
Pallas program with every operand resident in VMEM.

Layout: the K observations are padded to Kp = R*128 and stored lane-planar as
six [R, 128] planes (Xx, Xy, Xz, nx, ny, valid) stacked into one [6R, 128]
VMEM block, so every per-observation quantity is pure 8x128 VPU work. Pose
scalars live as (1, 128) replicated vectors (the VPU has transcendentals; the
scalar core does not), reductions produce genuine scalars, and the 6x6 damped
system is solved by the same two-3x3-block elimination as ops.ba.solve6_spd,
fully expanded to straight-line scalar arithmetic.

Semantics match ops.ba.motion_ba exactly (same residual, same Huber IRLS
weights, same lambda schedule and stopping rule); parity is tested in
tests/test_ba_kernels.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rodrigues_planes(wx, wy, wz):
    """Rodrigues + right-Jacobian coefficients from (1,128) pose components.

    Returns (a, b, B) with R = I + a[w]x + b[w]x^2 and J_r = I - b[w]x + B[w]x^2
    (the A coefficient of ba.residual_and_jacobians equals b).
    """
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(theta2 + 1e-24)
    small = theta2 < 1e-8
    safe1 = jnp.where(small, 1.0, theta)
    safe2 = jnp.where(small, 1.0, theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / safe1)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    B = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe2 * safe1),
    )
    return a, b, B


def _rotation_planes(a, b, wx, wy, wz):
    """The 9 entries of R = I + a[w]x + b[w]x^2 as (1,128) planes."""
    R00 = 1.0 - b * (wy * wy + wz * wz)
    R01 = b * wx * wy - a * wz
    R02 = b * wx * wz + a * wy
    R10 = b * wx * wy + a * wz
    R11 = 1.0 - b * (wx * wx + wz * wz)
    R12 = b * wy * wz - a * wx
    R20 = b * wx * wz - a * wy
    R21 = b * wy * wz + a * wx
    R22 = 1.0 - b * (wx * wx + wy * wy)
    return R00, R01, R02, R10, R11, R12, R20, R21, R22


def _huber_cost(s, delta):
    b = delta * delta
    return jnp.where(s <= b, s, 2.0 * delta * jnp.sqrt(s + 1e-18) - b)


def _huber_weight(s, delta):
    return jnp.where(s <= delta * delta, 1.0, delta / jnp.sqrt(s + 1e-18))


def _inv3_scalar(m):
    """Closed-form 3x3 inverse on a 3x3 nested list of scalars."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return [
        [A * inv_det, -(b * i - c * h) * inv_det, (b * f - c * e) * inv_det],
        [B * inv_det, (a * i - c * g) * inv_det, -(a * f - c * d) * inv_det],
        [C * inv_det, -(a * h - b * g) * inv_det, (a * e - b * d) * inv_det],
    ]


def _mat3_mul(x, y):
    return [
        [sum(x[i][k] * y[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def _mat3_vec(x, v):
    return [sum(x[i][k] * v[k] for k in range(3)) for i in range(3)]


def _solve6_scalar(H, g):
    """Scalar expansion of ba.solve6_spd: block elimination with two 3x3
    inverses. H is a 6x6 nested list (symmetric), g a 6-list; returns x (6)."""
    A = [[H[i][j] for j in range(3)] for i in range(3)]
    B = [[H[i][j + 3] for j in range(3)] for i in range(3)]
    C = [[H[i + 3][j + 3] for j in range(3)] for i in range(3)]
    g1, g2 = g[:3], g[3:]
    Ainv = _inv3_scalar(A)
    AinvB = _mat3_mul(Ainv, B)
    Bt_AinvB = [
        [sum(B[k][i] * AinvB[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    S = [[C[i][j] - Bt_AinvB[i][j] for j in range(3)] for i in range(3)]
    Sinv = _inv3_scalar(S)
    Ainv_g1 = _mat3_vec(Ainv, g1)
    rhs2 = [g2[i] - sum(B[k][i] * Ainv_g1[k] for k in range(3)) for i in range(3)]
    x2 = _mat3_vec(Sinv, rhs2)
    x1 = [Ainv_g1[i] - sum(AinvB[i][k] * x2[k] for k in range(3)) for i in range(3)]
    return x1 + x2


def _kernel(pose0_ref, data_ref, out_ref, *, R, huber_delta, ftol):
    """data_ref rows: [Xx | Xy | Xz | nx | ny | valid], each an [R,128] plane.

    The iteration cap comes in as a RUNTIME scalar (pose0_ref[0, 7]), not a
    Python constant: Mosaic unrolls while_loops whose trip count is statically
    bounded, which made compile time scale linearly with max_iters (the
    full-size kernel at 10 iterations never finished compiling). A dynamic
    bound keeps one copy of the body.
    """
    Xx = data_ref[0 * R : 1 * R, :]
    Xy = data_ref[1 * R : 2 * R, :]
    Xz = data_ref[2 * R : 3 * R, :]
    nx = data_ref[3 * R : 4 * R, :]
    ny = data_ref[4 * R : 5 * R, :]
    vw = data_ref[5 * R : 6 * R, :]

    def splat(s):
        return jnp.broadcast_to(jnp.reshape(s, (1, 1)), (1, LANES)).astype(
            jnp.float32
        )

    def project(wx, wy, wz, tx, ty, tz):
        """(1,128) pose planes -> per-obs gx, gy, inv_z and R planes."""
        a, b, B = _rodrigues_planes(wx, wy, wz)
        Rm = _rotation_planes(a, b, wx, wy, wz)
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = Rm
        px = R00 * Xx + R01 * Xy + R02 * Xz + tx
        py = R10 * Xx + R11 * Xy + R12 * Xz + ty
        pz = R20 * Xx + R21 * Xy + R22 * Xz + tz
        z_safe = jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
        inv_z = 1.0 / z_safe
        return px * inv_z, py * inv_z, inv_z, Rm, (a, b, B)

    def robust_cost(wx, wy, wz, tx, ty, tz):
        gx, gy, _, _, _ = project(wx, wy, wz, tx, ty, tz)
        r0 = gx - nx
        r1 = gy - ny
        s = r0 * r0 + r1 * r1
        return jnp.sum(vw * _huber_cost(s, huber_delta))

    max_iters = pose0_ref[0, 7].astype(jnp.int32)

    def cond_fn(st):
        return (st[8] < max_iters) & ~st[9]

    def body(st):
        wx_s, wy_s, wz_s, tx_s, ty_s, tz_s, lam, cost, it, _ = st
        wx, wy, wz = splat(wx_s), splat(wy_s), splat(wz_s)
        tx, ty, tz = splat(tx_s), splat(ty_s), splat(tz_s)

        gx, gy, inv_z, Rm, (a, b, B) = project(wx, wy, wz, tx, ty, tz)
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = Rm
        r0 = gx - nx
        r1 = gy - ny
        s = r0 * r0 + r1 * r1
        w = vw * _huber_weight(s, huber_delta)

        # M = R [X]x and J_r (see ba.residual_and_jacobians).
        M00 = R01 * Xz - R02 * Xy
        M01 = R02 * Xx - R00 * Xz
        M02 = R00 * Xy - R01 * Xx
        M10 = R11 * Xz - R12 * Xy
        M11 = R12 * Xx - R10 * Xz
        M12 = R10 * Xy - R11 * Xx
        M20 = R21 * Xz - R22 * Xy
        M21 = R22 * Xx - R20 * Xz
        M22 = R20 * Xy - R21 * Xx
        A_c = b  # right-Jacobian A coefficient
        Jr00 = 1.0 - B * (wy * wy + wz * wz)
        Jr01 = A_c * wz + B * wx * wy
        Jr02 = -A_c * wy + B * wx * wz
        Jr10 = -A_c * wz + B * wx * wy
        Jr11 = 1.0 - B * (wx * wx + wz * wz)
        Jr12 = A_c * wx + B * wy * wz
        Jr20 = A_c * wy + B * wx * wz
        Jr21 = -A_c * wx + B * wy * wz
        Jr22 = 1.0 - B * (wx * wx + wy * wy)
        D00 = -(M00 * Jr00 + M01 * Jr10 + M02 * Jr20)
        D01 = -(M00 * Jr01 + M01 * Jr11 + M02 * Jr21)
        D02 = -(M00 * Jr02 + M01 * Jr12 + M02 * Jr22)
        D10 = -(M10 * Jr00 + M11 * Jr10 + M12 * Jr20)
        D11 = -(M10 * Jr01 + M11 * Jr11 + M12 * Jr21)
        D12 = -(M10 * Jr02 + M11 * Jr12 + M12 * Jr22)
        D20 = -(M20 * Jr00 + M21 * Jr10 + M22 * Jr20)
        D21 = -(M20 * Jr01 + M21 * Jr11 + M22 * Jr21)
        D22 = -(M20 * Jr02 + M21 * Jr12 + M22 * Jr22)

        zero = jnp.zeros_like(inv_z)
        row0 = [
            inv_z * (D00 - gx * D20),
            inv_z * (D01 - gx * D21),
            inv_z * (D02 - gx * D22),
            inv_z,
            zero,
            -gx * inv_z,
        ]
        row1 = [
            inv_z * (D10 - gy * D20),
            inv_z * (D11 - gy * D21),
            inv_z * (D12 - gy * D22),
            zero,
            inv_z,
            -gy * inv_z,
        ]

        # Normal equations: 21 unique H entries + 6 gradient entries + cost,
        # each one [R,128] -> scalar reduction.
        H = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                hij = jnp.sum(w * (row0[i] * row0[j] + row1[i] * row1[j]))
                H[i][j] = hij
                H[j][i] = hij
        g = [jnp.sum(w * (row0[i] * r0 + row1[i] * r1)) for i in range(6)]

        # Damped system: H + lam * diag(H) + 1e-9 I.
        Hd = [
            [
                H[i][j] + jnp.where(i == j, lam * H[i][j] + 1e-9, 0.0)
                for j in range(6)
            ]
            for i in range(6)
        ]
        delta = _solve6_scalar(Hd, g)

        wx_n = wx_s - delta[0]
        wy_n = wy_s - delta[1]
        wz_n = wz_s - delta[2]
        tx_n = tx_s - delta[3]
        ty_n = ty_s - delta[4]
        tz_n = tz_s - delta[5]
        new_cost = robust_cost(
            splat(wx_n), splat(wy_n), splat(wz_n),
            splat(tx_n), splat(ty_n), splat(tz_n),
        )

        accept = new_cost < cost
        done = (accept & (cost - new_cost <= ftol * cost)) | (lam > 1e8)
        wx_s = jnp.where(accept, wx_n, wx_s)
        wy_s = jnp.where(accept, wy_n, wy_s)
        wz_s = jnp.where(accept, wz_n, wz_s)
        tx_s = jnp.where(accept, tx_n, tx_s)
        ty_s = jnp.where(accept, ty_n, ty_s)
        tz_s = jnp.where(accept, tz_n, tz_s)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), lam * 2.0)
        cost = jnp.where(accept, new_cost, cost)
        return (wx_s, wy_s, wz_s, tx_s, ty_s, tz_s, lam, cost, it + 1, done)

    wx0 = pose0_ref[0, 0]
    wy0 = pose0_ref[0, 1]
    wz0 = pose0_ref[0, 2]
    tx0 = pose0_ref[0, 3]
    ty0 = pose0_ref[0, 4]
    tz0 = pose0_ref[0, 5]
    lam0 = pose0_ref[0, 6]
    cost0 = robust_cost(
        splat(wx0), splat(wy0), splat(wz0), splat(tx0), splat(ty0), splat(tz0)
    )
    st = jax.lax.while_loop(
        cond_fn,
        body,
        (wx0, wy0, wz0, tx0, ty0, tz0, lam0, cost0, jnp.int32(0), jnp.bool_(False)),
    )
    out_ref[0, 0] = st[0]
    out_ref[0, 1] = st[1]
    out_ref[0, 2] = st[2]
    out_ref[0, 3] = st[3]
    out_ref[0, 4] = st[4]
    out_ref[0, 5] = st[5]
    out_ref[0, 6] = st[7]  # final cost
    out_ref[0, 7] = st[8].astype(jnp.float32)  # iterations used


@partial(
    jax.jit,
    static_argnames=("max_iters", "huber_delta", "ftol", "interpret"),
)
def motion_ba_planes(
    pose0: jnp.ndarray,  # [8] f32: wx wy wz tx ty tz lam0 pad
    data: jnp.ndarray,  # [6R, 128] f32 planes (Xx Xy Xz nx ny valid)
    max_iters: int,
    huber_delta: float,
    ftol: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused LM loop; returns [8] f32 (pose, cost, iters)."""
    R = data.shape[0] // 6
    # Ship the iteration cap as data (pose0[7]) — see _kernel's docstring.
    pose0 = pose0.at[7].set(jnp.float32(max_iters))
    out = pl.pallas_call(
        partial(_kernel, R=R, huber_delta=huber_delta, ftol=ftol),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(pose0.reshape(1, 8), data)
    return out[0]


def pack_motion_planes(
    cam, kp_uv: jnp.ndarray, point_xyz: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """[K,2] pixels + [K,3] points + [K] mask -> [6R,128] lane-planar block."""
    K = kp_uv.shape[0]
    Kp = -(-K // LANES) * LANES
    R = Kp // LANES
    pad = Kp - K

    def plane(x):
        return jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(R, LANES)

    nx = (kp_uv[:, 0] - cam.cx) / cam.fx
    ny = (kp_uv[:, 1] - cam.cy) / cam.fx  # fx only, like the reference
    return jnp.concatenate(
        [
            plane(point_xyz[:, 0]),
            plane(point_xyz[:, 1]),
            plane(point_xyz[:, 2]),
            plane(nx),
            plane(ny),
            plane(valid.astype(jnp.float32)),
        ],
        axis=0,
    )
