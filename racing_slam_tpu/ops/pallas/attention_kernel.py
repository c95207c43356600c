"""Flash-style fused multi-head attention for the LightGlue matcher.

The north-star mandate is "lightglue matcher -> Pallas attention-matching
kernel" (reference call site: src/features/DeepFeatureExtractor.cpp:8; the
lightglue-cpp submodule is absent upstream). models/lightglue.py's XLA path
materializes every [H, K, K] logit tensor in HBM (~92 MB at K=2400) and
round-trips it through softmax — 16 attention sites per matcher call made
HBM traffic, not FLOPs, the cost. This kernel runs the classic online-softmax
(flash) recurrence: per (head, query-tile) it streams key/value tiles through
VMEM, carrying running max / denominator / accumulator scratch, so no [K, K]
plane ever leaves VMEM. bf16 MXU matmuls with f32 accumulation.

Masking semantics match models/lightglue._mha exactly: invalid keys get
logit -1e9 (softmax then distributes uniformly if ALL keys are masked,
exactly like jax.nn.softmax over a -1e9 row), and invalid query rows are
zeroed by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(
    q_ref,  # [TQ, dh] (head-major row layout: rows h*Kq+q)
    k_ref,  # [TK, dh]
    v_ref,  # [TK, dh]
    mk_ref,  # [TK, 1] f32 key validity (1/0/-1)
    o_ref,  # [TQ, dh] out
    m_ref,  # [TQ, 1] f32 scratch: running max
    l_ref,  # [TQ, 1] f32 scratch: running denominator
    acc_ref,  # [TQ, dh] f32 scratch: running numerator
    *,
    scale: float,
    n_k: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, _NEG, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[:]  # [TQ, dh] bf16
    k = k_ref[:]  # [TK, dh] bf16
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,  # bf16 x bf16 -> f32 MXU
    ) * scale  # [TQ, TK]
    # mk: 1 = valid, 0 = masked (-1e9, uniform-softmax parity with the XLA
    # path when ALL keys are masked), -1 = tile padding (-2e9: excluded even
    # from that degenerate uniform case — XLA never saw these rows).
    mk = mk_ref[:, 0][None, :]
    s = jnp.where(mk > 0.0, s, jnp.where(mk < 0.0, 2.0 * _NEG, _NEG))

    m_old = m_ref[:]  # [TQ, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)  # [TQ, TK]
    alpha = jnp.exp(m_old - m_new)  # [TQ, 1]
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [TQ, dh]
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("tile_q", "tile_k", "interpret"))
def flash_mha(
    q: jnp.ndarray,  # [Kq, H, dh]
    k: jnp.ndarray,  # [Kk, H, dh]
    v: jnp.ndarray,  # [Kk, H, dh]
    mask_k: jnp.ndarray,  # [Kk] bool
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(dh), masked over keys) v without HBM logits.

    Layout matches models/lightglue._mha (token-major, heads inside);
    returns f32 [Kq, H, dh]. Query-side masking is left to the caller
    (parity with _mha, which zeroes masked query rows afterwards).
    """
    Kq, H, dh = q.shape
    Kk = k.shape[0]
    scale = 1.0 / float(dh) ** 0.5

    nq = -(-Kq // tile_q)
    nk = -(-Kk // tile_k)

    def padt(x, n, fill=0.0):
        pad = n - x.shape[0]
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    # Head-major ROW layout ([H*K, dh], pure 2-D blocks): leading-dim
    # (1, ., .) blocks tripped the remote Mosaic build into allocating the
    # whole [H, K, K] iteration on the VMEM stack.
    qh = (
        padt(q, nq * tile_q).astype(jnp.bfloat16)
        .transpose(1, 0, 2).reshape(H * nq * tile_q, dh)
    )
    kh = (
        padt(k, nk * tile_k).astype(jnp.bfloat16)
        .transpose(1, 0, 2).reshape(H * nk * tile_k, dh)
    )
    vh = (
        padt(v, nk * tile_k).astype(jnp.bfloat16)
        .transpose(1, 0, 2).reshape(H * nk * tile_k, dh)
    )
    mk = padt(mask_k.astype(jnp.float32), nk * tile_k, fill=-1.0)[:, None]

    out = pl.pallas_call(
        partial(_kernel, scale=scale, n_k=nk),
        grid=(H, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (tile_q, dh), lambda h, i, j: (h * nq + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, dh), lambda h, i, j: (h * nk + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, dh), lambda h, i, j: (h * nk + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_k, 1), lambda h, i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, dh), lambda h, i, j: (h * nq + i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((H * nq * tile_q, dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, dh), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * H * nq * tile_q * nk * tile_k * dh,
            bytes_accessed=2 * (Kq + Kk) * H * dh * 2 + Kq * H * dh * 4,
            transcendentals=H * nq * tile_q * nk * tile_k,
        ),
    )(qh, kh, vh, mk)
    return (
        out.reshape(H, nq * tile_q, dh).transpose(1, 0, 2)[:Kq]
    )
