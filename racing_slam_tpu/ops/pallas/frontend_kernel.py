"""Fused corner-detection frontend kernel in Pallas.

The classical frontend's image stack (gaussian blur -> sobel -> structure
tensor box sums -> min-eigenvalue -> 15x15 NMS, plus the separate sigma=2
descriptor blur; ops/image.py + ops/corners.py) is ~35 elementwise passes
over the frame. XLA materializes most of them in HBM, and the stage profiled
at ~2 ms/frame — the single largest slice of the tracking step. This kernel
computes the ENTIRE stack in one pass: the padded image is loaded into VMEM
once, every intermediate lives in VMEM, and only the three results (gated
response, NMS'd peak map, descriptor-blurred image) are written back.

Layout: the caller pads the image onto a [H + 2*MR, W + 2*MC] canvas
(margins hold zeros, matching the zero-padding semantics of the XLA conv
path). All shifts are jnp.roll: wrap-around only ever lands in the margins
because the accumulated halo of the deepest chain
(blur 4 + sobel 1 + box 1 + NMS 7 = 13) stays below the margins (16 / 64).
Interior results are exact; margins are garbage and get cropped on write-out.

Reference for what this replaces: cv::GFTTDetector inside the ORB extractor
(src/features/OrbFeatureExtractor.cpp:14-16).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..image import gaussian_kernel1d

MR = 16  # row margin (sublanes)
MC = 64  # column margin (lanes); > any accumulated halo and < roll wrap


def _shift(arr, d, axis):
    """out[i] = arr[i + d] (static d); wrap-around lands in the margins."""
    if d == 0:
        return arr
    return jnp.roll(arr, -d, axis=axis)


def _sep_conv_canvas(arr, taps, radius):
    """Separable 'same' conv on the canvas with a symmetric 1-D kernel."""
    tmp = taps[radius] * arr
    for d in range(1, radius + 1):
        tmp = tmp + taps[radius + d] * _shift(arr, d, 1)
        tmp = tmp + taps[radius - d] * _shift(arr, -d, 1)
    out = taps[radius] * tmp
    for d in range(1, radius + 1):
        out = out + taps[radius + d] * _shift(tmp, d, 0)
        out = out + taps[radius - d] * _shift(tmp, -d, 0)
    return out


def _shift_max(arr, radius):
    """(2r+1)^2 max filter via separable shift-max."""
    tmp = arr
    for d in range(1, radius + 1):
        tmp = jnp.maximum(tmp, _shift(arr, d, 1))
        tmp = jnp.maximum(tmp, _shift(arr, -d, 1))
    out = tmp
    for d in range(1, radius + 1):
        out = jnp.maximum(out, _shift(tmp, d, 0))
        out = jnp.maximum(out, _shift(tmp, -d, 0))
    return out


def _kernel(
    *refs,
    H: int,
    W: int,
    k1: tuple,
    r1: int,
    k2: tuple,
    r2: int,
    nms_radius: int,
    border: int,
    has_mask: bool,
):
    if has_mask:
        img_ref, mask_ref, resp_ref, peaks_ref, blur2_ref = refs
    else:
        img_ref, resp_ref, peaks_ref, blur2_ref = refs
        mask_ref = None
    img = img_ref[:]
    Hp, Wp = img.shape

    # --- descriptor blur (independent output) ---
    blur2_ref[:] = jax.lax.slice(
        _sep_conv_canvas(img, k2, r2), (MR, MC), (MR + H, MC + W)
    )

    # --- Shi-Tomasi response (same taps as ops.corners.shi_tomasi_response).
    b = _sep_conv_canvas(img, k1, r1)
    # Sobel = smooth [1,2,1] (x) diff; gradient sign cancels in the products.
    def smooth(a, axis):
        return 2.0 * a + _shift(a, 1, axis) + _shift(a, -1, axis)

    def diff(a, axis):
        return _shift(a, 1, axis) - _shift(a, -1, axis)

    ix = smooth(diff(b, 1), 0)
    iy = smooth(diff(b, 0), 1)

    def box3(a):
        t = a + _shift(a, 1, 1) + _shift(a, -1, 1)
        return t + _shift(t, 1, 0) + _shift(t, -1, 0)

    sxx = box3(ix * ix)
    syy = box3(iy * iy)
    sxy = box3(ix * iy)
    half_tr = 0.5 * (sxx + syy)
    rad = jnp.sqrt(jnp.maximum((0.5 * (sxx - syy)) ** 2 + sxy * sxy, 0.0))
    resp = half_tr - rad

    # Mask + border + margin gating BEFORE NMS (the XLA path zeroes the score
    # map before max_pool_same, so suppressed corners cannot shadow real
    # peaks — detect_corners, ops/corners.py).
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    inb = (
        (rows >= MR + border)
        & (rows < MR + H - border)
        & (cols >= MC + border)
        & (cols < MC + W - border)
    )
    resp = jnp.where(inb, resp, 0.0)
    if mask_ref is not None:
        resp = jnp.where(mask_ref[:] > 0.0, resp, 0.0)

    peaks = jnp.where(resp >= _shift_max(resp, nms_radius), resp, 0.0)

    resp_ref[:] = jax.lax.slice(resp, (MR, MC), (MR + H, MC + W))
    peaks_ref[:] = jax.lax.slice(peaks, (MR, MC), (MR + H, MC + W))


@partial(
    jax.jit,
    static_argnames=(
        "pre_blur_sigma", "desc_blur_sigma", "nms_radius", "border", "interpret",
    ),
)
def corner_frontend_fused(
    img: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    pre_blur_sigma: float = 1.2,
    desc_blur_sigma: float = 2.0,
    nms_radius: int = 7,
    border: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(gated_response, nms_peaks, desc_blurred) for a [H, W] f32 image.

    Semantics match the XLA path exactly: shi_tomasi_response(img) with
    mask/border zeroing, max_pool_same NMS peaks, and
    gaussian_blur(img, desc_blur_sigma) — in one fused VMEM pass.
    """
    H, W = img.shape
    k1 = gaussian_kernel1d(pre_blur_sigma)
    r1 = len(k1) // 2
    k2 = gaussian_kernel1d(desc_blur_sigma)
    r2 = len(k2) // 2
    assert max(r1 + 2 + nms_radius, r2) <= MR, "halo exceeds margin"

    Wp = W + 2 * MC
    Hp = H + 2 * MR
    padded = jnp.zeros((Hp, Wp), jnp.float32).at[MR : MR + H, MC : MC + W].set(
        img.astype(jnp.float32)
    )
    inputs = [padded]
    if mask is not None:
        mpad = jnp.zeros((Hp, Wp), jnp.float32).at[
            MR : MR + H, MC : MC + W
        ].set((mask > 0).astype(jnp.float32))
        inputs.append(mpad)

    out = pl.pallas_call(
        partial(
            _kernel,
            H=H,
            W=W,
            k1=tuple(float(x) for x in k1),
            r1=r1,
            k2=tuple(float(x) for x in k2),
            r2=r2,
            nms_radius=nms_radius,
            border=border,
            has_mask=mask is not None,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=Hp * Wp * (4 * (2 * r1 + 1) + 4 * (2 * r2 + 1) + 8 * nms_radius + 40),
            bytes_accessed=len(inputs) * Hp * Wp * 4 + 3 * H * W * 4,
            transcendentals=Hp * Wp,
        ),
    )(*inputs)
    return out[0], out[1], out[2]
