"""Fused corner-detection frontend kernel in Pallas.

The classical frontend's image stack (gaussian blur -> sobel -> structure
tensor box sums -> min-eigenvalue -> 15x15 NMS, plus the separate sigma=2
descriptor blur; ops/image.py + ops/corners.py) is ~35 elementwise passes
over the frame. XLA materializes most of them in HBM, and the stage profiled
at ~2 ms/frame — the single largest slice of the tracking step. This kernel
computes the ENTIRE stack in one fused pass per row band: each band canvas
is loaded into VMEM once, every intermediate lives in VMEM, and only the
three results (gated response, NMS'd peak map, descriptor-blurred image) are
written back.

Tiling: the image is cut into TILE_H-row bands, each carried on a
[TILE_H + 2*MR, W + 2*MC] canvas whose halo rows hold the true neighboring
image rows (zeros beyond the frame). The deepest dependency chain
(blur r1=4 + sobel diff 1 + sobel smooth 1 + box 1 + NMS 7 = 14 rows) fits
inside the MR=16 halo, so every interior pixel of every band is EXACT —
band tiling is invisible in the outputs. Per-band VMEM footprint is
~112 x 768 x 4 B ≈ 344 KB (plus intermediates), far below the 16 MB scoped
limit at any resolution; the round-1 untiled version OOM'd VMEM at 640x480.

All shifts are jnp.roll: wrap-around only ever lands in the halo/margins
because the accumulated halo stays below MR / MC; halos are cropped on
write-out.

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

MR = 16  # row halo (sublanes); > deepest vertical dependency chain (14)
MC = 64  # column margin (lanes); > any accumulated halo and < roll wrap
TILE_H = 80  # rows per band (multiple of 8 f32 sublanes; 480 = 6*80, 720 = 9*80)


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
    tile_h: int,
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
    band = pl.program_id(0)
    img = img_ref[0]  # [tile_h + 2*MR, Wp] band canvas
    Hb, Wp = img.shape

    # --- descriptor blur (independent output) ---
    blur2_ref[0] = jax.lax.slice(
        _sep_conv_canvas(img, k2, r2), (MR, MC), (MR + tile_h, MC + W)
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

    # Mask + border gating in GLOBAL image coordinates BEFORE NMS (the XLA
    # path zeroes the score map before max_pool_same, so suppressed corners
    # cannot shadow real peaks — detect_corners, ops/corners.py). Using
    # global rows keeps the gate consistent across band halos.
    rows = band * tile_h + jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 0) - MR
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wp), 1)
    inb = (
        (rows >= border)
        & (rows < H - border)
        & (cols >= MC + border)
        & (cols < MC + W - border)
    )
    resp = jnp.where(inb, resp, 0.0)
    if mask_ref is not None:
        resp = jnp.where(mask_ref[0] > 0.0, resp, 0.0)

    peaks = jnp.where(resp >= _shift_max(resp, nms_radius), resp, 0.0)

    resp_ref[0] = jax.lax.slice(resp, (MR, MC), (MR + tile_h, MC + W))
    peaks_ref[0] = jax.lax.slice(peaks, (MR, MC), (MR + tile_h, MC + W))


def _make_bands(canvas: jnp.ndarray, n: int, tile_h: int) -> jnp.ndarray:
    """[Hpad + 2*MR, Wp] canvas -> [n, tile_h + 2*MR, Wp] overlapping bands."""
    return jnp.stack(
        [
            jax.lax.slice_in_dim(canvas, i * tile_h, i * tile_h + tile_h + 2 * MR, axis=0)
            for i in range(n)
        ]
    )


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
    gaussian_blur(img, desc_blur_sigma) — fused VMEM passes over row bands.
    """
    H, W = img.shape
    k1 = gaussian_kernel1d(pre_blur_sigma)
    r1 = len(k1) // 2
    k2 = gaussian_kernel1d(desc_blur_sigma)
    r2 = len(k2) // 2
    assert max(r1 + 3 + nms_radius, r2) <= MR, "halo exceeds margin"

    n = -(-H // TILE_H)
    Hpad = n * TILE_H
    Wp = W + 2 * MC
    Hb = TILE_H + 2 * MR
    canvas = jnp.zeros((Hpad + 2 * MR, Wp), jnp.float32)
    canvas = canvas.at[MR : MR + H, MC : MC + W].set(img.astype(jnp.float32))
    inputs = [_make_bands(canvas, n, TILE_H)]
    if mask is not None:
        mcanvas = jnp.zeros((Hpad + 2 * MR, Wp), jnp.float32)
        mcanvas = mcanvas.at[MR : MR + H, MC : MC + W].set(
            (mask > 0).astype(jnp.float32)
        )
        inputs.append(_make_bands(mcanvas, n, TILE_H))

    out = pl.pallas_call(
        partial(
            _kernel,
            H=H,
            W=W,
            tile_h=TILE_H,
            k1=tuple(float(x) for x in k1),
            r1=r1,
            k2=tuple(float(x) for x in k2),
            r2=r2,
            nms_radius=nms_radius,
            border=border,
            has_mask=mask is not None,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, Hb, Wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in inputs
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, TILE_H, W), jnp.float32),
            jax.ShapeDtypeStruct((n, TILE_H, W), jnp.float32),
            jax.ShapeDtypeStruct((n, TILE_H, W), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * Hb * Wp
            * (4 * (2 * r1 + 1) + 4 * (2 * r2 + 1) + 8 * nms_radius + 40),
            bytes_accessed=len(inputs) * n * Hb * Wp * 4 + 3 * Hpad * W * 4,
            transcendentals=n * Hb * Wp,
        ),
    )(*inputs)
    resp = out[0].reshape(Hpad, W)[:H]
    peaks = out[1].reshape(Hpad, W)[:H]
    blur2 = out[2].reshape(Hpad, W)[:H]
    return resp, peaks, blur2
