"""Fused Pallas frontend kernel vs the XLA conv-stack reference path."""

import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.ops.corners import (
    detect_corners,
    max_pool_same,
    select_corners_from_maps,
    shi_tomasi_response,
)
from racing_slam_tpu.ops.image import gaussian_blur
from racing_slam_tpu.ops.pallas.frontend_kernel import corner_frontend_fused
from racing_slam_tpu.utils.synthetic import random_texture


def _xla_maps(img, mask=None, border=8, nms_radius=7):
    score = shi_tomasi_response(img)
    H, W = img.shape
    if mask is not None:
        score = jnp.where(mask > 0, score, 0.0)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    score = jnp.where(inb, score, 0.0)
    is_peak = score >= max_pool_same(score, 2 * nms_radius + 1)
    return score, jnp.where(is_peak, score, 0.0)


def test_fused_maps_match_xla(rng):
    img = jnp.asarray(random_texture(144, 256, rng))
    score_x, peaks_x = _xla_maps(img)
    score_f, peaks_f, blur_f = corner_frontend_fused(img, interpret=True)
    np.testing.assert_allclose(
        np.asarray(score_f), np.asarray(score_x), atol=2e-5, rtol=1e-4
    )
    # NMS survivors can differ only at exact-tie pixels; demand identity.
    np.testing.assert_allclose(
        np.asarray(peaks_f), np.asarray(peaks_x), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(blur_f), np.asarray(gaussian_blur(img, 2.0)), atol=1e-5
    )


def test_fused_respects_mask(rng):
    img = jnp.asarray(random_texture(144, 256, rng))
    mask = np.ones((144, 256), np.uint8)
    mask[:, :128] = 0
    score_f, peaks_f, _ = corner_frontend_fused(
        img, jnp.asarray(mask), interpret=True
    )
    assert np.asarray(score_f)[:, :128].max() == 0.0
    c = select_corners_from_maps(score_f, peaks_f, cell=16)
    xy = np.asarray(c.xy)[np.asarray(c.valid)]
    assert (xy[:, 0] >= 128).all()


def test_fused_keypoints_match_xla_detector(rng):
    img = jnp.asarray(random_texture(144, 256, rng))
    c_x = detect_corners(img, cell=16, n_per_cell=2)
    score_f, peaks_f, _ = corner_frontend_fused(img, interpret=True)
    c_f = select_corners_from_maps(score_f, peaks_f, cell=16, n_per_cell=2)
    vx = np.asarray(c_x.valid)
    vf = np.asarray(c_f.valid)
    # fp-rounding can flip argmax at near-ties in a few cells; demand
    # near-total agreement rather than bit identity.
    agree = (vx == vf).mean()
    assert agree > 0.99, f"valid agreement {agree}"
    both = vx & vf
    close = (
        np.abs(np.asarray(c_x.xy)[both] - np.asarray(c_f.xy)[both]).max(axis=-1)
        < 0.51
    ).mean()
    assert close > 0.98, f"xy agreement {close}"


def test_fused_720_rows_nine_bands(rng):
    """720-row image = 9 TILE_H bands (the 1280x720 tiling; width kept small
    for interpret-mode speed — the band canvas is row-tiled only, so the
    9-band path is exactly what full 720p exercises on the chip, where
    bench.py --res 720 records the real-resolution datapoint)."""
    img = jnp.asarray(random_texture(720, 256, rng))
    score_x, peaks_x = _xla_maps(img)
    score_f, peaks_f, blur_f = corner_frontend_fused(img, interpret=True)
    np.testing.assert_allclose(
        np.asarray(score_f), np.asarray(score_x), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(peaks_f), np.asarray(peaks_x), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(blur_f), np.asarray(gaussian_blur(img, 2.0)), atol=1e-5
    )
