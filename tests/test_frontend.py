import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.ops.corners import detect_corners
from racing_slam_tpu.ops.descriptors import MAX_DISTANCE, extract_descriptors
from racing_slam_tpu.ops.matching import match_frames
from racing_slam_tpu.utils.synthetic import random_texture, shift_image


def _detect_and_describe(img):
    j = jnp.asarray(img)
    c = detect_corners(j)
    d = extract_descriptors(j, c.xy)
    return c, d


def test_detect_corners_on_texture(rng):
    img = random_texture(240, 320, rng)
    c = _detect_and_describe(img)[0]
    assert np.asarray(c.valid).sum() > 100
    xy = np.asarray(c.xy)[np.asarray(c.valid)]
    # Inside borders
    assert (xy[:, 0] >= 8).all() and (xy[:, 0] < 312).all()
    assert (xy[:, 1] >= 8).all() and (xy[:, 1] < 232).all()


def test_corner_repeatability_under_shift(rng):
    img = random_texture(240, 320, rng)
    dx, dy = 3.3, -2.6
    img2 = shift_image(img, dx, dy)
    c1 = detect_corners(jnp.asarray(img))
    c2 = detect_corners(jnp.asarray(img2))
    xy1 = np.asarray(c1.xy)[np.asarray(c1.valid)]
    xy2 = np.asarray(c2.xy)[np.asarray(c2.valid)]
    # For each corner in 1, a corner in 2 should exist near (xy1 + shift).
    from scipy.spatial import cKDTree

    tree = cKDTree(xy2)
    dist, _ = tree.query(xy1 + [dx, dy], k=1)
    frac = (dist < 1.5).mean()
    assert frac > 0.6, f"repeatability too low: {frac}"
    # The strongest quartile must be highly repeatable (what tracking uses).
    s1 = np.asarray(c1.score)[np.asarray(c1.valid)]
    top = np.argsort(-s1)[: len(s1) // 4]
    frac_top = (dist[top] < 1.5).mean()
    assert frac_top > 0.8, f"top-quartile repeatability too low: {frac_top}"


def test_mask_respected(rng):
    img = random_texture(240, 320, rng)
    mask = np.zeros((240, 320), np.float32)
    mask[:, :160] = 1.0  # only left half allowed
    c = detect_corners(jnp.asarray(img), mask=jnp.asarray(mask))
    xy = np.asarray(c.xy)[np.asarray(c.valid)]
    assert (xy[:, 0] < 160).all()


def test_descriptor_matching_under_shift(rng):
    img = random_texture(240, 320, rng)
    dx, dy = 4.0, 1.5
    img2 = shift_image(img, dx, dy)
    c1, d1 = _detect_and_describe(img)
    c2, d2 = _detect_and_describe(img2)
    m = match_frames(d1, c1.valid, d2, c2.valid, MAX_DISTANCE)
    valid = np.asarray(m.valid)
    assert valid.sum() > 80
    # Matched displacement must agree with the true shift.
    xy1 = np.asarray(c1.xy)[np.asarray(m.train_idx)[valid]]
    xy2 = np.asarray(c2.xy)[valid]
    disp = xy2 - xy1
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.5)
    inlier_frac = (np.linalg.norm(disp - [dx, dy], axis=-1) < 1.5).mean()
    assert inlier_frac > 0.8, f"match inlier fraction too low: {inlier_frac}"


def test_match_frames_cross_check_rejects_unrelated(rng):
    img1 = random_texture(240, 320, rng)
    img2 = random_texture(240, 320, np.random.default_rng(99))  # unrelated
    c1, d1 = _detect_and_describe(img1)
    c2, d2 = _detect_and_describe(img2)
    m = match_frames(d1, c1.valid, d2, c2.valid, MAX_DISTANCE)
    n1 = int(np.asarray(c1.valid).sum())
    # Unrelated images: far fewer surviving matches than real overlap.
    assert np.asarray(m.valid).sum() < 0.25 * n1


def test_cell_descriptor_extraction_matches_gather_path(rng):
    """extract_descriptors_cells (static-window path used by the pipeline)
    must agree with the per-keypoint gather formulation away from image
    borders (edge padding differs from window clamping only there)."""
    from racing_slam_tpu.ops.descriptors import extract_descriptors_cells

    img = random_texture(240, 320, rng)
    j = jnp.asarray(img)
    c = detect_corners(j, cell=16, n_per_cell=2)
    d_gather = np.asarray(extract_descriptors(j, c.xy))
    d_cells = np.asarray(extract_descriptors_cells(j, c.xy, 16, 2))
    xy = np.asarray(c.xy)
    interior = (
        (xy[:, 0] > 20) & (xy[:, 0] < 300) & (xy[:, 1] > 20) & (xy[:, 1] < 220)
        & np.asarray(c.valid)
    )
    assert interior.sum() > 100
    np.testing.assert_allclose(
        d_cells[interior], d_gather[interior], atol=2e-3
    )
