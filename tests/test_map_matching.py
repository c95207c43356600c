import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.ops.matching import match_map_to_frame
from tests.geometry_fixtures import default_camera, project_np, synthetic_scene


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _setup(rng, P=60, K=80, D=32, O=3):
    """Map points whose first K slots project onto the frame's keypoints; each
    point's observation descriptors are noisy copies of the keypoint's."""
    cam = default_camera()
    pose = np.eye(4, dtype=np.float32)
    X = synthetic_scene(rng, P)
    uv = project_np(cam, pose, X)

    kp_desc = _unit(rng.standard_normal((K, D)).astype(np.float32))
    # keypoints 0..P-1 sit at the projections (sub-pixel jitter), rest random
    kp_uv = np.concatenate(
        [uv + rng.uniform(-2, 2, (P, 2)).astype(np.float32),
         rng.uniform(0, 600, (K - P, 2)).astype(np.float32)]
    )
    obs_desc = np.zeros((P, O, D), np.float32)
    for o in range(O):
        obs_desc[:, o] = _unit(kp_desc[:P] + 0.1 * rng.standard_normal((P, D)).astype(np.float32))
    obs_valid = np.ones((P, O), bool)
    return cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid


def _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid,
           point_mask=None, kp_matched=None, pt_matched=None, max_distance=0.8):
    P, K = X.shape[0], kp_uv.shape[0]
    return match_map_to_frame(
        cam, jnp.asarray(pose), jnp.asarray(X),
        jnp.asarray(np.ones(P, bool) if point_mask is None else point_mask),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.asarray(np.zeros(K, bool) if kp_matched is None else kp_matched),
        jnp.asarray(np.zeros(P, bool) if pt_matched is None else pt_matched),
        max_distance=max_distance, chunk=32,
    )


def test_matches_correct_keypoints(rng):
    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng)
    m = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid)
    valid = np.asarray(m.valid)
    pts = np.asarray(m.point_idx)
    # Keypoint k < P should be matched to point k (its descriptor source).
    correct = sum(1 for k in range(60) if valid[k] and pts[k] == k)
    assert correct > 50, f"only {correct} correct matches"
    # Distractor keypoints (no corresponding point nearby) unmatched.
    assert valid[60:].sum() <= 2


def test_radius_gate(rng):
    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng)
    # Move keypoints far from all projections: nothing can match.
    kp_uv_far = kp_uv + 50.0
    m = _match(cam, pose, X, kp_uv_far, kp_desc, obs_desc, obs_valid)
    assert np.asarray(m.valid).sum() == 0


def test_point_filter_mask(rng):
    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng)
    mask = np.zeros(60, bool)
    mask[:20] = True  # only first 20 points eligible (observed-by-last-KF analogue)
    m = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid, point_mask=mask)
    pts = np.asarray(m.point_idx)[np.asarray(m.valid)]
    assert (pts < 20).all()


def test_dedup_already_matched(rng):
    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng)
    kp_matched = np.zeros(80, bool)
    kp_matched[:10] = True
    pt_matched = np.zeros(60, bool)
    pt_matched[20:30] = True
    m = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid,
               kp_matched=kp_matched, pt_matched=pt_matched)
    valid = np.asarray(m.valid)
    pts = np.asarray(m.point_idx)
    assert not valid[:10].any()  # matched keypoints skipped
    assert not np.isin(pts[valid], np.arange(20, 30)).any()  # matched points skipped


def test_at_most_one_point_per_keypoint(rng):
    # Two identical points at the same position competing for one keypoint.
    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng, P=10, K=12)
    X[1] = X[0]
    obs_desc[1] = obs_desc[0]
    m = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid)
    valid = np.asarray(m.valid)
    pts = np.asarray(m.point_idx)[valid]
    assert len(np.unique(pts)) == len(pts)  # no point matched twice


def test_pallas_backend_matches_xla(rng):
    """The fused Pallas stage-1 kernel must agree with the XLA fallback."""
    import jax.numpy as jnp

    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(rng, P=64, K=80)
    kwargs = dict(
        point_mask=None, kp_matched=None, pt_matched=None, max_distance=0.8,
    )
    m_xla = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid, **kwargs)

    from racing_slam_tpu.ops.matching import match_map_to_frame

    P, K = X.shape[0], kp_uv.shape[0]
    m_pal = match_map_to_frame(
        cam, jnp.asarray(pose), jnp.asarray(X), jnp.ones(P, bool),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.zeros(K, bool), jnp.zeros(P, bool),
        max_distance=0.8, chunk=32, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(m_xla.valid), np.asarray(m_pal.valid))
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_xla.point_idx)[v], np.asarray(m_pal.point_idx)[v]
    )
    np.testing.assert_allclose(
        np.asarray(m_xla.distance)[v], np.asarray(m_pal.distance)[v], atol=1e-4
    )


def test_pallas_keypoint_tiling_matches_xla(rng):
    """K beyond one keypoint tile (the 720p shape class) must produce the
    same stage-1 results: the running argmin across K tiles is exact."""
    import jax.numpy as jnp

    from racing_slam_tpu.ops.matching import match_map_to_frame

    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(
        rng, P=64, K=2600  # > 2560 -> two K tiles (2048 + padded 2048)
    )
    kwargs = dict(
        point_mask=None, kp_matched=None, pt_matched=None, max_distance=0.8,
    )
    m_xla = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid, **kwargs)
    P, K = X.shape[0], kp_uv.shape[0]
    m_pal = match_map_to_frame(
        cam, jnp.asarray(pose), jnp.asarray(X), jnp.ones(P, bool),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.zeros(K, bool), jnp.zeros(P, bool),
        max_distance=0.8, chunk=64, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(m_xla.valid), np.asarray(m_pal.valid))
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_xla.point_idx)[v], np.asarray(m_pal.point_idx)[v]
    )


def test_banded_backend_matches_xla(rng):
    """The grid-hash (banded) backend must agree with the XLA path exactly:
    sorted-order banding + pixel gate is a pure superset pruning."""
    import jax.numpy as jnp

    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(
        rng, P=300, K=1100, D=32, O=3
    )
    P, K = X.shape[0], kp_uv.shape[0]
    m_xla = _match(cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid)
    m_band = match_map_to_frame(
        cam, jnp.asarray(pose), jnp.asarray(X), jnp.ones(P, bool),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.zeros(K, bool), jnp.zeros(P, bool),
        max_distance=0.8, chunk=32, backend="banded",
    )
    np.testing.assert_array_equal(
        np.asarray(m_xla.valid), np.asarray(m_band.valid)
    )
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_xla.point_idx)[v], np.asarray(m_band.point_idx)[v]
    )
    np.testing.assert_allclose(
        np.asarray(m_xla.distance)[v], np.asarray(m_band.distance)[v],
        atol=1e-4,
    )


def test_banded_backend_partial_gate(rng):
    """Banding with a sparse gated subset (the observed-by-last-keyframe
    filter shape, src/Slam.cpp:138-150) and pre-matched keypoints/points."""
    import jax.numpy as jnp

    cam, pose, X, kp_uv, kp_desc, obs_desc, obs_valid = _setup(
        rng, P=300, K=1100, D=32, O=3
    )
    P, K = X.shape[0], kp_uv.shape[0]
    point_mask = rng.random(P) < 0.3
    kp_m = rng.random(K) < 0.2
    pt_m = rng.random(P) < 0.1
    common = dict(max_distance=0.8, chunk=32)
    args = (
        cam, jnp.asarray(pose), jnp.asarray(X), jnp.asarray(point_mask),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.asarray(kp_m), jnp.asarray(pt_m),
    )
    m_xla = match_map_to_frame(*args, backend="xla", **common)
    m_band = match_map_to_frame(*args, backend="banded", **common)
    np.testing.assert_array_equal(
        np.asarray(m_xla.valid), np.asarray(m_band.valid)
    )
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_xla.point_idx)[v], np.asarray(m_band.point_idx)[v]
    )


def test_banded_backend_prefix_cap(rng):
    """At P >= 8192 the banded backend gathers only the first P/2 sorted
    rows (ops/matching.py: bounded sorted prefix G). With gated points well
    under the cap the result must still match XLA exactly; the cap is pure
    traffic reduction, never semantics."""
    import jax.numpy as jnp

    cam, pose, X0, kp_uv, kp_desc, obs_desc0, obs_valid0 = _setup(
        rng, P=500, K=1100, D=32, O=3
    )
    # Grow the map to 8192 slots: the first 500 are the real scene, the
    # rest sit behind the camera (ungated but VALID — they still travel
    # through the sort and would be gathered without the cap).
    P, K = 8192, kp_uv.shape[0]
    X = np.concatenate(
        [X0, rng.normal(0, 2, (P - 500, 3)).astype(np.float32)
         * [1, 1, -1] - [0, 0, 5]]
    )
    obs_desc = np.concatenate(
        [obs_desc0,
         rng.standard_normal((P - 500, 3, 32)).astype(np.float32)]
    )
    obs_valid = np.concatenate(
        [obs_valid0, np.ones((P - 500, 3), bool)]
    )
    point_mask = np.ones(P, bool)
    common = dict(max_distance=0.8, chunk=32)
    args = (
        cam, jnp.asarray(pose), jnp.asarray(X), jnp.asarray(point_mask),
        jnp.asarray(obs_desc), jnp.asarray(obs_valid),
        jnp.asarray(kp_uv), jnp.asarray(kp_desc), jnp.ones(K, bool),
        jnp.zeros(K, bool), jnp.zeros(P, bool),
    )
    m_xla = match_map_to_frame(*args, backend="xla", **common)
    m_band = match_map_to_frame(*args, backend="banded", **common)
    np.testing.assert_array_equal(
        np.asarray(m_xla.valid), np.asarray(m_band.valid)
    )
    v = np.asarray(m_xla.valid)
    np.testing.assert_array_equal(
        np.asarray(m_xla.point_idx)[v], np.asarray(m_band.point_idx)[v]
    )
