import jax.numpy as jnp
import numpy as np

from racing_slam_tpu.slam.state import (
    Features,
    KeyframeStore,
    MapState,
    add_associations,
    create_points,
    remove_points,
    write_keyframe,
)

P, O, F, K, D = 16, 4, 4, 8, 16


def _empty():
    return MapState.create(P, O), KeyframeStore.create(F, K, D)


def _feat(rng, k=K):
    return Features(
        xy=jnp.asarray(rng.uniform(0, 100, (k, 2)).astype(np.float32)),
        desc=jnp.asarray(rng.standard_normal((k, D)).astype(np.float32)),
        valid=jnp.ones((k,), bool),
        score=jnp.ones((k,)),
    )


def test_create_points_allocates_and_wires(rng):
    m, kfs = _empty()
    pos = jnp.asarray(rng.standard_normal((K, 3)).astype(np.float32))
    cand = jnp.asarray(np.array([1, 1, 0, 1, 0, 0, 0, 0], bool))
    kp_a = jnp.arange(K, dtype=jnp.int32)
    kp_b = jnp.arange(K, dtype=jnp.int32)[::-1].copy()
    m, kfs, slots, created = create_points(
        m, pos, cand, jnp.int32(0), jnp.int32(1), kp_a, kp_b,
        jnp.ones(K), kfs,
    )
    assert int(m.num_points()) == 3
    c = np.asarray(created)
    np.testing.assert_array_equal(c, np.asarray(cand))
    s = np.asarray(slots)[c]
    assert len(np.unique(s)) == 3
    # Observations registered for both keyframes.
    np.testing.assert_array_equal(np.asarray(m.obs_valid)[s, :2], True)
    np.testing.assert_array_equal(np.asarray(m.obs_kf)[s, 0], 0)
    np.testing.assert_array_equal(np.asarray(m.obs_kf)[s, 1], 1)
    # Frame match slots wired both ways.
    km = np.asarray(kfs.matches)
    for i, slot in zip(np.where(c)[0], s):
        assert km[0, int(kp_a[i])] == slot
        assert km[1, int(kp_b[i])] == slot


def test_create_points_respects_capacity(rng):
    m, kfs = _empty()
    # Fill 14 of 16 slots.
    m = m._replace(valid=m.valid.at[: P - 2].set(True))
    pos = jnp.asarray(rng.standard_normal((K, 3)).astype(np.float32))
    cand = jnp.ones(K, bool)  # 8 candidates, only 2 free slots
    m, kfs, slots, created = create_points(
        m, pos, cand, jnp.int32(0), jnp.int32(1),
        jnp.arange(K, dtype=jnp.int32), jnp.arange(K, dtype=jnp.int32),
        jnp.ones(K), kfs,
    )
    assert int(np.asarray(created).sum()) == 2
    assert int(m.num_points()) == P


def test_add_associations_appends(rng):
    m, kfs = _empty()
    fidx = jnp.arange(8, dtype=jnp.int32)  # keyframe slot i <- frame i
    # One existing point with 2 observations.
    m = m._replace(
        valid=m.valid.at[5].set(True),
        obs_valid=m.obs_valid.at[5, :2].set(True),
        obs_kf=m.obs_kf.at[5, :2].set(jnp.asarray([0, 1])),
    )
    match = jnp.full((K,), -1, jnp.int32).at[3].set(5)
    valid = jnp.zeros((K,), bool).at[3].set(True)
    m2 = add_associations(m, jnp.int32(2), match, valid, fidx)
    assert bool(m2.obs_valid[5, 2])
    assert int(m2.obs_kf[5, 2]) == 2
    assert int(m2.obs_kp[5, 2]) == 3
    # Saturation, drop_newest: fill all O slots, further associations dropped.
    m3 = add_associations(m2, jnp.int32(3), match, valid, fidx,
                          policy="drop_newest")
    m4 = add_associations(m3, jnp.int32(4), match, valid, fidx,
                          policy="drop_newest")
    assert int(jnp.sum(m4.obs_valid[5])) == O
    assert sorted(np.asarray(m4.obs_kf[5]).tolist()) == [0, 1, 2, 3]
    # Saturation, replace_oldest: keyframe 4 replaces the oldest anchor (0).
    m5 = add_associations(m3, jnp.int32(4), match, valid, fidx,
                          policy="replace_oldest")
    assert int(jnp.sum(m5.obs_valid[5])) == O
    assert sorted(np.asarray(m5.obs_kf[5]).tolist()) == [1, 2, 3, 4]


def test_add_associations_fills_holes_first():
    """Eviction scrubbing leaves invalid slots mid-table; a new association
    must land in the hole, never on a live observation."""
    m, kfs = _empty()
    fidx = jnp.arange(8, dtype=jnp.int32)
    m = m._replace(
        valid=m.valid.at[5].set(True),
        obs_valid=m.obs_valid.at[5].set(jnp.asarray([True, False, True, False])),
        obs_kf=m.obs_kf.at[5].set(jnp.asarray([0, 9, 2, 9])),
        obs_kp=m.obs_kp.at[5].set(jnp.asarray([10, 0, 12, 0])),
    )
    match = jnp.full((K,), -1, jnp.int32).at[3].set(5)
    valid = jnp.zeros((K,), bool).at[3].set(True)
    m2 = add_associations(m, jnp.int32(3), match, valid, fidx)
    ov = np.asarray(m2.obs_valid[5])
    assert ov.sum() == 3
    # Both live observations survived.
    assert int(m2.obs_kf[5, 0]) == 0 and int(m2.obs_kp[5, 0]) == 10
    assert int(m2.obs_kf[5, 2]) == 2 and int(m2.obs_kp[5, 2]) == 12
    new_slot = int(np.nonzero(ov & (np.asarray(m2.obs_kf[5]) == 3))[0][0])
    assert new_slot in (1, 3)


def test_remove_points_scrubs_matches(rng):
    m, kfs = _empty()
    m = m._replace(valid=m.valid.at[jnp.asarray([2, 7])].set(True),
                   obs_valid=m.obs_valid.at[2, 0].set(True))
    kfs = kfs._replace(
        matches=kfs.matches.at[0, 1].set(2).at[1, 4].set(7).at[2, 3].set(7)
    )
    remove = jnp.zeros((P,), bool).at[7].set(True)
    m2, kfs2 = remove_points(m, kfs, remove)
    assert not bool(m2.valid[7])
    assert bool(m2.valid[2])
    km = np.asarray(kfs2.matches)
    assert km[1, 4] == -1 and km[2, 3] == -1
    assert km[0, 1] == 2  # untouched


def test_write_keyframe_and_observed_by(rng):
    m, kfs = _empty()
    f = _feat(rng)
    kfs = write_keyframe(kfs, jnp.int32(0), jnp.zeros(3), jnp.zeros(3), f,
                         jnp.full((K,), -1), jnp.int32(7))
    assert bool(kfs.valid[0]) and int(kfs.frame_index[0]) == 7
    m = m._replace(valid=m.valid.at[1].set(True),
                   obs_valid=m.obs_valid.at[1, 0].set(True),
                   obs_kf=m.obs_kf.at[1, 0].set(0))
    ob = np.asarray(m.observed_by(jnp.int32(0)))
    assert ob[1] and not ob[0]
