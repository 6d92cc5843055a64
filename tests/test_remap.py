"""Direct unit tests for narrowphase.remap_cache (the transient hash-table
re-alignment of the per-lane contact cache after a pair-buffer rebuild,
ref: src/Contact.cs:385-413 + src/BroadPhase.cs:50 pairSet)."""

import jax.numpy as jnp
import numpy as np

from box2d_tpu.narrowphase import empty_cache, remap_cache
from box2d_tpu.state import ContactStore


def _store(ka, kb, P):
    n = len(ka)
    pad = P - n
    f = lambda x, fill: jnp.asarray(
        np.concatenate([np.asarray(x, np.float32),
                        np.full(pad, fill, np.float32)]))
    i = lambda x, fill: jnp.asarray(
        np.concatenate([np.asarray(x, np.int32),
                        np.full(pad, fill, np.int32)]))
    rng = np.random.RandomState(3)
    ni = rng.uniform(0, 5, (P, 2)).astype(np.float32)
    ti = rng.uniform(-1, 1, (P, 2)).astype(np.float32)
    ids = rng.randint(0, 1 << 16, (P, 2)).astype(np.int32)
    return ContactStore(
        key_a=i(ka, -1), key_b=i(kb, -1),
        ids=jnp.asarray(ids),
        normal_impulse=jnp.asarray(ni),
        tangent_impulse=jnp.asarray(ti),
        rolling_impulse=f(rng.uniform(0, 1, n), 0.0),
        touching=i([1] * n, 0) > 0,
        color=i(rng.randint(0, 8, n), -1),
    ), ni, ti, ids


def test_remap_transfers_warm_data_across_permutation():
    """Every surviving key must land on its new lane with ids/impulses/
    color intact, regardless of how the rebuild permuted the lanes."""
    P = 256
    n = 100
    rng = np.random.RandomState(11)
    ka = rng.choice(5000, n, replace=False).astype(np.int32)
    kb = (ka + 1 + rng.randint(0, 100, n)).astype(np.int32)
    old, ni, ti, ids = _store(ka, kb, P)

    perm = rng.permutation(n)
    new_ka = np.full(P, -1, np.int32)
    new_kb = np.full(P, -1, np.int32)
    new_ka[:n] = ka[perm]
    new_kb[:n] = kb[perm]
    new, orphan, drops = remap_cache(
        old, jnp.asarray(new_ka), jnp.asarray(new_kb), P)

    assert int(drops) == 0
    assert not np.asarray(orphan).any()        # every old key survived
    got_ni = np.asarray(new.normal_impulse)[:n]
    got_ids = np.asarray(new.ids)[:n]
    got_color = np.asarray(new.color)[:n]
    np.testing.assert_array_equal(got_ni, ni[perm])
    np.testing.assert_array_equal(got_ids, ids[perm])
    np.testing.assert_array_equal(got_color, np.asarray(old.color)[perm])
    assert np.asarray(new.touching)[:n].all()
    # dead lanes fully zeroed/released
    assert (np.asarray(new.color)[n:] == -1).all()
    assert not np.asarray(new.touching)[n:].any()


def test_remap_orphans_vanished_touching_pairs():
    """Old touching lanes whose key is absent from the new buffer must be
    flagged orphaned (their contact_end event source), not silently lost."""
    P = 128
    n = 40
    ka = np.arange(100, 100 + n, dtype=np.int32)
    kb = ka + 7
    old, *_ = _store(ka, kb, P)

    keep = np.ones(n, bool)
    keep[5] = keep[17] = False                 # two pairs vanish
    new_ka = np.full(P, -1, np.int32)
    new_kb = np.full(P, -1, np.int32)
    new_ka[:keep.sum()] = ka[keep]
    new_kb[:keep.sum()] = kb[keep]
    new, orphan, drops = remap_cache(
        old, jnp.asarray(new_ka), jnp.asarray(new_kb), P)

    orphan = np.asarray(orphan)
    assert int(drops) == 0
    assert orphan[5] and orphan[17]
    assert orphan.sum() == 2
    # the surviving lanes still matched
    assert np.asarray(new.touching)[:keep.sum()].all()


def test_remap_empty_cache_matches_nothing():
    P = 64
    old = empty_cache(P)
    new_ka = jnp.asarray(np.array([3] + [-1] * (P - 1), np.int32))
    new_kb = jnp.asarray(np.array([9] + [-1] * (P - 1), np.int32))
    new, orphan, drops = remap_cache(old, new_ka, new_kb, P)
    assert int(drops) == 0
    assert not np.asarray(orphan).any()
    assert not np.asarray(new.touching).any()
    assert (np.asarray(new.color) == -1).all()
