"""Cuckoo URL-seen filter: no false negatives, exactness, serialize identity,
first-occurrence-wins batch semantics (FIXTURES.md §6)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gocrawler_ray.state.cuckoo import CuckooFilter


def test_add_contains_no_false_negatives():
    f = CuckooFilter(capacity=1 << 12)
    keys = np.arange(1, 3000, dtype=np.uint64) * np.uint64(2654435761)
    unseen = f.add_if_absent(keys)
    assert unseen.all()
    assert f.contains_many(keys).all()


def test_exact_no_false_positives():
    f = CuckooFilter(capacity=1 << 12, exact=True)
    keys = np.arange(1, 5000, dtype=np.uint64) * np.uint64(0x9E3779B9)
    f.add_if_absent(keys)
    probe = np.arange(100_001, 140_000, dtype=np.uint64) * np.uint64(7)
    probe = np.setdiff1d(probe, keys)
    assert not f.contains_many(probe).any()  # exact mode: zero FPs


def test_batch_duplicate_first_wins():
    f = CuckooFilter(capacity=1 << 8)
    keys = np.array([5, 7, 5, 9, 7, 5], dtype=np.uint64)
    unseen = f.add_if_absent(keys)
    assert unseen.tolist() == [True, True, False, True, False, False]
    again = f.add_if_absent(keys)
    assert not again.any()


def test_serialize_restore_identity():
    f = CuckooFilter(capacity=1 << 10)
    keys = (np.arange(1, 2000, dtype=np.uint64) * np.uint64(11400714819323198485)) | np.uint64(1)
    f.add_if_absent(keys)
    g = CuckooFilter.restore(f.serialize())
    assert np.array_equal(f.table, g.table)
    assert f.exact_keys == g.exact_keys
    assert f.count == g.count
    assert g.contains_many(keys).all()
    # restored filter keeps evolving identically
    more = np.arange(50_000, 50_100, dtype=np.uint64)
    assert f.add_if_absent(more).tolist() == g.add_if_absent(more).tolist()
    assert np.array_equal(f.table, g.table)


def test_saturation_keeps_no_false_negatives():
    # Overfill a tiny filter far beyond capacity — victims/overflow must
    # preserve membership for every inserted key.
    f = CuckooFilter(capacity=64, exact=False)
    keys = np.arange(1, 500, dtype=np.uint64) * np.uint64(2654435761)
    f.add_if_absent(keys)
    assert f.contains_many(keys).all()


def test_exact_mode_auto_grows_past_capacity():
    # In exact mode the table rebuilds at 2x near saturation instead of
    # degrading into eviction storms; membership stays exact throughout.
    f = CuckooFilter(capacity=64, exact=True)
    keys = (np.arange(1, 4000, dtype=np.uint64) * np.uint64(0x9E3779B9)) | np.uint64(1)
    unseen = f.add_if_absent(keys)
    assert unseen.all()
    assert f.num_buckets * 4 >= 4000  # grew well past the initial 64
    assert not f.victims  # growth, not victim parking
    assert f.contains_many(keys).all()
    probe = np.arange(10_000_000, 10_003_000, dtype=np.uint64)
    probe = np.setdiff1d(probe, keys)
    assert not f.contains_many(probe).any()
    # serialize/restore keeps the grown geometry
    g = CuckooFilter.restore(f.serialize())
    assert g.num_buckets == f.num_buckets
    assert g.contains_many(keys).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**63), min_size=1, max_size=300))
def test_property_matches_python_set(xs):
    f = CuckooFilter(capacity=1 << 10, exact=True)
    oracle: set[int] = set()
    keys = np.array(xs, dtype=np.uint64)
    unseen = f.add_if_absent(keys)
    for k, u in zip(xs, unseen.tolist()):
        assert u == (k not in oracle)
        oracle.add(k)
    assert f.contains_many(keys).all()
