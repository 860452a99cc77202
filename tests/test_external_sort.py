"""External sort plane (stages/external_sort.py): the concatenation of
sealed sorted runs is exactly the global order, rank probes resolve
without re-shuffle, and a crashed run resumes at run granularity."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from gocrawler_ray.stages.external_sort import (
    external_sort_write,
    keys_at_ranks,
    sample_boundaries,
)

ROOT = "/tmp/gocrawler_test/extsort"


def _ds(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    keys = rng.randint(-10**6, 10**6, size=n).astype(np.int64)
    return rd.from_arrow(pa.table({
        "k": keys, "payload": np.arange(n, dtype=np.int64),
    })).repartition(6), keys


def _global_keys(root):
    out = []
    for d in sorted(
        glob.glob(os.path.join(root, "sorted", "range=*")),
        key=lambda p: int(p.split("=")[1]),
    ):
        out.append(pq.read_table(d, columns=["k"])["k"].to_numpy())
    return np.concatenate(out)


def test_external_sort_total_order(ray_session):
    shutil.rmtree(ROOT, ignore_errors=True)
    ds, keys = _ds()
    man = external_sort_write(ds, ROOT, "k", n_ranges=8)
    assert man["total_rows"] == len(keys)
    assert man["monotonic"]
    got = _global_keys(ROOT)
    np.testing.assert_array_equal(got, np.sort(keys))
    # rank probes equal the sorted array at those ranks
    ranks = [0, 1, 999, 2500, len(keys) - 1]
    assert keys_at_ranks(man, ranks) == [
        (r, int(np.sort(keys)[r])) for r in ranks
    ]
    # multiple real ranges, each bounded well below the whole
    assert len(man["runs"]) >= 6
    assert max(r["rows"] for r in man["runs"]) < len(keys) / 2


def test_external_sort_resumes_at_run_granularity(ray_session):
    root = ROOT + "_resume"
    shutil.rmtree(root, ignore_errors=True)
    ds, keys = _ds(seed=5)
    man1 = external_sort_write(ds, root, "k", n_ranges=8)
    victim = man1["runs"][2]["range_id"]
    vdir = os.path.join(root, "sorted", f"range={victim}")
    os.remove(os.path.join(vdir, "_SUCCESS"))  # crash: run unsealed
    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(os.path.join(root, "sorted", "range=*", "*.parquet"))
        if f"range={victim}/" not in f
    }
    man2 = external_sort_write(ds, root, "k", n_ranges=8)
    after = {f: os.stat(f).st_mtime_ns for f in before}
    assert after == before  # sealed runs untouched byte-for-byte
    assert os.path.exists(os.path.join(vdir, "_SUCCESS"))  # rebuilt
    assert man2 == man1
    np.testing.assert_array_equal(_global_keys(root), np.sort(keys))


def test_sample_boundaries_degrade_and_balance(ray_session):
    # thin data: fewer samples than ranges -> one range, still correct
    ds, keys = _ds(n=40)
    b = sample_boundaries(ds, "k", n_ranges=16, sample_mod=256)
    assert b.size == 0
    root = ROOT + "_thin"
    shutil.rmtree(root, ignore_errors=True)
    man = external_sort_write(ds, root, "k", n_ranges=16)
    np.testing.assert_array_equal(_global_keys(root), np.sort(keys))
    assert man["monotonic"] and man["total_rows"] == 40


def test_iter_global_order_streams_sorted(ray_session):
    from gocrawler_ray.stages.external_sort import iter_global_order

    root = ROOT + "_stream"
    shutil.rmtree(root, ignore_errors=True)
    ds, keys = _ds(seed=9)
    man = external_sort_write(ds, root, "k", n_ranges=8)
    got = np.concatenate([
        b.column("k").to_numpy()
        for b in iter_global_order(man, columns=["k"], batch_size=512)
    ])
    np.testing.assert_array_equal(got, np.sort(keys))


def test_external_sort_through_norename_uri(ray_session, tmp_path):
    """The whole plane — scatter, run sort (inside Ray tasks), seals,
    rank probes, ordered scan — works on a rename-free store URI."""
    from gocrawler_ray.stages.external_sort import iter_global_order

    root = str(tmp_path / "nr_extsort")
    uri = "norename://" + root
    ds, keys = _ds(n=2000, seed=11)
    man = external_sort_write(ds, uri, "k", n_ranges=4)
    assert man["total_rows"] == 2000 and man["monotonic"]
    got = np.concatenate([
        b.column("k").to_numpy() for b in iter_global_order(man)
    ])
    np.testing.assert_array_equal(got, np.sort(keys))
    ranks = [0, 777, 1999]
    assert keys_at_ranks(man, ranks) == [
        (r, int(np.sort(keys)[r])) for r in ranks
    ]


def test_external_sort_property_random_workloads(ray_session, tmp_path):
    """Property sweep: arbitrary key distributions (heavy duplication,
    negatives, tiny domains — the shapes that break range partitioners)
    always yield the exact global order and correct rank probes."""
    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        n=st.integers(30, 1500),
        n_ranges=st.integers(2, 12),
        dom=st.integers(1, 10**6),
        seed=st.integers(0, 10**6),
    )
    def check(n, n_ranges, dom, seed):
        rng = np.random.RandomState(seed)
        keys = rng.randint(-dom, dom + 1, size=n).astype(np.int64)
        ds = rd.from_arrow(pa.table({
            "k": keys, "payload": np.arange(n, dtype=np.int64),
        })).repartition(4)
        counter[0] += 1
        root = str(tmp_path / f"prop{counter[0]}")
        man = external_sort_write(ds, root, "k", n_ranges=n_ranges,
                                  sample_mod=4)
        want = np.sort(keys)
        np.testing.assert_array_equal(_global_keys(root), want)
        assert man["total_rows"] == n and man["monotonic"]
        ranks = sorted({0, n // 3, n - 1})
        assert keys_at_ranks(man, ranks) == [(r, int(want[r])) for r in ranks]
        shutil.rmtree(root, ignore_errors=True)

    check()


def test_merge_join_sorted_co_partitioned(ray_session, tmp_path):
    """Sort-merge join over co-partitioned run trees equals a plain
    merge; trees with different boundaries are refused loudly."""
    import pandas as pd

    from gocrawler_ray.stages.external_sort import merge_join_sorted

    rng = np.random.RandomState(13)
    ka = np.sort(rng.choice(5000, size=400, replace=False)).astype(np.int64)
    va = rng.randint(0, 100, size=400).astype(np.int64)
    kb = rng.choice(5000, size=3000).astype(np.int64)
    wb = rng.randint(0, 10, size=3000).astype(np.int64)
    ds_a = rd.from_arrow(pa.table({"k": ka, "v": va})).repartition(3)
    ds_b = rd.from_arrow(pa.table({"k": kb, "w": wb})).repartition(5)
    man_a = external_sort_write(ds_a, str(tmp_path / "a"), "k",
                                n_ranges=6, sample_mod=2)
    man_b = external_sort_write(ds_b, str(tmp_path / "b"), "k",
                                boundaries=man_a["boundaries"])

    def red(ta, tb):
        a = ta.to_pandas()
        b = tb.to_pandas()
        j = b.merge(a, on="k", how="inner")
        return (len(j), int((j["v"] * j["w"]).sum()))

    parts = merge_join_sorted(man_a, man_b, red)
    got_n = sum(p[0] for p in parts)
    got_s = sum(p[1] for p in parts)
    ref = (pd.DataFrame({"k": kb, "w": wb})
           .merge(pd.DataFrame({"k": ka, "v": va}), on="k", how="inner"))
    assert got_n == len(ref)
    assert got_s == int((ref["v"] * ref["w"]).sum())

    man_c = external_sort_write(ds_b, str(tmp_path / "c"), "k",
                                n_ranges=3, sample_mod=2)
    with pytest.raises(ValueError, match="co-partitioned"):
        merge_join_sorted(man_a, man_c, red)
