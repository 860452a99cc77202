"""Bloom-pushdown semi-join (stages/joins.py): the filter must never
produce false negatives (pruning is lossless), the measured FPP must be
near the configured one, and the full semi-join must stay EXACT even
when the bloom is deliberately tiny (high-FPP) — the verify join owns
correctness, the bloom only prunes bytes."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from gocrawler_ray.stages.joins import Bloom, bloom_semi_join, build_bloom, splitmix64


def test_splitmix64_is_uniformish_and_deterministic():
    x = np.arange(100000, dtype=np.uint64)
    h = splitmix64(x)
    assert (h == splitmix64(x)).all()
    # bijective finalizer: no collisions on distinct inputs
    assert len(np.unique(h)) == len(h)
    # each of the 64 bits is set ~half the time
    for shift in (0, 17, 43, 63):
        frac = ((h >> np.uint64(shift)) & np.uint64(1)).mean()
        assert 0.49 < frac < 0.51


def test_bloom_no_false_negatives_and_fpp():
    members = np.arange(0, 20000, 2, dtype=np.int64)        # evens
    probes = np.arange(1, 40001, 2, dtype=np.int64)          # odds
    b = Bloom(len(members), fpp=0.01)
    b.add_many(members)
    assert b.contains_many(members).all()                    # lossless
    measured = b.contains_many(probes).mean()
    assert measured < 0.03                                   # ~1% target


def test_bloom_distributed_build_equals_single(ray_session):
    keys = np.arange(5000, dtype=np.int64) * 7
    single = Bloom(len(keys), fpp=0.01)
    single.add_many(keys)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
    merged = build_bloom(ds, "k", n_items=len(keys), fpp=0.01)
    assert (merged.words == single.words).all()


@pytest.mark.parametrize(
    "fpp,broadcast_limit",
    [
        (0.008, 0),       # bloom prefilter + shuffle verify join
        (0.6, 0),         # bloom nearly useless → verify join must save it
        (0.008, 10**6),   # broadcast exact-keyset fast path (no join)
    ],
)
def test_bloom_semi_join_exact(ray_session, fpp, broadcast_limit):
    rng = np.random.default_rng(5)
    fact_keys = rng.integers(0, 3000, size=20000).astype(np.int64)
    fact = pa.table({
        "fk": pa.array(fact_keys),
        "payload": pa.array(np.arange(20000, dtype=np.int64)),
    })
    dim = pa.table({"dk": pa.array(np.arange(0, 3000, 3, dtype=np.int64))})
    out = bloom_semi_join(
        rd.from_arrow(fact).repartition(5),
        rd.from_arrow(dim).repartition(2),
        "fk", "dk", num_partitions=4, fpp=fpp,
        broadcast_limit=broadcast_limit,
    ).to_pandas().sort_values("payload").reset_index(drop=True)
    keep = np.isin(fact_keys, dim.column("dk").to_numpy())
    expect = fact.to_pandas()[keep].reset_index(drop=True)
    assert list(out.columns) == ["fk", "payload"]
    assert (out["payload"].to_numpy() == expect["payload"].to_numpy()).all()
    assert (out["fk"].to_numpy() == expect["fk"].to_numpy()).all()
