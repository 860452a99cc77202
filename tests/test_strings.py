"""Edit-distance join: banded-DP kernel vs brute-force Levenshtein, and
the full PassJoin pipeline (driver AND forced-distributed planes) vs an
all-pairs reference on adversarial shapes — short strings, empties,
equal lengths, heavy shared-segment collisions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gocrawler_ray.stages.strings import edit_distance_join, lev_leq


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        new = [i] + [0] * lb
        for j in range(1, lb + 1):
            new[j] = min(
                dp[j] + 1, new[j - 1] + 1, dp[j - 1] + (a[i - 1] != b[j - 1])
            )
        dp = new
    return dp[lb]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_lev_kernel_matches_brute_force(seed, k):
    rng = np.random.default_rng(seed)
    alpha = list("abcde")
    pairs = []
    for _ in range(800):
        la, lb = rng.integers(0, 12), rng.integers(0, 12)
        pairs.append(
            ("".join(rng.choice(alpha, la)), "".join(rng.choice(alpha, lb)))
        )
    a, b = [p[0] for p in pairs], [p[1] for p in pairs]
    dist, keep = lev_leq(a, b, k)
    for x, y, d, kp in zip(a, b, dist, keep):
        t = _ref_lev(x, y)
        assert kp == (t <= k)
        if kp:
            assert d == t  # kept distances are exact, not just <= k


def _corpus(seed: int):
    rng = np.random.default_rng(seed)
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]
    base = [" ".join(rng.choice(words, 6)) for _ in range(100)]
    mutated = []
    for i in range(25):  # single substitution -> guaranteed dist-1 pairs
        s = list(base[i])
        s[min(4, len(s) - 1)] = "#"
        mutated.append("".join(s))
    titles = base + mutated + ["ab", "ac", "b", ""]  # SHORT-bucket arm
    ids = [f"d{i:04d}" for i in range(len(titles))]
    return titles, ids


def _ref_join(titles, ids, k):
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = _ref_lev(titles[i], titles[j])
            if d <= k:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, d))
    return sorted(out)


@pytest.mark.parametrize("k", [1, 2])
def test_edit_distance_join_exact_recall(ray_session, k):
    titles, ids = _corpus(3)
    t = pa.table({"doc_id": ids, "title": titles})
    ds = rd.from_arrow([t.slice(0, 40), t.slice(40, 50), t.slice(90)])
    exp = _ref_join(titles, ids, k)
    got = edit_distance_join(ds, col="title", id_col="doc_id", k=k)
    assert sorted(zip(got["a"], got["b"], got["dist"].astype(int))) == exp


def test_edit_distance_distributed_plane_matches_driver(ray_session):
    """pair_driver_cap=None forces the Dataset pair plane + hash-join
    title co-partition; it must equal the driver fast path exactly."""
    titles, ids = _corpus(5)
    t = pa.table({"doc_id": ids, "title": titles})
    ds = rd.from_arrow([t.slice(0, 64), t.slice(64)])
    fast = edit_distance_join(ds, col="title", id_col="doc_id", k=2)
    dist = edit_distance_join(
        ds, col="title", id_col="doc_id", k=2, pair_driver_cap=None
    )
    assert sorted(zip(fast["a"], fast["b"], fast["dist"])) == sorted(
        zip(dist["a"], dist["b"], dist["dist"])
    )
    assert len(fast) >= 25  # the injected substitutions are all found
