"""Unit tests for the link-graph operators (stages/graph.py), the URL
canonicalization kernel (functions/urls.py::normalize_urls), and the
audio chunk plan (stages/multimodal.py::AudioChunkPlan)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gocrawler_ray.functions.urls import normalize_urls
from gocrawler_ray.stages.graph import (
    EDGE_MULS,
    degree_table,
    edges_dataset,
    path_weights,
)
from gocrawler_ray.stages.multimodal import (
    MEDIA_META_TYPE,
    MEDIA_SCHEMA,
    AudioChunkPlan,
)


def _docs(n):
    return rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))


def _brute_edges(n):
    out = []
    for i in range(n):
        if i % 37 == 3:
            continue
        for a, b in EDGE_MULS:
            out.append((i, (a * i + b) % n))
    return out


def test_edges_match_brute_force(ray_session):
    n = 100
    got = sorted(
        map(tuple, edges_dataset(_docs(n), n).to_pandas().to_numpy().tolist())
    )
    assert got == sorted(_brute_edges(n))


def test_degree_table(ray_session):
    n = 100
    df = degree_table(_docs(n), n, num_partitions=4).to_pandas()
    assert len(df) == n
    edges = _brute_edges(n)
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    by_id = df.set_index("doc_id")
    for i in range(n):
        assert by_id.loc[i, "out_degree"] == (0 if i % 37 == 3 else 3)
        assert by_id.loc[i, "in_degree"] == indeg.get(i, 0)
    # total conservation: every edge has exactly one head and one tail
    assert df["in_degree"].sum() == df["out_degree"].sum() == len(edges)


@pytest.mark.parametrize("dense_threshold", [1 << 20, 0])  # dense and sparse plans
def test_path_weights_matches_numpy_power_iteration(ray_session, dense_threshold):
    n, iters = 60, 3
    df = path_weights(
        _docs(n), n, iters=iters, num_partitions=4,
        dense_threshold=dense_threshold,
    ).to_pandas()
    # dense adjacency brute force: w_{k+1} = A^T w_k, w_0 = 1
    A = np.zeros((n, n), dtype=np.int64)
    for s, d in _brute_edges(n):
        A[s, d] += 1
    w = np.ones(n, dtype=np.int64)
    for _ in range(iters):
        w = A.T @ w
    got = df.set_index("doc_id")["paths"].sort_index().to_numpy()
    assert (got == w).all()


@pytest.mark.parametrize(
    "raw,norm",
    [
        ("HTTPS://WWW.Example.COM:443/Path/x?a=B#frag", "https://www.example.com/Path/x?a=B"),
        ("http://Host.MX:80", "http://host.mx/"),
        ("http://Host.MX:8080/a", "http://host.mx:8080/a"),
        ("https://h.mx:80/a", "https://h.mx:80/a"),  # :80 is non-default for https
        ("ftp://Mixed.Case/KeepPort:443", "ftp://mixed.case/KeepPort:443"),
        ("not a url", "not a url"),  # passthrough
        ("https://h.mx/#only-frag", "https://h.mx/"),
    ],
)
def test_normalize_urls(raw, norm):
    assert normalize_urls([raw]).to_pylist() == [norm]


def test_audio_chunk_plan_boundaries():
    metas = [
        {"media_type": "audio", "format": "wav", "width": 0, "height": 0, "duration_ms": d}
        for d in (0, 1500, 2000, 4500, 200_000)
    ]
    metas.append(
        {"media_type": "video", "format": "mp4", "width": 0, "height": 0, "duration_ms": 9000}
    )
    tbl = pa.Table.from_arrays(
        [
            pa.array([str(i) for i in range(len(metas))], pa.string()),
            pa.array([b""] * len(metas), pa.binary()),
            pa.array(metas, MEDIA_META_TYPE),
        ],
        schema=MEDIA_SCHEMA,
    )
    out = AudioChunkPlan(chunk_ms=2000, max_chunks=32)(tbl)
    chunks = out.column("chunks").to_pylist()
    assert chunks[0] == []  # zero duration
    assert chunks[1] == [{"chunk_no": 0, "start_ms": 0, "end_ms": 1500}]  # tail kept
    assert chunks[2] == [{"chunk_no": 0, "start_ms": 0, "end_ms": 2000}]
    assert [c["end_ms"] for c in chunks[3]] == [2000, 4000, 4500]
    assert len(chunks[4]) == 32  # capped
    assert chunks[4][-1] == {"chunk_no": 31, "start_ms": 62000, "end_ms": 64000}
    assert chunks[5] == []  # non-audio rows emit no chunks


@pytest.mark.parametrize("n", [20, 53, 100])
@pytest.mark.parametrize("edge_cap", [2_000_000, None])
def test_triangle_stats_match_brute_force(ray_session, n, edge_cap):
    """edge_cap=None forces the distributed two-join census — both
    plans must match brute force exactly."""
    from gocrawler_ray.stages.graph import triangle_stats

    und = {tuple(sorted(e)) for e in _brute_edges(n) if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if a < b < c
    )
    wedges = sum(
        1 for a, b in und for c in adj[b] if b < c
    )
    n_e, n_w, n_t = triangle_stats(
        _docs(n), n, num_partitions=4, driver_edge_cap=edge_cap
    )
    assert n_e == len(und)
    assert n_w == wedges
    assert n_t == tri


@pytest.mark.parametrize("dense_threshold", [1 << 20, 0])  # dense and sparse
def test_damped_pagerank_matches_numpy_floor_iteration(ray_session, dense_threshold):
    from gocrawler_ray.stages.graph import damped_pagerank

    n, iters = 60, 3
    df = damped_pagerank(
        _docs(n), n, iters=iters, num_partitions=4,
        dense_threshold=dense_threshold,
    ).to_pandas()
    w = np.full(n, 1_000_000, dtype=np.int64)
    for _ in range(iters):
        nxt = np.full(n, 150_000, dtype=np.int64)
        for s, d in _brute_edges(n):
            nxt[d] += (85 * w[s]) // 300
        w = nxt
    got = df.set_index("doc_id")["pr"].sort_index().to_numpy()
    assert (got == w).all()


def test_scc_fwbw_matches_tarjan_on_random_graphs():
    """The FW-BW-TRIM distributed SCC plan and the driver Tarjan sweep
    are independent implementations — pit them against each other on
    seeded random digraphs (including self-loops, chains and cycles)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gocrawler_ray.pipelines.queries import _scc_labels

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(5, 40))
        m = int(rng.integers(0, 4 * n))
        src = rng.integers(0, n, size=m).astype(np.int64)
        dst = rng.integers(0, n, size=m).astype(np.int64)
        edf = pd.DataFrame({"src": src, "dst": dst})
        edges = rd.from_pandas(edf) if m else rd.from_pandas(
            pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)}))
        a = _scc_labels(n, edf, edges)
        b = _scc_labels(n, None, edges)
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


def test_scc_fwbw_long_ring_past_old_round_cap():
    """Regression (post-r4 ADVICE): a directed RING is one SCC with
    diameter = n; the old 64-round fixpoint cap silently mislabeled any
    ring longer than 64 as singletons — exactly the crawl-trap shape
    q_scc_stats hunts. 70 > 64 forces full convergence, plus a chain of
    2-cycles to exercise multiple outer rounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gocrawler_ray.pipelines.queries import _scc_labels

    n_ring = 70
    src = list(range(n_ring))
    dst = [(i + 1) % n_ring for i in range(n_ring)]
    # chain of three 2-cycles hanging off the ring: (70,71) (72,73) (74,75)
    for a, b in [(70, 71), (72, 73), (74, 75)]:
        src += [a, b]
        dst += [b, a]
    src += [0, 71, 73]   # ring → first 2-cycle → second → third
    dst += [70, 72, 74]
    n = 76
    edf = pd.DataFrame({"src": np.array(src, np.int64),
                        "dst": np.array(dst, np.int64)})
    got = _scc_labels(n, None, rd.from_pandas(edf))
    want = _scc_labels(n, edf, rd.from_pandas(edf))
    np.testing.assert_array_equal(got, want)
    # the ring is ONE component labeled by its min node
    assert (got[:n_ring] == 0).all()
    assert got[70] == got[71] == 70 and got[74] == got[75] == 74
