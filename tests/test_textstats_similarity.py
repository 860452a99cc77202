"""Text analysis + similarity search + multimodal plumbing."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gocrawler_ray.stages.multimodal import (
    DecodeImage,
    FrameSamplePlan,
    ResizePlan,
    synth_media_table,
)
from gocrawler_ray.stages.similarity import brute_force_topk, ivf_topk
from gocrawler_ray.stages.textstats import (
    fingerprint,
    lang_id,
    text_quality,
    token_counts,
)


def _tbl(texts):
    return pa.table({"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts})


def test_text_quality():
    out = text_quality(
        _tbl(
            [
                "This is a perfectly normal English sentence with some words.",
                "!!! ??? ... ###",
                "12345 67890 11111 22222 33333",
                "",
            ]
        )
    ).to_pylist()
    assert out[0]["quality_keep"]
    assert not out[1]["quality_keep"]  # punct-heavy
    assert not out[2]["quality_keep"]  # digit-heavy
    assert not out[3]["quality_keep"]  # empty
    assert out[0]["n_words"] == 10
    assert 0 < out[0]["stopword_ratio"] < 1


def test_token_counts():
    out = token_counts(_tbl(["hello world", "don't stop-me now 123", ""])).to_pylist()
    assert out[0]["ws_tokens"] == 2 and out[0]["bpe_tokens"] == 2
    # don ' t stop - me now 123 → 8 BPE-ish tokens
    assert out[1]["ws_tokens"] == 4 and out[1]["bpe_tokens"] == 8
    assert out[2]["ws_tokens"] == 0 and out[2]["bpe_tokens"] == 0


def test_lang_id():
    out = lang_id(
        _tbl(
            [
                "the cat is in the house and it is warm",
                "el gato es de la casa y que bonito es",
                "der Hund ist ein Freund und das ist gut",
                "le chat est un ami et que la vie est belle",
                "xyzzy plugh qwerty",
            ]
        )
    ).to_pylist()
    assert [r["lang_guess"] for r in out] == ["en", "es", "de", "fr", "und"]


def test_fingerprint_robust_to_small_edit():
    a = "one two three four five six seven eight nine ten " * 5
    b = a.replace("four", "fourx", 1)  # edit away from the min-gram
    out = fingerprint(_tbl([a, b, "different entirely now", a])).to_pylist()
    # the min-gram survives an edit that doesn't touch it (winnowing
    # robustness is probabilistic; this case is deterministic because
    # pd.util.hash_array is seed-stable)
    assert out[0]["fingerprint"] == out[1]["fingerprint"]
    assert out[0]["fingerprint"] != out[2]["fingerprint"]
    assert out[0]["fingerprint"] == out[3]["fingerprint"]  # deterministic


def test_brute_force_topk_exact():
    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((200, 32))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    ds = rd.from_items(rows).repartition(4)
    q = {"ids": np.array([0, 5]), "matrix": vecs[[0, 5]]}
    out = brute_force_topk(ds, q, k=5)
    # exact: compare against full numpy
    for qid in (0, 5):
        sims = vecs @ vecs[qid] / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qid])
        )
        expect = set(np.argsort(-sims)[:5].tolist())
        got = set(out[out["query_id"] == qid]["vec_id"].tolist())
        assert got == expect
        assert out[out["query_id"] == qid].iloc[0]["vec_id"] == qid  # self first


def test_ivf_topk_recall():
    rng = np.random.RandomState(12)
    vecs = rng.standard_normal((300, 16))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    ds = rd.from_items(rows).repartition(4)
    q = {"ids": np.array([42]), "matrix": vecs[[42]]}
    exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
    approx = set(ivf_topk(ds, q, k=10, num_clusters=8, nprobe=4)["vec_id"])
    assert 42 in approx
    assert len(exact & approx) >= 5  # decent recall with nprobe=half


def test_ivf_persisted_index_prunes_and_recalls():
    import glob
    import os
    import shutil

    from gocrawler_ray.stages.similarity import IvfIndex

    root = "/tmp/gocrawler_test/ivf_index"
    shutil.rmtree(root, ignore_errors=True)
    rng = np.random.RandomState(7)
    # clustered data: 6 gaussian blobs → IVF pruning is actually selective
    centers = rng.standard_normal((6, 16)) * 5
    vecs = np.vstack([centers[i % 6] + rng.standard_normal(16) * 0.3 for i in range(600)])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(600)]
    ds = rd.from_items(rows).repartition(4)

    idx = IvfIndex.build(ds, num_clusters=6, index_dir=root, seed=5)
    # index persisted: centroids + one partition dir per cluster
    assert os.path.exists(os.path.join(root, "centroids.npy"))
    parts = glob.glob(os.path.join(root, "vectors", "cluster=*"))
    assert len(parts) >= 4

    q = {"ids": np.array([10]), "matrix": vecs[[10]]}
    # probe reads FEWER rows than the corpus (pruning is real)
    assert idx.probe(q, nprobe=2).count() < 600
    exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
    approx = set(IvfIndex.load(root).topk(q, k=10, nprobe=2)["vec_id"])
    assert len(exact & approx) >= 9  # blob neighbors live in probed clusters

    # reload path gives identical results (the index is the artifact)
    again = set(IvfIndex.load(root).topk(q, k=10, nprobe=2)["vec_id"])
    assert again == approx


def test_multimodal_plumbing():
    tbl = synth_media_table(["a", "b", "c"], ["payload one", "payload two", ""])
    ds = rd.from_arrow(tbl)
    out = (
        ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=2, concurrency=1)
        .map_batches(ResizePlan(max_side=128), batch_format="pyarrow")
        .map_batches(FrameSamplePlan(), batch_format="pyarrow")
        .to_pandas()
    )
    # fake decode must agree with the hash-derived metadata
    for _, r in out.iterrows():
        assert r["decoded_width"] == r["meta"]["width"]
        assert r["decoded_height"] == r["meta"]["height"]
        assert r["decoded_format"] == r["meta"]["format"]
        assert max(r["resize_width"], r["resize_height"]) <= 128
        assert list(r["sample_frames_ms"]) == []  # images: no frames
    # real decoder is an explicit stub
    import pytest

    with pytest.raises(NotImplementedError):
        DecodeImage(real=True)


def test_synth_media_batch_matches_table_builder():
    """The streaming per-batch derivation must produce byte-identical
    MEDIA_SCHEMA rows to the driver-side list builder it replaced."""
    import pyarrow as pa

    from gocrawler_ray.stages.multimodal import synth_media_batch, synth_media_table

    ids = ["10", "11", "12", "13"]
    texts = ["hello world", "", "Ω unicode ≠ ascii", "x" * 300]
    want = synth_media_table(ids, texts)
    src = pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                    "text": pa.array(texts)})
    got = synth_media_batch(src, media_type="image")
    assert got.equals(want)
    # video/audio metadata: duration in chars x 10, zero dims
    vid = synth_media_batch(src, media_type="video", fmt="mp4")
    metas = vid.column("meta").to_pylist()
    assert [m["duration_ms"] for m in metas] == [10 * len(t) for t in texts]
    assert all(m["media_type"] == "video" and m["format"] == "mp4" for m in metas)


def test_lsh_topk_full_radius_equals_bruteforce():
    """At probe_radius = n_planes the LSH filter passes every row, so
    the result must EQUAL exact brute force on raw (unclustered)
    vectors — the algebraic identity that anchors the approximate op."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gocrawler_ray.stages.similarity import brute_force_topk, lsh_topk

    import pyarrow as pa

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16))
    tbl = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                    "embedding": pa.array([list(r) for r in emb],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.array([7], dtype=np.int64),
               "matrix": emb[7:8].copy()}
    exact = brute_force_topk(ds, queries, k=10)
    approx = lsh_topk(ds, queries, k=10, n_planes=8, probe_radius=8,
                      seed=5, dim=16)
    pd.testing.assert_frame_equal(
        exact[["query_id", "vec_id", "cos"]].reset_index(drop=True),
        approx[["query_id", "vec_id", "cos"]].reset_index(drop=True),
    )


def test_lsh_topk_probe_prunes_but_keeps_duplicate_cluster():
    """radius 0: only the query's own bucket is scanned — identical
    copies (same sign pattern by construction) must all be found, and
    the result set must be a subset of the corpus the probe admits."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gocrawler_ray.stages.similarity import lsh_topk

    import pyarrow as pa

    rng = np.random.default_rng(4)
    emb = rng.standard_normal((100, 16))
    emb[50:60] = emb[0]  # 10 exact copies of vec 0
    tbl = pa.table({"vec_id": pa.array(np.arange(100, dtype=np.int64)),
                    "embedding": pa.array([list(r) for r in emb],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.array([0], dtype=np.int64),
               "matrix": emb[0:1].copy()}
    out = lsh_topk(ds, queries, k=11, n_planes=8, probe_radius=0,
                   seed=5, dim=16)
    got = set(out["vec_id"])
    assert {0, *range(50, 60)} <= got  # every exact copy found
    assert (out["cos"][: 11][out["vec_id"].isin({0, *range(50, 60)})] == 1.0).all()


def test_lsh_topk_multi_query_probes_every_querys_ball():
    """Two queries in OPPOSITE buckets at radius 0: each query must
    still recover its own exact-duplicate cluster (the probe set is the
    union of both hamming balls, scored per query) — guards the
    first-row-only probe bug."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gocrawler_ray.stages.similarity import lsh_topk

    rng = np.random.default_rng(6)
    emb = rng.standard_normal((120, 16))
    emb[40:45] = emb[0]    # cluster of query A
    emb[80:85] = -emb[0]   # cluster of query B, antipodal bucket
    tbl = pa.table({"vec_id": pa.array(np.arange(120, dtype=np.int64)),
                    "embedding": pa.array([list(r) for r in emb],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)
    queries = {"ids": np.array([0, 80], dtype=np.int64),
               "matrix": np.vstack([emb[0], emb[80]])}
    out = lsh_topk(ds, queries, k=6, n_planes=8, probe_radius=0,
                   seed=5, dim=16)
    got_a = set(out.loc[out["query_id"] == 0, "vec_id"])
    got_b = set(out.loc[out["query_id"] == 80, "vec_id"])
    assert {0, *range(40, 45)} <= got_a
    assert {80, *range(80, 85)} <= got_b
