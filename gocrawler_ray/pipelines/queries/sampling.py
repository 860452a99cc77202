"""Sampling, splits, packing, formats and corpus prep — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403



def q_corpus_prep(sf_dir: str):
    """Composed training-corpus prep: exact dedup → language id →
    quality filter → token counts, one streaming pipeline over the
    augmented documents table. Dedup runs FIRST so the stat kernels
    (text_quality / lang_id / token_counts — all vectorized) execute
    once over survivors only, fused into a single ``map_batches`` pass;
    re-expresses the LLM-data prep chain a reference user would script
    around the crawler's output store (scan → clean → dedupe,
    /root/reference/pkg/itemparser/extractor.go:30-67 is the scan
    shape)."""
    ded = exact_dedup(_augmented_docs(sf_dir), col="text", id_col="doc_id")

    def stats(t: pa.Table) -> pa.Table:
        t = text_quality(t)
        t = lang_id(t)
        t = token_counts(t)
        keep = pc.and_(
            t.column("quality_keep").combine_chunks(),
            pc.not_equal(t.column("lang_guess"), "und"),
        )
        return t.filter(keep).select(
            ["doc_id", "lang_guess", "n_words", "ws_tokens", "bpe_tokens"]
        )

    return ded.map_batches(stats, batch_format="pyarrow")



def q_split_sample(sf_dir: str):
    """Deterministic 20 % sample → 80/10/10 train/val/test split over
    documents — pure hash-of-id map-only kernels (stages/sampling.py),
    stable under re-partitioning/retries; no shuffle at any scale."""
    from ...stages.sampling import assign_split, sample_mask

    docs = _pq(sf_dir, "documents", columns=["doc_id"])

    def go(t: pa.Table) -> pa.Table:
        t = sample_mask(t, rate=0.2, seed=7)
        t = assign_split(t, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
        return t.select(["doc_id", "split"])

    return docs.map_batches(go, batch_format="pyarrow")



def q_multimodal_decode(sf_dir: str):
    from ...stages.multimodal import DecodeImage, ResizePlan, synth_media_batch

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    ds = docs.map_batches(
        lambda t: synth_media_batch(t, media_type="image"),
        batch_format="pyarrow",
    )
    out = ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=256, concurrency=2
    ).map_batches(ResizePlan(max_side=512), batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table(
            {
                "media_id": t.column("media_id"),
                "decoded_width": t.column("decoded_width"),
                "decoded_height": t.column("decoded_height"),
                "decoded_format": t.column("decoded_format"),
                "resize_width": t.column("resize_width"),
                "resize_height": t.column("resize_height"),
            }
        ),
        batch_format="pyarrow",
    )



def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling plan (stages/multimodal.py::FrameSamplePlan)
    over synthetic video media (duration = 10 ms per text char), frames
    exploded to one row per sampled frame. The codec is the declared
    stub; the plumbing — list column, explode, batch sizing — is real."""
    from ...stages.multimodal import FrameSamplePlan, synth_media_batch

    media = _pq(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: synth_media_batch(t, media_type="video", fmt="mp4"),
        batch_format="pyarrow",
    )

    def explode(t: pa.Table) -> pa.Table:
        frames = t.column("sample_frames_ms")
        flat = frames.combine_chunks().flatten() if isinstance(
            frames, pa.ChunkedArray
        ) else frames.flatten()
        lens = pc.list_value_length(frames).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        ms = flat.to_numpy(zero_copy_only=False).astype(np.int32)
        return pa.table(
            {
                "media_id": t.column("media_id").take(pa.array(parent)),
                "frame_no": pa.array(ms.astype(np.int64) // 1000),
                "frame_ms": pa.array(ms, pa.int32()),
            }
        )

    return (
        media
        .map_batches(
            FrameSamplePlan(frame_interval_ms=1000, max_frames=16),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .map_batches(explode, batch_format="pyarrow")
    )



def q_importance_sample(sf_dir: str):
    """Importance sampling: keep probability = min(1, ws_tokens/80) —
    long docs survive, short boilerplate is thinned proportionally
    (stages/sampling.py::weighted_mask). Map-only; the double-precision
    compare uses identical operand expressions on both sides."""
    from ...stages.sampling import weighted_mask

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def go(t: pa.Table) -> pa.Table:
        tok = token_counts(t)
        w = np.minimum(
            1.0, tok.column("ws_tokens").to_numpy(zero_copy_only=False) / 80.0
        )
        kept = weighted_mask(tok, w, id_col="doc_id", seed=7)
        return kept.select(["doc_id", "ws_tokens"])

    return docs.map_batches(go, batch_format="pyarrow")



def q_incremental_ingest(sf_dir: str):
    """Incremental-ingest content anti-join: which docs of an incoming
    batch are genuinely NEW against the existing corpus (dups by
    CONTENT hash are dropped even when their ids differ). The scalable
    plan streams the 100 TB corpus ONCE map-only against the broadcast
    incoming hash set (bounded by the increment size), gathers only the
    matched hashes, and anti-joins driver-side — a bloom cannot serve
    an anti-join (false positives would silently DROP new docs), which
    is why this flips the probe direction instead. Incoming batch here:
    20 exact copies of existing docs + 20 edited (' v2') docs; the
    edited 20 survive."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    import pyarrow.parquet as pq

    d = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    dup = d[d["doc_id"] < 20]
    edited = d[(d["doc_id"] >= 20) & (d["doc_id"] < 40)]
    incoming = pd.DataFrame(
        {
            "doc_id": np.concatenate(
                [dup["doc_id"].to_numpy() + 10000, edited["doc_id"].to_numpy() + 20000]
            ),
            "text": np.concatenate(
                [dup["text"].to_numpy(), (edited["text"] + " v2").to_numpy()]
            ),
        }
    )
    inc_hash = np.array(md5_hex_many(incoming["text"].tolist()), dtype=object)
    probe_ref = ray.put(np.sort(np.unique(inc_hash)))

    def matched(t: pa.Table) -> pa.Table:
        probe = ray.get(probe_ref)
        hs = np.array(
            md5_hex_arrow(t.column("text")),
            dtype=object,
        )
        pos = np.clip(np.searchsorted(probe, hs), 0, len(probe) - 1)
        hit = probe[pos] == hs
        return pa.table({"h": pa.array(hs[hit], pa.string())})

    seen: set = set()
    for b in docs.map_batches(matched, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        seen.update(b.column("h").to_pylist())
    keep = np.array([h not in seen for h in inc_hash])
    return pa.table({"doc_id": pa.array(incoming["doc_id"].to_numpy()[keep], pa.int64())})



def q_audio_chunks(sf_dir: str):
    """Audio chunk plan (multimodal §: audio modality): synthetic clips
    (duration = 10 ms/char), AudioChunkPlan actor pool, chunk list
    exploded to one row per window. Codec behind the declared stub; the
    plumbing — struct list column, explode, batch sizing — is real."""
    from ...stages.multimodal import AudioChunkPlan, synth_media_batch

    media = _pq(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: synth_media_batch(t, media_type="audio", fmt="wav"),
        batch_format="pyarrow",
    )

    def explode(t: pa.Table) -> pa.Table:
        chunks = t.column("chunks")
        if isinstance(chunks, pa.ChunkedArray):
            chunks = chunks.combine_chunks()
        flat = chunks.flatten()
        lens = pc.list_value_length(chunks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        return pa.table(
            {
                "media_id": t.column("media_id").take(pa.array(parent)),
                "chunk_no": flat.field("chunk_no"),
                "start_ms": flat.field("start_ms"),
                "end_ms": flat.field("end_ms"),
            }
        )

    return (
        media
        .map_batches(
            AudioChunkPlan(chunk_ms=2000, max_chunks=32),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .map_batches(explode, batch_format="pyarrow")
    )



def q_stratified_sample(sf_dir: str):
    """Class-rebalanced deterministic sample of the event stream —
    per-stratum hash bounds (stages/sampling.py::stratified_mask),
    map-only, stable under re-partitioning and retries; the exact
    uint64 bounds are shared verbatim with the oracle's CASE arms."""
    from ...stages.sampling import stratified_mask

    ev = _pq(sf_dir, "events", columns=["event_id", "event_type"])
    return ev.map_batches(
        lambda t: stratified_mask(t, STRATIFIED_RATES, "event_type", seed=7),
        batch_format="pyarrow",
    )



def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing of tokenized documents into 256-token
    training windows (stages/packing.py): md5-sharded buckets pack
    independently in doc-id order — the deterministic parallel form of
    the LLM context-packing step; a recursive-CTE oracle replays the
    identical greedy recurrence."""
    from ...stages.packing import pack_sequences

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    with_tok = docs.map_batches(
        lambda t: token_counts(t).select(["doc_id", "ws_tokens"]),
        batch_format="pyarrow",
    )
    return pack_sequences(with_tok, budget=256)



def q_sample_k(sf_dir: str):
    """Deterministic uniform 256-sample of documents without
    replacement — global smallest-hash top-k via per-block partial
    top-k + a bounded driver merge (stages/sampling.py), the
    reproducible stand-in for reservoir sampling."""
    from ...stages.sampling import sample_topk_hash

    docs = _pq(sf_dir, "documents", columns=["doc_id"])
    return sample_topk_hash(docs, k=256, id_col="doc_id", seed=7)



def q_class_balanced_sample(sf_dir: str):
    """Class-balanced subsampling (stages/sampling.py::group_sample_k):
    cap every event_type at 100 uniformly-hash-chosen events — the
    dataset-rebalancing step before training. Per-block per-class
    partial top-k bounds the gather at blocks × classes × k; ranks
    compare exact uint64 hashes so the SQL oracle's ORDER BY picks the
    identical winner set."""
    from ...stages.sampling import group_sample_k

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id"],
             num_blocks=_n_cpus())
    return group_sample_k(ev, key_col="event_type", id_col="event_id",
                          k=100, seed=7)



def q_corpus_mix(sf_dir: str):
    """Weighted deterministic corpus interleave
    (stages/packing.py::interleave_positions): even-numbered sources get
    weight 2, odd get 1; every doc receives its slot in the mixed
    training stream. Distinct-source weights come from a bounded
    per-batch combine; the rank itself is one hash-bucket shuffle."""
    from ...stages.packing import interleave_positions

    docs = _pq(sf_dir, "documents", columns=["doc_id", "source"],
               num_blocks=_n_cpus())

    def src_partial(t: pa.Table) -> pd.DataFrame:
        u = pd.unique(t.column("source").to_pandas())
        return pd.DataFrame({"source": u, "n": np.int64(1)})

    srcs = _combine_partials(
        docs.map_batches(src_partial, batch_format="pyarrow"),
        ["source"], ["n"],
    )["source"].sort_values().tolist()
    wts = {s: (2 if int(s[3:]) % 2 == 0 else 1) for s in srcs}
    cyc = sum(wts.values())
    off, acc = {}, 0
    for s in srcs:
        off[s] = acc
        acc += wts[s]
    wmap_ref = ray.put({s: (wts[s], off[s], cyc) for s in srcs})
    return interleave_positions(docs, "source", "doc_id", wmap_ref)



def q_corpus_shards(sf_dir: str):
    """Training-corpus shard manifest: every document routes to one of
    16 shards by reproducible content-independent hash (first 8 md5
    bytes of ``shard:{doc_id}`` — the repo's oracle-recomputable
    scheme), the stream is WRITTEN as hive-partitioned parquet through
    the resumable sealed-directory sink (sources/tables.py::
    write_partitioned — the 100 TB output contract), and the manifest
    (per-shard doc/token counts) is re-read from the SINK's files, so
    the oracle also gates the writer round-trip."""
    import tempfile as _tf

    from ...sources.tables import write_partitioned

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def assign(t: pa.Table) -> pa.Table:
        shard = _md5_shard(t.column("doc_id").to_pylist())
        texts = t.column("text").to_pandas().fillna("")
        toks = texts.str.count(r"\S+").to_numpy(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "shard": pa.array(shard, pa.int64()),
            "n_tok": pa.array(toks, pa.int64()),
        })

    root = os.path.join(_tf.gettempdir(), "gocrawler_shards",
                        os.path.basename(sf_dir.rstrip("/")))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    sharded = docs.map_batches(assign, batch_format="pyarrow")
    write_partitioned(sharded, root, "shard", resume=False)

    manifest = rd.read_parquet(root)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "shard": pd.to_numeric(t.column("shard").to_pandas()).astype(
                np.int64
            ),
            "n_docs": np.int64(1),
            "n_tokens": t.column("n_tok").to_numpy(),
        })
        return df.groupby("shard", as_index=False).sum()

    out = _combine_partials(
        manifest.map_batches(partial, batch_format="pyarrow"),
        ["shard"], ["n_docs", "n_tokens"],
    )
    out["shard"] = out["shard"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)



def q_key_skew(sf_dir: str):
    """Partition-skew diagnostic: the distribution of per-user event
    counts as a count-of-counts histogram — the measurement that decides
    when a groupby key needs salting. ONE hash-bucket shuffle computes
    exact per-user counts (users never straddle buckets); the
    count-of-counts partial stream is bounded by the max per-key
    multiplicity, not by users."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id"], num_blocks=_n_cpus())

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        per_user = g.groupby("user_id").size()
        vc = per_user.value_counts()
        return pd.DataFrame({
            "events_per_user": vc.index.to_numpy(np.int64),
            "n_users": vc.to_numpy(np.int64),
        })

    per_bucket = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(bucket_hist, batch_format="pandas")
    )
    out = _combine_partials(per_bucket, ["events_per_user"], ["n_users"])
    out["events_per_user"] = out["events_per_user"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("events_per_user").reset_index(drop=True)



def q_training_manifest(sf_dir: str):
    """The capstone end-to-end training-data pipeline a reference user
    would run nightly, as ONE streaming composition: exact dedup →
    quality filter → language gate → token counts (q_corpus_prep's
    fused pass) → md5 shard routing → per-shard doc/token manifest.
    Everything between the scan and the 16-row manifest is map-only on
    survivors; the only gathers are dedup's bounded min-id partials and
    the 16-key manifest combine."""
    prep = q_corpus_prep(sf_dir)

    def assign(t: pa.Table) -> pd.DataFrame:
        shard = _md5_shard(t.column("doc_id").to_pylist())
        df = pd.DataFrame({
            "shard": shard,
            "n_docs": np.int64(1),
            "n_tokens": t.column("ws_tokens").to_numpy(),
        })
        return df.groupby("shard", as_index=False).sum()

    out = _combine_partials(
        prep.map_batches(assign, batch_format="pyarrow"),
        ["shard"], ["n_docs", "n_tokens"],
    )
    for c in ("shard", "n_docs", "n_tokens"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)



def q_chunk_windows(sf_dir: str, window: int = 64, stride: int = 48):
    """Training-chunk manifest: split every document into fixed-size
    token windows (size 64, stride 48 — the overlap-chunking step in
    front of tokenize-and-pack). Emits one row per chunk with its exact
    token count — map-only flat emission, fully vectorized (one
    whitespace split per batch, chunk ids via segmented arange), no
    shuffle: at 100 TB this runs at read throughput and streams straight
    into a sharded sink."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def chunks(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pandas()
        n = texts.fillna("").str.split().str.len().to_numpy(np.int64)
        n_chunks = -(-n // stride)  # ceil(n / stride); 0 for empty docs
        total = int(n_chunks.sum())
        doc_ids = np.repeat(t.column("doc_id").to_numpy(), n_chunks)
        starts = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n_chunks[:-1], out=starts[1:])
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(starts, n_chunks)
        tokens_left = np.repeat(n, n_chunks) - chunk_id * stride
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "chunk_tokens": pa.array(
                    np.minimum(tokens_left, window), pa.int64()
                ),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow").sort(
        ["doc_id", "chunk_id"]
    )



def q_csv_roundtrip(sf_dir: str):
    """CSV sink + source parity — same contract as
    :func:`q_jsonl_roundtrip` through ``Dataset.write_csv`` /
    ``ray.data.read_csv`` (Arrow CSV: typed round-trip of ints and
    strings); gated against the oracle over the ORIGINAL parquet."""
    import shutil

    out_dir = os.path.join(
        "/tmp/gocrawler_csv", sf_dir.strip("/").replace("/", "_")
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = _pq(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"],
               num_blocks=_n_cpus())
    docs.write_csv(out_dir)
    back = rd.read_csv(out_dir)
    return _format_roundtrip_agg(back)



def q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source parity: write the documents manifest as
    sharded JSON-lines via ``Dataset.write_json`` (one file per block —
    the resumable layout), read it back with ``ray.data.read_json``,
    and aggregate — proving the engine round-trips the interchange
    format every external corpus pipeline speaks. The aggregate (per
    source: docs + exact char volume) is gated against the oracle over
    the ORIGINAL parquet, so the round-trip must preserve every row and
    value exactly."""
    import shutil

    out_dir = os.path.join(
        "/tmp/gocrawler_jsonl", sf_dir.strip("/").replace("/", "_")
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = _pq(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"],
               num_blocks=_n_cpus())
    docs.write_json(out_dir)
    back = rd.read_json(out_dir)
    return _format_roundtrip_agg(back)



def q_epoch_order(sf_dir: str):
    """Deterministic training-dataloader epoch shuffle: each epoch's
    global order is ``sort by md5-hash('epoch:{e}:'||doc_id)`` — a
    reproducible, coordination-free permutation (any worker can compute
    any row's epoch position locally; epochs decorrelate because the
    salt changes). Emits the first 64 (doc_id, position) slots of
    epochs 1 and 2: per epoch, each block contributes its local 64
    smallest hashes (partial top-k — blocks × 64 rows ever leave the
    mappers) and the driver closes the global prefix; ties pinned by
    doc_id, exact uint64 comparisons throughout."""
    from ...stages.sampling import _unit_hash

    K = 64
    frames = []
    for epoch in (1, 2):
        docs = _pq(sf_dir, "documents", columns=["doc_id"],
                   num_blocks=_n_cpus())

        def partial(t: pa.Table, _e=epoch) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            u = _unit_hash(ids, f"epoch:{_e}:")
            order = np.lexsort((ids, u))[:K]
            return pa.table({"doc_id": pa.array(ids[order]),
                             "__hv": pa.array(u[order], pa.uint64())})

        parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
        ids = parts["doc_id"].to_numpy(np.int64)
        hv = parts["__hv"].to_numpy(np.uint64)
        order = np.lexsort((ids, hv))[:K]
        frames.append(pd.DataFrame({
            "epoch": np.int64(epoch),
            "doc_id": ids[order],
            "position": np.arange(len(order), dtype=np.int64),
        }))
    return pd.concat(frames, ignore_index=True)



def q_split_leakage(sf_dir: str):
    """Split-leakage audit over the event stream: a USER-keyed 80/20
    hash split must put no user on both sides, while the naive
    EVENT-keyed split leaks almost every active user — the
    contamination check run before training on behavioral data. ONE
    hash-bucket shuffle on user_id; per-user membership for both
    schemes reduces in-bucket (users partition across buckets, so the
    three counters sum exactly)."""
    from ...functions.urls import md5_hash64_many
    from ...stages.temporal import _with_bucket

    TR = int(0.8 * 2**64)  # 80/20 boundary on the md5-uint64 line
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        uu = np.unique(u)
        hu = md5_hash64_many(np.char.add("split:7:", uu.astype(str)))
        u_train = hu < np.uint64(TR)
        he = md5_hash64_many(np.char.add("split:7:", e.astype(str)))
        e_train = he < np.uint64(TR)
        df = pd.DataFrame({"u": u, "tr": e_train, "te": ~e_train})
        per = df.groupby("u", as_index=False).agg(
            tr=("tr", "max"), te=("te", "max"))
        rows = [
            {"scheme": "by_event",
             "n_train_users": int(per["tr"].sum()),
             "n_test_users": int(per["te"].sum()),
             "n_leaked": int((per["tr"] & per["te"]).sum())},
            {"scheme": "by_user",
             "n_train_users": int(u_train.sum()),
             "n_test_users": int((~u_train).sum()),
             "n_leaked": 0},
        ]
        return pd.DataFrame(rows)

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["scheme"], ["n_train_users", "n_test_users", "n_leaked"],
    )
    for c in ["n_train_users", "n_test_users", "n_leaked"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("scheme").reset_index(drop=True)



def q_weighted_sample(sf_dir: str):
    """Deterministic weighted top-k reservoir (Efraimidis–Spirakis
    A-ES): each doc draws a hash-derived uniform u and the k=100 docs
    with the largest ln(u)/weight win — inclusion probability
    proportional to weight (n_chars), reproducible under any
    partitioning because u is a pure function of doc_id. Map-only
    per-block local top-k (k × blocks rows reach the driver), driver
    merges — no shuffle at any scale. The A-ES key is continuous, so
    cross-engine float noise (~1 ulp of ln) cannot reorder ranks whose
    gaps are ~1/n of the key range."""
    from ...functions.urls import md5_hash64_many

    K = 100
    docs = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"],
               num_blocks=_n_cpus())

    def topk(t: pa.Table) -> pd.DataFrame:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        w = t.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.float64)
        h = md5_hash64_many(np.char.add("wsample:7:", ids.astype(str)))
        # (h + 0.5) / 2^64 ∈ (0, 1): identical double arithmetic to the
        # oracle, and never 0 (ln is finite)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        key = np.log(u) / w
        order = np.lexsort((ids, -key))[:K]
        return pd.DataFrame({"doc_id": ids[order],
                             "n_chars": w[order].astype(np.int64),
                             "key": key[order]})

    parts = _gather_capped(
        docs.map_batches(topk, batch_format="pyarrow"))  # ≤ blocks × k
    order = np.lexsort((parts["doc_id"].to_numpy(),
                        -parts["key"].to_numpy()))[:K]
    out = parts.iloc[order][["doc_id", "n_chars"]]
    return out.sort_values("doc_id").reset_index(drop=True)



def q_km_reorder(sf_dir: str):
    """Kaplan–Meier survival curve of the customer reorder gap: for
    each gap length t (days), the estimated probability a customer
    "survives" t days without reordering — consecutive-order gaps are
    events, the tail from each customer's LAST order to the global max
    order date is a censored observation (the retention curve with the
    open intervals handled honestly, not dropped).

    Two bounded passes over orders: (1) scalar max-day partials;
    (2) custkey-bucketed per-customer sorts emitting CALENDAR-BOUNDED
    (gap, events, censored) count partials. The driver closes at-risk
    counts n_t by exact integer window sums and the product
    S(t) = Π(1 − d_u/n_u) in QUANTIZED log space (round(ln·10⁹) per
    event day, exact integer prefix sums, one exp per row) — float
    multiplication order can never flip the hash. Terminal event days
    with no survivors (n = d) are dropped on both sides."""
    from ...stages.temporal import _with_bucket

    o = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def days(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        return pa.table({
            "ck": t.column("o_custkey"),
            "d": pa.array(ts // DAY, pa.int64())})

    od = o.map_batches(days, batch_format="pyarrow").materialize()

    def mx(t: pa.Table) -> pd.DataFrame:
        d = t.column("d").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"k": [np.int64(0)],
                             "mx": [np.int64(d.max()) if len(d)
                                    else np.int64(-1)]})

    dmax = int(pd.concat(
        list(od.map_batches(mx, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)["mx"].max())

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["ck"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        order = np.lexsort((d, ck))
        ck, d = ck[order], d[order]
        same = ck[1:] == ck[:-1]
        ev = (d[1:] - d[:-1])[same]                    # reorder gaps
        last = np.concatenate([~same, [True]])
        cen = dmax - d[last]                           # censored tails
        df = pd.DataFrame({
            "t": np.concatenate([ev, cen]),
            "died": np.concatenate([np.ones(len(ev), np.int64),
                                    np.zeros(len(cen), np.int64)]),
            "cens": np.concatenate([np.zeros(len(ev), np.int64),
                                    np.ones(len(cen), np.int64)])})
        return df.groupby("t", as_index=False).sum()

    cnt = _combine_partials(
        _with_bucket(od, "ck", 32).groupby("__bucket")
        .map_groups(gaps, batch_format="pandas"),
        ["t"], ["died", "cens"],
    ).sort_values("t").reset_index(drop=True)

    died = cnt["died"].to_numpy(np.int64)
    tot = int((died + cnt["cens"].to_numpy(np.int64)).sum())
    before = np.concatenate([[0], np.cumsum(
        died + cnt["cens"].to_numpy(np.int64))[:-1]])
    n_t = tot - before
    keep = (died > 0) & (n_t > died)
    t_k, d_k, n_k = (cnt["t"].to_numpy(np.int64)[keep], died[keep],
                     n_t[keep])
    q = round_half_away(np.log(
        (n_k - d_k).astype(np.float64) / n_k.astype(np.float64)) * 1e9
    ).astype(np.int64)
    km = np.exp(np.cumsum(q).astype(np.float64) / 1e9)
    return pd.DataFrame({
        "gap_days": t_k, "died": d_k, "at_risk": n_k,
        "km": round_half_away(km, 6)})



def q_slot_apportionment(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed budget of
    1000 crawl slots across sources, proportional to document count —
    how a fixed-size fetcher fleet gets divided. INTEGER-EXACT end to
    end: base = ⌊1000·n_s/N⌋, the leftover slots go to the largest
    remainders 1000·n_s mod N (ties → source asc) — no floats anywhere,
    and the result provably sums to exactly 1000. Source-bounded count
    partials; the close is a 20-row driver sort."""
    docs = _pq(sf_dir, "documents", columns=["source"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": t.column("source").to_pandas(),
                           "n": np.int64(1)})
        return df.groupby("source", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n"],
    ).sort_values("source").reset_index(drop=True)
    B = 1000
    n = out["n"].to_numpy(np.int64)
    tot = int(n.sum())
    base = (B * n) // tot
    rem = (B * n) % tot
    leftover = B - int(base.sum())
    order = np.lexsort((np.arange(len(n)), -rem))  # rem desc, source asc
    extra = np.zeros(len(n), dtype=np.int64)
    extra[order[:leftover]] = 1
    return pd.DataFrame({
        "source": out["source"],
        "n_docs": n,
        "slots": base + extra})



def q_ivm_daily_counts(sf_dir: str):
    """Incremental view maintenance: the daily (day, event_type) count/
    value view is built from a BASE partition (event_id % 10 < 9) and
    then patched with the delta partition's partial aggregates — the
    merge is a pure additive combine (counts and exact cents both sum),
    so the maintained view equals the full recompute by construction,
    and the oracle computes the full view directly. The pattern that
    turns a nightly 100 TB rebuild into an append-only delta apply;
    both legs are bounded (day × type) combines."""
    ev = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial_of(pred):
        def partial(t: pa.Table) -> pd.DataFrame:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            m = pred(eid)
            ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()[m]
            cents = np.rint(t.column("value").to_numpy()[m] * 100
                            ).astype(np.int64)
            df = pd.DataFrame({
                "day": ts // DAY,
                "event_type": t.column("event_type").to_pandas(
                ).to_numpy()[m],
                "n": np.int64(1), "cents": cents})
            return df.groupby(["day", "event_type"],
                              as_index=False).sum()
        return partial

    base = _combine_partials(
        ev.map_batches(partial_of(lambda e: e % 10 < 9),
                       batch_format="pyarrow"),
        ["day", "event_type"], ["n", "cents"])
    delta = _combine_partials(
        ev.map_batches(partial_of(lambda e: e % 10 >= 9),
                       batch_format="pyarrow"),
        ["day", "event_type"], ["n", "cents"])
    merged = pd.concat([base, delta], ignore_index=True).groupby(
        ["day", "event_type"], as_index=False).sum()
    merged = merged.sort_values(["day", "event_type"]).reset_index(
        drop=True)
    return pd.DataFrame({
        "day": merged["day"].astype(np.int64),
        "event_type": merged["event_type"],
        "n": merged["n"].astype(np.int64),
        "total": round_half_away(
            merged["cents"].to_numpy(np.int64) / 100.0, 2)})



def q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather) sink + source parity — the third format in
    the round-trip family (csv_roundtrip / jsonl_roundtrip), exercising
    the manifest pattern Ray Data lacks a built-in for: every block
    dumps itself to one .arrow file inside map_batches (parallel,
    driver never sees rows) and returns a one-row manifest; the read
    side fans the manifest back out and each task mmap-loads its files.
    Gated by the shared per-source audit aggregate."""
    import pyarrow.feather as ft
    import shutil
    import uuid

    out_dir = os.path.join(
        "/tmp/gocrawler_ipc", sf_dir.strip("/").replace("/", "_"))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    docs = _pq(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"],
               num_blocks=_n_cpus())

    def dump(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.arrow")
        ft.write_feather(t, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    manifest = docs.map_batches(dump, batch_format="pyarrow"
                                ).to_pandas()  # one row per block

    def load(t: pa.Table) -> pa.Table:
        tabs = [ft.read_table(p) for p in t.column("path").to_pylist()]
        return pa.concat_tables(tabs)

    back = rd.from_items(
        [{"path": p} for p in manifest["path"]]
    ).map_batches(load, batch_size=1, batch_format="pyarrow")
    return _format_roundtrip_agg(back)



def q_partition_pruned_read(sf_dir: str):
    """Partition-pruned read-back through the resumable sink: events
    are written ONCE per session through write_partitioned (hive
    layout, _SUCCESS-sealed directories — the 100 TB output contract,
    SURVEY §4.3), then ONLY the purchase partition is read back BY
    PATH, so no byte of the other partitions leaves storage — the
    partition-pruning half of 'prune at the read' that column pruning
    alone can't give. The read-back aggregates daily purchase value
    (day-bounded partials, integer-floor means), gated against SQL
    over the ORIGINAL table — the round-trip must preserve every row
    exactly."""
    from ...sources.tables import read_dataset, write_partitioned

    root = _PART_SINK_CACHE.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="events_part_", dir="/tmp")
        ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
                 num_blocks=_n_cpus())
        write_partitioned(ev, root, "event_type")
        _PART_SINK_CACHE[sf_dir] = root
    ds = read_dataset(os.path.join(root, "event_type=purchase"),
                      columns=["ts", "value"])
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        v3 = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return (pd.DataFrame({"day": day, "n_purchases": np.int64(1),
                              "sum3": v3})
                .groupby("day", as_index=False).sum())

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["n_purchases", "sum3"])
    g = g.sort_values("day").reset_index(drop=True)
    g["mean6"] = (g["sum3"].astype(np.int64) * 1000
                  // g["n_purchases"].astype(np.int64))
    return g.astype({"day": np.int64, "n_purchases": np.int64,
                     "sum3": np.int64, "mean6": np.int64})[
        ["day", "n_purchases", "sum3", "mean6"]]



def q_media_decode_batches(sf_dir: str):
    """Decode-pool work plan for the media corpus: group media items
    into codec-HOMOGENEOUS batches of 64 (per md5-derived format, in
    doc order) with per-batch payload byte totals — the actor-pool
    input manifest that keeps one decoder hot per batch and bounds
    per-task object-store bytes. One groupby per format (3 codec
    groups; the in-group plan is the same sequential recurrence class
    as pack_sequences — md5-shard the ids for wider parallelism at
    scale); bin-bounded output."""
    from ...functions.urls import md5_hex_arrow

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def rows(t: pa.Table) -> pa.Table:
        h = md5_hex_arrow(t.column("text"))
        fmt = np.array([int(x[:2], 16) % 3 for x in h], dtype=np.int64)
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "fmt_idx": pa.array(fmt, pa.int64()),
            "nbytes": pc.cast(pc.utf8_length(
                pc.fill_null(t.column("text"), "")), pa.int64())})

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        g["batch_id"] = np.arange(len(g), dtype=np.int64) // 64
        return (g.groupby(["fmt_idx", "batch_id"], as_index=False)
                .agg(n_items=("doc_id", "size"),
                     sum_bytes=("nbytes", "sum")))

    out = (docs.map_batches(rows, batch_format="pyarrow")
           .groupby("fmt_idx").map_groups(plan, batch_format="pandas")
           .to_pandas())
    out = out.sort_values(["fmt_idx", "batch_id"]).reset_index(drop=True)
    return out.astype({c: np.int64 for c in
                       ["fmt_idx", "batch_id", "n_items", "sum_bytes"]})



def q_neyman_allocation(sf_dir: str):
    """Survey-design sample allocation: split a 1000-doc annotation
    budget across (lang × source) strata proportionally to the exact
    integer dispersion weight V_h = N_h·Σx² − (Σx)² of doc length (the
    variance-proportional form of Neyman allocation, kept integer so
    no sqrt crosses the gate), rounded by Hamilton largest remainder
    (ties to the smaller stratum key — the slot_apportionment
    convention). One taxonomy-bounded sufficient-stats partial; the
    allocation is driver integer arithmetic the oracle replays with
    HUGEINT + a remainder-rank window."""
    BUDGET = 1000
    docs = _pq(sf_dir, "documents", columns=["lang", "source", "n_chars"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        x = (t.column("n_chars").to_numpy(zero_copy_only=False)
             .astype(np.int64))
        return (pd.DataFrame({
            "lang": t.column("lang").to_numpy(zero_copy_only=False),
            "source": t.column("source").to_numpy(zero_copy_only=False),
            "n": np.int64(1), "sx": x, "sxx": x * x})
            .groupby(["lang", "source"], as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source"], ["n", "sx", "sxx"])
    g = g.sort_values(["lang", "source"]).reset_index(drop=True)
    v = [int(n) * int(sxx) - int(sx) ** 2
         for n, sx, sxx in zip(g["n"], g["sx"], g["sxx"])]
    tot = sum(v)
    base = [BUDGET * w // tot for w in v]
    rem = [BUDGET * w % tot for w in v]
    leftover = BUDGET - sum(base)
    order = sorted(range(len(v)),
                   key=lambda i: (-rem[i], g["lang"].iloc[i],
                                  g["source"].iloc[i]))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    g["weight"] = [np.int64(w) for w in v]
    g["alloc"] = np.array(alloc, dtype=np.int64)
    g["n_docs"] = g["n"].astype(np.int64)
    return g[["lang", "source", "n_docs", "weight", "alloc"]]


# ---------------------------------------------------------------------------
# out-of-core total order: resumable range-partitioned external sort
# ---------------------------------------------------------------------------

_EXTSORT_CACHE: dict = {}


def _external_sorted_events(sf_dir: str) -> dict:
    """Once per sf_dir: external-sort events by (v3, event_id) into
    sealed sorted runs (stages/external_sort.py) and cache the manifest.
    Key = v3·2³¹ + event_id — strictly monotone in (v3, event_id) while
    0 ≤ event_id < 2³¹ (asserted), |v3| < 2³² (milli-unit values)."""
    if sf_dir in _EXTSORT_CACHE:
        return _EXTSORT_CACHE[sf_dir]
    from ...stages.external_sort import external_sort_write

    ev = _pq(sf_dir, "events", columns=["event_id", "value"],
             num_blocks=_n_cpus())

    def keyed(t: pa.Table) -> pa.Table:
        eid = pc.cast(t.column("event_id"), pa.int64()).to_numpy()
        v3 = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1000
        ).astype(np.int64)
        assert (eid >= 0).all() and (eid < 2**31).all()
        return pa.table({
            "k": pa.array(v3 * np.int64(2**31) + eid, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
        })

    root = tempfile.mkdtemp(prefix="extsort_", dir="/tmp")
    man = external_sort_write(
        ev.map_batches(keyed, batch_format="pyarrow"), root, "k",
        n_ranges=16,
    )
    _EXTSORT_CACHE[sf_dir] = man
    return man


def q_external_sort_ranks(sf_dir: str):
    """GLOBAL total order exercised through the durable external-sort
    plane: the (v3, event_id) key at 17 probe ranks (every N/16-th rank
    plus the last) of the events table, resolved from the sealed sorted
    runs via the manifest cumsum — random access into a 100 TB ORDER BY
    without any re-shuffle. The oracle recomputes the same ranks with
    row_number() OVER (ORDER BY v3, event_id), so the gate verifies the
    sample boundaries, the scatter, every run's local sort AND the
    manifest bookkeeping end to end."""
    from ...stages.external_sort import keys_at_ranks

    man = _external_sorted_events(sf_dir)
    n = man["total_rows"]
    ranks = sorted({(i * n) // 16 for i in range(16)} | {n - 1})
    got = keys_at_ranks(man, ranks)
    ks = np.array([k for _, k in got], np.int64)
    return pd.DataFrame({
        "rank": np.array([r for r, _ in got], np.int64),
        "v3": (ks // np.int64(2**31)).astype(np.int64),
        "event_id": (ks - (ks // np.int64(2**31)) * np.int64(2**31)
                     ).astype(np.int64),
    })


def q_external_sort_manifest(sf_dir: str):
    """Self-audit of the external-sort run tree: total rows across runs
    equal the table, run key ranges are monotone non-overlapping (the
    concatenation IS the global order), and every run directory is
    sealed — the resumability contract checked from disk, not trusted
    from the in-memory manifest."""
    man = _external_sorted_events(sf_dir)
    sealed = all(
        os.path.exists(os.path.join(
            man["root"], "sorted", f"range={r['range_id']}", "_SUCCESS"
        ))
        for r in man["runs"]
    )
    return pd.DataFrame({
        "total_rows": [np.int64(man["total_rows"])],
        "monotonic": [np.int64(1 if man["monotonic"] else 0)],
        "sealed": [np.int64(1 if sealed else 0)],
    })


def q_external_sort_order_sum(sf_dir: str):
    """FULL-SEQUENCE order gate for the external-sort plane: an
    order-SENSITIVE checksum Σ (rank mod M)·(key mod M) mod M over the
    ENTIRE global sequence (not just rank probes) — any transposition,
    loss or duplication anywhere in the 2M-key order moves it. Scale
    plan: each sealed run knows its global rank offset from the
    manifest cumsum, so one Ray task per run computes its partial
    checksum independently (no sequential scan, nothing row-scale on
    the driver) and the driver sums #runs integers. The oracle
    recomputes the identical sum with row_number() OVER (ORDER BY …)."""
    import pyarrow.parquet as _pq2

    import ray as _ray

    man = _external_sorted_events(sf_dir)
    M = 1_000_003
    cum = man["cum_rows"]

    @_ray.remote(num_cpus=1)
    def run_partial(root: str, key_col: str, rid: int, base: int) -> int:
        t = _pq2.read_table(
            os.path.join(root, "sorted", f"range={rid}"), columns=[key_col]
        )
        k = t.column(key_col).to_numpy()
        rn = np.arange(base, base + len(k), dtype=np.int64)
        km = ((k % M) + M) % M  # match DuckDB's sign-of-dividend %
        return int((((rn % M) * km) % M).sum())

    parts = _ray.get([
        run_partial.remote(man["root"], man["key_col"], r["range_id"], cum[i])
        for i, r in enumerate(man["runs"])
    ])
    return pd.DataFrame({
        "total_rows": [np.int64(man["total_rows"])],
        "order_sum": [np.int64(sum(parts))],
    })


_MERGE_JOIN_CACHE: dict = {}


def q_sort_merge_revenue(sf_dir: str):
    """SORT-MERGE JOIN plane (the "sort once, join many" warehouse
    pattern — a genuinely different execution strategy from the
    catalog's hash/broadcast joins): orders and lineitem are externally
    sorted by orderkey into range-CO-PARTITIONED sealed run trees
    (lineitem reuses orders' sampled boundaries), then the join is one
    independent Ray task per range — ZERO shuffle at join time, and the
    durable runs amortize over every later join on the same key. Each
    range task merge-joins its two sorted slices and pre-reduces to a
    per-priority partial; the driver combines #ranges × 5 rows. Gated
    against the plain SQL join: per o_orderpriority, lineitem count and
    exact integer quantity sum."""
    from ...stages.external_sort import external_sort_write, merge_join_sorted

    key = (sf_dir, "sort_merge")
    if key not in _MERGE_JOIN_CACHE:
        orders = _pq(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderpriority"],
                     num_blocks=_n_cpus()).map_batches(
            lambda t: pa.table({
                "k": pc.cast(t.column("o_orderkey"), pa.int64()),
                "prio": t.column("o_orderpriority"),
            }), batch_format="pyarrow")
        li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"],
                 num_blocks=_n_cpus()).map_batches(
            lambda t: pa.table({
                "k": pc.cast(t.column("l_orderkey"), pa.int64()),
                "qty": pa.array(np.rint(
                    t.column("l_quantity").to_numpy(zero_copy_only=False)
                ).astype(np.int64)),
            }), batch_format="pyarrow")
        root = tempfile.mkdtemp(prefix="smj_", dir="/tmp")
        man_o = external_sort_write(orders, os.path.join(root, "orders"),
                                    "k", n_ranges=8)
        man_l = external_sort_write(li, os.path.join(root, "lineitem"),
                                    "k", boundaries=man_o["boundaries"])
        _MERGE_JOIN_CACHE[key] = (man_o, man_l)
    man_o, man_l = _MERGE_JOIN_CACHE[key]

    def reduce_range(ta: pa.Table, tb: pa.Table) -> dict:
        # both slices sorted by k: locate each lineitem's order row via
        # searchsorted (orderkey unique in orders), then pre-reduce
        ka = ta.column("k").to_numpy()
        kb = tb.column("k").to_numpy()
        pos = np.searchsorted(ka, kb)
        pos = np.clip(pos, 0, max(len(ka) - 1, 0))
        m = (ka[pos] == kb) if len(ka) else np.zeros(len(kb), bool)
        prio = ta.column("prio").to_numpy(zero_copy_only=False)[pos[m]]
        qty = tb.column("qty").to_numpy()[m]
        df = pd.DataFrame({"prio": prio, "n": np.int64(1), "q": qty})
        return df.groupby("prio", as_index=False).sum().to_dict("list")

    parts = merge_join_sorted(man_o, man_l, reduce_range)
    acc: dict[str, list[int]] = {}
    for p in parts:
        for pr, n, qv in zip(p["prio"], p["n"], p["q"]):
            a = acc.setdefault(pr, [0, 0])
            a[0] += int(n)
            a[1] += int(qv)
    rows = sorted(acc.items())
    return pd.DataFrame({
        "o_orderpriority": [r[0] for r in rows],
        "n_lines": np.array([r[1][0] for r in rows], np.int64),
        "sum_qty": np.array([r[1][1] for r in rows], np.int64),
    })
