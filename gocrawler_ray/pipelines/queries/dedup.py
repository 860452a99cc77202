"""Deduplication planes (exact / MinHash / SimHash / containment / CDC) — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403
from .text import q_decontaminate  # noqa: F401 — cross-family



def q_exact_dedup(sf_dir: str):
    out = exact_dedup(_augmented_docs(sf_dir), col="text", id_col="doc_id")
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")



def q_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs, verified with exact Jaccard. With
    r=2 rows per band the per-pair miss probability at the lowest true
    similarity in this corpus (≈0.76) is (1−0.76²)^64 ≈ 1e-27, so the
    LSH output EQUALS the exact pairwise-Jaccard≥τ set — which is what
    the DuckDB oracle computes (full cross-pair k-gram Jaccard)."""
    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    _, edges = minhash_lsh_dedup(
        ds, col="text", id_col="doc_id", threshold=0.6, num_perm=128, bands=64
    )
    return pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.string()),
            "b": pa.array([b for _, b in edges], pa.string()),
        }
    )



def q_simhash_pairs(sf_dir: str):
    """SimHash bit-band near-dup over the same augmented corpus as
    minhash_pairs. band_bits=4 (16 bands) at gate scale: per-pair recall
    at the corpus' minimum true similarity is ≈1-3e-5, so the verified
    output equals the exact pairwise-Jaccard set (same SQL oracle as
    minhash_pairs); the 16-bit default is the corpus-scale config."""
    from ...stages.dedup import simhash_near_dup

    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    edges = simhash_near_dup(
        ds, col="text", id_col="doc_id", band_bits=4, threshold=0.6,
        bucket_cap=1 << 20, hamming_radius=16, shingle_radius=26,
    )
    return pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.string()),
            "b": pa.array([b for _, b in edges], pa.string()),
        }
    )



def q_simhash(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(add_simhash, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "simhash"]), batch_format="pyarrow"
    )



def q_edit_distance_pairs(sf_dir: str):
    """Levenshtein≤2 string-similarity self-join over 32-char document
    title prefixes (``stages/strings.py``: PassJoin segment candidates →
    banded-DP verify), with 15 single-substitution variants injected so
    true typo-dups exist at every scale. Candidate generation is
    exact-recall (pigeonhole over k+1 segments), so the verified output
    EQUALS the oracle's full quadratic ``levenshtein`` join — the
    character-edit dedup modality the shingle-based planes are blind
    to (one substitution moves k adjacent shingles but one edit)."""
    from ...stages.strings import edit_distance_join

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def titles(t: pa.Table) -> pa.Table:
        base = pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "title": pc.utf8_slice_codeunits(t.column("text"), 0, 32),
            }
        )
        sub = t.filter(pc.less(t.column("doc_id"), 15))
        texts = sub.column("text").to_pylist()
        var = pa.table(
            {
                "doc_id": pc.cast(
                    pc.add(sub.column("doc_id"), 30000), pa.string()
                ),
                # one substitution inside the title window (titles are
                # [a-z ]+, so '#' always changes the char): SQL mirror
                # substr(text,1,4) || '#' || substr(text,6,27)
                "title": pa.array(
                    [x[:4] + "#" + x[5:32] for x in texts], pa.string()
                ),
            }
        )
        return pa.concat_tables([base, var])

    ds = docs.map_batches(titles, batch_format="pyarrow")
    out = edit_distance_join(ds, col="title", id_col="doc_id", k=2)
    out["dist"] = out["dist"].astype(np.int64)
    return out



def q_connected_components(sf_dir: str):
    """Distributed connected components (iterative min-label propagation,
    stages/dedup.py::components_minlabel) over the verified near-dup
    pair set — the dup-cluster resolution step of LSH dedup run through
    the DISTRIBUTED path (the driver-side union-find is the small-edge
    shortcut). Label = component-min doc_id (string order, both sides)."""
    from ...stages.dedup import components_minlabel, minhash_lsh_dedup

    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    _, edges = minhash_lsh_dedup(
        ds, col="text", id_col="doc_id", threshold=0.6, num_perm=128, bands=64
    )
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.string()),
                "b": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )
    return components_minlabel(edges_ds, num_partitions=4)



# ---------------------------------------------------------------------------
# round-3 widening: exact similarity join, semi/outer join shapes, reshape
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard similarity self-join (AllPairs prefix
    filtering, stages/dedup.py::ngram_jaccard_join) over the same
    augmented near-dup corpus as minhash_pairs — the dedup flavor with a
    deterministic recall guarantee (no LSH miss probability). Returns
    the scored pair list (a, b, j)."""
    from ...stages.dedup import ngram_jaccard_join

    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    # freq_order off: this corpus' shingle-df profile is FLAT (random
    # small-vocab grams, max in-batch df 7/600 — no boilerplate skew),
    # so the sampled df pass finds an empty hot set and costs ~2 s for
    # nothing; on real web text (Zipfian df) it stays on. Measured both.
    out = ngram_jaccard_join(
        ds, col="text", id_col="doc_id", k=3, threshold=0.6, freq_order=False
    )
    out["j"] = round_half_away(out["j"].to_numpy(), 6)
    return out



def q_canonical_docs(sf_dir: str):
    """Canonical-keeper selection per near-dup cluster — the dedup KEEP
    policy as a first-class operator (which member of each dup cluster
    survives): keeper = the member with the most characters (richest
    version), tie-broken by min doc_id. Components close over the
    bounded verified edge list with driver union-find (same
    shortcut-vs-distributed contract as dup_cluster_sizes); member
    char-lengths come back in ONE broadcast-filtered map pass — the
    corpus itself never shuffles. Past the edge cap the labels stay a
    Dataset and the argmax runs as a label-keyed map_groups."""
    import ray

    from ...stages.dedup import components_minlabel, minhash_lsh_dedup

    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    _, edges = minhash_lsh_dedup(
        ds, col="text", id_col="doc_id", threshold=0.6, num_perm=128, bands=64
    )

    def lengths_of(member_ref):
        def pick(t: pa.Table) -> pa.Table:
            sub = t.filter(
                pc.is_in(t.column("doc_id"), ray.get(member_ref))
            )
            return pa.table(
                {
                    "doc_id": sub.column("doc_id"),
                    "n": pc.cast(
                        pc.utf8_length(sub.column("text")), pa.int64()
                    ),
                }
            )

        return ds.map_batches(pick, batch_format="pyarrow")

    if len(edges) <= 500_000:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted({x for e in edges for x in e})
        lab = {x: find(x) for x in nodes}
        member_ref = ray.put(pa.array(nodes, pa.string()))
        lens = lengths_of(member_ref).to_pandas()
        lens["label"] = lens["doc_id"].map(lab)
    else:  # pragma: no cover - edge set past the driver cap
        labels = components_minlabel(
            rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([a for a, _ in edges], pa.string()),
                        "b": pa.array([b for _, b in edges], pa.string()),
                    }
                )
            ),
            num_partitions=4,
        )
        ldf = labels.to_pandas()  # bounded: dup nodes << corpus
        member_ref = ray.put(pa.array(ldf["node"], pa.string()))
        lens = lengths_of(member_ref).to_pandas()
        lens["label"] = lens["doc_id"].map(
            dict(zip(ldf["node"], ldf["label"]))
        )

    mx = lens.groupby("label")["n"].transform("max")
    at_max = lens[lens["n"] == mx]
    out = (
        lens.groupby("label", as_index=False)
        .agg(n_members=("doc_id", "count"), max_chars=("n", "max"))
        .merge(
            at_max.groupby("label", as_index=False)["doc_id"]
            .min()
            .rename(columns={"doc_id": "keeper"}),
            on="label",
        )
    )
    out["n_members"] = out["n_members"].astype(np.int64)
    out["max_chars"] = out["max_chars"].astype(np.int64)
    return out[["label", "keeper", "n_members", "max_chars"]].sort_values(
        "label"
    ).reset_index(drop=True)



def q_dup_cluster_sizes(sf_dir: str):
    """Dup-cluster size histogram — the dedup QA aggregate (how much of
    the corpus is duplicated, at what multiplicity): distributed
    connected components over the verified near-dup edges, a label-keyed
    distributed count (labels grow with the corpus), then a bounded
    size-histogram combine (distinct sizes ≤ max cluster size)."""
    from ray.data.aggregate import Count

    from ...stages.dedup import components_minlabel, minhash_lsh_dedup

    ds = _near_dup_docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.string()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    _, edges = minhash_lsh_dedup(
        ds, col="text", id_col="doc_id", threshold=0.6, num_perm=128, bands=64
    )
    if len(edges) <= 500_000:
        # the verified edge list is ALREADY a bounded driver-side list
        # (LSH verify fan-out caps it) — union-find here beats paying
        # the iterative min-label propagation's per-round shuffle
        # latency on a few hundred edges (measured 6.1 s → 3.6 s for
        # the whole query at sf0.1)
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        sizes: dict = {}
        nodes = {x for e in edges for x in e}
        for x in nodes:
            r = find(x)
            sizes[r] = sizes.get(r, 0) + 1
        vc = pd.Series(list(sizes.values())).value_counts()
        out = pd.DataFrame(
            {"size": vc.index.to_numpy(np.int64),
             "n_clusters": vc.to_numpy(np.int64)}
        )
    else:  # pragma: no cover - edge set past the driver cap
        labels = components_minlabel(
            rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([a for a, _ in edges], pa.string()),
                        "b": pa.array([b for _, b in edges], pa.string()),
                    }
                )
            ),
            num_partitions=4,
        )
        counts = labels.groupby("label").aggregate(Count(alias_name="size"))

        def hist(t: pa.Table) -> pd.DataFrame:
            s = t.column("size").to_pandas().astype(np.int64)
            vc = s.value_counts()
            return pd.DataFrame(
                {"size": vc.index.to_numpy(np.int64),
                 "n_clusters": vc.to_numpy(np.int64)}
            )

        out = _combine_partials(
            counts.map_batches(hist, batch_format="pyarrow"),
            ["size"], ["n_clusters"],
        )
    out["n_clusters"] = out["n_clusters"].astype(np.int64)
    out["size"] = out["size"].astype(np.int64)
    return out.sort_values("size").reset_index(drop=True)



def q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking storage dedup (the restic/borg/LBFS
    move, Muthitacharoen et al. SOSP'01): chunk every document at
    positions where the md5 of the trailing 8-gram ≡ 0 (mod 32)
    (~32-byte expected chunks), then measure the corpus-wide dedup
    ratio 1 − distinct_bytes/total_bytes — how much a content-addressed
    store would save. Boundaries are a pure function of local content,
    so chunking is map-only and INSERTIONS only reshuffle chunk
    boundaries locally (the property that makes CDC beat fixed-size
    blocks). Window hashes dedupe through np.unique before the md5 loop
    (the fixed vocab repeats 8-grams heavily); the distinct-chunk plane
    gathers (md5, bytes) under a cap with a distributed
    groupby-max fallback past it. All outputs exact ints + one rounded
    division."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def chunk_rows(t: pa.Table) -> pd.DataFrame:
        import hashlib
        from numpy.lib.stride_tricks import sliding_window_view
        from ...functions.urls import md5_hash64_many

        hs_out: list[str] = []
        b_out: list[int] = []
        for s in t.column("text").to_pylist():
            s = s or ""
            L = len(s)
            if L == 0:
                continue
            bounds: list[int] = []
            if L >= 8:
                a = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                win = sliding_window_view(a, 8)
                toks = [w.tobytes().decode("utf-8") for w in win]
                hv = md5_hash64_many(np.array(toks, dtype=object))
                bounds = list((np.nonzero(hv % 32 == 0)[0] + 8
                               ).astype(int))
            if not bounds or bounds[-1] != L:
                bounds.append(L)
            prev = 0
            for e in bounds:
                if e > prev:
                    ch = s[prev:e]
                    hs_out.append(hashlib.md5(
                        ch.encode("utf-8")).hexdigest())
                    b_out.append(e - prev)
                    prev = e
        return pd.DataFrame({"h": hs_out, "b": np.array(b_out,
                                                        np.int64)})

    rows = docs.map_batches(chunk_rows, batch_format="pyarrow"
                            ).materialize()  # totals + distinct planes
    tot = pd.concat(
        list(rows.map_batches(
            lambda t: pd.DataFrame({
                "k": [np.int64(0)], "n": [np.int64(t.num_rows)],
                "b": [np.int64(pc.sum(t.column("b")).as_py() or 0)]}),
            batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    total_chunks, total_bytes = int(tot["n"].sum()), int(tot["b"].sum())

    gathered = _gather_capped(rows)
    if gathered is not None:
        dis = gathered.drop_duplicates("h")
    else:  # chunk space past the cap: distributed dedup by hash
        dis = (rows.groupby("h").max("b")
               .map_batches(lambda t: pa.table(
                   {"h": t.column("h"), "b": t.column("max(b)")}),
                   batch_format="pyarrow")
               .to_pandas())
    distinct_chunks = len(dis)
    distinct_bytes = int(dis["b"].sum())
    return pd.DataFrame({
        "total_chunks": [np.int64(total_chunks)],
        "distinct_chunks": [np.int64(distinct_chunks)],
        "total_bytes": [np.int64(total_bytes)],
        "distinct_bytes": [np.int64(distinct_bytes)],
        "dedup_ratio": round_half_away(np.array(
            [1.0 - float(distinct_bytes) / float(total_bytes)]), 6)})



def q_cross_dedup(sf_dir: str):
    """Cross-corpus contamination near-dup join: incoming docs (ODD
    doc_id) checked against the frozen reference corpus (EVEN doc_id)
    — the decontamination shape a training-data pipeline runs before
    ADDING a crawl batch to an existing training set (doc-level
    near-dup, complementing q_decontaminate's n-gram-level overlap).
    Ten opposite-parity near-dup tails are planted (doc_id+20001) so
    the gate always has cross matches.

    Reuses the exact AllPairs prefix-filter join (deterministic
    recall, stages/dedup.py::ngram_jaccard_join — driver fast path +
    distributed pair plane both inherited); the cross-parity filter
    and per-incoming-doc argmax (max j, smallest ref on ties) run on
    the join's bounded OUTPUT. Emits (doc_id, ref_id, j)."""
    from ...stages.dedup import ngram_jaccard_join

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def tails(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 10))
        texts = [x + " extra tail token appended"
                 for x in t2.column("text").to_pylist()]
        return pa.table({
            "doc_id": pc.add(t2.column("doc_id"), 20001),
            "text": pa.array(texts, pa.string())})

    aug = docs.union(docs.map_batches(tails, batch_format="pyarrow"))
    ds = aug.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.string()),
            "text": t.column("text")}),
        batch_format="pyarrow")
    # freq_order off: flat shingle-df synthetic corpus (see
    # q_ngram_jaccard_pairs); stays on for Zipfian web text
    pairs = ngram_jaccard_join(
        ds, col="text", id_col="doc_id", k=3, threshold=0.6,
        freq_order=False)
    empty = pd.DataFrame({"doc_id": np.zeros(0, np.int64),
                          "ref_id": np.zeros(0, np.int64),
                          "j": np.zeros(0)})
    if not len(pairs):
        return empty
    a = pairs["a"].to_numpy().astype(np.int64)
    b = pairs["b"].to_numpy().astype(np.int64)
    j = pairs["j"].to_numpy()
    cross = (a % 2) != (b % 2)
    if not cross.any():
        return empty
    a, b, j = a[cross], b[cross], j[cross]
    new = np.where(a % 2 == 1, a, b)
    ref = np.where(a % 2 == 1, b, a)
    df = pd.DataFrame({"doc_id": new, "ref_id": ref, "j": j})
    df = (df.sort_values(["doc_id", "j", "ref_id"],
                         ascending=[True, False, True])
            .drop_duplicates("doc_id", keep="first")
            .reset_index(drop=True))
    df["j"] = round_half_away(df["j"].to_numpy(), 6)
    return df



def q_dup_rate_by_source(sf_dir: str):
    """Per-source exact duplication-rate audit — the curation dashboard
    number behind 'which feed is flooding the corpus with copies'
    (doc_id<20 copies injected as in exact_dedup so the rate is
    nonzero at gate scale).

    ONE scan, one bounded exchange: each block pre-reduces to distinct
    (source, content-md5) pairs with local multiplicities, pairs route
    by pair hash (same pair → same bucket, so per-bucket distinct
    counts are globally exact while one source's hashes spread over all
    buckets — no hot-source bucket), and the close combines ≤
    sources × buckets partial rows. Nothing content-sized ever lands
    on the driver."""
    from ...functions.urls import md5_hex_arrow

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "source"],
               num_blocks=_n_cpus())

    def copies(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 20))
        return pa.table({"doc_id": pc.add(t2.column("doc_id"), 10000),
                         "text": t2.column("text"),
                         "source": t2.column("source")})

    aug = docs.union(docs.map_batches(copies, batch_format="pyarrow"))

    def local(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
                "source": t.column("source").to_numpy(zero_copy_only=False),
                "h": np.asarray(md5_hex_arrow(t.column("text")),
                                dtype=object)})
              .groupby(["source", "h"], sort=False).size()
              .reset_index(name="n"))
        ph = pd.util.hash_pandas_object(df[["source", "h"]],
                                        index=False).to_numpy()
        return pa.table({
            "source": pa.array(df["source"].to_numpy(dtype=object),
                               pa.string()),
            "h": pa.array(df["h"].to_numpy(dtype=object), pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            "__bucket": pa.array((ph % np.uint64(64)).astype(np.int32),
                                 pa.int32()),
        })

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["source", "h"], sort=False)["n"].sum()
               .reset_index())
        return (agg.groupby("source", sort=False)
                .agg(n_docs=("n", "sum"), n_distinct=("h", "size"))
                .reset_index())

    parts = (aug.map_batches(local, batch_format="pyarrow")
             .groupby("__bucket").map_groups(bucket, batch_format="pandas"))
    out = _combine_partials(parts, ["source"], ["n_docs", "n_distinct"])
    out = out.sort_values("source").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["dup_share6"] = ((out["n_docs"] - out["n_distinct"]) * 10**6
                         // out["n_docs"]).astype(np.int64)
    return out[["source", "n_docs", "n_distinct", "dup_share6"]]



def q_containment_pairs(sf_dir: str):
    """EXACT overlap-coefficient (containment) self-join — quote/subset
    detection over the documents corpus with injected token-prefix
    quotes (doc_id<10 → +30000, the first max(4, 2·len//5) tokens):
    those pairs sit at C = 1.0 but Jaccard ≈ 0.4, which Jaccard-LSH
    and the Jaccard prefix filter structurally miss
    (stages/dedup.py::containment_join — probe-prefix × full-index
    bucketing with deterministic recall, distributed pair plane past
    the driver cap). Returns (a, b, c) with exact C ≥ 0.8."""
    from ...stages.dedup import containment_join

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def quotes(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 10))
        texts = []
        for x in t2.column("text").to_pylist():
            # single-space split after space-trim, KEEPING empty
            # tokens — byte-identical to the oracle's
            # string_split(trim(text), ' ') on any whitespace shape
            # (post-r4 ADVICE: .split() drops empties and splits on
            # tabs/newlines, a latent gate mismatch)
            toks = (x or "").strip(" ").split(" ")
            n = max(4, 2 * len(toks) // 5)
            texts.append(" ".join(toks[:n]))
        return pa.table({"doc_id": pc.add(t2.column("doc_id"), 30000),
                         "text": pa.array(texts, pa.string())})

    aug = docs.union(docs.map_batches(quotes, batch_format="pyarrow"))
    ds = aug.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.string()),
            "text": t.column("text"),
        }),
        batch_format="pyarrow",
    )
    # freq_order off: flat shingle-df corpus (same adjudication as
    # ngram_jaccard_pairs — the sampled-df pass finds an empty hot set)
    out = containment_join(ds, k=3, threshold=0.8, freq_order=False)
    out["c"] = round_half_away(out["c"].to_numpy(), 6)
    return out



def q_source_dup_mass(sf_dir: str, cap: int = 5_000_000):
    """Duplication pressure by feed: per source, the share of its word
    5-gram OCCURRENCES that are corpus-repeated (the gram appears in
    >1 distinct doc) — repeated_ngrams' per-doc signal rolled up to the
    level a curation run actually acts on ('which feed is template
    spam'). Same two passes: distinct-docs-per-gram partials combine
    under the cap and the dup set broadcasts as a zero-copy uint64
    array into a map-only probe emitting source-bounded sums; past the
    cap the dup set stays a Dataset and the probe is a left_semi join
    (the repeated_ngrams fallback), with the same bounded close."""
    n = 5
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "source"],
               num_blocks=_n_cpus())

    def gram_doc_partial(t: pa.Table) -> pa.Table:
        # emits PYARROW (house rule): the past-cap fallback feeds this
        # straight into Ray's sort-based groupby, where pandas blocks
        # are ~13x slower through the shuffle
        flat, di = _flat_tokens(t.column("text").to_pandas())
        grams, gdi = _word_ngram_hashes(flat, di, n)
        if len(grams) == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"g": grams, "d": gdi})
        nd = pairs.drop_duplicates().groupby("g", as_index=False).size()
        return pa.table({"g": pa.array(nd["g"].to_numpy(np.int64)),
                         "nd": pa.array(nd["size"].to_numpy(np.int64))})

    partials = docs.map_batches(gram_doc_partial, batch_format="pyarrow")
    counts = _combine_partials(partials, ["g"], ["nd"], cap=cap)
    if counts is not None:
        dup = np.sort(counts.loc[counts["nd"] > 1, "g"]
                      .to_numpy(np.int64))
        dref = ray.put(dup)

        def probe(t: pa.Table) -> pd.DataFrame:
            ds_ = ray.get(dref)
            flat, di = _flat_tokens(t.column("text").to_pandas())
            grams, gdi = _word_ngram_hashes(flat, di, n)
            src = t.column("source").to_numpy(zero_copy_only=False)
            if len(grams) == 0:
                return pd.DataFrame({
                    "source": pd.Series([], dtype=object),
                    "n_grams": pd.Series([], dtype=np.int64),
                    "n_dup": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(ds_, grams)
            hit = (pos < ds_.size) & (
                ds_[np.minimum(pos, max(ds_.size - 1, 0))] == grams)
            return (pd.DataFrame({"source": src[gdi],
                                  "n_grams": np.int64(1),
                                  "n_dup": hit.astype(np.int64)})
                    .groupby("source", as_index=False).sum())

        g = _combine_partials(docs.map_batches(probe,
                                               batch_format="pyarrow"),
                              ["source"], ["n_grams", "n_dup"])
    else:  # pragma: no cover - gram domain past the broadcast cap
        summed = partials.groupby("g").sum("nd")
        dup_ds = summed.map_batches(
            lambda t: t.filter(pc.greater(t.column("sum(nd)"), 1))
            .select(["g"]), batch_format="pyarrow")

        def gram_rows(t: pa.Table) -> pa.Table:
            flat, di = _flat_tokens(t.column("text").to_pandas())
            grams, gdi = _word_ngram_hashes(flat, di, n)
            src = t.column("source").to_numpy(zero_copy_only=False)
            return pa.table({
                "source": pa.array(src[gdi], pa.string()),
                "g": pa.array(grams, type=pa.int64())})

        grams_ds = docs.map_batches(gram_rows, batch_format="pyarrow")
        tot = _combine_partials(
            grams_ds.map_batches(
                lambda t: pd.DataFrame(
                    {"source": t.column("source").to_numpy(
                        zero_copy_only=False),
                     "n_grams": np.int64(1)})
                .groupby("source", as_index=False).sum(),
                batch_format="pyarrow"),
            ["source"], ["n_grams"])
        hits = grams_ds.join(
            dup_ds, join_type="left_semi",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "documents")),
            on=("g",))
        dups = _combine_partials(
            hits.map_batches(
                lambda t: pd.DataFrame(
                    {"source": t.column("source").to_numpy(
                        zero_copy_only=False),
                     "n_dup": np.int64(1)})
                .groupby("source", as_index=False).sum(),
                batch_format="pyarrow"),
            ["source"], ["n_dup"])
        g = tot.merge(dups, on="source", how="left").fillna({"n_dup": 0})
    g = g.sort_values("source").reset_index(drop=True)
    g["n_grams"] = g["n_grams"].astype(np.int64)
    g["n_dup"] = g["n_dup"].astype(np.int64)
    g["dup_mass6"] = (g["n_dup"] * 10**6 // g["n_grams"]).astype(np.int64)
    return g[["source", "n_grams", "n_dup", "dup_mass6"]]



def q_dup_pair_source_split(sf_dir: str):
    """Syndication split of the near-dup pair set: how many verified
    near-dup pairs join docs of the SAME source vs different sources —
    within-feed pairs mean template reuse (dedup per feed suffices);
    cross-feed pairs mean syndication (dedup must be global). Sources
    attach to the BOUNDED pair output only: the pair-member id set
    broadcasts into one filtered documents scan (never the corpus),
    and the split closes as three integers."""
    pairs = q_minhash_pairs(sf_dir)
    if isinstance(pairs, rd.Dataset):  # pragma: no cover - frame today
        pairs = pairs.to_pandas()
    elif isinstance(pairs, pa.Table):
        pairs = pairs.to_pandas()
    base = lambda s: np.array([int(str(x)) % 20000 for x in s],
                              dtype=np.int64)
    ia, ib = base(pairs["a"]), base(pairs["b"])
    ids = np.unique(np.concatenate([ia, ib]))
    ids_ref = ray.put(ids)

    docs = _pq(sf_dir, "documents", columns=["doc_id", "source"],
               num_blocks=_n_cpus())

    def fetch(t: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, d)
        hit = (pos < want.size) & (
            want[np.minimum(pos, max(want.size - 1, 0))] == d)
        return t.filter(pa.array(hit))

    small = docs.map_batches(fetch, batch_format="pyarrow").to_pandas()
    src_of = dict(zip(small["doc_id"].astype(np.int64),
                      small["source"]))
    same = np.array([src_of[x] == src_of[y] for x, y in zip(ia, ib)])
    n_within = int(same.sum())
    n_cross = int((~same).sum())
    tot = max(n_within + n_cross, 1)
    return pd.DataFrame({
        "n_within": [np.int64(n_within)],
        "n_cross": [np.int64(n_cross)],
        "within_share6": [np.int64(n_within * 10**6 // tot)]})



def q_dup_purchase_audit(sf_dir: str):
    """Duplicate-transaction screen: purchases landing within 5 minutes
    of the same user's PREVIOUS purchase — the double-charge audit a
    payments review runs before any revenue number is trusted. One
    user-bucket shuffle; the kernel is a lexsort + shifted compare on
    purchases only; the close is three integers."""
    from ...stages.temporal import _with_bucket

    WINDOW = 300_000_000  # 5 min in µs
    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({
            "event_id": pc.cast(t2.column("event_id"), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "ts": pc.cast(t2.column("ts"), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].to_numpy(np.int64),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].to_numpy(np.int64)[order]
        rapid = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            rapid[1:] = (u[1:] == u[:-1]) & (ts[1:] - ts[:-1] <= WINDOW)
        return pd.DataFrame({"k": [np.int64(0)],
                             "n_purchases": [np.int64(len(u))],
                             "n_rapid": [np.int64(int(rapid.sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_purchases", "n_rapid"])
    np_, nr = int(g["n_purchases"].sum()), int(g["n_rapid"].sum())
    return pd.DataFrame({
        "n_purchases": [np.int64(np_)],
        "n_rapid": [np.int64(nr)],
        "rapid_share6": [np.int64(nr * 10**6 // np_ if np_ else 0)]})



def q_containment_dedup(sf_dir: str):
    """Containment DEDUP — the survivor set the containment join
    exists for: over the quote-augmented corpus, any doc whose shingle
    set is ≥ 0.9-contained in a STRICTLY larger doc's set is dropped
    (the quote dies, the superset survives); equal-size near-dup pairs
    drop the larger doc_id (the min-id keeper convention). The pair
    plane is containment_join (deterministic recall); set sizes come
    from the pair members ONLY (candidate-bounded fetch); the corpus
    anti-joins the bounded drop set map-side. Returns surviving
    doc_ids."""
    from ...stages.dedup import _candidate_shingle_sets, containment_join

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def quotes(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 10))
        texts = []
        for x in t2.column("text").to_pylist():
            # single-space split after space-trim, KEEPING empty
            # tokens — byte-identical to the oracle's
            # string_split(trim(text), ' ') on any whitespace shape
            # (post-r4 ADVICE: .split() drops empties and splits on
            # tabs/newlines, a latent gate mismatch)
            toks = (x or "").strip(" ").split(" ")
            n = max(4, 2 * len(toks) // 5)
            texts.append(" ".join(toks[:n]))
        return pa.table({"doc_id": pc.add(t2.column("doc_id"), 30000),
                         "text": pa.array(texts, pa.string())})

    aug = docs.union(docs.map_batches(quotes, batch_format="pyarrow"))
    ds = aug.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.string()),
            "text": t.column("text")}),
        batch_format="pyarrow")
    pairs = containment_join(ds, k=3, threshold=0.9, freq_order=False)
    drop: set = set()
    if len(pairs):
        ids = sorted(set(pairs["a"]) | set(pairs["b"]))
        sets = _candidate_shingle_sets(ds, ids, "text", 3)
        for a, b in zip(pairs["a"], pairs["b"]):
            na, nb = sets[a].size, sets[b].size
            if na < nb:
                drop.add(a)
            elif nb < na:
                drop.add(b)
            else:
                drop.add(max(a, b))
    dref = ray.put(np.array(sorted(drop), dtype=object))

    def keep(t: pa.Table) -> pa.Table:
        dr = ray.get(dref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if not dr.size:
            return t.select(["doc_id"])
        m = ~np.isin(d, dr)
        return pa.table({"doc_id": pa.array(d[m], pa.string())})

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)



def q_shingle_df_profile(sf_dir: str):
    """Shingle document-frequency histogram (3-grams; buckets 1, 2,
    3-10, 11-100, 100+) — the measured skew profile behind the
    freq_order design decision in the near-dup joins (BASELINE.md's
    'this corpus' shingle df is FLAT' claim, now hash-gated instead of
    asserted): a Zipfian bucket tail says turn hot-shingle prefix
    reordering ON, a flat one says the pass is pure cost. Per-batch
    distinct-doc gram partials (sum-exact because a doc lives in one
    row) combine under the repeated_ngrams cap; the histogram close is
    5 integers."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())
    n = 3

    def gram_doc_partial(t: pa.Table) -> pa.Table:
        # emits PYARROW (house rule): the past-cap fallback feeds this
        # straight into Ray's sort-based groupby, where pandas blocks
        # are ~13x slower through the shuffle
        flat, di = _flat_tokens(t.column("text").to_pandas())
        grams, gdi = _word_ngram_hashes(flat, di, n)
        if len(grams) == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"g": grams, "d": gdi})
        nd = pairs.drop_duplicates().groupby("g", as_index=False).size()
        return pa.table({"g": pa.array(nd["g"].to_numpy(np.int64)),
                         "nd": pa.array(nd["size"].to_numpy(np.int64))})

    partials = docs.map_batches(gram_doc_partial, batch_format="pyarrow")
    counts = _combine_partials(partials, ["g"], ["nd"], cap=5_000_000)
    if counts is None:  # pragma: no cover - gram domain past the cap
        summed = partials.groupby("g").sum("nd").to_pandas()
        counts = summed.rename(columns={"sum(nd)": "nd"})
    nd = counts["nd"].to_numpy(np.int64)
    bkt = np.select([nd == 1, nd == 2, nd <= 10, nd <= 100],
                    [0, 1, 2, 3], default=4)
    g = (pd.DataFrame({"df_bucket": bkt.astype(np.int64),
                       "n_shingles": np.int64(1)})
         .groupby("df_bucket", as_index=False).sum())
    g = g.sort_values("df_bucket").reset_index(drop=True)
    tot = int(g["n_shingles"].sum())
    g["share6"] = (g["n_shingles"].astype(np.int64) * 10**6 // tot)
    return g.astype({"df_bucket": np.int64, "n_shingles": np.int64,
                     "share6": np.int64})



def q_canonical_collisions(sf_dir: str):
    """Frontier inflation from URL spelling variants: over the messy
    fixture, how many RAW spellings collapse to the same canonical
    form after normalization — the quantified version of the problem
    url_normalize exists to solve (one page entering the URL-seen set
    under several spellings burns seen-set memory AND politeness
    budget). The distinct count runs through the exact pair-bucket
    plane (stages/aggregates.count_distinct); 3-integer close."""
    from ...functions.urls import normalize_urls
    from ...stages.aggregates import count_distinct

    docs = _pq(sf_dir, "documents", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        urls = np.empty(len(ids), dtype=object)
        for j, d in enumerate(ids):
            m = d % 4
            if m == 0:
                urls[j] = ("HTTPS://WWW.MixUp.COM.MX:443/Mixup/"
                           f"detproducto.aspx?sku={d}#ref")
            elif m == 1:
                urls[j] = (f"https://www.synthd1.mx:8080/shop/"
                           f"Home.aspx#frag{d}")
            elif m == 2:
                urls[j] = f"HTTP://News.Site.MX:80#top{d}"
            else:
                urls[j] = f"https://shop.example.mx/p?q={d}"
        return pa.table({"url": pa.array(urls, pa.string())})

    ds = docs.map_batches(build, batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "k": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "u": normalize_urls(t.column("url"))}),
        batch_format="pyarrow")
    n_raw = _doc_count(sf_dir)
    nd = count_distinct(ds, key_col="k", value_col="u").to_pandas()
    n_canon = int(nd["n_distinct"].iloc[0]) if len(nd) else 0
    return pd.DataFrame({
        "n_raw": [np.int64(n_raw)],
        "n_canonical": [np.int64(n_canon)],
        "inflation6": [np.int64((n_raw - n_canon) * 10**6 // n_raw
                               if n_raw else 0)]})
