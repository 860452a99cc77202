"""Text statistics, corpus hygiene and language modeling — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403



# ---------------------------------------------------------------------------
# training-data ops
# ---------------------------------------------------------------------------

def q_text_quality(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(text_quality, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.select(
            ["doc_id", "n_chars_q", "n_words", "n_punct", "n_digit", "n_upper", "quality_keep"]
        ),
        batch_format="pyarrow",
    )



def q_token_counts(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(token_counts, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "ws_tokens", "bpe_tokens"]), batch_format="pyarrow"
    )



def q_lang_guess(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(lang_id, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "lang_guess"]), batch_format="pyarrow"
    )



def q_fingerprint(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(fingerprint, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    )





def q_doc_frequency(sf_dir: str):
    """Document frequency + smoothed IDF per term over the documents
    table (min_df=2) — the broadcastable global half of TF-IDF."""
    from ...stages.aggregates import doc_frequency

    docs = _pq(sf_dir, "documents", columns=["text"], num_blocks=_n_cpus())
    return doc_frequency(docs, col="text", min_df=2)



def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 word bigrams (count desc, bigram asc) — the
    n-gram LM / boilerplate-detection primitive. Per-batch vectorized
    bigram counts shuffle a vocabulary-sized partial stream into a
    distributed sum; the top-k is per-block partial top-k merged on the
    driver (blocks × k rows), never a full sort."""
    docs = _pq(sf_dir, "documents", columns=["text"], num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pandas().fillna("")
        toks = texts.str.lower().str.findall(r"\w+")
        flat_l: list = []
        for ws in toks:
            flat_l.extend(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)
            )
        if not flat_l:
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        vc = pd.Series(flat_l, dtype=object).value_counts()
        return pd.DataFrame({"bigram": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(np.int64)})

    partials = docs.map_batches(partial, batch_format="pyarrow")
    combined = _combine_partials(partials, ["bigram"], ["n"], cap=200_000)
    if combined is None:  # pragma: no cover - Heaps-law vocab past the cap
        summed = partials.groupby("bigram").sum("n")

        def block_topk(t: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "bigram": t.column("bigram").to_pandas().astype(object),
                    "n": t.column("sum(n)").to_pandas().astype(np.int64),
                }
            )
            return df.sort_values(
                ["n", "bigram"], ascending=[False, True]
            ).head(20)

        combined = summed.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = combined.sort_values(["n", "bigram"], ascending=[False, True]).head(20)
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)



def q_decontaminate(sf_dir: str):
    """Benchmark n-gram decontamination — the training-data hygiene pass
    (flag corpus docs sharing any word n-gram with an eval benchmark;
    the GPT-3/PaLM 8-13-gram rule, n=3 here so the small-vocab synthetic
    corpus produces a non-degenerate hit rate).

    Scale shape: the benchmark side is TINY by definition (eval sets,
    not corpora), so its distinct-gram set broadcasts once via ray.put
    and the 100 TB corpus is scanned exactly ONCE, map-only — grams
    travel as 64-bit rolling hashes (:func:`_word_ngram_hashes`, identity
    only), the broadcast set is a zero-copy sorted uint64 array, the
    probe is one ``searchsorted``, and the per-source flag counts are
    bounded partials combined on the driver."""
    n = 3
    docs = _pq(sf_dir, "documents", columns=["doc_id", "source", "text"],
               num_blocks=_n_cpus())

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        mask = ids % 97 == 0
        if not mask.any():
            return pa.table({"g": pa.array([], type=pa.int64())})
        texts = t.column("text").to_pandas()[mask].reset_index(drop=True)
        flat, di = _flat_tokens(texts)
        grams, _ = _word_ngram_hashes(flat, di, n)
        return pa.table({"g": pa.array(np.unique(grams), type=pa.int64())})

    bench = np.unique(
        np.concatenate(
            [b["g"].to_numpy(np.int64) for b in
             docs.map_batches(bench_grams, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    bench_ref = ray.put(bench)

    def flag_partial(t: pa.Table) -> pd.DataFrame:
        bg = ray.get(bench_ref)  # primitive uint64 → zero-copy view
        ids = t.column("doc_id").to_numpy()
        keep = ids % 97 != 0  # benchmark docs are not corpus candidates
        texts = t.column("text").to_pandas()[keep].reset_index(drop=True)
        src = t.column("source").to_pandas()[keep].reset_index(drop=True)
        flat, di = _flat_tokens(texts)
        grams, gdi = _word_ngram_hashes(flat, di, n)
        hit = np.zeros(len(texts), dtype=bool)
        hit[np.unique(gdi[_in_sorted(grams, bg)])] = True
        out = pd.DataFrame({"source": src, "hit": hit.astype(np.int64)})
        agg = out.groupby("source", as_index=False).agg(
            n_docs=("hit", "size"), n_contaminated=("hit", "sum")
        )
        return agg

    partials = docs.map_batches(flag_partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["source"], ["n_docs", "n_contaminated"])
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_contaminated"] = out["n_contaminated"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)



def q_unigram_logprob(sf_dir: str):
    """Corpus-LM quality score: per-document mean log2 probability of
    its tokens under the corpus unigram model — the classic cheap
    perplexity filter for training-data curation.

    Two passes, zero shuffles: (1) vocabulary counts as per-batch
    partials combined on the driver (Heaps' law keeps even a 100 TB
    corpus's vocabulary in the low millions — the broadcast IS the
    algorithm, the cap + distributed-compaction fallback guards
    pathology); (2) a map-only scoring scan — searchsorted lookup into
    the broadcast (word -> log2 p) arrays, segmented reduceat mean."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def count_partial(t: pa.Table) -> pd.DataFrame:
        flat, _ = _flat_tokens(t.column("text").to_pandas())
        if len(flat) == 0:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.int64)})
        vc = pd.Series(flat, dtype=object).value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy(np.int64)})

    partials = docs.map_batches(count_partial, batch_format="pyarrow")
    vocab = _combine_partials(partials, ["w"], ["c"], cap=2_000_000)
    if vocab is None:  # pragma: no cover - vocab past the broadcast cap
        summed = partials.groupby("w").sum("c")
        vocab = summed.to_pandas().rename(columns={"sum(c)": "c"})
    vocab = vocab.sort_values("w").reset_index(drop=True)
    total = float(vocab["c"].sum())
    lm_ref = ray.put(
        (vocab["w"].to_numpy(dtype=object),
         np.log2(vocab["c"].to_numpy(np.float64) / total))
    )

    def score(t: pa.Table) -> pd.DataFrame:
        words, logp = ray.get(lm_ref)
        texts = t.column("text").to_pandas()
        flat, di = _flat_tokens(texts)
        lens = np.bincount(di, minlength=len(texts)).astype(np.int64)
        vals = logp[np.searchsorted(words, flat)]
        starts = np.zeros(len(texts), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        nz = lens > 0
        sums = np.zeros(len(texts))
        sums[nz] = np.add.reduceat(vals, starts[nz]) if nz.any() else 0.0
        avg = np.where(nz, sums / np.maximum(lens, 1), np.nan)
        return pd.DataFrame(
            {
                "doc_id": t.column("doc_id").to_numpy()[nz],
                "n_tokens": lens[nz],
                "avg_logprob": round_half_away(avg[nz], 6),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")



def q_repeated_ngrams(sf_dir: str, cap: int = 5_000_000):
    """Substring-level duplication signal (the cheap cousin of
    suffix-array dedup from 'Deduplicating Training Data Makes Language
    Models Better'): per document, how many of its word 5-grams occur in
    at least one OTHER document.

    Pass 1 counts distinct-docs-per-gram as per-batch partials (a doc's
    text lives in one row, so per-batch distinct doc counts SUM exactly
    across batches) combined under a cap; the duplicated-gram set
    broadcasts and pass 2 is a map-only probe (np.isin + reduceat),
    emitting one row per doc with no driver materialization. Past the
    cap the gram counts fall back to a distributed groupby + inner join
    against the gram stream. Grams travel as 64-bit rolling hashes
    (:func:`_word_ngram_hashes`) — identity only, never output — so the
    broadcast dup set is a zero-copy uint64 array and the probe is one
    ``searchsorted``, not an object-dtype ``np.isin`` re-sort per task."""
    n = 5
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
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
    if counts is None:  # gram domain past the broadcast cap
        summed = partials.groupby("g").sum("nd")
        dup = summed.map_batches(
            lambda t: t.filter(pc.greater(t.column("sum(nd)"), 1))
            .select(["g"]),
            batch_format="pyarrow",
        )

        def gram_rows(t: pa.Table) -> pa.Table:
            flat, di = _flat_tokens(t.column("text").to_pandas())
            grams, gdi = _word_ngram_hashes(flat, di, n)
            return pa.table(
                {
                    "doc_id": pa.array(t.column("doc_id").to_numpy()[gdi]),
                    "g": pa.array(grams, type=pa.int64()),
                }
            )

        grams_ds = docs.map_batches(gram_rows, batch_format="pyarrow")
        hits = grams_ds.join(
            dup, join_type="left_semi",
            num_partitions=_shuffle_partitions(_row_count(sf_dir, "documents")),
            on=("g",),
        )
        dup_counts = hits.groupby("doc_id").count()
        totals = grams_ds.groupby("doc_id").count()
        merged = totals.join(
            dup_counts, join_type="left_outer", num_partitions=4,
            on=("doc_id",), right_suffix="_dup",
        ).to_pandas()
        merged = merged.rename(
            columns={"count()": "n_grams", "count()_dup": "n_dup"}
        )
        merged["n_dup"] = merged["n_dup"].fillna(0).astype(np.int64)
        merged["n_grams"] = merged["n_grams"].astype(np.int64)
        return merged.sort_values("doc_id").reset_index(drop=True)

    dup_set = np.sort(counts.loc[counts["nd"] > 1, "g"].to_numpy(np.int64))
    dup_ref = ray.put(dup_set)

    def probe(t: pa.Table) -> pd.DataFrame:
        dg = ray.get(dup_ref)  # primitive uint64 → zero-copy view
        flat, di = _flat_tokens(t.column("text").to_pandas())
        grams, gdi = _word_ngram_hashes(flat, di, n)
        n_rows = t.num_rows
        n_grams = np.bincount(gdi, minlength=n_rows).astype(np.int64)
        hit = _in_sorted(grams, dg)
        n_dup = np.bincount(gdi[hit], minlength=n_rows).astype(np.int64)
        keep = n_grams > 0  # docs shorter than n emit no gram rows in SQL
        return pd.DataFrame(
            {
                "doc_id": t.column("doc_id").to_numpy()[keep],
                "n_grams": n_grams[keep],
                "n_dup": n_dup[keep],
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow").sort("doc_id")



def q_source_vocab(sf_dir: str):
    """Type-token profile per corpus source: total tokens and DISTINCT
    vocabulary size — the lexical-diversity screen of a training-data
    quality pass. Per-batch (source, token) count partials combine
    under a cap (vocabulary-sized stream); past it the fallback is ONE
    hash-bucket shuffle on the composite key with in-bucket dedup
    (globally exact — a pair lands in one bucket) and a
    source-bounded count combine."""
    from ...stages.temporal import _with_bucket

    docs = _pq(sf_dir, "documents", columns=["source", "text"],
               num_blocks=_n_cpus())

    def pair_counts(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        src = t.column("source").to_numpy(zero_copy_only=False)[di]
        df = pd.DataFrame({"source": src, "tok": flat})
        out = df.groupby(["source", "tok"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    pairs = docs.map_batches(pair_counts, batch_format="pyarrow")
    comb = _combine_partials(pairs, ["source", "tok"], ["n"], cap=5_000_000)
    if comb is not None:
        out = comb.groupby("source", as_index=False).agg(
            n_tokens=("n", "sum"), n_vocab=("tok", "size")
        )
    else:  # pragma: no cover - >5M (source, token) vocabulary regime
        def add_key(t: pa.Table) -> pa.Table:
            k = (t.column("source").to_pandas().astype(str) + "|"
                 + t.column("tok").to_pandas().astype(str))
            return t.append_column("__k", pa.array(k, pa.string()))

        def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
            d = g.groupby(["source", "tok"], as_index=False)["n"].sum()
            return d.groupby("source", as_index=False).agg(
                n_tokens=("n", "sum"), n_vocab=("tok", "size")
            )

        per_bucket = (
            _with_bucket(pairs.map_batches(add_key, batch_format="pyarrow"),
                         "__k", 64)
            .groupby("__bucket")
            .map_groups(bucket_stats, batch_format="pandas")
        )
        out = _combine_partials(per_bucket, ["source"],
                                ["n_tokens", "n_vocab"])
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["n_vocab"] = out["n_vocab"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)



def q_bigram_lift(sf_dir: str):
    """Collocation mining: top-20 bigrams (count >= 5) by LIFT
    P(xy)/(P(x)P(y)) — the PMI ranking with the log dropped so the score
    is CLOSED OVER EXACT INTEGERS (floor-scaled to 1e6; libm log ulp
    differences can't cross the hash gate). One pass emits unigram and
    bigram count partials together (kind-tagged rows); the vocabulary-
    sized combine runs under a cap, and past it the bigram counts stay a
    distributed groupby with the unigram map broadcast (unigram vocab ≪
    bigram vocab by Heaps' law) and a per-block partial top-k."""
    docs = _pq(sf_dir, "documents", columns=["text"], num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pandas().fillna("")
        toks = texts.str.lower().str.findall(r"\w+")
        uni: list = []
        bi: list = []
        for ws in toks:
            uni.extend(ws)
            bi.extend(ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1))
        frames = []
        if uni:
            vc = pd.Series(uni, dtype=object).value_counts()
            frames.append(pd.DataFrame({
                "gram": vc.index.to_numpy(dtype=object), "kind": "u",
                "n": vc.to_numpy(np.int64)}))
        if bi:
            vc = pd.Series(bi, dtype=object).value_counts()
            frames.append(pd.DataFrame({
                "gram": vc.index.to_numpy(dtype=object), "kind": "b",
                "n": vc.to_numpy(np.int64)}))
        if not frames:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "kind": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    partials = docs.map_batches(partial, batch_format="pyarrow")
    counts = _combine_partials(partials, ["gram", "kind"], ["n"],
                               cap=1_000_000)

    def lift_rows(bg: pd.DataFrame, ucnt: dict, n_u: int, n_b: int
                  ) -> pd.DataFrame:
        bg = bg[bg["n"] >= 5]
        lifts, grams, ns = [], [], []
        for g, c_xy in zip(bg["gram"], bg["n"]):
            x, y = g.split(" ", 1)
            c_x, c_y = ucnt.get(x, 0), ucnt.get(y, 0)
            if not c_x or not c_y:
                continue
            lifts.append(int(c_xy) * n_u * n_u * 1_000_000
                         // (n_b * c_x * c_y))
            grams.append(g)
            ns.append(int(c_xy))
        return pd.DataFrame({"bigram": pd.Series(grams, dtype=object),
                             "n": pd.Series(ns, dtype=np.int64),
                             "lift6": pd.Series(lifts, dtype=np.int64)})

    if counts is not None:
        u = counts[counts["kind"] == "u"]
        ucnt = dict(zip(u["gram"], u["n"].astype(int)))
        n_u = int(u["n"].sum())
        bg = counts[counts["kind"] == "b"]
        n_b = int(bg["n"].sum())
        out = lift_rows(bg, ucnt, n_u, n_b)
    else:  # pragma: no cover - vocab past the driver cap
        from ray.data.aggregate import Sum

        summed = partials.groupby(["gram", "kind"]).aggregate(
            Sum("n", alias_name="n")
        )
        u = summed.filter(lambda r: r["kind"] == "u").to_pandas()
        ucnt = dict(zip(u["gram"], u["n"].astype(int)))
        n_u = int(u["n"].sum())
        n_b_row = summed.filter(lambda r: r["kind"] == "b").sum("n")
        n_b = int(n_b_row)
        uref = ray.put((ucnt, n_u, n_b))

        def block_topk(t: pa.Table) -> pd.DataFrame:
            ucnt_, n_u_, n_b_ = ray.get(uref)
            df = t.to_pandas()
            df = df[df["kind"] == "b"]
            r = lift_rows(df, ucnt_, n_u_, n_b_)
            return r.sort_values(["lift6", "bigram"],
                                 ascending=[False, True]).head(20)

        out = summed.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["lift6", "bigram"], ascending=[False, True]).head(20)
    out["n"] = out["n"].astype(np.int64)
    out["lift6"] = out["lift6"].astype(np.int64)
    return out.reset_index(drop=True)



def q_pii_scrub(sf_dir: str):
    """PII redaction sweep — the compliance pass every training corpus
    needs before release: vectorized regex detection + redaction of
    emails and phone numbers, reported as per-source counts and the
    exact post-redaction character volume.

    Scale shape: map-only over the streaming corpus (compiled patterns,
    pandas C string kernels — no per-row Python), per-batch per-source
    partials combined on the driver (bounded by source cardinality).
    The redacted TEXT itself would stream straight to a partitioned
    sink at production scale; the query returns the audit aggregate."""
    email_re = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone_re = r"555-[0-9]+"
    docs = _pii_docs(sf_dir)

    def scrub_partial(t: pa.Table) -> pd.DataFrame:
        text = t.column("text").to_pandas()
        src = t.column("source").to_pandas()
        n_emails = text.str.count(email_re)
        n_phones = text.str.count(phone_re)
        red = text.str.replace(email_re, "[PII]", regex=True).str.replace(
            phone_re, "[PII]", regex=True
        )
        out = pd.DataFrame(
            {
                "source": src,
                "n_docs": 1,
                "n_emails": n_emails.to_numpy(np.int64),
                "n_phones": n_phones.to_numpy(np.int64),
                "redacted_chars": red.str.len().to_numpy(np.int64),
            }
        )
        return out.groupby("source", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(scrub_partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "n_emails", "n_phones", "redacted_chars"],
    )
    for c in ["n_docs", "n_emails", "n_phones", "redacted_chars"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)



def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency fit over the corpus vocabulary: ln(freq) vs
    ln(rank) least-squares slope/intercept across the top-100 tokens —
    the one-number lexical-naturalness screen for synthetic or scraped
    text. Token-count partials combine under a vocabulary cap (past it
    the counts re-shuffle by hash(token) with per-bucket top-100
    partials — a pair of (freq, token) orders is global because each
    token lives in ONE bucket); the ln/regression close runs on ≤ 100
    driver rows."""
    from ...stages.temporal import _with_bucket

    docs = _pq(sf_dir, "documents", columns=["text"],
               num_blocks=_n_cpus())

    def counts(t: pa.Table) -> pd.DataFrame:
        flat, _ = _flat_tokens(t.column("text").to_pandas())
        df = pd.DataFrame({"tok": flat})
        out = df.groupby("tok", as_index=False).size()
        return out.rename(columns={"size": "n"})

    partials = docs.map_batches(counts, batch_format="pyarrow")

    def top100(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "tok"], ascending=[False, True])
        return df.head(100).reset_index(drop=True)

    comb = _combine_partials(partials, ["tok"], ["n"], cap=5_000_000)
    if comb is None:  # vocabulary past the cap: per-bucket exact top-100
        def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
            return top100(g.groupby("tok", as_index=False)["n"].sum())

        comb = (
            _with_bucket(partials, "tok", 64)
            .groupby("__bucket")
            .map_groups(bucket_top, batch_format="pandas")
        ).to_pandas()
    top = top100(comb)
    n = top["n"].to_numpy(np.float64)
    rnk = np.arange(1, len(top) + 1, dtype=np.float64)
    y, x = np.log(n), np.log(rnk)
    k = float(len(top))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    icept = sy / k - slope * sx / k
    return pd.DataFrame({
        "k": np.array([len(top)], dtype=np.int64),
        "zipf_slope": round_half_away(np.array([slope]), 6),
        "zipf_icept": round_half_away(np.array([icept]), 6),
    })



def q_lang_source_matrix(sf_dir: str):
    """Corpus composition cross-tab: document count and mean length per
    (lang, source) cell — the coverage matrix a data curator reads
    before setting corpus-mix weights. Map-only (lang × source)-bounded
    count/Σchars partials; single driver close."""
    docs = _pq(sf_dir, "documents",
               columns=["lang", "source", "n_chars"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas(),
            "source": t.column("source").to_pandas(),
            "n_docs": np.int64(1),
            "sum_chars": t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        return df.groupby(["lang", "source"], as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source"], ["n_docs", "sum_chars"],
    )
    return pd.DataFrame({
        "lang": out["lang"], "source": out["source"],
        "n_docs": out["n_docs"].astype(np.int64),
        "avg_chars": round_half_away(
            out["sum_chars"].to_numpy(np.float64)
            / out["n_docs"].to_numpy(np.float64), 6),
    }).sort_values(["lang", "source"]).reset_index(drop=True)



def q_vocab_coverage(sf_dir: str):
    """Tokenizer-budget coverage: with a vocabulary of the top-16
    corpus tokens (ties → token asc), what fraction of each source's
    token stream is in-vocab? The coverage table a tokenizer trainer
    reads before sizing a vocab. One vocabulary-bounded
    (source, token) partial combine feeds BOTH the global top-k cut
    and the per-source split — integer counts end-to-end, one rounded
    division per source."""
    K = 16
    docs = _pq(sf_dir, "documents", columns=["source", "text"],
               num_blocks=_n_cpus())

    def pair_counts(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        src = t.column("source").to_numpy(zero_copy_only=False)[di]
        df = pd.DataFrame({"source": src, "tok": flat, "c": np.int64(1)})
        return df.groupby(["source", "tok"], as_index=False).sum()

    st = _combine_partials(
        docs.map_batches(pair_counts, batch_format="pyarrow"),
        ["source", "tok"], ["c"],
    )
    glob = st.groupby("tok", as_index=False)["c"].sum().sort_values(
        ["c", "tok"], ascending=[False, True])
    vocab = set(glob["tok"].head(K))
    rows = []
    for src, g in st.groupby("source"):
        n = int(g["c"].sum())
        inv = int(g.loc[g["tok"].isin(vocab), "c"].sum())
        rows.append({
            "source": src, "n_tokens": np.int64(n),
            "in_vocab": np.int64(inv),
            "coverage": float(inv) / float(n)})
    df = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    df["coverage"] = round_half_away(df["coverage"].to_numpy(), 6)
    return df



def q_gopher_filter(sf_dir: str):
    """Gopher-style composite quality gate (the canonical LLM pretrain
    filter, Rae et al. 2021 §A1.1 adapted to this corpus): word count
    in [10, 10k], mean word length in [3, 10], symbol ratio < 0.1,
    ≥ 2 English stopwords, digit ratio < 0.2 — one map-only pass over
    the Arrow RE2 kernels (stages/textstats.py), with every ratio rule
    evaluated as an INTEGER cross-multiplication (word_chars ≥ 3·words,
    10·punct < chars, 5·digits < chars) so the verdict is exact on both
    engines. Emits per-rule fail flags + the keep bit — the audit
    breakdown a curation run reports, not just the survivor list."""
    from ...stages.textstats import _EN_STOP_RE, _count

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def flags(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_words = _count(txt, r"\w+")
        word_chars = n_chars - _count(txt, r"\W")
        n_punct = _count(txt, r"[^\w\s]")
        n_digit = _count(txt, r"[0-9]")
        n_stop = _count(pc.utf8_lower(txt), _EN_STOP_RE)
        f_words = (n_words < 10) | (n_words > 10_000)
        f_wlen = (word_chars < 3 * n_words) | (word_chars > 10 * n_words)
        f_sym = 10 * n_punct >= n_chars
        f_stop = n_stop < 2
        f_dig = 5 * n_digit >= n_chars
        keep = ~(f_words | f_wlen | f_sym | f_stop | f_dig)
        ints = lambda a: pa.array(a.astype(np.int64), pa.int64())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "fail_words": ints(f_words), "fail_wordlen": ints(f_wlen),
            "fail_symbol": ints(f_sym), "fail_stop": ints(f_stop),
            "fail_digit": ints(f_dig), "keep": ints(keep)})

    return docs.map_batches(flags, batch_format="pyarrow")



def q_token_fertility(sf_dir: str):
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word — the "how many subwords does this language cost" table that
    prices a multilingual vocab. Language-bounded count partials
    (exact integer Σbpe, Σws per lang), one rounded division each."""
    from ...stages.textstats import BPE_ISH, _count

    docs = _pq(sf_dir, "documents", columns=["lang", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(t.column("text"), "")
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas(),
            "ws": _count(txt, r"\S+"),
            "bpe": _count(txt, BPE_ISH),
            "n": np.int64(1)})
        return df.groupby("lang", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["ws", "bpe", "n"],
    ).sort_values("lang").reset_index(drop=True)
    return pd.DataFrame({
        "lang": out["lang"],
        "n_docs": out["n"].astype(np.int64),
        "ws_tokens": out["ws"].astype(np.int64),
        "bpe_tokens": out["bpe"].astype(np.int64),
        "fertility": round_half_away(
            out["bpe"].to_numpy(np.int64)
            / out["ws"].to_numpy(np.int64), 6)})



def q_lexical_richness(sf_dir: str):
    """Per-source lexical richness: type-token ratio and hapax (freq-1)
    share — the vocabulary-diversity screen a corpus-mix designer reads
    next to source_kl's drift score (template-generated spam has LOW
    TTR; scraped boilerplate has LOW hapax share). Same bounded
    (source, token) count partial as source_kl; ratios close as exact
    integer floors (×10⁶), so no float ever."""
    docs = _pq(sf_dir, "documents", columns=["source", "text"],
               num_blocks=_n_cpus())

    def pair_counts(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        src = t.column("source").to_numpy(zero_copy_only=False)[di]
        df = pd.DataFrame({"source": src, "tok": flat, "c": np.int64(1)})
        return df.groupby(["source", "tok"], as_index=False).sum()

    st = _combine_partials(
        docs.map_batches(pair_counts, batch_format="pyarrow"),
        ["source", "tok"], ["c"],
    )
    rows = []
    for src, g in st.groupby("source"):
        c = g["c"].to_numpy(np.int64)
        n_tok, n_typ = int(c.sum()), len(c)
        n_hapax = int((c == 1).sum())
        rows.append({
            "source": src, "n_tokens": np.int64(n_tok),
            "n_types": np.int64(n_typ), "n_hapax": np.int64(n_hapax),
            "ttr6": np.int64(n_typ * 1_000_000 // n_tok),
            "hapax6": np.int64(n_hapax * 1_000_000 // n_typ)})
    if not rows:
        return pd.DataFrame(columns=["source", "n_tokens", "n_types",
                                     "n_hapax", "ttr6", "hapax6"])
    return pd.DataFrame(rows).sort_values("source"
                                          ).reset_index(drop=True)



def q_trigram_entropy(sf_dir: str):
    """Character-trigram Shannon entropy per source (nats) — the
    boilerplate detector one level below lexical_richness: templated or
    machine-generated text reuses character sequences, so its trigram
    entropy sags even when its word-level TTR looks healthy. Trigrams
    extract VECTORIZED (one utf-8 buffer per batch, three shifted
    views, doc boundaries masked — no per-row loop); the partial is the
    (source, trigram) count grid, DOMAIN-bounded by charset³. Each
    distinct trigram's term c·ln(n/c) quantizes to 1e-6 before the
    exact integer sum (the source_kl move); H6 closes as q // n."""
    docs = _pq(sf_dir, "documents", columns=["source", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pylist()
        srcs = t.column("source").to_pandas().to_numpy()
        buf = np.frombuffer(
            "".join(tx.lower() for tx in texts).encode("utf-8"),
            dtype=np.uint8)
        lens = np.array([len(tx.encode("utf-8")) for tx in
                         (tx.lower() for tx in texts)], np.int64)
        if not len(buf) or lens.sum() == 0:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "tri": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64)})
        ends = np.cumsum(lens)
        starts = ends - lens
        # trigram start positions: all i with i+2 < doc_end
        n_tri = np.maximum(lens - 2, 0)
        di = np.repeat(np.arange(len(lens)), n_tri)
        pos = (np.arange(int(n_tri.sum()))
               - np.repeat(np.cumsum(n_tri) - n_tri, n_tri)
               + starts[di])
        tri = (buf[pos].astype(np.int64) * 65536
               + buf[pos + 1].astype(np.int64) * 256
               + buf[pos + 2].astype(np.int64))
        df = pd.DataFrame({"source": srcs[di], "tri": tri,
                           "c": np.int64(1)})
        return df.groupby(["source", "tri"], as_index=False).sum()

    grid = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "tri"], ["c"],
    )
    rows = []
    for src, g in grid.groupby("source"):
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        t6 = round_half_away(
            1e6 * c.astype(np.float64)
            * np.log(float(n) / c.astype(np.float64))).astype(np.int64)
        q = int((t6.astype(object)).sum())
        rows.append({"source": src, "n_trigrams": np.int64(n),
                     "n_distinct": np.int64(len(c)),
                     "h6": np.int64(_tdiv(q, n))})
    if not rows:
        return pd.DataFrame(columns=["source", "n_trigrams",
                                     "n_distinct", "h6"])
    return pd.DataFrame(rows).sort_values("source"
                                          ).reset_index(drop=True)



def q_chars_tokens_corr(sf_dir: str):
    """Per-source Pearson correlation between document char length and
    whitespace token count — the tokenizer sanity screen (a source
    whose chars and tokens decorrelate is full of unsegmented blobs or
    markup). Integer moment partials per source (bounded combine);
    each r closes with the assortativity expression tree — the only
    floats are the final casts/sqrts the oracle replicates."""
    docs = _pq(sf_dir, "documents",
               columns=["source", "text", "n_chars"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pandas()
        _, di = _flat_tokens(texts)
        tk = np.bincount(di, minlength=len(texts)).astype(np.int64)
        x = t.column("n_chars").to_numpy(zero_copy_only=False
                                         ).astype(np.int64)
        df = pd.DataFrame({
            "source": t.column("source").to_pandas().to_numpy(),
            "m": np.int64(1), "sx": x, "sy": tk, "sxy": x * tk,
            "sxx": x * x, "syy": tk * tk})
        return df.groupby("source", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["m", "sx", "sy", "sxy", "sxx", "syy"],
    )
    rows = []
    for r_ in out.itertuples():
        m, sx, sy = int(r_.m), int(r_.sx), int(r_.sy)
        sxy, sxx, syy = int(r_.sxy), int(r_.sxx), int(r_.syy)
        num = m * sxy - sx * sy
        vx, vy = m * sxx - sx * sx, m * syy - sy * sy
        corr = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        rows.append({"source": r_.source, "n_docs": np.int64(m),
                     "corr": round_half_away(np.array([corr]), 6)[0]})
    if not rows:
        return pd.DataFrame(columns=["source", "n_docs", "corr"])
    return pd.DataFrame(rows).sort_values("source"
                                          ).reset_index(drop=True)



def q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the engine's stopword-profile language ID
    (stages/textstats.lang_id — the fasttext-shaped stub) and the
    corpus ground-truth lang label: chance-corrected agreement, the
    honest version of raw accuracy when one language dominates. The
    partial is the bounded (lang × guess) confusion grid; po, pe and
    kappa close as exact unbounded-int arithmetic with kappa6 the
    ×1e6 trunc-div (N·Σdiag − Σrᵢcᵢ) / (N² − Σrᵢcᵢ) the oracle
    replicates in HUGEINT."""
    from ...stages.textstats import lang_id

    docs = _pq(sf_dir, "documents", columns=["lang", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        g = lang_id(t)
        df = pd.DataFrame({
            "lang": g.column("lang").to_pandas().to_numpy(),
            "guess": g.column("lang_guess").to_pandas().to_numpy(),
            "c": np.int64(1)})
        return df.groupby(["lang", "guess"], as_index=False).sum()

    grid = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "guess"], ["c"],
    )
    N = int(grid["c"].sum())
    diag = int(grid.loc[grid["lang"] == grid["guess"], "c"].sum())
    rows_t = grid.groupby("lang")["c"].sum()
    cols_t = grid.groupby("guess")["c"].sum()
    labels = set(rows_t.index) | set(cols_t.index)
    pe_num = sum(int(rows_t.get(lb, 0)) * int(cols_t.get(lb, 0))
                 for lb in labels)
    kappa6 = _tdiv((N * diag - pe_num) * 10**6, N * N - pe_num)
    return pd.DataFrame({
        "n": [np.int64(N)], "n_agree": [np.int64(diag)],
        "po6": [np.int64(diag * 10**6 // N)],
        "kappa6": [np.int64(kappa6)]})



def q_token_pmi(sf_dir: str):
    """Top-20 token pairs by pointwise mutual information over
    document co-occurrence (min support 10 docs) — the collocation
    detector one level above top_bigrams (PMI finds tokens that travel
    together anywhere in a doc, not just adjacent). The corpus
    vocabulary is bounded, so per-doc distinct-token pairs emit into a
    vocab²-bounded combine; PMI quantizes as
    round(1e6·log2(c_xy·N / (c_x·c_y))) — exact integer compare, ties
    broken lexicographically."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def pair_partial(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        df = pd.DataFrame({"d": di, "w": flat}).drop_duplicates()
        out_a, out_b = [], []
        for _, g in df.groupby("d"):
            ws = np.sort(g["w"].to_numpy())
            k = len(ws)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            out_a.append(ws[ii])
            out_b.append(ws[jj])
        if not out_a:
            return pd.DataFrame({
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "c": np.int64(1)}).groupby(["a", "b"],
                                       as_index=False).sum()

    def tok_partial(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        df = pd.DataFrame({"d": di, "w": flat}).drop_duplicates()
        return pd.DataFrame({"w": df["w"], "c": np.int64(1)}
                            ).groupby("w", as_index=False).sum()

    def doc_count(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"k": [np.int64(0)],
                             "n": [np.int64(t.num_rows)]})

    pairs = _combine_partials(
        docs.map_batches(pair_partial, batch_format="pyarrow"),
        ["a", "b"], ["c"])
    toks = _combine_partials(
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        ["w"], ["c"])
    N = int(_combine_partials(
        docs.map_batches(doc_count, batch_format="pyarrow"),
        ["k"], ["n"])["n"].sum())
    cof = dict(zip(toks["w"], toks["c"].astype(int)))
    p = pairs[pairs["c"] >= 10].copy()
    pmi = [int(round_half_away(np.array([
        1e6 * np.log2(int(c) * N / (cof[a] * cof[b]))]))[0])
        for a, b, c in zip(p["a"], p["b"], p["c"])]
    p["pmi6"] = np.array(pmi, dtype=np.int64) if len(p) else \
        pd.Series([], dtype=np.int64)
    p = p.sort_values(["pmi6", "a", "b"],
                      ascending=[False, True, True]).head(20)
    return pd.DataFrame({
        "a": p["a"].to_numpy(), "b": p["b"].to_numpy(),
        "n_docs": p["c"].to_numpy(np.int64),
        "pmi6": p["pmi6"].to_numpy(np.int64)}).reset_index(drop=True)



def q_bot_repetition(sf_dir: str):
    """Bot-signal screen: per event type, the share of consecutive
    same-user events that repeat the IDENTICAL (type, milliunit value)
    pair — organic users vary, replay bots don't. One user-hash bucket
    shuffle; inside each bucket a lexsort + one shifted compare
    (vectorized), leaving a 5-row (type, pairs, identical) combine."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_type", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        tu = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        v3 = np.rint(g["value"].to_numpy(np.float64) * 1000
                     ).astype(np.int64)
        o = np.lexsort((tu, uid))
        uid, et, v3 = uid[o], et[o], v3[o]
        same_user = uid[1:] == uid[:-1]
        ident = same_user & (et[1:] == et[:-1]) & (v3[1:] == v3[:-1])
        return pd.DataFrame({
            "event_type": et[1:][same_user],
            "n_pairs": np.int64(1),
            "n_identical": ident[same_user].astype(np.int64),
        }).groupby("event_type", as_index=False).sum()

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["event_type"], ["n_pairs", "n_identical"],
    ).sort_values("event_type")
    return pd.DataFrame({
        "event_type": g["event_type"].to_numpy(),
        "n_pairs": g["n_pairs"].to_numpy(np.int64),
        "n_identical": g["n_identical"].to_numpy(np.int64),
        "ident_share6": np.array(
            [int(a) * 10**6 // int(b) if int(b) else 0 for a, b in
             zip(g["n_identical"], g["n_pairs"])], np.int64),
    }).reset_index(drop=True)



def q_logprob_buckets(sf_dir: str):
    """LM-quality mix census: doc counts per (source, ⌊mean log2 token
    probability⌋) cell — the perplexity-bucket composition report a
    curation run reads before choosing per-source mixing weights.

    Same two zero-shuffle passes as unigram_logprob (vocabulary
    partials → broadcast LM; Heaps' law bounds the broadcast), then the
    scoring scan buckets each doc and pre-reduces to (source, bucket)
    count partials per batch — the close combines a few dozen cells.
    Bucketing floors the SAME round-to-6 value the unigram_logprob gate
    already proves equal on both sides, so the floor cannot straddle."""
    docs = _pq(sf_dir, "documents", columns=["text", "source"],
               num_blocks=_n_cpus())

    def count_partial(t: pa.Table) -> pd.DataFrame:
        flat, _ = _flat_tokens(t.column("text").to_pandas())
        if len(flat) == 0:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.int64)})
        vc = pd.Series(flat, dtype=object).value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "c": vc.to_numpy(np.int64)})

    partials = docs.map_batches(count_partial, batch_format="pyarrow")
    vocab = _combine_partials(partials, ["w"], ["c"], cap=2_000_000)
    if vocab is None:  # pragma: no cover - vocab past the broadcast cap
        summed = partials.groupby("w").sum("c")
        vocab = summed.to_pandas().rename(columns={"sum(c)": "c"})
    vocab = vocab.sort_values("w").reset_index(drop=True)
    total = float(vocab["c"].sum())
    lm_ref = ray.put(
        (vocab["w"].to_numpy(dtype=object),
         np.log2(vocab["c"].to_numpy(np.float64) / total))
    )

    def score(t: pa.Table) -> pd.DataFrame:
        words, logp = ray.get(lm_ref)
        texts = t.column("text").to_pandas()
        flat, di = _flat_tokens(texts)
        lens = np.bincount(di, minlength=len(texts)).astype(np.int64)
        vals = logp[np.searchsorted(words, flat)]
        starts = np.zeros(len(texts), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        nz = lens > 0
        sums = np.zeros(len(texts))
        sums[nz] = np.add.reduceat(vals, starts[nz]) if nz.any() else 0.0
        avg = sums[nz] / lens[nz]
        b = np.floor(round_half_away(avg, 6)).astype(np.int64)
        src = t.column("source").to_numpy(zero_copy_only=False)[nz]
        return (pd.DataFrame({"source": src, "bucket": b})
                .groupby(["source", "bucket"], sort=False).size()
                .reset_index(name="n_docs"))

    out = _combine_partials(docs.map_batches(score, batch_format="pyarrow"),
                            ["source", "bucket"], ["n_docs"])
    out = out.sort_values(["source", "bucket"]).reset_index(drop=True)
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out[["source", "bucket", "n_docs"]]



def q_gate_bias_matrix(sf_dir: str):
    """Language-bias audit of the Gopher quality gate: per language,
    how many docs pass the composite filter and how many fail the
    ENGLISH-stopword rule specifically — the known failure mode of
    English-centric gates on multilingual corpora (they silently
    depress non-English keep rates; this matrix is the number a
    curation review reads before applying per-language thresholds).
    Same integer cross-multiplication flags as gopher_filter, rolled
    up to a language-bounded partial combine."""
    from ...stages.textstats import _EN_STOP_RE, _count

    docs = _pq(sf_dir, "documents", columns=["text", "lang"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(t.column("text"), "")
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_words = _count(txt, r"\w+")
        word_chars = n_chars - _count(txt, r"\W")
        n_punct = _count(txt, r"[^\w\s]")
        n_digit = _count(txt, r"[0-9]")
        n_stop = _count(pc.utf8_lower(txt), _EN_STOP_RE)
        f_words = (n_words < 10) | (n_words > 10_000)
        f_wlen = (word_chars < 3 * n_words) | (word_chars > 10 * n_words)
        f_sym = 10 * n_punct >= n_chars
        f_stop = n_stop < 2
        f_dig = 5 * n_digit >= n_chars
        keep = ~(f_words | f_wlen | f_sym | f_stop | f_dig)
        return (pd.DataFrame({
            "lang": t.column("lang").to_numpy(zero_copy_only=False),
            "n_docs": np.int64(1),
            "n_keep": keep.astype(np.int64),
            "n_fail_stop": f_stop.astype(np.int64)})
            .groupby("lang", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["n_docs", "n_keep", "n_fail_stop"])
    g = g.sort_values("lang").reset_index(drop=True)
    g["keep_share6"] = (g["n_keep"].astype(np.int64) * 10**6
                        // g["n_docs"].astype(np.int64))
    return g.astype({"n_docs": np.int64, "n_keep": np.int64,
                     "n_fail_stop": np.int64, "keep_share6": np.int64})[
        ["lang", "n_docs", "n_keep", "n_fail_stop", "keep_share6"]]



def q_lang_confusion_matrix(sf_dir: str):
    """Full language-ID confusion matrix (true lang × guess) with
    per-true-language recall shares — the detailed eval behind
    langid_kappa's single chance-corrected number: which languages the
    stopword-profile classifier actually confuses, and in which
    direction. Bounded (lang × guess) count partials; integer-floor
    row shares."""
    from ...stages.textstats import lang_id

    docs = _pq(sf_dir, "documents", columns=["lang", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        g = lang_id(t)
        return (pd.DataFrame({
            "lang": g.column("lang").to_pandas().to_numpy(),
            "guess": g.column("lang_guess").to_pandas().to_numpy(),
            "n": np.int64(1)})
            .groupby(["lang", "guess"], as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "guess"], ["n"])
    tot = g.groupby("lang")["n"].transform("sum")
    g["row_share6"] = (g["n"].astype(np.int64) * 10**6
                       // tot.astype(np.int64))
    g = g.sort_values(["lang", "guess"]).reset_index(drop=True)
    return g.astype({"n": np.int64, "row_share6": np.int64})[
        ["lang", "guess", "n", "row_share6"]]



def q_usable_tokens_by_source(sf_dir: str):
    """Post-gate token budget per feed: of each source's whitespace
    tokens, how many survive the Gopher quality gate — THE number a
    mixture plan allocates against (raw token counts overstate feeds
    full of filtered boilerplate). One fused map pass (gate flags +
    token count share the same Arrow RE2 scans, no second read);
    source-bounded partials; integer-floor share."""
    from ...stages.textstats import _EN_STOP_RE, _count

    docs = _pq(sf_dir, "documents", columns=["text", "source"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(t.column("text"), "")
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_words = _count(txt, r"\w+")
        word_chars = n_chars - _count(txt, r"\W")
        n_punct = _count(txt, r"[^\w\s]")
        n_digit = _count(txt, r"[0-9]")
        n_stop = _count(pc.utf8_lower(txt), _EN_STOP_RE)
        ws = _count(txt, r"\S+")
        keep = ~((n_words < 10) | (n_words > 10_000)
                 | (word_chars < 3 * n_words)
                 | (word_chars > 10 * n_words)
                 | (10 * n_punct >= n_chars)
                 | (n_stop < 2)
                 | (5 * n_digit >= n_chars))
        return (pd.DataFrame({
            "source": t.column("source").to_numpy(zero_copy_only=False),
            "n_docs": np.int64(1),
            "n_kept": keep.astype(np.int64),
            "tokens_total": ws.astype(np.int64),
            "tokens_kept": (ws * keep).astype(np.int64)})
            .groupby("source", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "n_kept", "tokens_total", "tokens_kept"])
    g = g.sort_values("source").reset_index(drop=True)
    g["kept_share6"] = (g["tokens_kept"].astype(np.int64) * 10**6
                        // g["tokens_total"].astype(np.int64))
    return g.astype({c: np.int64 for c in
                     ["n_docs", "n_kept", "tokens_total", "tokens_kept",
                      "kept_share6"]})[
        ["source", "n_docs", "n_kept", "tokens_total", "tokens_kept",
         "kept_share6"]]



def q_gate_length_bias(sf_dir: str):
    """Length-bias audit of the Gopher gate: keep rate by document
    length bucket (256-char bins, capped at 15) — the companion to
    gate_bias_matrix's language axis: composite gates systematically
    drop short docs (word-count floor) and the bin curve shows exactly
    where the cliff sits. Same integer flag kernel; bin-bounded
    combine."""
    from ...stages.textstats import _EN_STOP_RE, _count

    docs = _pq(sf_dir, "documents", columns=["text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(t.column("text"), "")
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_words = _count(txt, r"\w+")
        word_chars = n_chars - _count(txt, r"\W")
        n_punct = _count(txt, r"[^\w\s]")
        n_digit = _count(txt, r"[0-9]")
        n_stop = _count(pc.utf8_lower(txt), _EN_STOP_RE)
        keep = ~((n_words < 10) | (n_words > 10_000)
                 | (word_chars < 3 * n_words)
                 | (word_chars > 10 * n_words)
                 | (10 * n_punct >= n_chars)
                 | (n_stop < 2)
                 | (5 * n_digit >= n_chars))
        return (pd.DataFrame({
            "len_bucket": np.minimum(n_chars // 256, 15),
            "n_docs": np.int64(1),
            "n_keep": keep.astype(np.int64)})
            .groupby("len_bucket", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["len_bucket"], ["n_docs", "n_keep"])
    g = g.sort_values("len_bucket").reset_index(drop=True)
    g["keep_share6"] = (g["n_keep"].astype(np.int64) * 10**6
                        // g["n_docs"].astype(np.int64))
    return g.astype({"len_bucket": np.int64, "n_docs": np.int64,
                     "n_keep": np.int64, "keep_share6": np.int64})



def q_most_duplicated_docs(sf_dir: str):
    """Template-spam shortlist: the 20 documents with the highest
    duplicated-5-gram share (ties to the smaller doc_id) — the
    actionable tail of repeated_ngrams' per-doc signal, the docs a
    curation pass eyeballs first. Chains the same dup-set probe into a
    per-block partial top-k (≤ blocks × 20 rows gather) — no full-doc
    ranking ever materializes."""
    per_doc = q_repeated_ngrams(sf_dir)

    def topk_partial(t: pa.Table) -> pd.DataFrame:
        ng = t.column("n_grams").to_numpy(zero_copy_only=False)
        nd = t.column("n_dup").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        share = nd * 10**6 // np.maximum(ng, 1)
        top = np.lexsort((ids, -share))[:20]
        return pd.DataFrame({
            "doc_id": ids[top].astype(np.int64),
            "n_grams": ng[top].astype(np.int64),
            "n_dup": nd[top].astype(np.int64),
            "dup_share6": share[top].astype(np.int64)})

    parts = pd.concat(
        list(per_doc.map_batches(topk_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    parts = parts.sort_values(["dup_share6", "doc_id"],
                              ascending=[False, True]).head(20)
    return parts.reset_index(drop=True).astype(
        {c: np.int64 for c in parts.columns})



def q_lead_words(sf_dir: str):
    """Template-opener audit: the 20 most common document FIRST words
    with corpus share — near-identical openers across a feed are the
    cheapest template-spam tell (the 5-gram dup machinery finds the
    bodies; this finds the headline pattern). Map-only first-token
    extraction (one Arrow split per batch), vocabulary-bounded
    combine, exact-integer shares, ties to the lexicographically
    smaller word."""
    docs = _pq(sf_dir, "documents", columns=["text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pandas().fillna("")
        first = texts.str.split(n=1).str[0].fillna("")
        vc = first[first != ""].value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(np.int64)})

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["word"], ["n"])
    tot = int(g["n"].sum())
    g = g.sort_values(["n", "word"],
                      ascending=[False, True]).head(20).reset_index(
        drop=True)
    g["share6"] = (g["n"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n": np.int64, "share6": np.int64})[
        ["word", "n", "share6"]]



def q_vocab_growth(sf_dir: str):
    """Heaps'-law measurement: vocabulary size after 10/25/50/100 % of
    the corpus (by doc_id order) — the growth curve behind the
    'vocabulary stays broadcastable at 100 TB' claim the LM/vocab
    broadcasts rely on (unigram_logprob, doc_frequency), measured
    instead of asserted. ONE pass: each token's MINIMUM doc_id
    (vocab-bounded (token, min) partials, driver min-combine); each
    prefix's vocabulary is then a searchsorted count — no second
    scan."""
    n_docs = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        flat, di = _flat_tokens(t.column("text").to_pandas())
        if not len(flat):
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "mn": pd.Series([], dtype=np.int64)})
        ids = (t.column("doc_id").to_numpy(zero_copy_only=False)
               .astype(np.int64))[di]
        df = pd.DataFrame({"tok": flat, "mn": ids})
        return df.groupby("tok", as_index=False)["mn"].min()

    # incremental min-compaction: the gather never holds more than
    # ~2 compaction windows of (token, min) rows (vocab-bounded by
    # Heaps' law — the very claim this query measures)
    acc: pd.DataFrame | None = None
    pending: list[pd.DataFrame] = []
    pend_rows = 0
    for b in docs.map_batches(partial, batch_format="pyarrow")                  .iter_batches(batch_size=65536, batch_format="pandas"):
        pending.append(b)
        pend_rows += len(b)
        if pend_rows >= 500_000:
            chunk = pd.concat(([acc] if acc is not None else [])
                              + pending, ignore_index=True)
            acc = chunk.groupby("tok", as_index=False)["mn"].min()
            pending, pend_rows = [], 0
    toks = pd.concat(([acc] if acc is not None else []) + pending,
                     ignore_index=True)
    mins = toks.groupby("tok")["mn"].min().to_numpy(np.int64)
    mins.sort()
    rows = []
    for pct in (10, 25, 50, 100):
        thr = n_docs * pct // 100
        rows.append({"pct": pct, "n_docs": thr,
                     "vocab": int(np.searchsorted(mins, thr))})
    return pd.DataFrame(rows).astype({"pct": np.int64,
                                      "n_docs": np.int64,
                                      "vocab": np.int64})



def q_doc_length_quantiles(sf_dir: str):
    """Per-language document-length norms: exact p50/p90 of n_chars
    per lang (quantile_cont semantics) — the length-prior a curation
    pass consults before setting per-language truncation or minimum
    thresholds (gate_length_bias shows the gate's length cliff; this
    shows where each language's mass actually sits). Same one-shuffle
    multi-key segment kernel as group_quantiles."""
    from ...stages.aggregates import group_quantiles

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"],
               num_blocks=_n_cpus())
    out = group_quantiles(docs, key_col="lang", value_col="n_chars",
                          qs=(0.5, 0.9))
    if isinstance(out, rd.Dataset):
        out = out.to_pandas()
    return out.sort_values("lang").reset_index(drop=True)
