"""Driver-gate query implementations (SURVEY §2 coverage), one callable
per operator family, each paired with a DuckDB oracle in
``__ray_entry__.oracle_sql``.

Every callable takes ``sf_dir`` and returns a Dataset / DataFrame /
Arrow table whose column NAMES match the oracle SQL exactly (the driver
sorts columns by name before hashing). Floating-point outputs that
involve accumulation are rounded to 6 decimals on BOTH sides so IEEE
summation-order noise cannot flip the hash.

None of these call ``ray.init`` — the driver owns the session.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ...config import MIXUP, CrawlConfig
from ...functions.numeric import round_half_away
from ...functions.urls import md5_hex_arrow, md5_hex_many
from ...stages.candidates import CandidateFilter
from ...stages.dedup import MinHasher, exact_dedup, jaccard, minhash_lsh_dedup, add_simhash
from ...stages.extract import parse_items
from ...stages.similarity import brute_force_topk, ivf_topk, lsh_topk
from ...stages.textstats import fingerprint, lang_id, text_quality, token_counts
from ...state.checkpoint import CheckpointStore
from ..derived import derive_corpus, derived_profile, url_of
from ..crawl import run_crawl



def _pq(sf_dir: str, name: str, columns=None, num_blocks: int | None = None) -> rd.Dataset:
    """Pruned-column parquet read. ``num_blocks`` pins the block count to
    the intended task parallelism: Ray's default split of a single file
    (64 blocks) makes every downstream sort/groupby pay per-block
    scheduling overhead far beyond the CPU count — shuffle-heavy queries
    pass ``_n_cpus()`` here (measured 2.6× on the as-of join)."""
    return rd.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns,
        override_num_blocks=num_blocks,
    )



def _n_cpus() -> int:
    return max(4, int(ray.cluster_resources().get("CPU", 8)))



def _from_arrow_sliced(table: pa.Table, n_slices: int = 4) -> rd.Dataset:
    """Driver-side Arrow table → Dataset of ≥ ``n_slices`` zero-copy
    blocks, so a downstream actor pool (min concurrency 2) actually
    receives parallel input at gate scale — `rd.from_arrow(table)` makes
    ONE monolithic block that starves all but one actor."""
    step = max(1, -(-table.num_rows // n_slices))
    slices = [table.slice(o, step) for o in range(0, max(table.num_rows, 1), step)]
    return rd.from_arrow(slices)



def _gather_capped(
    ds: rd.Dataset, cap: int = 2_000_000
) -> pd.DataFrame | None:
    """Stream a (filtered, projected) Dataset to ONE driver frame,
    bailing to None the moment it exceeds ``cap`` rows — the plan-choice
    primitive behind the broadcast fast paths: a bounded build side
    gathers once and broadcasts into the fact scan (zero shuffles),
    while past the cap the caller's distributed join/shuffle plan runs
    instead. The caps pick the plan, never the semantics — including on
    an EMPTY build side, where the returned frame carries the dataset's
    column names so callers' sort/select still work and produce the
    correct empty answer."""
    frames: list[pd.DataFrame] = []
    total = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > cap:
            return None
    if frames:
        return pd.concat(frames, ignore_index=True)
    return pd.DataFrame(columns=ds.schema().names)



def _sorted_lookup(keys_sorted: np.ndarray, probe: np.ndarray):
    """(mask, idx) of probe hits against a sorted key array — the
    vectorized broadcast-join kernel used inside map_batches."""
    if not len(keys_sorted) or not len(probe):
        return np.zeros(len(probe), dtype=bool), np.zeros(len(probe), np.int64)
    i = np.searchsorted(keys_sorted, probe)
    i[i == len(keys_sorted)] = 0
    return keys_sorted[i] == probe, i



def _broadcast_fact_attach(
    fact: rd.Dataset,
    build_ds: rd.Dataset,
    fact_key: str,
    build_key: str,
    attach_cols: list[str],
    pre=None,
) -> rd.Dataset | None:
    """Inner-join a bounded build side into a fact scan WITHOUT a
    shuffle: gather the (filtered, projected) build side under the cap,
    broadcast its sorted key + int64 attach columns via ``ray.put``, and
    attach per batch with a searchsorted lookup (rows with no build
    match drop, matching inner-join semantics). Returns None past the
    cap — the caller then runs its distributed hash-join plan; the cap
    picks the plan, never the semantics. ``pre`` is an optional
    per-batch fact transform (filter/projection) applied first."""
    bdf = _gather_capped(build_ds)
    if bdf is None:
        return None
    srt = bdf.sort_values(build_key)
    # one searchsorted index per probe ⇒ the build key MUST be unique,
    # or fact rows would silently attach only the first duplicate where
    # the hash-join fallback would emit one row per match
    assert srt[build_key].is_unique, f"duplicate build keys in {build_key}"
    keys_ref = ray.put(srt[build_key].to_numpy(np.int64))
    vals_ref = ray.put(
        {c: srt[c].to_numpy(np.int64) for c in attach_cols}
    )

    def attach(t: pa.Table) -> pa.Table:
        if pre is not None:
            t = pre(t)
        k = t.column(fact_key).to_numpy(zero_copy_only=False)
        m, i = _sorted_lookup(ray.get(keys_ref), k)
        t = t.filter(pa.array(m))
        vals = ray.get(vals_ref)
        for c in attach_cols:
            t = t.append_column(c, pa.array(vals[c][i[m]], pa.int64()))
        return t

    return fact.map_batches(attach, batch_format="pyarrow")



def _rev4(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """TPC-H revenue as EXACT fixed-point int64: cents × discount% —
    price*(1−disc) scaled by 10⁴. Both engines close sums over these
    ints and convert to double exactly once, so summation order can
    never flip a rounded cent (the repo-wide ratio/sum exactness
    recipe)."""
    return (
        np.rint(np.asarray(price) * 100).astype(np.int64)
        * (100 - np.rint(np.asarray(disc) * 100).astype(np.int64))
    )



def _merge_count(k_uid, k_ts, q_uid, q_ts, q_first: bool = False):
    """#{j : (k_uid_j, k_ts_j) ≤ (q_uid_i, q_ts_i)} for every query
    row i — the two-level merge rank, vectorized as ONE lexsort (a
    composite uid·ts int packing would overflow int64). ``q_first``
    sorts queries BEFORE tied keys, turning the predicate into strict
    '<'. Shared by the windowed-join kernels (click_to_purchase,
    range_moving_sum) and pinned by the brute-force property test."""
    n_k = len(k_uid)
    uid_all = np.concatenate([k_uid, q_uid])
    ts_all = np.concatenate([k_ts, q_ts])
    flag = np.concatenate([
        np.zeros(n_k, np.int8),
        np.full(len(q_uid), -1 if q_first else 1, np.int8),
    ])
    order = np.lexsort((flag, ts_all, uid_all))
    pos = np.empty(len(order), np.int64)
    pos[order] = np.arange(len(order))
    is_q = (flag[order] != 0).astype(np.int64)
    q_before = np.cumsum(is_q) - is_q
    return pos[n_k:] - q_before[pos[n_k:]]



def _md5_shard(ids, n_shards: int = 16) -> np.ndarray:
    """Deterministic md5-routed shard id per doc id (the manifest /
    sharded-sink routing key; mirrors the oracle's md5-uint64 trick)."""
    from ...functions.urls import md5_hash64_many

    return (md5_hash64_many([f"shard:{i}" for i in ids])
            % np.uint64(n_shards)).astype(np.int64)



def _per_customer_rev4(g: pd.DataFrame) -> pd.DataFrame:
    """In-bucket exact per-customer revenue (o_custkey, x) — the shared
    first stage of the global-order aggregates (gini, percent-rank)."""
    s = pd.DataFrame({
        "o_custkey": g["o_custkey"].to_numpy(np.int64),
        "x": _rev4(g["l_extendedprice"].to_numpy(),
                   g["l_discount"].to_numpy()),
    }).groupby("o_custkey", as_index=False)["x"].sum()
    return s



def _combine_partials(
    partials: rd.Dataset,
    keys: list[str],
    value_cols: list[str],
    cap: int | None = None,
) -> pd.DataFrame | None:
    """One-pass driver combine of per-batch partial aggregates (all
    partial columns merge by SUM).

    Scale contract: the partial stream is O(blocks × distinct keys).
    With ``cap=None`` the caller asserts key cardinality is bounded by
    construction — grading-flag pairs (≤9), nations (25), clock hours ×
    event types (time-span-bounded) — so the gather is a few thousand
    rows even at 100 TB block counts, while a Ray sort-based groupby on
    the same partials pays ~2 s of fixed shuffle latency at any scale.
    For keys that grow with the data, pass a ``cap``: the stream is
    compacted as it arrives and the function returns None the moment the
    compacted size exceeds the cap — the caller then falls back to the
    distributed groupby (the partials are lazy, so the fallback simply
    re-executes them)."""
    frames: list[pd.DataFrame] = []
    total = 0
    for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if cap is not None and total > 4 * cap:
            merged = pd.concat(frames, ignore_index=True).groupby(
                keys, as_index=False
            )[value_cols].sum()
            frames, total = [merged], len(merged)
            if total > cap:
                return None
    if not frames:
        return pd.DataFrame(columns=keys + value_cols)
    out = pd.concat(frames, ignore_index=True).groupby(keys, as_index=False)[
        value_cols
    ].sum()
    if cap is not None and len(out) > cap:
        return None
    return out



def _docs_table(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, "documents.parquet"))


# ---------------------------------------------------------------------------
# crawl-engine queries
# ---------------------------------------------------------------------------

_CRAWL_CACHE: dict = {}



def _derived_crawl_ckpt(sf_dir: str) -> str:
    """Run (once per sf_dir per process) the full engine crawl over the
    documents-derived web; returns the checkpoint root."""
    if sf_dir in _CRAWL_CACHE:
        return _CRAWL_CACHE[sf_dir]
    tables = derive_corpus(_docs_table(sf_dir))
    ckpt = tempfile.mkdtemp(prefix="crawl_bfs_", dir="/tmp")
    cfg = CrawlConfig(num_seen_shards=4, fetcher_concurrency=2, batch_size=8192)
    run_crawl(
        tables["corpus"], tables["hosts"], tables["seeds"],
        derived_profile(), cfg, ckpt,
    )
    _CRAWL_CACHE[sf_dir] = ckpt
    return ckpt



def _derived_crawl_table(sf_dir: str) -> pa.Table:
    """(doc_id, depth) of every admitted url of the derived-web crawl."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    docs_root = os.path.join(ckpt, "docs")
    from ...sources.tables import read_table

    parts = [
        read_table(os.path.join(docs_root, d), columns=["url", "depth"])
        for d in sorted(os.listdir(docs_root))
    ]
    t = pa.concat_tables(parts)
    skus = pc.cast(
        pc.replace_substring_regex(t.column("url"), r"^.*sku=", ""), pa.int64()
    )
    doc_id = pc.subtract(skus, pa.scalar(10**12, pa.int64()))
    return pa.table(
        {"doc_id": doc_id, "depth": pc.cast(t.column("depth"), pa.int32())}
    ).sort_by("doc_id")



def _docs_small(sf_dir: str, name: str, columns) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns).to_pandas()



def _augmented_docs(sf_dir: str) -> rd.Dataset:
    """documents ∪ exact copies of doc_id<20 shifted by +10000 (both sides
    of the oracle construct this identically)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def copies(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 20))
        return pa.table(
            {
                "doc_id": pc.add(t2.column("doc_id"), 10000),
                "text": t2.column("text"),
            }
        )

    return docs.union(docs.map_batches(copies, batch_format="pyarrow"))



# -- rows-only checks (non-SQL-expressible) ---------------------------------

def _near_dup_docs(sf_dir: str) -> rd.Dataset:
    # CPU-count blocks, not Ray's default 64-way file split: the sketch
    # kernels are vectorized per batch, so ~40-row batches leave them
    # dominated by per-task dispatch (measured 2× on the signing stage)
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())

    def tails(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.less(t.column("doc_id"), 10))
        texts = [x + " extra tail token appended" for x in t2.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pc.add(t2.column("doc_id"), 20000),
                "text": pa.array(texts, pa.string()),
            }
        )

    return docs.union(docs.map_batches(tails, batch_format="pyarrow"))



def _augmented_embeddings(sf_dir: str) -> rd.Dataset:
    """embeddings ∪ 12 exact copies of vec 1 at ids 100000+i (both sides
    of the oracle construct this identically). The copies concentrate the
    query's true top-10 inside ONE cluster, so the nprobe-pruned ANN
    result provably equals exact brute force — which is what lets a SQL
    oracle gate an approximate index."""
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def copies(t: pa.Table) -> pa.Table:
        t1 = t.filter(pc.equal(t.column("vec_id"), 1))
        if t1.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], t.column("embedding").type)}
            )
        reps = pa.concat_tables([t1] * 12)
        return pa.table(
            {
                "vec_id": pa.array(100000 + np.arange(12, dtype=np.int64)),
                "embedding": reps.column("embedding"),
            }
        )

    return emb.union(emb.map_batches(copies, batch_format="pyarrow"))



# ---------------------------------------------------------------------------
# shuffle joins / rollup / link-graph analytics (round 2 widening)
# ---------------------------------------------------------------------------

def _doc_count(sf_dir: str) -> int:
    return _row_count(sf_dir, "documents")



def _row_count(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata — no data read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")
    ).metadata.num_rows



def _shuffle_partitions(*row_counts: int) -> int:
    """Row-count-adaptive hash-shuffle partition count for
    ``Dataset.join`` / iterative graph rounds.

    Ray 2.49's hash-shuffle runs one aggregator actor per partition with
    a ~0.1-0.4 s fixed cost each; at bench scale (sf0.1, ~750k join-side
    rows) P=8 measured 2.6x faster end-to-end than P=32 with a wide
    sweet spot (P=4..12 within 15%). So: one partition per ~100k input
    rows, floor 4. At 100 TB the count keeps growing PAST the CPU count
    (capped only by ~2M rows/partition) so per-aggregator memory stays
    bounded and a 256-node cluster still gets full fan-out."""
    rows = sum(row_counts)
    by_rows = max(4, -(-rows // 100_000))
    return int(min(by_rows, max(_n_cpus(), rows // 2_000_000)))



def _sparse_events(sf_dir: str) -> rd.Dataset:
    """The sparse event slice (event_id % 37 == 0) shared by the
    set-op/path queries — membership stays genuinely partial."""
    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"])

    def sparse_filter(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(eid % 37 == 0))

    return ev.map_batches(sparse_filter, batch_format="pyarrow")



def _sparse_pivot_users(sf_dir: str, predicate) -> pa.Table | rd.Dataset:
    """Per-user wide counts over the sparse event slice
    ``event_id % 37 == 0`` (~270 of 10k events at sf0.01, so user×type
    membership is genuinely partial and the set ops are non-trivial) —
    one pivot-partial stream serves both set-op queries.

    ``predicate(df) -> bool mask`` selects users from the wide count
    frame. Bounded user domains combine on the driver; past the cap the
    partials re-execute through ONE distributed groupby-sum and the
    predicate is applied inside map_batches — the 100 TB path never
    gathers the pivot (mirrors q_event_pivot's fallback)."""
    from ...stages.aggregates import pivot_counts

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def sparse_filter(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(eid % 37 == 0))

    sparse = ev.map_batches(sparse_filter, batch_format="pyarrow")
    n_cols = [f"n_{c}" for c in EVENT_TYPES] + ["n_total"]
    partials = pivot_counts(sparse, "user_id", "event_type", EVENT_TYPES)
    base = _combine_partials(partials, ["user_id"], n_cols, cap=200_000)
    if base is not None:
        keep = base[predicate(base)]
        return pa.table(
            {"user_id": pa.array(np.sort(keep["user_id"].to_numpy()))}
        )
    # unbounded user domain: distributed merge + distributed predicate
    agg = partials.groupby("user_id").sum(n_cols)

    def select(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c for c in t.column_names]
        )
        df = t.to_pandas()
        return pa.table({"user_id": df.loc[predicate(df), "user_id"].to_numpy()})

    return agg.map_batches(select, batch_format="pyarrow").sort("user_id")



# per-stratum keep rates for the stratified-sample query: downsample the
# high-volume boilerplate types, keep every conversion — the single
# source of truth for BOTH the kernel and the SQL oracle's CASE bounds.
STRATIFIED_RATES = {
    "view": 0.25,
    "click": 0.5,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 0.0625,
}



EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]



# ---------------------------------------------------------------------------
# training-data hygiene: benchmark decontamination + corpus-LM scoring
# ---------------------------------------------------------------------------


def _flat_tokens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch into ONE flat object array plus the
    per-row doc index of every token — the layout every downstream
    n-gram / lookup kernel wants (shifted concats, searchsorted,
    reduceat) with zero per-row Python past the split itself."""
    toks = texts.fillna("").str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = toks.explode().dropna().to_numpy(dtype=object)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return flat, doc_idx



def _word_ngrams(flat: np.ndarray, doc_idx: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Word n-grams over the flat token layout: pandas shifted string
    concat (C kernels), masked to positions where the window stays
    inside one document. Returns (grams, gram_doc_idx)."""
    if len(flat) < n:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    g = pd.Series(flat[: len(flat) - n + 1], dtype=object)
    for j in range(1, n):
        g = g + " " + pd.Series(flat[j : len(flat) - n + 1 + j], dtype=object)
    valid = doc_idx[: len(flat) - n + 1] == doc_idx[n - 1 :]
    return g.to_numpy(dtype=object)[valid], doc_idx[: len(flat) - n + 1][valid]



def _word_ngram_hashes(
    flat: np.ndarray, doc_idx: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word n-grams as 64-bit rolling hashes — for kernels where the
    gram is only an identity (membership probe, distinct count), never
    an output value. One ``hash_array`` pass over the tokens, then a
    position-sensitive polynomial combine over shifted views: no gram
    string is ever materialized, the broadcast set ships as a primitive
    uint64 array (zero-copy from the object store), and membership is a
    C-speed ``searchsorted``. Identity-by-hash follows the shingle-hash
    contract (stages/dedup.py::_candidate_shingle_sets): a collision
    altering a count needs ~2^32 distinct grams in one comparison.
    Returned viewed as int64 (bit-identical) so the hashes survive
    Arrow/pandas/shuffle boundaries that coerce to signed."""
    if len(flat) < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    th = pd.util.hash_array(flat)  # deterministic siphash, fixed key
    m = len(flat) - n + 1
    p = np.uint64(1099511628211)  # FNV prime; uint64 mul/add wrap
    h = th[:m].copy()
    for j in range(1, n):
        h = h * p + th[j : m + j]
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    return h[valid].view(np.int64), doc_idx[:m][valid]



def _in_sorted(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in a SORTED array — searchsorted probe
    (np.isin without the per-call re-sort)."""
    if not table.size:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(table, values)
    np.minimum(pos, table.size - 1, out=pos)
    return table[pos] == values



def _shipping_priority_join_plan(sf_dir: str, cut: pd.Timestamp):
    """Q3 at unbounded scale: 3-table native hash joins (customer semi
    -> orders -> lineitem) with date pushdown at every read, then ONE
    hash-bucket shuffle for complete per-order revenue (an order's
    lines never straddle buckets) and per-bucket top-10 partials merged
    on the driver — never a global sort."""
    from ...stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "orders"), _row_count(sf_dir, "lineitem")
    )
    bldg = (
        _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
            num_blocks=parts)
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    orders = (
        _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
            num_blocks=parts)
        .map_batches(
            lambda t: t.filter(pc.less(t.column("o_orderdate"),
                                       pa.scalar(cut, type=pa.timestamp("us")))),
            batch_format="pyarrow")
        .join(bldg, join_type="left_semi", num_partitions=parts,
              on=("o_custkey",), right_on=("c_custkey",))
        .select_columns(["o_orderkey", "o_orderdate"])
    )
    li = (
        _pq(sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            num_blocks=parts)
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("l_shipdate"),
                                          pa.scalar(cut, type=pa.timestamp("us")))),
            batch_format="pyarrow")
        .select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
    )
    joined = li.join(orders, join_type="inner", num_partitions=parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # exact fixed-point per-order revenue: row order inside the
        # bucket (shuffle arrival) can no longer move a float sum
        rev4 = (
            _rev4(g["l_extendedprice"].to_numpy(), g["l_discount"].to_numpy())
        )
        g = g.assign(rev4=rev4.astype(object))
        s = g.groupby(["l_orderkey", "o_orderdate"], as_index=False)[
            "rev4"].sum()
        s["revenue"] = round_half_away(
            np.array([int(x) for x in s["rev4"]], dtype=np.float64)
            / 10000.0, 2)
        return s.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True]
        ).head(10)[["l_orderkey", "revenue", "o_orderdate"]]

    cand = (
        _with_bucket(joined, "l_orderkey", 32)
        .groupby("__bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        cand.sort_values(["revenue", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )




def _li_orders_custkey(sf_dir: str, parts: int) -> rd.Dataset:
    """lineitem rows with o_custkey attached — the shared first stage
    of the per-customer revenue aggregates (gini, percent-rank, CF).
    The orders (orderkey → custkey) map broadcasts into the streaming
    lineitem scan under the cap (no join shuffle — the map is ~1/4 the
    fact bytes and unique-keyed); past it, the distributed hash join.
    Either way the ONLY remaining shuffle is the caller's custkey
    bucket groupby."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                 num_blocks=parts)
    joined = _broadcast_fact_attach(
        li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    if joined is None:
        joined = li.join(orders, join_type="inner",
                         num_partitions=parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))
    return joined



# ---------------------------------------------------------------------------
# round-3 widening III: PII redaction, training-chunk manifest, JSONL parity
# ---------------------------------------------------------------------------

def _pii_docs(sf_dir: str) -> rd.Dataset:
    """documents with deterministic synthetic PII appended (the corpus
    itself is PII-free synthetic text; both the Ray side and the SQL
    oracle derive the SAME augmentation, so the scrub is gated on real
    matches): every doc_id % 7 == 0 gains an email, every
    doc_id % 11 == 0 a phone number."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "source", "text"],
               num_blocks=_n_cpus())

    def aug(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pandas()
        text = t.column("text").to_pandas().fillna("")
        email = np.where(
            ids % 7 == 0, " user" + ids.astype(str) + "@example.com", ""
        )
        phone = np.where(
            ids % 11 == 0, " call 555-" + (ids % 10000).astype(str), ""
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "text": pa.array(text + email + phone, pa.string()),
            }
        )

    return docs.map_batches(aug, batch_format="pyarrow")



def _format_roundtrip_agg(back: rd.Dataset) -> pd.DataFrame:
    """Per-source (n_docs, exact char volume) over a re-read manifest —
    the shared audit aggregate for the format round-trip queries."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "n_docs": 1,
                "chars": t.column("n_chars").to_numpy(),
            }
        )
        return df.groupby("source", as_index=False).sum()

    out = _combine_partials(
        back.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "chars"],
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["chars"] = out["chars"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)



BM25_TERMS = ("vector", "join", "stream")



def _bm25_top(sf_dir: str, k: int) -> pd.DataFrame:
    """BM25 top-``k`` for the fixed 3-term query (k1=1.2, b=0.75,
    log-free monotone idf (N−df+0.5)/(df+0.5) so no libm ulp can cross
    the hash gate — same reasoning as the integer PMI in bigram_lift).

    Two streaming passes: (1) corpus stats — N, Σdl, per-term df — as
    ONE per-batch scalar partial row (bounded combine at any corpus
    size); (2) scoring — stats broadcast via ray.put, each batch scores
    its matching docs and emits a local top-k (k × blocks to the
    driver). The per-term float expression mirrors the oracle operand
    for operand and is rounded half-away to 6 decimals INDEPENDENTLY
    per term, then summed in exact 1e-6 integer units — summation
    order can never flip the gate. Shared candidate generator for
    q_bm25_topk (k=20) and the q_rerank_topk first stage (k=50)."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())
    pats = [rf"\b{t}\b" for t in BM25_TERMS]

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        s = t.column("text").to_pandas().fillna("").str.lower()
        dl = s.str.count(r"\w+").to_numpy(np.int64)
        row = {"n_docs": np.int64(len(s)), "sum_dl": dl.sum()}
        for term, pat in zip(BM25_TERMS, pats):
            row[f"df_{term}"] = np.int64(
                (s.str.count(pat).to_numpy(np.int64) > 0).sum()
            )
        return pd.DataFrame([row])

    cols = ["n_docs", "sum_dl"] + [f"df_{t}" for t in BM25_TERMS]
    st = pd.concat(
        list(docs.map_batches(stats_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )[cols].sum()
    n_docs = int(st["n_docs"])
    avgdl = float(st["sum_dl"]) / n_docs  # identical to the oracle's
    idf = {
        t: (n_docs - int(st[f"df_{t}"]) + 0.5) / (int(st[f"df_{t}"]) + 0.5)
        for t in BM25_TERMS
    }
    bref = ray.put((avgdl, idf))

    def score_partial(t: pa.Table) -> pd.DataFrame:
        avgdl_, idf_ = ray.get(bref)
        s = t.column("text").to_pandas().fillna("").str.lower()
        dl = s.str.count(r"\w+").to_numpy(np.float64)
        score6 = np.zeros(len(s), dtype=np.int64)
        hit = np.zeros(len(s), dtype=bool)
        for term, pat in zip(BM25_TERMS, pats):
            tf = s.str.count(pat).to_numpy(np.float64)
            m = tf > 0
            hit |= m
            # operand order mirrors the oracle expression exactly
            term_score = idf_[term] * (tf * 2.2) / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl_)
            )
            score6[m] += round_half_away(
                term_score[m] * 1_000_000
            ).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[hit]
        sc = score6[hit]
        order = np.lexsort((ids, -sc))[:k]
        return pd.DataFrame({"doc_id": ids[order], "score6": sc[order]})

    parts = pd.concat(
        list(docs.map_batches(score_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )
    out = parts.sort_values(["score6", "doc_id"],
                            ascending=[False, True]).head(k)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score6"] = out["score6"].astype(np.int64)
    return out.reset_index(drop=True)



def _fk_orphan_count(
    probe: rd.Dataset, probe_key: str, build: rd.Dataset, build_key: str,
    cap: int = 2_000_000,
) -> tuple[int, int]:
    """(n_probe_rows, n_orphans) for one FK relationship. Plan-capped:
    a bounded build side broadcasts its sorted distinct keys into the
    probe scan (map-only); past the cap BOTH sides hash-bucket on the
    key and the in-bucket kernel anti-counts — exact at any size, one
    shuffle each, nothing but (hits, misses) partials leave a bucket."""
    from ...stages.temporal import _with_bucket

    bdf = _gather_capped(build.select_columns([build_key]), cap=cap)
    if bdf is not None:
        keys = np.sort(bdf[build_key].to_numpy(np.int64))
        keys_ref = ray.put(keys)

        def partial(t: pa.Table) -> pd.DataFrame:
            k = t.column(probe_key).to_numpy(zero_copy_only=False).astype(
                np.int64)
            ks = ray.get(keys_ref)
            hit, _ = _sorted_lookup(ks, k)
            return pd.DataFrame({"g": np.zeros(1, dtype=np.int64),
                                 "n_rows": [len(k)],
                                 "n_orphans": [int((~hit).sum())]})

        out = _combine_partials(
            probe.map_batches(partial, batch_format="pyarrow"),
            ["g"], ["n_rows", "n_orphans"],
        )
        return int(out["n_rows"].iloc[0]), int(out["n_orphans"].iloc[0])

    # co-partition anti-count past the cap
    def p_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t.column(probe_key), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def b_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t.column(build_key), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    both = probe.map_batches(p_side, batch_format="pyarrow").union(
        build.map_batches(b_side, batch_format="pyarrow"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        pk = g.loc[g["side"] == 0, "key"].to_numpy(np.int64)
        bk = np.sort(g.loc[g["side"] == 1, "key"].to_numpy(np.int64))
        hit, _ = _sorted_lookup(bk, pk)
        return pd.DataFrame({"g": np.zeros(1, dtype=np.int64),
                             "n_rows": [len(pk)],
                             "n_orphans": [int((~hit).sum())]})

    out = _combine_partials(
        _with_bucket(both, "key", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["g"], ["n_rows", "n_orphans"],
    )
    return int(out["n_rows"].iloc[0]), int(out["n_orphans"].iloc[0])



def _daily_value_cents(sf_dir: str) -> pd.DataFrame:
    """Daily event-value sums as exact cents — the shared bounded input
    of the sequential time-series statistics (CUSUM, autocorrelation):
    one map-side partial per block, driver combine over
    calendar-bounded rows (more data fattens days, it doesn't add
    them)."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        cents = np.rint(t.column("value").to_numpy() * 100
                        ).astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "x": cents})
        return df.groupby("day", as_index=False).sum()

    return _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["x"],
    ).sort_values("day").reset_index(drop=True)



# Poisson(1) inverse-CDF thresholds as exact uint64 constants
# (floor(CDF_k · 2^64), k = 0..7; draws past T_7 truncate to w = 8).
# Hardcoded identically in the oracle SQL so the weight of every
# (event, replicate) pair is an exact integer comparison on both sides.
_POIS1_T = np.array([
    6786177901268885274, 13572355802537770549, 16965444753172213186,
    18096474403383694065, 18379231815936564285, 18435783298447138329,
    18445208545532234003, 18446555009401533385, 18446723317385195808,
], dtype=np.uint64)



def _bfs_dist_from(seed: int, n: int, edf, edges,
                   max_rounds: int = 64) -> np.ndarray:
    """Directed BFS dist array from ``seed`` (−1 = unreachable). With a
    gathered edge frame ``edf``: one CSR frontier sweep on the driver.
    With ``edf=None``: each round is ONE map_batches scan of the edge
    Dataset (frontier broadcast via ray.put; dist bounded by node
    count — the pagerank/kcore family's budget)."""
    dist = np.full(n, -1, dtype=np.int64)
    dist[seed] = 0

    if edf is not None:  # CSR frontier sweep on the driver
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        starts = np.searchsorted(s, np.arange(n))
        ends = np.searchsorted(s, np.arange(n) + 1)
        frontier = np.array([seed], dtype=np.int64)
        for r in range(1, max_rounds + 1):
            nxt = []
            for v in frontier:
                nxt.append(d[starts[v]:ends[v]])
            if not nxt:
                break
            cand = np.unique(np.concatenate(nxt)) if nxt else np.zeros(
                0, np.int64)
            cand = cand[dist[cand] == -1]
            if not len(cand):
                break
            dist[cand] = r
            frontier = cand
        return dist

    frontier = np.array([seed], dtype=np.int64)
    for r in range(1, max_rounds + 1):
        fref = ray.put(frontier)  # sorted node ids

        def nexts(t: pa.Table) -> pd.DataFrame:
            fr = ray.get(fref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(fr, s)
            return pd.DataFrame({"dst": np.unique(d[hit]),
                                 "c": np.int64(1)})

        cand = _combine_partials(
            edges.map_batches(nexts, batch_format="pyarrow"),
            ["dst"], ["c"],
        )["dst"].to_numpy(np.int64)
        cand = cand[dist[cand] == -1]
        if not len(cand):
            break
        dist[cand] = r
        frontier = np.sort(cand)
    return dist



def _tdiv(num: int, den: int) -> int:
    """Integer division truncating toward ZERO — DuckDB's `//` semantics
    (Python's `//` floors toward -inf, which differs on negative
    numerators). Every signed fixed-point close that an oracle mirrors
    with `//` must go through this so both sides truncate identically."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q



def _minmerge_stream(parts: rd.Dataset, n: int, init: np.ndarray,
                     vcol: str = "v", lcol: str = "l") -> np.ndarray:
    """Node-bounded min-combine: stream (v, label) partials and fold
    them into ``init`` with np.minimum.at — the min-aggregation twin of
    _combine_partials (which only sums), used by the label-propagation
    family whose per-node state is the pagerank/kcore node budget."""
    lab = init.copy()
    for b in parts.iter_batches(batch_size=65536, batch_format="pandas"):
        if len(b):
            np.minimum.at(lab, b[vcol].to_numpy(np.int64),
                          b[lcol].to_numpy(np.int64))
    return lab



def _scc_labels(n: int, edf, edges: rd.Dataset) -> np.ndarray:
    """SCC label per node (= min doc_id in its SCC). With a gathered
    edge frame: one iterative Tarjan sweep on the driver. With
    ``edf=None``: FW-BW-TRIM — per-node state stays node-bounded (the
    pagerank/kcore budget) while every propagation round is ONE
    distributed map_batches scan of the edge Dataset: (1) TRIM peels
    zero-in/out-degree nodes (kills tendrils and chains, the classic
    FW-BW weakness), (2) forward and backward min-label fixpoints F/B,
    (3) nodes with F=B join SCC(F) and deactivate — at least the
    minimum active node's whole SCC resolves per outer round.

    NO ROUND CAPS (post-r4 ADVICE): the min-label fixpoints iterate to
    convergence — they terminate within the active subgraph's diameter,
    so a crawl-trap ring longer than any fixed cap (the exact structure
    this query hunts) still labels correctly instead of silently
    degrading to singletons; the outer loop terminates because every
    round resolves at least the SCC of the minimum active label (its
    F and B both equal itself). Past 64 outer rounds — a long chain of
    non-trivial SCCs — progress is logged loudly so a pathological
    graph is visible, never wrong."""
    INF = np.int64(2**62)

    if edf is not None:  # driver Tarjan (iterative, CSR)
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        starts = np.searchsorted(s, np.arange(n))
        ends = np.searchsorted(s, np.arange(n) + 1)
        index = np.full(n, -1, np.int64)
        low = np.zeros(n, np.int64)
        onstk = np.zeros(n, bool)
        stack: list[int] = []
        scc = np.full(n, -1, np.int64)
        counter = 0
        for root in range(n):
            if index[root] != -1:
                continue
            index[root] = low[root] = counter
            counter += 1
            stack.append(root)
            onstk[root] = True
            work = [(root, int(starts[root]))]
            while work:
                v, ptr = work[-1]
                if ptr < ends[v]:
                    work[-1] = (v, ptr + 1)
                    w = int(d[ptr])
                    if index[w] == -1:
                        index[w] = low[w] = counter
                        counter += 1
                        stack.append(w)
                        onstk[w] = True
                        work.append((w, int(starts[w])))
                    elif onstk[w]:
                        low[v] = min(low[v], index[w])
                else:
                    work.pop()
                    if work:
                        pv = work[-1][0]
                        low[pv] = min(low[pv], low[v])
                    if low[v] == index[v]:
                        comp = []
                        while True:
                            w = stack.pop()
                            onstk[w] = False
                            comp.append(w)
                            if w == v:
                                break
                        mn = min(comp)
                        for w in comp:
                            scc[w] = mn
        return scc

    scc = np.full(n, -1, np.int64)
    active = np.ones(n, bool)
    _outer = 0
    while True:
        _outer += 1
        if _outer > 64 and _outer % 16 == 1:
            import logging

            logging.getLogger(__name__).warning(
                "_scc_labels: outer round %d, %d nodes still active "
                "(long chain of non-trivial SCCs — correct but slow; "
                "consider the driver-Tarjan plan via a larger edge cap)",
                _outer, int(active.sum()),
            )
        while True:  # TRIM: iterated zero-degree peel
            ref = ray.put(active)

            def deg_partial(t: pa.Table) -> pd.DataFrame:
                act = ray.get(ref)
                s = t.column("src").to_numpy(zero_copy_only=False)
                d = t.column("dst").to_numpy(zero_copy_only=False)
                m = act[s] & act[d]
                df = pd.DataFrame({
                    "v": np.concatenate([s[m], d[m]]),
                    "outd": np.concatenate([
                        np.ones(int(m.sum()), np.int64),
                        np.zeros(int(m.sum()), np.int64)]),
                    "ind": np.concatenate([
                        np.zeros(int(m.sum()), np.int64),
                        np.ones(int(m.sum()), np.int64)])})
                return df.groupby("v", as_index=False).sum()

            deg = _combine_partials(
                edges.map_batches(deg_partial, batch_format="pyarrow"),
                ["v"], ["outd", "ind"],
            )
            outd = np.zeros(n, np.int64)
            ind = np.zeros(n, np.int64)
            if len(deg):
                vv = deg["v"].to_numpy(np.int64)
                outd[vv] = deg["outd"].to_numpy(np.int64)
                ind[vv] = deg["ind"].to_numpy(np.int64)
            trim = active & ((outd == 0) | (ind == 0))
            if not trim.any():
                break
            scc[trim] = np.flatnonzero(trim)
            active &= ~trim
        if not active.any():
            break

        def fixpoint(reverse: bool) -> np.ndarray:
            # iterate to CONVERGENCE — bounded by the active subgraph's
            # diameter, so long rings resolve exactly (no round cap)
            lab = np.where(active, np.arange(n, dtype=np.int64), INF)
            while True:
                ref2 = ray.put((active, lab))
                sc, dc = ("dst", "src") if reverse else ("src", "dst")

                def prop(t: pa.Table) -> pd.DataFrame:
                    act, lb = ray.get(ref2)
                    s = t.column(sc).to_numpy(zero_copy_only=False)
                    d = t.column(dc).to_numpy(zero_copy_only=False)
                    m = act[s] & act[d]
                    df = pd.DataFrame({"v": d[m], "l": lb[s[m]]})
                    return df.groupby("v", as_index=False).min()

                new = _minmerge_stream(
                    edges.map_batches(prop, batch_format="pyarrow"),
                    n, lab)
                if np.array_equal(new, lab):
                    return lab
                lab = new

        F = fixpoint(reverse=False)
        B = fixpoint(reverse=True)
        done = active & (F == B) & (F < INF)
        if not done.any():
            # unreachable by construction (the minimum active label's
            # SCC always has F=B=itself) — if it ever fires the labels
            # would be wrong, so fail loudly rather than degrade
            raise RuntimeError(
                "_scc_labels made no progress with "
                f"{int(active.sum())} active nodes — labeling bug"
            )
        scc[done] = F[done]
        active &= ~done
        if not active.any():
            break
    return scc



def _bfs_reach_multi(seeds: np.ndarray, n: int, edf, edges: rd.Dataset,
                     reverse: bool = False,
                     max_rounds: int = 64) -> np.ndarray:
    """Reachability bool array from a SEED SET (seeds themselves are
    marked), optionally along reversed edges — the multi-source
    generalization of _bfs_dist_from with the same two-path budget:
    gathered CSR sweep under the edge cap, one distributed edge scan
    per round past it."""
    reached = np.zeros(n, dtype=bool)
    reached[seeds] = True
    frontier = np.sort(np.asarray(seeds, dtype=np.int64))

    if edf is not None:
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        if reverse:
            s, d = d, s
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        starts = np.searchsorted(s, np.arange(n))
        ends = np.searchsorted(s, np.arange(n) + 1)
        for _r in range(max_rounds):
            nxt = [d[starts[v]:ends[v]] for v in frontier]
            if not nxt:
                break
            cand = (np.unique(np.concatenate(nxt)) if nxt
                    else np.zeros(0, np.int64))
            cand = cand[~reached[cand]]
            if not len(cand):
                break
            reached[cand] = True
            frontier = cand
        return reached

    sc, dc = ("dst", "src") if reverse else ("src", "dst")
    for _r in range(max_rounds):
        fref = ray.put(frontier)

        def nexts(t: pa.Table) -> pd.DataFrame:
            fr = ray.get(fref)
            s = t.column(sc).to_numpy(zero_copy_only=False)
            d = t.column(dc).to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(fr, s)
            return pd.DataFrame({"dst": np.unique(d[hit]),
                                 "c": np.int64(1)})

        cand = _combine_partials(
            edges.map_batches(nexts, batch_format="pyarrow"),
            ["dst"], ["c"],
        )["dst"].to_numpy(np.int64)
        cand = cand[~reached[cand]]
        if not len(cand):
            break
        reached[cand] = True
        frontier = np.sort(cand)
    return reached


# re-export EVERYTHING (including underscored helpers and imported
# modules) into the family modules via `from ._core import *`
# shared per-process caches (item-mutated, never reassigned, so the
# `from ._core import *` re-export binds every family to ONE dict)
_IVF_CACHE: dict = {}
_PART_SINK_CACHE: dict = {}

__all__ = [n for n in list(globals()) if not n.startswith("__")]
