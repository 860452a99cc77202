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

from ..config import MIXUP, CrawlConfig
from ..functions.numeric import round_half_away
from ..functions.urls import md5_hex_arrow, md5_hex_many
from ..stages.candidates import CandidateFilter
from ..stages.dedup import MinHasher, exact_dedup, jaccard, minhash_lsh_dedup, add_simhash
from ..stages.extract import parse_items
from ..stages.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..stages.textstats import fingerprint, lang_id, text_quality, token_counts
from ..state.checkpoint import CheckpointStore
from .derived import derive_corpus, derived_profile, url_of
from .crawl import run_crawl


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
    from ..functions.urls import md5_hash64_many

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
    from ..sources.tables import read_table

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


def q_crawl_flagship(sf_dir: str):
    """The flagship end-to-end: crawl the derived web with the full
    engine, then run the items/enrichment pipeline over the FETCHED docs
    (parse + analyzer actor pool) — the reference's crawler + parser
    Lambda as one Ray-Data flow. Projected to the SQL-expressible item +
    enrichment columns so the DuckDB oracle (recursive-CTE reachability ×
    parse semantics × md5-bucket sentiment) verifies the WHOLE path:
    crawl admission, span parse, price kernel, review parse, analyzer."""
    import ray.data as rd

    from ..state.checkpoint import CheckpointStore
    from .items import build_items

    ckpt = CheckpointStore(_derived_crawl_ckpt(sf_dir))
    docs = ckpt.read_all_docs_table()
    items = build_items(_from_arrow_sliced(docs), analyzer_concurrency=2)

    def project(t: pa.Table) -> pa.Table:
        # first-review extraction via Arrow offsets (functions/lists —
        # round-4 verdict #3): no to_pylist, no per-row Python
        from ..functions.lists import first_list_element

        skus = pc.cast(
            pc.replace_substring_regex(t.column("doc_id"), r"^.*sku=", ""),
            pa.int64(),
        )
        first = first_list_element(t.column("reviews"))

        def rf(name, default):
            return pc.fill_null(pc.struct_field(first, name), pa.scalar(default))

        return pa.table(
            {
                "doc_id": pc.subtract(skus, pa.scalar(10**12, pa.int64())),
                "id": t.column("id"),
                "name": t.column("name"),
                "brand": t.column("brand"),
                "description": t.column("description"),
                "price_cents": t.column("price_cents"),
                "r_author": rf("author", ""),
                "r_stars": rf("stars", 0.0),
                "r_date": rf("date", ""),
                "r_title": rf("title", ""),
                "r_content": rf("content", ""),
                "sentiment": rf("sentiment", ""),
                "n_entities": pc.cast(
                    pc.fill_null(
                        pc.list_value_length(pc.struct_field(first, "entities")),
                        0,
                    ),
                    pa.int64(),
                ),
                "meta_keywords": t.column("meta_keywords"),
                "meta_description": t.column("meta_description"),
                "first_image": pc.fill_null(
                    first_list_element(t.column("image_urls")), pa.scalar("")
                ),
            }
        )

    return items.map_batches(project, batch_format="pyarrow")


_AMAZON_CRAWL_CACHE: dict = {}


def q_amazon_flagship(sf_dir: str):
    """Second-profile end-to-end (M9/M10): crawl the AMAZON-shaped web
    with the reference AMAZON regexes, parse with the amazon DOM-callback
    semantics (selector spans, rating set, no colon-split price,
    normalize_kv details, bullets TrimSpace), enrich reviews, and verify
    every column against the shared BFS-CTE oracle."""
    from ..config import AMAZON
    from ..stages.analyzer import ReviewAnalyzer
    from ..stages.extract import parse_items_amazon
    from ..state.checkpoint import CheckpointStore
    from .derived import derive_amazon_corpus

    if sf_dir not in _AMAZON_CRAWL_CACHE:
        tables = derive_amazon_corpus(_docs_table(sf_dir))
        ckpt = tempfile.mkdtemp(prefix="crawl_amzn_", dir="/tmp")
        cfg = CrawlConfig(num_seen_shards=4, fetcher_concurrency=2, batch_size=8192)
        run_crawl(tables["corpus"], tables["hosts"], tables["seeds"], AMAZON, cfg, ckpt)
        _AMAZON_CRAWL_CACHE[sf_dir] = ckpt
    docs = CheckpointStore(_AMAZON_CRAWL_CACHE[sf_dir]).read_all_docs_table()

    def to_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("status"), "ok"))
        items = parse_items_amazon(
            pa.table({"doc_id": t.column("url"), "spans": t.column("spans")})
        )
        return items.filter(pc.invert(items.column("is_captcha")))

    items = (
        _from_arrow_sliced(docs)
        .map_batches(to_items, batch_format="pyarrow")
        .map_batches(ReviewAnalyzer, batch_format="pyarrow", concurrency=2)
    )

    def project(t: pa.Table) -> pa.Table:
        # Arrow-offsets first-review + vectorized details-map lookup
        # (functions/lists — round-4 verdict #3): no per-row Python
        from ..functions.lists import first_list_element, kv_lookup

        ids = pc.cast(
            pc.replace_substring_regex(
                pc.replace_substring_regex(t.column("doc_id"), r"^.*/dp/B", ""),
                r"/ref=.*$", "",
            ),
            pa.int64(),
        )
        first = first_list_element(t.column("reviews"))

        def rf(name, default):
            return pc.fill_null(pc.struct_field(first, name), pa.scalar(default))

        return pa.table(
            {
                "doc_id": ids,
                "id": t.column("id"),
                "name": t.column("name"),
                "brand": t.column("brand"),
                "rating": t.column("rating"),
                "price_cents": t.column("price_cents"),
                "d_fabricante": kv_lookup(t.column("details"), "Fabricante"),
                "d_asin": kv_lookup(t.column("details"), "ASIN"),
                "r_author": rf("author", ""),
                "r_stars": rf("stars", 0.0),
                "r_date": rf("date", ""),
                "r_sentiment": rf("sentiment", ""),
            }
        )

    return items.map_batches(project, batch_format="pyarrow")


def q_captcha_quarantine(sf_dir: str):
    """Captcha quarantine sink (S8): the crawl writes one quarantine row
    per blocked page (url, req_id, host, depth, captcha payload —
    amazon.go:290-318); the oracle recomputes the crawl-reachable captcha
    set from the BFS CTE. Shares the memoized crawl run."""
    from ..state.checkpoint import CheckpointStore

    ckpt = CheckpointStore(_derived_crawl_ckpt(sf_dir))
    t = ckpt.read_all_quarantine_table()
    skus = pc.cast(
        pc.replace_substring_regex(t.column("url"), r"^.*sku=", ""), pa.int64()
    )
    return pa.table(
        {
            "doc_id": pc.subtract(skus, pa.scalar(10**12, pa.int64())),
            "captcha_text": t.column("captcha_text"),
        }
    )


def q_crawl_bfs(sf_dir: str):
    """Full engine crawl (shard actors, politeness, fetcher) over the web
    derived from ``documents``; rows = (doc_id, depth of first visit).
    Oracle: recursive-CTE BFS min-depth."""
    return _derived_crawl_table(sf_dir)


def q_crawl_depth_counts(sf_dir: str):
    """Grouped aggregate over the crawl frontier (A-class counters,
    SURVEY §2.5): pages admitted per BFS depth. Streams the crawl's
    checkpointed waves (pruned to the depth column) through per-batch
    count partials; the driver combine is bounded by DEPTH cardinality
    (≤ max_waves), never by frontier size — the distributed-combiner
    form of the reference's visit counters."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"), columns=["depth"])

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t.column("depth").to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame({"depth": u, "n_pages": c})

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["depth"], ["n_pages"],
    ).sort_values("depth")
    return pa.table(
        {
            "depth": pa.array(out["depth"].to_numpy(), pa.int32()),
            "n_pages": pa.array(out["n_pages"].to_numpy(), pa.int64()),
        }
    )


def q_url_classify(sf_dir: str):
    """URL filter + product classifier (M1-M3) with the reference MIXUP
    regexes over urls derived from doc ids."""
    docs = _pq(sf_dir, "documents", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        urls = np.empty(len(ids), dtype=object)
        for j, d in enumerate(ids):
            m = d % 3
            if m == 0:
                urls[j] = (
                    "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku="
                    + str(d).zfill(13)
                )
            elif m == 1:
                urls[j] = f"https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=c{d}"
            else:
                urls[j] = f"https://www.evil.com/page{d}"
        return pa.table({"url": pa.array(urls, pa.string())})

    built = docs.map_batches(build, batch_format="pyarrow")
    filt = built.map_batches(CandidateFilter(MIXUP, 4), batch_format="pyarrow")
    return filt.map_batches(
        lambda t: t.select(["url", "host", "priority"]), batch_format="pyarrow"
    )


def q_req_md5(sf_dir: str):
    """MD5 request-id kernel (M13) over document text."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "req_id": pa.array(md5_hex_arrow(t.column("text"))),
            }
        ),
        batch_format="pyarrow",
    )


def q_price_cents(sf_dir: str):
    """Fixed-point currency kernel (M14): int64(f*100 + 0.5)."""
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        p = t.column("l_extendedprice").to_numpy()
        c = np.floor(p * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "price_cents": pa.array(c),
            }
        )

    return li.map_batches(cents, batch_format="pyarrow")


def q_items_parse(sf_dir: str):
    """Span-sequence item parse (M7/M8/M13) over the derived corpus."""
    tables = derive_corpus(_docs_table(sf_dir))
    ds = rd.from_arrow(tables["corpus"])
    items = ds.map_batches(
        lambda t: parse_items(t, source_store="Synth").filter(
            pc.invert(pc.field("is_captcha"))
        ),
        batch_format="pyarrow",
    )

    def project(t: pa.Table) -> pa.Table:
        skus = pc.cast(
            pc.replace_substring_regex(t.column("doc_id"), r"^.*sku=", ""),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": pc.subtract(skus, pa.scalar(10**12, pa.int64())),
                "id": t.column("id"),
                "name": t.column("name"),
                "brand": t.column("brand"),
                "description": t.column("description"),
                "price_cents": t.column("price_cents"),
                "meta_keywords": t.column("meta_keywords"),
                "meta_description": t.column("meta_description"),
            }
        )

    return items.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# relational operator surface
# ---------------------------------------------------------------------------

def q_q1_agg(sf_dir: str):
    """Grouped aggregate with per-batch partial pre-aggregation (the
    combiner pattern — the shuffle sees one row per key per batch)."""
    li = _pq(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        # exact fixed-point revenue; quantities are integral so their
        # float sums are already exact
        df["rev4"] = _rev4(df["l_extendedprice"].to_numpy(),
                           df["l_discount"].to_numpy()).astype(object)
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(sum_qty=("l_quantity", "sum"), rev4=("rev4", "sum"),
                 n=("l_quantity", "size"))
        )
        return g

    partials = li.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(
        partials, ["l_returnflag", "l_linestatus"], ["sum_qty", "rev4", "n"]
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_rev"] = round_half_away(
        np.array([int(x) for x in out["rev4"]], dtype=np.float64)
        / 10000.0, 2)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_rev", "n"]]


def q_top_orders(sf_dir: str):
    """Global sort + limit (top-k)."""
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"],
                 num_blocks=_n_cpus())
    return orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_cust_nation_orders(sf_dir: str):
    """Broadcast hash join (small side ray.put once) + grouped agg."""
    cust = _docs_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    # plain TASK stage, not an actor pool: the only state is the
    # broadcast ref, and ray.get resolves from node-local plasma with a
    # per-worker deserialization cache — tasks skip actor spin-up
    def join(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["c_nationkey"] = df["o_custkey"].map(ray.get(lookup_ref)).astype(np.int32)
        return df.groupby("c_nationkey", as_index=False).agg(
            n_orders=("o_custkey", "size"), sum_total=("o_totalprice", "sum")
        )

    partials = orders.map_batches(join, batch_format="pyarrow")
    out = _combine_partials(partials, ["c_nationkey"], ["n_orders", "sum_total"])
    out["sum_total"] = out["sum_total"].round(2)
    return out


def _docs_small(sf_dir: str, name: str, columns) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns).to_pandas()


def q_purchases_by_user(sf_dir: str):
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.filter(pc.equal(t.column("event_type"), "purchase")).to_pandas()
        return df.groupby("user_id", as_index=False).agg(
            n=("value", "size"), total=("value", "sum")
        )

    # per-user keys GROW with the data: driver combine only under a cap,
    # distributed groupby once the compacted partial stream exceeds it
    partials = ev.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["user_id"], ["n", "total"], cap=2_000_000)
    if out is None:
        from ray.data.aggregate import Sum

        out = (
            partials.groupby("user_id")
            .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
            .to_pandas()
        )
    out["total"] = out["total"].round(6)
    return out


def q_events_hourly(sf_dir: str):
    """Tumbling event-time window as a grouped aggregate (streaming-shaped
    workload, SURVEY §2.9 / ray guide)."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        df = pd.DataFrame(
            {
                "hour": hour,
                "event_type": t.column("event_type").to_pandas(),
                # exact milliunit ints: partial sums are order-free
                "v3": np.rint(
                    t.column("value").to_numpy() * 1000
                ).astype(np.int64).astype(object),
            }
        )
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("v3", "size"), v3=("v3", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["hour", "event_type"], ["n", "v3"])
    out["sum_value"] = round_half_away(
        np.array([int(x) for x in out["v3"]], dtype=np.float64)
        / 1000.0, 6)
    return out[["hour", "event_type", "n", "sum_value"]]


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


def q_exact_dedup(sf_dir: str):
    out = exact_dedup(_augmented_docs(sf_dir), col="text", id_col="doc_id")
    return out.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")


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
    from ..stages.sampling import assign_split, sample_mask

    docs = _pq(sf_dir, "documents", columns=["doc_id"])

    def go(t: pa.Table) -> pa.Table:
        t = sample_mask(t, rate=0.2, seed=7)
        t = assign_split(t, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
        return t.select(["doc_id", "split"])

    return docs.map_batches(go, batch_format="pyarrow")


def q_embedding_topk(sf_dir: str):
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    q0 = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))
    )
    queries = {
        "ids": np.array([0], dtype=np.int64),
        "matrix": np.array(q0.column("embedding").to_pylist(), dtype=np.float64),
    }
    out = brute_force_topk(emb, queries, k=10).copy()
    out["cos"] = out["cos"].round(6)
    out = (
        out.sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out[["query_id", "vec_id", "cos"]]


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
    from ..stages.dedup import simhash_near_dup

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
    from ..stages.strings import edit_distance_join

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


def q_fingerprint(sf_dir: str):
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(fingerprint, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    )


_IVF_CACHE: dict = {}


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


def q_ivf_topk(sf_dir: str):
    """IVF ANN top-k via the PERSISTED index (centroids from a seeded
    uniform sample; vectors written partitioned by cluster; probe =
    pruned read of nprobe partition directories). Runs over the
    augmented table (12 exact copies of vec 1) so the true top-10 lives
    in the query's own cluster and the SQL brute-force oracle is exact;
    pytest guards recall on the raw table separately."""
    import tempfile
    import pyarrow.parquet as pq

    q1 = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 1))
    )
    queries = {
        "ids": np.array([1], dtype=np.int64),
        "matrix": np.array(q1.column("embedding").to_pylist(), dtype=np.float64),
    }
    if sf_dir not in _IVF_CACHE:
        _IVF_CACHE[sf_dir] = tempfile.mkdtemp(prefix="ivf_idx_", dir="/tmp")
    # a persisted index ignores the input dataset entirely, so only pay
    # for the augmented table when a BUILD is actually coming; the build
    # consumes it three times (count, centroid sample, partitioned
    # write), so materialize once and let the passes reuse object-store
    # blocks instead of re-executing the union lineage
    if os.path.exists(os.path.join(_IVF_CACHE[sf_dir], "centroids.npy")):
        emb = None
    else:
        emb = _augmented_embeddings(sf_dir).materialize()
    out = ivf_topk(
        emb, queries, k=10, num_clusters=8, nprobe=4, index_dir=_IVF_CACHE[sf_dir]
    )
    return out[["query_id", "vec_id", "cos"]].reset_index(drop=True)


def q_embedding_near_dup(sf_dir: str):
    """Embedding near-dup (cosine ≥ τ) via random-hyperplane LSH buckets
    with in-bucket exact verification, over the augmented table (12
    exact copies of vec 1). Identical vectors produce identical sign
    patterns, so every true pair collides deterministically; the corpus'
    natural pair maximum is cos≈0.51, far below τ=0.99 — the exact
    cross-join SQL oracle therefore gates the LSH op."""
    from ..stages.dedup import embedding_near_dup

    pairs = embedding_near_dup(
        _augmented_embeddings(sf_dir), id_col="vec_id", emb_col="embedding",
        threshold=0.99,
    )
    return pa.table(
        {
            "a": pa.array([int(a) for a, _ in pairs], pa.int64()),
            "b": pa.array([int(b) for _, b in pairs], pa.int64()),
        }
    )


def q_sessionize(sf_dir: str):
    """Gap-based session windows (6 h) over the events stream — the
    hash-bucket co-located, vectorized multi-user kernel
    (stages/temporal.py); oracle = DuckDB lag()/cumulative-sum window
    sessions. Session identity is (user_id, session_start)."""
    from ..stages.temporal import sessionize

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    out = sessionize(ev, gap_us=6 * 3600 * 1_000_000)

    # np.round, not pc.round: Arrow's kernel lands on a different ULP
    # than DuckDB/numpy decimal rounding and fails the value-hash gate
    def round6(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        return t.set_column(
            i, "sum_value",
            pa.array(round_half_away(t.column("sum_value").to_numpy(), 6)),
        )

    return out.map_batches(round6, batch_format="pyarrow")


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 4 h windows hopping hourly,
    per user — each event contributes to 4 windows; explode + partial
    agg inside the batch, one bucketed combine shuffle
    (stages/temporal.py). window_start is µs-since-epoch."""
    from ..stages.temporal import hopping_window_agg

    H = 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    out = hopping_window_agg(ev, width_us=4 * H, hop_us=H)

    def round6(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        return t.set_column(
            i, "sum_value",
            pa.array(round_half_away(t.column("sum_value").to_numpy(), 6)),
        )

    return out.map_batches(round6, batch_format="pyarrow")


def q_interval_join(sf_dir: str):
    """Interval (range) join: pairs of same-user events within ±6 h —
    time-cell replication + one hash-bucket co-location shuffle
    (stages/temporal.py); self-pairs dropped post-join."""
    from ..stages.temporal import interval_join

    H6 = 6 * 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"],
             num_blocks=_n_cpus())
    evr = ev.map_batches(
        lambda t: pa.table(
            {
                "b_event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
            }
        ),
        batch_format="pyarrow",
    )
    out = interval_join(
        ev, evr,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        lower_us=-H6, upper_us=H6,
        right_cols=["b_event_id"],
    )
    return out.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("event_id"), t.column("b_event_id"))
        ),
        batch_format="pyarrow",
    )


def q_asof_join(sf_dir: str):
    """Backward as-of join: each event picks the latest order of the
    same user at-or-before its timestamp (point-in-time feature join);
    ties on o_orderdate resolve to the max o_orderkey. One bucket
    shuffle, pd.merge_asof kernel per bucket (stages/temporal.py)."""
    from ..stages.temporal import asof_join

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"],
             num_blocks=_n_cpus())
    orders = _pq(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
        num_blocks=_n_cpus(),
    )
    return asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )


def q_multimodal_decode(sf_dir: str):
    from ..stages.multimodal import DecodeImage, ResizePlan, synth_media_batch

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


# ---------------------------------------------------------------------------
# wide aggregates / sketches (stages/aggregates.py)
# ---------------------------------------------------------------------------

def q_group_topk(sf_dir: str):
    """Top-3 orders per customer by total price (ties → min orderkey),
    with rank. Per-block partial top-k prunes before the one bucket
    shuffle, so a hot customer moves ≤ 3×blocks rows."""
    from ..stages.aggregates import group_topk

    orders = _pq(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_totalprice"],
                 num_blocks=_n_cpus())
    return group_topk(orders, key_col="o_custkey", order_col="o_totalprice",
                      k=3, tiebreak_col="o_orderkey")


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: pair-hash bucket
    dedup then a partial-sum combine (stages/aggregates.py)."""
    from ..stages.aggregates import count_distinct

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"],
             num_blocks=_n_cpus())
    return count_distinct(ev, key_col="event_type", value_col="user_id")


def q_doc_frequency(sf_dir: str):
    """Document frequency + smoothed IDF per term over the documents
    table (min_df=2) — the broadcastable global half of TF-IDF."""
    from ..stages.aggregates import doc_frequency

    docs = _pq(sf_dir, "documents", columns=["text"], num_blocks=_n_cpus())
    return doc_frequency(docs, col="text", min_df=2)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog register table (p=10) for distinct user_ids in
    events. The registers are integer-exact and SQL-reproducible; the
    float estimate is derived via hll_estimate (pytest asserts the
    accuracy envelope)."""
    from ..stages.aggregates import hll_registers

    ev = _pq(sf_dir, "events", columns=["user_id"], num_blocks=_n_cpus())
    return hll_registers(ev, value_col="user_id", p=10)


def q_group_quantiles(sf_dir: str):
    """Exact p50/p95 of event value per event_type (quantile_cont
    linear-interpolation semantics), one bucket shuffle + a vectorized
    multi-key segment kernel."""
    from ..stages.aggregates import group_quantiles

    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())
    return group_quantiles(ev, key_col="event_type", value_col="value",
                           qs=(0.5, 0.95))


def q_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document: the global IDF table (tiny)
    broadcasts via ray.put and the scoring pass is one stateless
    map_batches — zero shuffles end to end."""
    from ..stages.aggregates import doc_frequency, tfidf_topk

    idf_ds = doc_frequency(
        _pq(sf_dir, "documents", columns=["text"], num_blocks=_n_cpus()),
        col="text", min_df=1,
    )
    idf_tbl = pa.Table.from_pandas(idf_ds.to_pandas())  # vocabulary-sized
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())
    return tfidf_topk(docs, idf_tbl, id_col="doc_id", col="text", k=3)


def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling plan (stages/multimodal.py::FrameSamplePlan)
    over synthetic video media (duration = 10 ms per text char), frames
    exploded to one row per sampled frame. The codec is the declared
    stub; the plumbing — list column, explode, batch sizing — is real."""
    from ..stages.multimodal import FrameSamplePlan, synth_media_batch

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


def q_connected_components(sf_dir: str):
    """Distributed connected components (iterative min-label propagation,
    stages/dedup.py::components_minlabel) over the verified near-dup
    pair set — the dup-cluster resolution step of LSH dedup run through
    the DISTRIBUTED path (the driver-side union-find is the small-edge
    shortcut). Label = component-min doc_id (string order, both sides)."""
    from ..stages.dedup import components_minlabel, minhash_lsh_dedup

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


def q_order_lineitem_join(sf_dir: str):
    """Big-big hash-shuffle join (J1 at fact×fact scale, where the
    broadcast pattern of cust_nation_orders stops applying): lineitem ⋈
    orders on orderkey via ``Dataset.join`` — both sides hash-partitioned
    on the key, no side materialized — then a bounded grouped agg
    (priority × returnflag ≤ 15) combined from per-block partials."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        num_blocks=parts,
    )
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
                 num_blocks=parts)
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        rev = t.column("l_extendedprice").to_numpy() * (
            1.0 - t.column("l_discount").to_numpy()
        )
        df = pd.DataFrame(
            {
                "o_orderpriority": t.column("o_orderpriority").to_pandas(),
                "l_returnflag": t.column("l_returnflag").to_pandas(),
                "rev": rev,
            }
        )
        return df.groupby(["o_orderpriority", "l_returnflag"], as_index=False).agg(
            n_lines=("rev", "size"), sum_rev=("rev", "sum")
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(
        partials, ["o_orderpriority", "l_returnflag"], ["n_lines", "sum_rev"]
    )
    out["sum_rev"] = out["sum_rev"].round(2)
    return out


def q_customer_no_orders(sf_dir: str):
    """Distributed ANTI join (J2's seen-anti-join shape as a relational
    operator): customers with no URGENT orders via ``Dataset.join
    (left_anti)`` — hash-partitioned both sides, so it holds when
    neither side fits a broadcast dict. (The urgent filter keeps the
    result non-trivial: this corpus gives every customer ≥1 order.)"""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "customer"), _row_count(sf_dir, "orders")
    )
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"],
               num_blocks=parts)
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
                 num_blocks=parts)
    urgent = orders.filter(
        expr="o_orderpriority == '1-URGENT'"
    ).select_columns(["o_custkey"])
    anti = cust.join(
        urgent,
        join_type="left_anti",
        num_partitions=parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return anti.map_batches(
        lambda t: t.select(["c_custkey", "c_nationkey"]), batch_format="pyarrow"
    )


def q_events_rollup(sf_dir: str):
    """ROLLUP(event_type, hour): base tumbling-window agg from per-block
    partials, subtotal and grand-total levels derived from the ROUNDED
    base aggregate on BOTH sides (sentinels hour=-1 / event_type='ALL'),
    so every rollup level is hash-stable regardless of summation order.
    The upper levels are driver arithmetic over the bounded base table —
    at 100 TB the base agg is still (types × clock-hours) rows."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hour": us // 3_600_000_000,
                "value": t.column("value").to_pandas(),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    base = _combine_partials(partials, ["event_type", "hour"], ["n", "sum_value"])
    base["sum_value"] = base["sum_value"].round(6)
    lvl1 = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    lvl1["hour"] = np.int64(-1)
    lvl2 = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "hour": np.array([-1], np.int64),
            "n": [base["n"].sum()],
            "sum_value": [base["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [base, lvl1[base.columns], lvl2[base.columns]], ignore_index=True
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out


def q_events_cube(sf_dir: str):
    """CUBE(event_type, hour): the rollup machinery plus the
    hour-subtotal level ROLLUP lacks — all four levels derived from the
    SAME rounded base aggregate on both sides (sentinels hour=-1 /
    event_type='ALL'), so every level is hash-stable regardless of
    summation order; upper levels are driver arithmetic over the
    bounded (types × clock-hours) base."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hour": us // 3_600_000_000,
                "value": t.column("value").to_pandas(),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    base = _combine_partials(partials, ["event_type", "hour"], ["n", "sum_value"])
    base["sum_value"] = base["sum_value"].round(6)
    by_type = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    by_type["hour"] = np.int64(-1)
    by_hour = base.groupby("hour", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    by_hour["event_type"] = "ALL"
    grand = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "hour": np.array([-1], np.int64),
            "n": [base["n"].sum()],
            "sum_value": [base["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [base, by_type[base.columns], by_hour[base.columns], grand[base.columns]],
        ignore_index=True,
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out


def q_value_share(sf_dir: str):
    """Percent-of-total window: each event's share of its user's total
    value — per-user totals from fixed-point partial sums (bounded user
    domain combines on the driver), broadcast once, then one map pass.
    Integer operands make the division bit-identical on both sides;
    zero totals emit share 0."""
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": t.column("user_id").to_pandas(),
                "value_u": round_half_away(
                    t.column("value").to_numpy(zero_copy_only=False) * 1_000_000
                ).astype(np.int64),
            }
        )
        return df.groupby("user_id", as_index=False).agg(total_u=("value_u", "sum"))

    totals = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["user_id"], ["total_u"]
    )
    ref = ray.put(pd.Series(totals["total_u"].to_numpy(), index=totals["user_id"]))

    def share(t: pa.Table) -> pa.Table:
        tot = ray.get(ref)
        u = pd.Series(t.column("user_id").to_numpy(zero_copy_only=False))
        v = round_half_away(
            t.column("value").to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        tu = u.map(tot).to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = round_half_away(v.astype(np.float64) / tu, 6)
        s[tu == 0] = 0.0
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_u": pa.array(v, pa.int64()),
                "share": pa.array(s, pa.float64()),
            }
        )

    return ev.map_batches(share, batch_format="pyarrow")


def _sparse_events(sf_dir: str) -> rd.Dataset:
    """The sparse event slice (event_id % 37 == 0) shared by the
    set-op/path queries — membership stays genuinely partial."""
    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"])

    def sparse_filter(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(eid % 37 == 0))

    return ev.map_batches(sparse_filter, batch_format="pyarrow")


def q_value_hist(sf_dir: str):
    """Fixed-width histogram of the event values (bin = floor(v/10)):
    per-block bincount partials merged by SUM — the bounded-state
    profile/EDA aggregate (bin domain is fixed by construction, so the
    exchange is a few dozen ints per block at any scale). The single
    floor(v/10) double op is identical on both sides."""
    ev = _pq(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.floor(v / 10.0).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins, "n": counts.astype(np.int64)})

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["bin"], ["n"]
    )
    out["n"] = out["n"].astype(np.int64)
    return out


def q_user_paths(sf_dir: str):
    """Per-user ordered journey string — string_agg(event_type ORDER BY
    ts, event_id) over the sparse slice
    (stages/temporal.py::ordered_paths): one bucket shuffle; output is
    one row per user so per-key join cost is proportional to the
    result."""
    from ..stages.temporal import ordered_paths

    return ordered_paths(
        _sparse_events(sf_dir), "user_id", "ts", "event_id", "event_type"
    )


def q_funnel_users(sf_dir: str):
    """Ordered-funnel filter: users whose sparse journey contains the
    view → click → purchase subsequence — a regex over the path string
    on both sides (event-type names are prefix-free, so substring
    matching is exact)."""
    from ..stages.temporal import ordered_paths

    paths = ordered_paths(
        _sparse_events(sf_dir), "user_id", "ts", "event_id", "event_type"
    )

    def funnel(t: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            t.column("path"), r"view.*click.*purchase"
        )
        return t.filter(hit).select(["user_id", "path"])

    out = paths.map_batches(funnel, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # a zero-block Dataset loses its schema on to_pandas — pin the
        # driver-contract columns explicitly for the empty-funnel case
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "path": pd.Series([], dtype=str)})
    return out


def q_value_ranks(sf_dir: str):
    """Ranking-window family in one pass: per-event-type RANK (ties
    share), PERCENT_RANK, and NTILE(4) quartile over the pinned
    (value, event_id) order (stages/temporal.py::rank_windows) — one
    bucket shuffle, segment arithmetic for all keys, integer operands
    so the rank divisions hash-match SQL."""
    from ..stages.temporal import rank_windows

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id", "value"],
             num_blocks=_n_cpus())
    return rank_windows(ev, "event_type", "value", "event_id", ntile=4)


def q_importance_sample(sf_dir: str):
    """Importance sampling: keep probability = min(1, ws_tokens/80) —
    long docs survive, short boilerplate is thinned proportionally
    (stages/sampling.py::weighted_mask). Map-only; the double-precision
    compare uses identical operand expressions on both sides."""
    from ..stages.sampling import weighted_mask

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def go(t: pa.Table) -> pa.Table:
        tok = token_counts(t)
        w = np.minimum(
            1.0, tok.column("ws_tokens").to_numpy(zero_copy_only=False) / 80.0
        )
        kept = weighted_mask(tok, w, id_col="doc_id", seed=7)
        return kept.select(["doc_id", "ws_tokens"])

    return docs.map_batches(go, batch_format="pyarrow")


def q_hourly_distinct_hll(sf_dir: str):
    """Tumbling-window HyperLogLog: per-hour distinct-user registers
    (stages/aggregates.py::windowed_hll_registers) — bounded sketch
    state per window, the streaming-distinct pattern at 100 TB; the
    integer register table is the gated artifact (p=6)."""
    from ..stages.aggregates import windowed_hll_registers

    ev = _pq(sf_dir, "events", columns=["ts", "user_id"])
    return windowed_hll_registers(ev, "ts", "user_id", p=6)


def q_props_k_stats(sf_dir: str):
    """JSON unmarshal surface (SURVEY §2.8): extract the integer field
    ``k`` from the events' JSON props column with one vectorized Arrow
    regex pass (functions/text.py::json_int_field — never per-row
    json.loads), then a bounded per-type aggregate from per-block
    partials (missing keys COALESCE to -1 on both sides)."""
    from ..functions.text import json_int_field

    ev = _pq(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        k = json_int_field(t.column("props"), "k").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"event_type": t.column("event_type").to_pandas(), "k": k}
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max")
        )

    # one gather serves both merge rules (SUM for n/sum_k, MAX for
    # max_k) — the partial stream is blocks × event-types rows
    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max")
    )
    for c in ("n", "sum_k", "max_k"):
        out[c] = out[c].astype(np.int64)
    return out


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
    from ..stages.aggregates import pivot_counts

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


def q_clickers_buyers(sf_dir: str):
    """INTERSECT set op: users who clicked AND purchased (within the
    sparse slice) — derived from the pivot partials (counts, never
    rows) combined on the driver, with a distributed fallback past the
    combine cap."""
    return _sparse_pivot_users(
        sf_dir, lambda df: (df["n_click"] > 0) & (df["n_purchase"] > 0)
    )


def q_viewers_no_purchase(sf_dir: str):
    """EXCEPT set op: users who viewed but never purchased (within the
    sparse slice) — same pivot-partial stream, complementary
    predicate."""
    return _sparse_pivot_users(
        sf_dir, lambda df: (df["n_view"] > 0) & (df["n_purchase"] == 0)
    )


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


def q_pagerank_paths(sf_dir: str):
    """Iterative link-analysis (PageRank dataflow) over the derived web:
    3 rounds of edges⋈weights + groupby-sum shuffles with integer path
    counts (stages/graph.py::path_weights) — hash-exact, so the
    unrolled-CTE oracle gates the full iterative pipeline."""
    from ..stages.graph import path_weights

    n = _doc_count(sf_dir)
    # per round the join sees 3n edges + n weights
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return path_weights(docs, n=n, iters=3, num_partitions=parts)


def q_link_degrees(sf_dir: str):
    """In/out degree per page of the derived link graph: one distributed
    count shuffle + a left_outer stitch (stages/graph.py::degree_table)."""
    from ..stages.graph import degree_table

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return degree_table(docs, n=n, num_partitions=parts)


def q_url_normalize(sf_dir: str):
    """URL canonicalization kernel (frontier hygiene, SURVEY §2.7
    hardening): lowercase scheme/host, strip fragment, drop default
    port, empty path → '/'. Pure Arrow kernels over deterministic messy
    spellings built from doc ids."""
    from ..functions.urls import normalize_urls

    docs = _pq(sf_dir, "documents", columns=["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        urls = np.empty(len(ids), dtype=object)
        for j, d in enumerate(ids):
            m = d % 4
            if m == 0:
                urls[j] = (
                    f"HTTPS://WWW.MixUp.COM.MX:443/Mixup/detproducto.aspx?sku={d}#ref"
                )
            elif m == 1:
                urls[j] = f"https://www.synthd1.mx:8080/shop/Home.aspx#frag{d}"
            elif m == 2:
                urls[j] = f"HTTP://News.Site.MX:80#top{d}"
            else:
                urls[j] = f"https://shop.example.mx/p?q={d}"
        return pa.table({"url": pa.array(urls, pa.string())})

    return docs.map_batches(build, batch_format="pyarrow").map_batches(
        lambda t: pa.table(
            {"url": t.column("url"), "url_norm": normalize_urls(t.column("url"))}
        ),
        batch_format="pyarrow",
    )


def q_audio_chunks(sf_dir: str):
    """Audio chunk plan (multimodal §: audio modality): synthetic clips
    (duration = 10 ms/char), AudioChunkPlan actor pool, chunk list
    exploded to one row per window. Codec behind the declared stub; the
    plumbing — struct list column, explode, batch sizing — is real."""
    from ..stages.multimodal import AudioChunkPlan, synth_media_batch

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


def q_user_running_total(sf_dir: str):
    """Per-user cumulative running totals over the event stream — the
    SUM OVER (PARTITION BY ... ORDER BY ts ROWS UNBOUNDED PRECEDING)
    dataflow as one bucket shuffle + segmented-cumsum kernel
    (stages/temporal.py::running_total). Fixed-point micro-units make
    the distributed cumsum bit-identical to the SQL window oracle."""
    from ..stages.temporal import running_total

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    return running_total(ev)


def q_event_deltas(sf_dir: str):
    """Per-user inter-event time deltas + previous-event value — the
    LAG window dataflow (stages/temporal.py::lag_deltas): one
    hash-bucket shuffle, shifted-compare kernel, order pinned by the
    unique event_id so the distributed result hash-matches the SQL
    window oracle exactly."""
    from ..stages.temporal import lag_deltas

    ev = _pq(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"],
             num_blocks=_n_cpus())
    return lag_deltas(ev)


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


def q_stratified_sample(sf_dir: str):
    """Class-rebalanced deterministic sample of the event stream —
    per-stratum hash bounds (stages/sampling.py::stratified_mask),
    map-only, stable under re-partitioning and retries; the exact
    uint64 bounds are shared verbatim with the oracle's CASE arms."""
    from ..stages.sampling import stratified_mask

    ev = _pq(sf_dir, "events", columns=["event_id", "event_type"])
    return ev.map_batches(
        lambda t: stratified_mask(t, STRATIFIED_RATES, "event_type", seed=7),
        batch_format="pyarrow",
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(sf_dir: str):
    """PIVOT/crosstab: per-user wide counts of each event type + total
    (stages/aggregates.py::pivot_counts) — blocks emit wide int partial
    rows that merge by SUM; bounded user domain combines on the driver,
    unbounded domains fall back to one distributed groupby-sum."""
    from ..stages.aggregates import pivot_counts

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"])
    n_cols = [f"n_{c}" for c in EVENT_TYPES] + ["n_total"]
    partials = pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)
    out = _combine_partials(partials, ["user_id"], n_cols, cap=200_000)
    if out is None:  # unbounded key domain: distributed merge
        agg = partials.groupby("user_id").sum(n_cols)
        return agg.map_batches(
            lambda t: t.rename_columns(
                [c[4:-1] if c.startswith("sum(") else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return out


def q_value_scaled(sf_dir: str):
    """Per-event-type robust scaling of the value column —
    (value − median) / IQR (stages/aggregates.py::robust_scale): grouped
    quartiles via the hash-gate-proven quantile kernel, broadcast once,
    then one stateless map pass. The canonical two-phase
    global-stats-then-map normalization of a feature pipeline."""
    from ..stages.aggregates import robust_scale

    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "value"],
             num_blocks=_n_cpus())
    return robust_scale(ev, "event_type", "value").map_batches(
        lambda t: t.select(["event_id", "event_type", "value_scaled"]),
        batch_format="pyarrow",
    )


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing of tokenized documents into 256-token
    training windows (stages/packing.py): md5-sharded buckets pack
    independently in doc-id order — the deterministic parallel form of
    the LLM context-packing step; a recursive-CTE oracle replays the
    identical greedy recurrence."""
    from ..stages.packing import pack_sequences

    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"])
    with_tok = docs.map_batches(
        lambda t: token_counts(t).select(["doc_id", "ws_tokens"]),
        batch_format="pyarrow",
    )
    return pack_sequences(with_tok, budget=256)


def q_user_top_event(sf_dir: str):
    """Exact grouped mode: each user's most frequent event type
    (stages/aggregates.py::grouped_mode) — counts-not-rows through two
    small shuffles, ties pinned by smallest value so the winner matches
    the SQL ROW_NUMBER oracle exactly."""
    from ..stages.aggregates import grouped_mode

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


def q_heavy_hitters(sf_dir: str):
    """Count-min-sketch frequency estimates per user over the event
    stream (stages/aggregates.py::cms_counts): each block ships one
    fixed 32 KB counter matrix, the driver sums them, and the candidate
    keys (bounded user domain) read back as min-over-rows point
    queries. The sketch registers are integer-exact and md5-derived, so
    the SQL oracle rebuilds the identical sketch and the identical
    estimates — the gate verifies the sketch, not a float summary."""
    from ..stages.aggregates import cms_counts_and_keys, cms_estimate_many

    ev = _pq(sf_dir, "events", columns=["user_id"])
    # one pass: blocks ship (partial sketch, distinct keys) together
    sketch, keys = cms_counts_and_keys(ev, "user_id")
    est = cms_estimate_many(sketch, keys.tolist())
    return pa.table(
        {"user_id": pa.array(keys, pa.int64()), "est": pa.array(est, pa.int64())}
    )


def q_urgent_lineitems(sf_dir: str):
    """Fact ⋉ dim semi-join with Bloom pushdown (stages/joins.py):
    lineitems of 1-URGENT orders. The urgent key set is summarized as a
    distributed-built Bloom filter, broadcast once, and applied map-only
    to the streaming lineitem scan; only the ~20 % survivors take the
    exact hash join, so the all-to-all moves a fifth of the fact bytes
    (false positives are removed by the verify join — the bloom only
    prunes shuffle volume, never decides membership)."""
    from ..stages.joins import bloom_semi_join

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    keys = orders.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("o_orderpriority"), "1-URGENT")
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    fact = _pq(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
        num_blocks=_n_cpus(),
    )
    return bloom_semi_join(
        fact, keys, "l_orderkey", "o_orderkey", num_partitions=_n_cpus()
    )


def q_sample_k(sf_dir: str):
    """Deterministic uniform 256-sample of documents without
    replacement — global smallest-hash top-k via per-block partial
    top-k + a bounded driver merge (stages/sampling.py), the
    reproducible stand-in for reservoir sampling."""
    from ..stages.sampling import sample_topk_hash

    docs = _pq(sf_dir, "documents", columns=["doc_id"])
    return sample_topk_hash(docs, k=256, id_col="doc_id", seed=7)


def q_moving_avg(sf_dir: str):
    """Rows-window moving aggregate: per-user moving sum/avg of the last
    4 events ordered by (ts, event_id) — the ``ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW`` window (stages/temporal.py::moving_window). One
    hash-bucket shuffle, then a cumsum-difference kernel; fixed-point
    sums and an identical-operand division keep the emitted average
    hash-exact against the SQL window oracle."""
    from ..stages.temporal import moving_window

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
             num_blocks=_n_cpus())
    return moving_window(ev, window_rows=4)


def q_first_last_events(sf_dir: str):
    """Entity-snapshot window: each user's FIRST and LAST event (id +
    type) over the pinned order (ts, event_id) plus their row count
    (stages/temporal.py::first_last_by_key) — the latest-state /
    entity-resolution pattern, one bucket shuffle + segment indexing."""
    from ..stages.temporal import first_last_by_key

    ev = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"],
             num_blocks=_n_cpus())
    return first_last_by_key(ev)


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5-shape multi-join: revenue from lineitems where the
    supplier and the ordering customer share a nation inside one region
    ('ASIA'). The star plan at 100 TB: the big-big core (lineitem ⋈
    orders) is ONE hash-shuffle ``Dataset.join``; every dimension-side
    predicate (region→nations, nation names, supplier→nation,
    customer→nation restricted to the region) broadcasts once via
    ray.put and applies inside map_batches — so exactly one all-to-all
    exchange end-to-end. (customer is the one side that grows with the
    data; past broadcast size it becomes a second bucketed join on
    o_custkey — documented trade, same machinery as the core join.)"""
    region = _docs_small(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _docs_small(sf_dir, "nation",
                         ["n_nationkey", "n_name", "n_regionkey"])
    rkeys = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    cust = _docs_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust = cust[cust["c_nationkey"].isin(nat_name)]
    cust_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    dims_ref = ray.put((nat_name, supp_nat, cust_nat))

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                 num_blocks=parts)
    joined = _broadcast_fact_attach(
        li, orders, "l_orderkey", "o_orderkey", ["o_custkey"]
    )
    if joined is None:  # pragma: no cover - orders beyond broadcast cap
        joined = li.join(
            orders,
            join_type="inner",
            num_partitions=parts,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

    def partial(t: pa.Table) -> pd.DataFrame:
        nat_name_, supp_nat_, cust_nat_ = ray.get(dims_ref)
        df = t.to_pandas()
        sn = df["l_suppkey"].map(supp_nat_)
        cn = df["o_custkey"].map(cust_nat_)
        keep = sn.notna() & cn.notna() & (sn == cn)
        df = df[keep]
        if not len(df):
            return pd.DataFrame({"n_name": [], "n_lines": [], "rev4": []})
        # exact fixed-point revenue (cents × discount%): partials sum
        # Python ints (object dtype) so no row count can overflow them
        rev4 = (
            _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        ).astype(object)
        out = pd.DataFrame({"n_name": sn[keep].map(nat_name_),
                            "rev4": rev4})
        return out.groupby("n_name", as_index=False).agg(
            n_lines=("rev4", "size"), rev4=("rev4", "sum")
        )

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["n_name"], ["n_lines", "rev4"])
    out["n_lines"] = out["n_lines"].astype(np.int64)
    # the single int→double conversion + one IEEE divide is shared
    # bit-for-bit with the oracle's CAST(sum AS DOUBLE) / 10000.0
    out["sum_rev"] = round_half_away(
        np.array([int(x) for x in out["rev4"]], dtype=np.float64) / 10000.0,
        2)
    return out[["n_name", "n_lines", "sum_rev"]].sort_values(
        "n_name").reset_index(drop=True)


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14-shape promo share: per ship-month, total revenue and
    the revenue from PROMO-type parts. part is the dimension side —
    p_partkey → is-promo broadcasts once via ray.put — so the plan is
    ONE map-only pass over lineitem with per-batch (month, sums)
    partials; the driver combine is bounded by the time span."""
    part = _docs_small(sf_dir, "part", ["p_partkey", "p_type"])
    promo_ref = ray.put(
        dict(zip(part["p_partkey"], part["p_type"] == "PROMO"))
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_shipdate", "l_extendedprice",
                      "l_discount"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        pm = ray.get(promo_ref)
        df = t.to_pandas()
        # numpy datetime64[M]→str is exactly 'YYYY-MM' — vectorized,
        # unlike pandas dt.strftime (per-row Python)
        month = (
            df["l_shipdate"].to_numpy().astype("datetime64[M]").astype(str)
        )
        # exact fixed-point revenue; object-int partials can't overflow
        rev4 = (
            _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        )
        is_promo = df["l_partkey"].map(pm).fillna(False).to_numpy(dtype=bool)
        out = pd.DataFrame({
            "month": month,
            "rev4": rev4.astype(object),
            "promo4": np.where(is_promo, rev4, 0).astype(object),
        })
        return out.groupby("month", as_index=False).agg(
            n_lines=("rev4", "size"),
            promo4=("promo4", "sum"),
            rev4=("rev4", "sum"),
        )

    partials = li.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(
        partials, ["month"], ["n_lines", "promo4", "rev4"]
    )
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["promo_rev"] = round_half_away(
        np.array([int(x) for x in out["promo4"]], dtype=np.float64)
        / 10000.0, 2)
    out["total_rev"] = round_half_away(
        np.array([int(x) for x in out["rev4"]], dtype=np.float64)
        / 10000.0, 2)
    return out[["month", "n_lines", "promo_rev", "total_rev"]].sort_values(
        "month").reset_index(drop=True)


def q_events_profile(sf_dir: str):
    """Column-profiling sweep (stages/aggregates.py::profile_columns):
    row/null counts + exact integer min/max per profiled column of the
    events table (timestamps as epoch-µs) — one streaming pass, one
    partial row per column per block."""
    from ..stages.aggregates import profile_columns

    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id"],
             num_blocks=_n_cpus())
    return profile_columns(
        ev, {"event_id": "int", "ts": "ts", "user_id": "int"}
    )


def q_class_balanced_sample(sf_dir: str):
    """Class-balanced subsampling (stages/sampling.py::group_sample_k):
    cap every event_type at 100 uniformly-hash-chosen events — the
    dataset-rebalancing step before training. Per-block per-class
    partial top-k bounds the gather at blocks × classes × k; ranks
    compare exact uint64 hashes so the SQL oracle's ORDER BY picks the
    identical winner set."""
    from ..stages.sampling import group_sample_k

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id"],
             num_blocks=_n_cpus())
    return group_sample_k(ev, key_col="event_type", id_col="event_id",
                          k=100, seed=7)


# ---------------------------------------------------------------------------
# round-3 widening: exact similarity join, semi/outer join shapes, reshape
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard similarity self-join (AllPairs prefix
    filtering, stages/dedup.py::ngram_jaccard_join) over the same
    augmented near-dup corpus as minhash_pairs — the dedup flavor with a
    deterministic recall guarantee (no LSH miss probability). Returns
    the scored pair list (a, b, j)."""
    from ..stages.dedup import ngram_jaccard_join

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


def q_order_priority_counts(sf_dir: str):
    """EXISTS semi-join (TPC-H Q4 shape): orders with ≥1 returned line,
    counted per priority. Uses Ray's native LEFT SEMI hash join — each
    left row emitted at most once, no dedup shuffle, no row duplication
    — then ≤5-key partial counts combined on the driver."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
                 num_blocks=parts)
    returned = (
        _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"],
            num_blocks=parts)
        .filter(expr="l_returnflag == 'R'")
        .select_columns(["l_orderkey"])
    )
    semi = orders.join(
        returned,
        join_type="left_semi",
        num_partitions=parts,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"o_orderpriority": t.column("o_orderpriority").to_pandas()})
        out = df.groupby("o_orderpriority", as_index=False).size()
        return out.rename(columns={"size": "n_orders"})

    partials = semi.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["o_orderpriority"], ["n_orders"])
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_customer_distribution(sf_dir: str):
    """Histogram of per-customer order counts INCLUDING zero-order
    customers (TPC-H Q13 shape): distributed count per custkey, LEFT
    OUTER join customer → counts (nulls → 0), then a bounded histogram
    combine (distinct per-customer counts ≲ max orders per customer)."""
    from ray.data.aggregate import Count

    parts = _shuffle_partitions(
        _row_count(sf_dir, "customer"), _row_count(sf_dir, "orders")
    )
    cust = _pq(sf_dir, "customer", columns=["c_custkey"], num_blocks=parts)
    counts = (
        _pq(sf_dir, "orders", columns=["o_custkey"], num_blocks=parts)
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    joined = cust.join(
        counts,
        join_type="left_outer",
        num_partitions=parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        c = t.column("c_count").to_pandas().fillna(0).astype(np.int64)
        out = pd.DataFrame({"c_count": c}).groupby(
            "c_count", as_index=False
        ).size()
        return out.rename(columns={"size": "n_custs"})

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["c_count"], ["n_custs"])
    out["n_custs"] = out["n_custs"].astype(np.int64)
    return out.sort_values("c_count").reset_index(drop=True)


def q_large_orders(sf_dir: str):
    """HAVING-filtered semi-join (TPC-H Q18 shape): orders whose total
    quantity exceeds 300, joined back to the order header.

    ONE hash-bucket shuffle computes per-order sums (an order's lines
    never straddle buckets, so the in-bucket pandas groupby is complete)
    and applies the HAVING filter in-bucket; survivors are RARE by
    construction (the 99.9th-percentile cut), so they broadcast-filter
    the orders scan instead of paying a second shuffle join. Past the
    broadcast cap the survivors fall back to a distributed hash join —
    the Ray `groupby().aggregate(Sum)` + `join` formulation of the same
    query measured 8.8 s vs ~1.5 s for this plan at sf0.1 (the sort
    shuffle + join fixed costs dominate a query whose reduced state is
    tiny)."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"],
             num_blocks=_n_cpus())

    def bucket_sums(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        s = s[s["l_quantity"] > 300.0]
        return pa.table(
            {
                "o_orderkey": pa.array(s["l_orderkey"].to_numpy(np.int64)),
                "sum_qty": pa.array(s["l_quantity"].to_numpy(np.float64)),
            }
        )

    big = (
        _with_bucket(li, "l_orderkey", 32)
        .groupby("__bucket")
        .map_groups(bucket_sums, batch_format="pandas")
    )

    cap = 2_000_000
    frames: list[pd.DataFrame] = []
    total = 0
    fallback = False
    for b in big.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > cap:
            fallback = True
            break

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_totalprice"],
                 num_blocks=_n_cpus())

    if not fallback:
        surv = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"o_orderkey": [], "sum_qty": []})
        )
        surv_ref = ray.put(surv)

        def attach(t: pa.Table) -> pd.DataFrame:
            sv = ray.get(surv_ref)
            df = t.to_pandas()
            out = df.merge(sv, on="o_orderkey", how="inner")
            out["sum_qty"] = round_half_away(out["sum_qty"].to_numpy(), 2)
            return out[["o_orderkey", "o_custkey", "o_totalprice", "sum_qty"]]

        return orders.map_batches(attach, batch_format="pyarrow").sort("o_orderkey")

    joined = big.join(  # pragma: no cover - >2M survivors regime
        orders,
        join_type="inner",
        num_partitions=_shuffle_partitions(_row_count(sf_dir, "orders")),
        on=("o_orderkey",),
        right_on=("o_orderkey",),
        right_suffix="_r",
    )

    def select(t: pa.Table) -> pa.Table:  # pragma: no cover
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_totalprice": t.column("o_totalprice"),
                "sum_qty": pa.array(
                    round_half_away(t.column("sum_qty").to_numpy(), 2)
                ),
            }
        )

    return joined.map_batches(select, batch_format="pyarrow").sort("o_orderkey")


def q_rich_dormant_customers(sf_dir: str):
    """Scalar-subquery broadcast + anti-join (TPC-H Q22 shape):
    customers with above-average balance and NO urgent order, grouped by
    nation. The global average is one (sum, n) partial combine — a
    scalar shipped in the filter closure, not a join — and the NOT
    EXISTS is Ray's native LEFT ANTI hash join."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "customer"), _row_count(sf_dir, "orders")
    )
    cust = _pq(sf_dir, "customer",
               columns=["c_custkey", "c_nationkey", "c_acctbal"],
               num_blocks=parts)

    def avg_partial(t: pa.Table) -> pd.DataFrame:
        bal2 = np.rint(t.column("c_acctbal").to_numpy() * 100).astype(
            np.int64)
        return pd.DataFrame({"g": [0], "s": [int(bal2.sum())],
                             "n": [len(bal2)]})

    tot = _combine_partials(
        cust.map_batches(avg_partial, batch_format="pyarrow"), ["g"], ["s", "n"]
    )
    # exact-integer 'above average' threshold: bal > S/N  ⟺
    # bal2 ≥ S//N + 1 (holds whether or not N divides S) — no float
    # average can flip a boundary customer between the engines
    min_rich2 = int(tot["s"][0]) // int(tot["n"][0]) + 1

    def rich_filter(t: pa.Table, _m=min_rich2) -> pa.Table:
        bal2 = np.rint(t.column("c_acctbal").to_numpy() * 100).astype(
            np.int64)
        return t.filter(pa.array(bal2 >= _m))

    rich = cust.map_batches(rich_filter, batch_format="pyarrow")
    urgent = (
        _pq(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
            num_blocks=parts)
        .filter(expr="o_orderpriority == '1-URGENT'")
        .select_columns(["o_custkey"])
    )
    anti = rich.join(
        urgent,
        join_type="left_anti",
        num_partitions=parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_nationkey": t.column("c_nationkey").to_pandas(),
                "bal2": np.rint(
                    t.column("c_acctbal").to_numpy() * 100
                ).astype(np.int64).astype(object),
            }
        )
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_custs=("bal2", "size"), bal2=("bal2", "sum")
        )
        return g

    partials = anti.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["c_nationkey"], ["n_custs", "bal2"])
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["total_bal"] = round_half_away(
        np.array([int(x) for x in out["bal2"]], dtype=np.float64) / 100.0, 2)
    return out[["c_nationkey", "n_custs", "total_bal"]].sort_values(
        "c_nationkey").reset_index(drop=True)


def q_events_unpivot(sf_dir: str):
    """Wide→long reshape (UNPIVOT/melt): each event row explodes into
    one (event_id, metric, mval) row per measure — a map-only stage (no
    shuffle), the standard prep step before a long-format metric store
    or per-metric windowing."""
    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"],
             num_blocks=_n_cpus())

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        eid = t.column("event_id").to_numpy()
        vals = [
            t.column("value").to_numpy().astype(np.float64),
            t.column("user_id").to_numpy().astype(np.float64),
            pc.cast(t.column("ts"), pa.int64()).to_numpy().astype(np.float64),
        ]
        metric = ["value", "user_id", "epoch_us"]
        return pa.table(
            {
                "event_id": pa.array(np.tile(eid, 3)),
                "metric": pa.array(np.repeat(np.array(metric, dtype=object), n)),
                "mval": pa.array(np.concatenate(vals)),
            }
        )

    return ev.map_batches(melt, batch_format="pyarrow")


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

    from ..stages.dedup import components_minlabel, minhash_lsh_dedup

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

    from ..stages.dedup import components_minlabel, minhash_lsh_dedup

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


def q_daily_new_users(sf_dir: str):
    """First-touch attribution (retention-cohort prep): per-user
    first-seen day, per-day new-user counts, cumulative user total.

    ONE hash-bucket shuffle co-locates each user's events; the in-bucket
    kernel takes a segmented per-user min day and emits per-day count
    partials — each user counted exactly once globally because a user's
    rows never straddle buckets. The per-day stream is clock-bounded
    (days × buckets rows even at 100 TB), so the histogram combine and
    the cumulative sum run on the driver."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (
            g["ts"].astype("int64").to_numpy() // 86_400_000_000
        ).astype(np.int64)
        first = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "day": day}
        ).groupby("user_id", as_index=False)["day"].min()
        vc = first["day"].value_counts()
        return pa.table(
            {
                "day": pa.array(vc.index.to_numpy(np.int64)),
                "n_new": pa.array(vc.to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["day"], ["n_new"])
    out = out.sort_values("day").reset_index(drop=True)
    out["n_new"] = out["n_new"].astype(np.int64)
    out["cum_users"] = out["n_new"].cumsum().astype(np.int64)
    return out


def q_grouped_corr(sf_dir: str):
    """Per-group Pearson correlation (value vs time-of-day) via
    MERGEABLE SUFFICIENT STATISTICS: each block contributes one
    (n, Σx, Σy, Σxy, Σx², Σy²) row per key — six fixed numbers, the
    canonical distributed second-moment aggregate — and the driver
    closes the formula over the bounded key set. Correlation is
    normalization-invariant, so the partials formula equals DuckDB's
    numerically-stable corr() to ~1e-13 relative; both sides round to 6."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t.column("value").to_numpy()
        y = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             % 86_400_000_000).astype(np.float64)
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "n": np.int64(1),
                "sx": x, "sy": y, "sxy": x * y, "sxx": x * x, "syy": y * y,
            }
        )
        return df.groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "sx", "sy", "sxy", "sxx", "syy"],
    )
    n = out["n"].to_numpy(np.float64)
    sx, sy = out["sx"].to_numpy(), out["sy"].to_numpy()
    sxy, sxx, syy = out["sxy"].to_numpy(), out["sxx"].to_numpy(), out["syy"].to_numpy()
    corr = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype(np.int64),
            "corr_vh": round_half_away(corr, 6),
        }
    ).sort_values("event_type").reset_index(drop=True)


def q_retention_cohorts(sf_dir: str):
    """Cohort-retention matrix: distinct users active in week-offset w
    from their first-touch day. ONE hash-bucket shuffle computes the
    first-touch AND every event's offset co-located (a user's rows never
    straddle buckets, so the per-bucket distinct (user, cohort, offset)
    dedup is globally exact) — no user→cohort broadcast, no self-join.
    The (cohort × offset) partial stream is clock-bounded."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        u = g["user_id"].to_numpy()
        df = pd.DataFrame({"user_id": u, "day": day})
        df["cohort"] = df.groupby("user_id")["day"].transform("min")
        df["week_offset"] = (df["day"] - df["cohort"]) // 7
        act = df[["user_id", "cohort", "week_offset"]].drop_duplicates()
        out = act.groupby(["cohort", "week_offset"], as_index=False).size()
        return pa.table(
            {
                "cohort": pa.array(out["cohort"].to_numpy(np.int64)),
                "week_offset": pa.array(out["week_offset"].to_numpy(np.int64)),
                "n_users": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["cohort", "week_offset"], ["n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort", "week_offset"]).reset_index(drop=True)


def q_winsorized_stats(sf_dir: str):
    """Two-pass robust-stats pipeline (winsorization): exact per-class
    p5/p95 from the quantile kernel (a class-bounded table), broadcast
    via ray.put, then ONE stateless clip+sum pass over the stream —
    the compute-stats → broadcast → transform pattern that replaces a
    self-join at any scale. Bounds are rounded to 6 BEFORE clipping on
    both sides so the clip decisions are hash-identical."""
    from ..stages.aggregates import group_quantiles

    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())
    qdf = group_quantiles(ev, "event_type", "value", (0.05, 0.95)).to_pandas()
    lo_map = dict(zip(qdf["event_type"], qdf["q5"]))
    hi_map = dict(zip(qdf["event_type"], qdf["q95"]))
    bref = ray.put((lo_map, hi_map))

    def partial(t: pa.Table) -> pd.DataFrame:
        lo_m, hi_m = ray.get(bref)
        et = t.column("event_type").to_pandas()
        # clip + sum over exact micro-units: the 6-decimal bounds and
        # milliunit values are both exact on the 1e-6 grid, so partial
        # sums are order-independent Python ints
        v6 = np.rint(t.column("value").to_numpy() * 1e6).astype(np.int64)
        lo6 = np.rint(et.map(lo_m).to_numpy(np.float64) * 1e6).astype(
            np.int64)
        hi6 = np.rint(et.map(hi_m).to_numpy(np.float64) * 1e6).astype(
            np.int64)
        clip6 = np.clip(v6, lo6, hi6).astype(object)
        return pd.DataFrame({"event_type": et, "n": np.int64(1),
                             "s6": clip6}) \
            .groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["event_type"],
        ["n", "s6"]
    )
    out["p05"] = out["event_type"].map(lo_map)
    out["p95"] = out["event_type"].map(hi_map)
    out["clipped_mean"] = round_half_away(
        np.array([int(x) for x in out["s6"]], dtype=np.float64)
        / out["n"].to_numpy(np.int64) / 1e6, 6
    )
    out["n"] = out["n"].astype(np.int64)
    return out[["event_type", "n", "p05", "p95", "clipped_mean"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


def q_rolling_active_users(sf_dir: str):
    """Rolling 7-day active users (sliding-window DISTINCT — the
    WAU metric): one hash-bucket shuffle co-locates each user, the
    kernel dedups (user, day), fans each active day into the ≤7 windows
    it covers, dedups (user, window) — exact because a user never
    straddles buckets — and emits clock-bounded (window, count)
    partials. Window bounds come from the partial stream itself (min
    window = first active day, max − 6 = last), no extra pass."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        act = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day}) \
            .drop_duplicates()
        n = len(act)
        win = (act["day"].to_numpy()[:, None] + np.arange(7, dtype=np.int64)).ravel()
        usr = np.repeat(act["user_id"].to_numpy(), 7)
        uw = pd.DataFrame({"user_id": usr, "win": win}).drop_duplicates()
        vc = uw["win"].value_counts()
        return pa.table(
            {
                "window_end": pa.array(vc.index.to_numpy(np.int64)),
                "active_users": pa.array(vc.to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["window_end"], ["active_users"])
    lo, hi = out["window_end"].min(), out["window_end"].max() - 6
    out = out[(out["window_end"] >= lo) & (out["window_end"] <= hi)]
    out["active_users"] = out["active_users"].astype(np.int64)
    return out.sort_values("window_end").reset_index(drop=True)


def q_lsh_topk(sf_dir: str):
    """Second ANN scale path (next to IVF): random-hyperplane LSH with
    multi-probe (stages/similarity.py::lsh_topk) over the SAME augmented
    table as ivf_topk. Identical copies share the query's sign pattern
    bit-for-bit, so the probe set provably contains the true top-10 and
    the exact brute-force SQL oracle gates the approximate index;
    pytest guards the full-radius ≡ brute-force identity and the
    probe-pruning behavior on raw vectors."""
    import pyarrow.parquet as pq

    emb = _augmented_embeddings(sf_dir)
    q1 = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 1))
    )
    queries = {
        "ids": np.array([1], dtype=np.int64),
        "matrix": np.array(q1.column("embedding").to_pylist(), dtype=np.float64),
    }
    out = lsh_topk(emb, queries, k=10, n_planes=12, probe_radius=2, seed=5)
    return out[["query_id", "vec_id", "cos"]].reset_index(drop=True)


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


# ---------------------------------------------------------------------------
# TPC-H Q6 / Q17 / Q3 shapes
# ---------------------------------------------------------------------------


def q_forecast_revenue(sf_dir: str):
    """Range-filter aggregation (TPC-H Q6 shape): revenue delta from a
    discount band in one ship-year. Map-only — pyarrow-compute filters
    inside the pruned scan, two scalar partials per block, driver sum.
    The canonical 'prune at the read' query: 4 of 11 columns leave
    storage and nothing shuffles at any scale."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_shipdate", "l_discount", "l_quantity",
                      "l_extendedprice"],
             num_blocks=_n_cpus())
    lo = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    hi = np.datetime64("1997-01-01").astype("datetime64[us]").astype(np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        ship = t.column("l_shipdate").cast(pa.timestamp("us")).to_numpy().astype(np.int64)
        disc = t.column("l_discount").to_numpy()
        qty = t.column("l_quantity").to_numpy()
        price = t.column("l_extendedprice").to_numpy()
        m = (ship >= lo) & (ship < hi) & (disc >= 0.04) & (disc <= 0.08) & (qty < 24.0)
        # exact fixed-point cents × discount% (the repo-wide sum recipe)
        rev4 = int((np.rint(price[m] * 100).astype(np.int64)
                    * np.rint(disc[m] * 100).astype(np.int64)).sum())
        return pd.DataFrame({"k": [0], "rev4": [rev4],
                             "n_lines": [int(m.sum())]})

    out = _combine_partials(
        li.map_batches(partial, batch_format="pyarrow"), ["k"],
        ["rev4", "n_lines"],
    )
    return pd.DataFrame(
        {
            "revenue": round_half_away(
                np.array([int(x) for x in out["rev4"]],
                         dtype=np.float64) / 10000.0, 2),
            "n_lines": out["n_lines"].astype(np.int64),
        }
    )


def q_small_qty_parts(sf_dir: str):
    """Correlated-average filter (TPC-H Q17 shape): revenue loss from
    lines ordering under half a part's average quantity, one brand.

    The brand prunes the part side to a broadcastable key set, so the
    correlated subquery is two map-only lineitem scans: (1) per-part
    (sum, count) partials -> driver combine (bounded by the brand's part
    count) -> broadcast thresholds; (2) threshold filter + scalar
    partials. Quantities are small integers, so sum/count averages are
    FP-exact and the comparison cannot flip between engines."""
    parts = _pq(sf_dir, "part", columns=["p_partkey", "p_brand"])
    keys = np.sort(
        np.concatenate(
            [b["p_partkey"].to_numpy()
             for b in parts.filter(expr="p_brand == 'Brand#4'")
             .iter_batches(batch_size=65536, batch_format="pandas")]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    keys_ref = ray.put(keys)
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _pq(sf_dir, "lineitem", columns=li_cols, num_blocks=_n_cpus())

    def avg_partial(t: pa.Table) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        pk = t.column("l_partkey").to_numpy()
        m = np.isin(pk, ks)
        df = pd.DataFrame({"l_partkey": pk[m],
                           "qty": t.column("l_quantity").to_numpy()[m]})
        agg = df.groupby("l_partkey", as_index=False).agg(
            s=("qty", "sum"), n=("qty", "size")
        )
        return agg

    stats = _combine_partials(
        li.map_batches(avg_partial, batch_format="pyarrow"),
        ["l_partkey"], ["s", "n"],
    ).sort_values("l_partkey")
    thr_ref = ray.put(
        (stats["l_partkey"].to_numpy(),
         0.5 * stats["s"].to_numpy(np.float64) / stats["n"].to_numpy(np.float64))
    )

    def rev_partial(t: pa.Table) -> pd.DataFrame:
        tk, thr = ray.get(thr_ref)
        pk = t.column("l_partkey").to_numpy()
        m = np.isin(pk, tk)
        qty = t.column("l_quantity").to_numpy()[m]
        price = t.column("l_extendedprice").to_numpy()[m]
        under = qty < thr[np.searchsorted(tk, pk[m])]
        return pd.DataFrame({"k": [0], "rev": [float(price[under].sum())],
                             "n_lines": [int(under.sum())]})

    out = _combine_partials(
        li.map_batches(rev_partial, batch_format="pyarrow"), ["k"],
        ["rev", "n_lines"],
    )
    return pd.DataFrame(
        {
            "avg_yearly": round_half_away(out["rev"].to_numpy() / 7.0, 2),
            "n_lines": out["n_lines"].astype(np.int64),
        }
    )


def q_shipping_priority(sf_dir: str):
    """Unshipped-order revenue top-10 (TPC-H Q3 shape).

    Fast plan (the large_orders lesson): the two filtered build sides —
    BUILDING custkeys, then (orderkey, orderdate) of their pre-cut
    orders — are CAPPED driver gathers broadcast into the lineitem
    scan, whose per-batch int64 fixed-point revenue partials combine
    under the same cap; zero shuffles end to end (measured 7.9 s → ~1 s
    at sf0.1 vs the native-join plan, whose two hash joins each carry
    2–4 s of fixed latency). Integer partials commute, so no bucket
    shuffle is needed for sum exactness. Past any cap the query falls
    back to the join plan below — at 100 TB the filtered build sides
    are customer-table-scale and the shuffle joins are the right
    answer; the caps pick the plan, not the semantics."""
    import ray

    cut = pd.Timestamp("1998-06-01")
    cut_us = pa.scalar(cut, type=pa.timestamp("us"))
    cap = 2_000_000
    gather_capped = _gather_capped

    bldg_df = gather_capped(
        _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
            num_blocks=_n_cpus())
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    if bldg_df is not None:
        ckeys = np.sort(bldg_df["c_custkey"].to_numpy(np.int64))
        ckeys_ref = ray.put(ckeys)

        def order_filter(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t.column("o_orderdate"), cut_us))
            oc = t.column("o_custkey").to_numpy(zero_copy_only=False)
            m, _ = _sorted_lookup(ray.get(ckeys_ref), oc)
            return t.filter(pa.array(m)).select(
                ["o_orderkey", "o_orderdate"]
            )

        ord_df = gather_capped(
            _pq(sf_dir, "orders",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
                num_blocks=_n_cpus())
            .map_batches(order_filter, batch_format="pyarrow")
        )
        if ord_df is not None:
            okeys = np.sort(ord_df["o_orderkey"].to_numpy(np.int64))
            okeys_ref = ray.put(okeys)

            def li_partial(t: pa.Table) -> pd.DataFrame:
                t = t.filter(pc.greater(t.column("l_shipdate"), cut_us))
                lk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
                m, _ = _sorted_lookup(ray.get(okeys_ref), lk)
                if not m.any():
                    return pd.DataFrame(
                        {"l_orderkey": np.zeros(0, np.int64),
                         "rev4": np.zeros(0, np.int64)}
                    )
                rev4 = _rev4(
                    t.column("l_extendedprice").to_numpy(
                        zero_copy_only=False)[m],
                    t.column("l_discount").to_numpy(zero_copy_only=False)[m],
                )
                return (
                    pd.DataFrame({"l_orderkey": lk[m], "rev4": rev4})
                    .groupby("l_orderkey", as_index=False)["rev4"].sum()
                )

            partials = _pq(
                sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount",
                         "l_shipdate"],
                num_blocks=_n_cpus(),
            ).map_batches(li_partial, batch_format="pyarrow")
            rev = _combine_partials(
                partials, ["l_orderkey"], ["rev4"], cap=cap
            )
            if rev is not None:
                if not len(rev):
                    return pd.DataFrame(
                        {"l_orderkey": pd.Series([], dtype=np.int64),
                         "revenue": pd.Series([], dtype=np.float64),
                         "o_orderdate": pd.Series(
                             [], dtype="datetime64[us]")}
                    )
                srt = ord_df.sort_values("o_orderkey")
                pos = np.searchsorted(
                    srt["o_orderkey"].to_numpy(np.int64),
                    rev["l_orderkey"].to_numpy(np.int64),
                )
                rev["o_orderdate"] = srt["o_orderdate"].to_numpy()[pos]
                rev["revenue"] = round_half_away(
                    rev["rev4"].to_numpy(np.int64) / 10000.0, 2
                )
                return (
                    rev.sort_values(["revenue", "l_orderkey"],
                                    ascending=[False, True])
                    .head(10)
                    .reset_index(drop=True)
                    [["l_orderkey", "revenue", "o_orderdate"]]
                )

    return _shipping_priority_join_plan(sf_dir, cut)


def _shipping_priority_join_plan(sf_dir: str, cut: pd.Timestamp):
    """Q3 at unbounded scale: 3-table native hash joins (customer semi
    -> orders -> lineitem) with date pushdown at every read, then ONE
    hash-bucket shuffle for complete per-order revenue (an order's
    lines never straddle buckets) and per-bucket top-10 partials merged
    on the driver — never a global sort."""
    from ..stages.temporal import _with_bucket

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


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (the k-means / IVF-training
    primitive: one mean vector per class over a `list<float>` column),
    emitted long-form (label, dim, centroid, n).

    Map-only + driver combine: each batch flattens its list column
    zero-copy (Arrow values buffer -> (n, d) numpy view), sums rows per
    label with one np.add.at, and emits (label, dim) partials — the
    partial stream is labels x dims x blocks, bounded at any corpus
    size, so no shuffle ever happens."""
    emb = _pq(sf_dir, "embeddings", columns=["embedding", "label"],
              num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding").combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        d = len(flat) // max(t.num_rows, 1)
        mat = flat.reshape(t.num_rows, d).astype(np.float64)
        labels = t.column("label").to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame(
            {
                "label": np.repeat(uniq, d).astype(np.int64),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
                "s": sums.ravel(),
                "n": np.repeat(counts, d),
            }
        )

    out = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], ["s", "n"],
    )
    out["centroid"] = round_half_away(
        out["s"].to_numpy() / out["n"].to_numpy(np.float64), 6
    )
    out["n"] = out["n"].astype(np.int64)
    return (
        out[["label", "dim", "centroid", "n"]]
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )


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


# ---------------------------------------------------------------------------
# round-3 widening II: Q7/Q10/Q15/Q16/Q19 join-aggregate shapes
# ---------------------------------------------------------------------------

def q_nation_trade_flows(sf_dir: str):
    """TPC-H Q7-shape cross-nation trade matrix: revenue shipped between
    every (supplier nation, customer nation) pair with supp ≠ cust, per
    ship year, 1996-1997. Same star plan as Q5
    (q_local_supplier_revenue): ONE lineitem ⋈ orders hash shuffle;
    supplier→nation and customer→nation broadcast once via ray.put; the
    driver combine is bounded by nations² × years (≤ 25·25·2), never by
    fact rows."""
    nation = _docs_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    cust = _docs_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cust_nat = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    dims_ref = ray.put((nat_name, supp_nat, cust_nat))

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_shipdate",
                      "l_extendedprice", "l_discount"],
             num_blocks=parts)

    def in_window(t: pa.Table) -> pa.Table:
        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), lo),
                    pc.less(t.column("l_shipdate"), hi))
        return t.filter(m)

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                 num_blocks=parts)

    # fast path: broadcast the (orderkey → custkey) map into the
    # lineitem scan (orders is the bounded side at gate scale); past the
    # cap the hash join below runs instead.
    joined = _broadcast_fact_attach(
        li, orders, "l_orderkey", "o_orderkey", ["o_custkey"],
        pre=in_window,
    )
    if joined is None:  # pragma: no cover - orders beyond broadcast cap
        joined = li.map_batches(in_window, batch_format="pyarrow").join(
            orders, join_type="inner", num_partitions=parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

    def partial(t: pa.Table) -> pd.DataFrame:
        nat_name_, supp_nat_, cust_nat_ = ray.get(dims_ref)
        df = t.to_pandas()
        sn = df["l_suppkey"].map(supp_nat_)
        cn = df["o_custkey"].map(cust_nat_)
        keep = sn.notna() & cn.notna() & (sn != cn)
        df = df[keep]
        if not len(df):
            return pd.DataFrame({"supp_nation": [], "cust_nation": [],
                                 "l_year": [], "n_lines": [], "revenue": []})
        year = (
            df["l_shipdate"].to_numpy().astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        # exact integer fixed-point (price in cents x (100 - disc pct)):
        # float sums of ~1e6 over hundreds of lines carry ~1e-4 absolute
        # noise -- enough to flip a cent at the .005 rounding boundary
        # between summation orders, so the oracle gate demands int64 sums
        rev4 = _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        out = pd.DataFrame({
            "supp_nation": sn[keep].map(nat_name_),
            "cust_nation": cn[keep].map(nat_name_),
            "l_year": year, "rev": rev4,
        })
        return out.groupby(
            ["supp_nation", "cust_nation", "l_year"], as_index=False
        ).agg(n_lines=("rev", "size"), revenue=("rev", "sum"))

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(
        partials, ["supp_nation", "cust_nation", "l_year"],
        ["n_lines", "revenue"],
    )
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["l_year"] = out["l_year"].astype(np.int64)
    out["revenue"] = round_half_away(
        out["revenue"].to_numpy(np.int64) / 10000.0, 2
    )
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


def q_returned_top_customers(sf_dir: str):
    """TPC-H Q10-shape: the 20 customers losing the most revenue to
    returned items (l_returnflag = 'R') among Q4-1996 orders. Plan: ONE
    lineitem ⋈ (date-pruned orders) hash shuffle → per-customer revenue
    partials (cap + distributed-groupby fallback, per-customer keys grow
    with the data) → top-20 on the bounded combine → winner attributes
    come from a broadcast-filtered SCAN of customer (20 keys via
    ray.put), never a driver read of the whole dimension."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                      "l_discount"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                            "o_orderdate"],
                 num_blocks=parts)

    def returned(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("l_returnflag"), "R"))

    def in_q(t: pa.Table) -> pa.Table:
        lo = pa.scalar(pd.Timestamp("1996-10-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"), lo),
                    pc.less(t.column("o_orderdate"), hi))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    # fast path: the Q4-1996 order slice is a bounded build side —
    # broadcast (orderkey → custkey) into the lineitem scan and skip the
    # hash join; past the cap the join plan below runs instead.
    ord_df = _gather_capped(orders.map_batches(in_q, batch_format="pyarrow"))
    if ord_df is not None:
        srt = ord_df.sort_values("o_orderkey")
        okeys_ref = ray.put(srt["o_orderkey"].to_numpy(np.int64))
        ocust_ref = ray.put(srt["o_custkey"].to_numpy(np.int64))

        def bcast_partial(t: pa.Table) -> pd.DataFrame:
            t = returned(t)
            lk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            m, i = _sorted_lookup(ray.get(okeys_ref), lk)
            if not m.any():
                return pd.DataFrame(
                    {"o_custkey": np.zeros(0, np.int64),
                     "revenue": np.zeros(0, np.int64)}
                )
            rev = _rev4(
                t.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
                t.column("l_discount").to_numpy(zero_copy_only=False)[m],
            )
            return pd.DataFrame(
                {"o_custkey": ray.get(ocust_ref)[i[m]], "revenue": rev}
            ).groupby("o_custkey", as_index=False)["revenue"].sum()

        partials = li.map_batches(bcast_partial, batch_format="pyarrow")
    else:  # pragma: no cover - order slice beyond broadcast cap
        joined = li.map_batches(returned, batch_format="pyarrow").join(
            orders.map_batches(in_q, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def partial(t: pa.Table) -> pd.DataFrame:
            df = t.to_pandas()
            # same exact fixed-point trick as nation_trade_flows
            df["rev"] = _rev4(df["l_extendedprice"].to_numpy(),
                              df["l_discount"].to_numpy())
            return df.groupby("o_custkey", as_index=False).agg(
                revenue=("rev", "sum")
            )

        partials = joined.map_batches(partial, batch_format="pyarrow")
    per_cust = _combine_partials(partials, ["o_custkey"], ["revenue"],
                                 cap=2_000_000)
    if per_cust is None:  # pragma: no cover - >2M active-customer regime
        from ray.data.aggregate import Sum

        per_cust = (
            partials.groupby("o_custkey")
            .aggregate(Sum("revenue", alias_name="revenue"))
            .to_pandas()
        )
    per_cust["revenue"] = round_half_away(
        per_cust["revenue"].to_numpy(np.int64) / 10000.0, 2
    )
    top = per_cust.sort_values(
        ["revenue", "o_custkey"], ascending=[False, True]
    ).head(20).rename(columns={"o_custkey": "c_custkey"})

    keys_ref = ray.put(set(int(k) for k in top["c_custkey"]))
    nation = _docs_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nat_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def pick_winners(t: pa.Table) -> pd.DataFrame:
        keys, nat = ray.get(keys_ref), ray.get(nat_ref)
        df = t.to_pandas()
        df = df[df["c_custkey"].isin(keys)].copy()
        df["n_name"] = df["c_nationkey"].map(nat)
        return df[["c_custkey", "c_name", "c_acctbal", "n_name"]]

    winners = (
        _pq(sf_dir, "customer",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
        .map_batches(pick_winners, batch_format="pyarrow")
        .to_pandas()
    )
    out = top.merge(winners, on="c_custkey", how="inner")
    return out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]
               ].sort_values(["revenue", "c_custkey"],
                             ascending=[False, True]).reset_index(drop=True)


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15-shape: the supplier(s) with maximum Q1-1996 shipped
    revenue (ties kept, like the view-based original). Map-only
    per-supplier revenue partials over the date-pruned lineitem scan
    (zero shuffles); the combine is bounded by the supplier dimension
    (cap + distributed fallback guards the unbounded regime); winner
    names attach from the supplier dim read."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                      "l_discount"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1996-04-01"), pa.timestamp("us"))
        t = t.filter(pc.and_(pc.greater_equal(t.column("l_shipdate"), lo),
                             pc.less(t.column("l_shipdate"), hi)))
        df = t.to_pandas()
        df["rev"] = _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        return df.groupby("l_suppkey", as_index=False).agg(
            total_rev=("rev", "sum")
        )

    partials = li.map_batches(partial, batch_format="pyarrow")
    rev = _combine_partials(partials, ["l_suppkey"], ["total_rev"],
                            cap=2_000_000)
    if rev is None:  # pragma: no cover - >2M supplier regime
        from ray.data.aggregate import Sum

        rev = (
            partials.groupby("l_suppkey")
            .aggregate(Sum("total_rev", alias_name="total_rev"))
            .to_pandas()
        )
    rev["total_rev"] = round_half_away(
        rev["total_rev"].to_numpy(np.int64) / 10000.0, 2
    )
    rev = rev[rev["total_rev"] == rev["total_rev"].max()]
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = rev.rename(columns={"l_suppkey": "s_suppkey"}).merge(
        supp, on="s_suppkey", how="inner"
    )
    return out[["s_suppkey", "s_name", "total_rev"]].sort_values(
        "s_suppkey"
    ).reset_index(drop=True)


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19-shape OR-of-ANDs predicate: revenue from lineitems
    matching any of three (brand, size-range, quantity-range) conjuncts.
    part attributes broadcast once via ray.put (partkey → (brand, size))
    so the whole query is a ZERO-shuffle map-only scan of lineitem with
    a 1-row-per-batch partial; revenue sums in exact integer fixed-point
    (see q_nation_trade_flows)."""
    part = _docs_small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    attrs_ref = ray.put((
        pd.Series(part["p_brand"].to_numpy(), index=part["p_partkey"]),
        pd.Series(part["p_size"].to_numpy(), index=part["p_partkey"]),
    ))
    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        brand_s, size_s = ray.get(attrs_ref)
        df = t.to_pandas()
        brand = df["l_partkey"].map(brand_s)
        size = df["l_partkey"].map(size_s)
        qty = df["l_quantity"].to_numpy()
        m = (
            ((brand == "Brand#12") & size.between(1, 5)
             & (qty >= 1) & (qty <= 11))
            | ((brand == "Brand#23") & size.between(1, 10)
               & (qty >= 10) & (qty <= 20))
            | ((brand == "Brand#34") & size.between(1, 15)
               & (qty >= 20) & (qty <= 30))
        ).to_numpy()
        rev4 = _rev4(df["l_extendedprice"].to_numpy()[m], df["l_discount"].to_numpy()[m])
        return pd.DataFrame({"k": [0], "revenue": [rev4.sum()],
                             "n_lines": [int(m.sum())]})

    partials = li.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["k"], ["revenue", "n_lines"])
    return pd.DataFrame({
        "revenue": round_half_away(
            out["revenue"].to_numpy(np.int64) / 10000.0, 2
        ),
        "n_lines": out["n_lines"].astype(np.int64),
    })


def q_supplier_part_variety(sf_dir: str):
    """TPC-H Q16-shape supplier variety: per (p_brand, size decade),
    how many DISTINCT suppliers shipped such parts (one brand excluded).
    part attrs broadcast; the count-distinct runs as per-batch
    triple dedup → capped driver combine of (brand, bucket, suppkey)
    triples; past the cap it falls back to ONE hash-bucket shuffle on
    the composite key (a triple lands in exactly one bucket, so
    in-bucket dedup is globally exact) followed by a bounded
    (brand × bucket) count combine — never a full sort-based
    count-distinct."""
    from ..stages.temporal import _with_bucket

    part = _docs_small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    attrs_ref = ray.put((
        pd.Series(part["p_brand"].to_numpy(), index=part["p_partkey"]),
        pd.Series(part["p_size"].to_numpy(), index=part["p_partkey"]),
    ))
    li = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"],
             num_blocks=_n_cpus())

    def triples(t: pa.Table) -> pd.DataFrame:
        brand_s, size_s = ray.get(attrs_ref)
        df = t.to_pandas()
        df["p_brand"] = df["l_partkey"].map(brand_s)
        df["size_bucket"] = (
            (df["l_partkey"].map(size_s).to_numpy(np.int64) - 1) // 10
        )
        df = df[df["p_brand"] != "Brand#13"]
        out = df[["p_brand", "size_bucket", "l_suppkey"]].drop_duplicates()
        out = out.copy()
        out["n"] = np.int64(1)
        return out

    trip = li.map_batches(triples, batch_format="pyarrow")
    comb = _combine_partials(
        trip, ["p_brand", "size_bucket", "l_suppkey"], ["n"], cap=2_000_000
    )
    if comb is not None:
        out = (
            comb[["p_brand", "size_bucket"]]
            .groupby(["p_brand", "size_bucket"], as_index=False)
            .size()
            .rename(columns={"size": "n_suppliers"})
        )
    else:  # pragma: no cover - >2M distinct-triple regime
        def add_key(t: pa.Table) -> pa.Table:
            b = t.column("p_brand").to_pandas().astype(str)
            k = (b + "|" + t.column("size_bucket").to_pandas().astype(str)
                 + "|" + t.column("l_suppkey").to_pandas().astype(str))
            return t.append_column("__k", pa.array(k, pa.string()))

        def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
            d = g.drop_duplicates(subset="__k")
            return d.groupby(
                ["p_brand", "size_bucket"], as_index=False
            ).agg(n_suppliers=("__k", "size"))

        per_bucket = (
            _with_bucket(trip.map_batches(add_key, batch_format="pyarrow"),
                         "__k", 64)
            .groupby("__bucket")
            .map_groups(bucket_counts, batch_format="pandas")
        )
        out = _combine_partials(
            per_bucket, ["p_brand", "size_bucket"], ["n_suppliers"]
        )
    out["n_suppliers"] = out["n_suppliers"].astype(np.int64)
    out["size_bucket"] = out["size_bucket"].astype(np.int64)
    return out.sort_values(["p_brand", "size_bucket"]).reset_index(drop=True)


def q_kmeans_assign(sf_dir: str):
    """One Lloyd assignment step of k-means over the embedding column:
    every vector goes to its nearest of k=8 deterministic seed centroids
    (the vectors with vec_id < 8), ties to the smaller seed id. The
    scale path for iterative clustering at 100 TB: seeds broadcast once
    via ray.put, each batch computes squared-L2 distances vectorized
    ((B,1,D)-(1,K,D) in float64), and the shuffle-free per-cluster
    partials (n, sum_d2) combine on the driver bounded by k."""
    import pyarrow.parquet as pq
    from ..stages.similarity import _emb_matrix

    seeds_t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 8)],
    ).sort_by("vec_id")
    seeds = _emb_matrix(seeds_t, "embedding")
    sids = seeds_t.column("vec_id").to_numpy()
    seeds_ref = ray.put((seeds, sids))

    emb = _pq(sf_dir, "embeddings", columns=["embedding"],
              num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        c, sid = ray.get(seeds_ref)
        x = _emb_matrix(t, "embedding")
        # (B, K) squared L2 via explicit difference (matches the
        # oracle's sum((x_i - c_i)^2) term by term in float64)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)  # first min = smallest sid
        best_d2 = d2[np.arange(len(x)), best]
        df = pd.DataFrame({"cluster": sid[best], "d2": best_d2})
        return df.groupby("cluster", as_index=False).agg(
            n=("d2", "size"), sum_d2=("d2", "sum")
        )

    partials = emb.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["cluster"], ["n", "sum_d2"])
    out["n"] = out["n"].astype(np.int64)
    out["avg_dist2"] = round_half_away(
        out["sum_d2"].to_numpy() / out["n"].to_numpy(), 6
    )
    return out[["cluster", "n", "avg_dist2"]].sort_values(
        "cluster"
    ).reset_index(drop=True)


def q_source_vocab(sf_dir: str):
    """Type-token profile per corpus source: total tokens and DISTINCT
    vocabulary size — the lexical-diversity screen of a training-data
    quality pass. Per-batch (source, token) count partials combine
    under a cap (vocabulary-sized stream); past it the fallback is ONE
    hash-bucket shuffle on the composite key with in-bucket dedup
    (globally exact — a pair lands in one bucket) and a
    source-bounded count combine."""
    from ..stages.temporal import _with_bucket

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


def q_triangle_count(sf_dir: str):
    """Triangle census of the derived link graph
    (stages/graph.py::triangle_stats): dedup'd low→high edge set, wedge
    join, closing-edge join — two hash shuffles end-to-end."""
    from ..stages.graph import triangle_stats

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    n_edges, n_wedges, n_triangles = triangle_stats(
        docs, n=n, num_partitions=parts
    )
    return pd.DataFrame({
        "n_edges": [np.int64(n_edges)],
        "n_wedges": [np.int64(n_wedges)],
        "n_triangles": [np.int64(n_triangles)],
    })


def q_corpus_mix(sf_dir: str):
    """Weighted deterministic corpus interleave
    (stages/packing.py::interleave_positions): even-numbered sources get
    weight 2, odd get 1; every doc receives its slot in the mixed
    training stream. Distinct-source weights come from a bounded
    per-batch combine; the rank itself is one hash-bucket shuffle."""
    from ..stages.packing import interleave_positions

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


def q_market_share(sf_dir: str):
    """TPC-H Q8-shape national market share: among 1996-1997 orders by
    EUROPE customers for PROMO-type parts, the per-order-year fraction
    of revenue supplied by NATION_3.

    Plan: the three filters (part type, customer region, supplier
    nation) are broadcast key sets built from driver reads of the
    dimension tables (the established dim-broadcast pattern of
    q_nation_trade_flows); the fact side pays ONE lineitem ⋈ orders
    hash shuffle, and the combine is bounded by distinct order years
    (2), never by fact rows. Revenue is exact int64 fixed-point
    (cents × (100 - disc pct)); only the final share divides."""
    part = _docs_small(sf_dir, "part", ["p_partkey", "p_type"])
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"].tolist())
    nation = _docs_small(sf_dir, "nation",
                         ["n_nationkey", "n_name", "n_regionkey"])
    region = _docs_small(sf_dir, "region", ["r_regionkey", "r_name"])
    euro_rk = int(region.loc[region["r_name"] == "EUROPE",
                             "r_regionkey"].iloc[0])
    euro_nats = set(
        nation.loc[nation["n_regionkey"] == euro_rk, "n_nationkey"].tolist()
    )
    n3 = int(nation.loc[nation["n_name"] == "NATION_3", "n_nationkey"].iloc[0])
    cust = _docs_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    euro_custs = set(
        cust.loc[cust["c_nationkey"].isin(euro_nats), "c_custkey"].tolist()
    )
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    n3_supps = set(supp.loc[supp["s_nationkey"] == n3, "s_suppkey"].tolist())
    dims_ref = ray.put((promo, euro_custs, n3_supps))

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"],
             num_blocks=parts)

    def promo_only(t: pa.Table) -> pa.Table:
        promo_, _, _ = ray.get(dims_ref)
        m = pc.is_in(t.column("l_partkey"),
                     value_set=pa.array(sorted(promo_), pa.int64()))
        return t.filter(m).drop_columns(["l_partkey"])

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"],
                 num_blocks=parts)

    def euro_window(t: pa.Table) -> pa.Table:
        _, euro_, _ = ray.get(dims_ref)
        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1998-01-01"), pa.timestamp("us"))
        m = pc.and_(
            pc.and_(pc.greater_equal(t.column("o_orderdate"), lo),
                    pc.less(t.column("o_orderdate"), hi)),
            pc.is_in(t.column("o_custkey"),
                     value_set=pa.array(sorted(euro_), pa.int64())),
        )
        t = t.filter(m)
        year = pc.add(pc.year(t.column("o_orderdate")), 0)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_year": pc.cast(year, pa.int64())})

    joined = _broadcast_fact_attach(
        li, orders.map_batches(euro_window, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["o_year"], pre=promo_only,
    )
    if joined is None:  # pragma: no cover - euro orders beyond cap
        joined = li.map_batches(promo_only, batch_format="pyarrow").join(
            orders.map_batches(euro_window, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

    def partial(t: pa.Table) -> pd.DataFrame:
        _, _, n3s = ray.get(dims_ref)
        df = t.to_pandas()
        rev4 = _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        isn3 = df["l_suppkey"].isin(n3s).to_numpy()
        out = pd.DataFrame({"o_year": df["o_year"].to_numpy(np.int64),
                            "num": np.where(isn3, rev4, 0), "den": rev4})
        return out.groupby("o_year", as_index=False)[["num", "den"]].sum()

    out = _combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_year"], ["num", "den"],
    )
    out["mkt_share"] = round_half_away(
        out["num"].to_numpy(np.float64) / out["den"].to_numpy(np.float64), 6
    )
    out["o_year"] = out["o_year"].astype(np.int64)
    return out[["o_year", "mkt_share"]].sort_values("o_year").reset_index(
        drop=True
    )


def q_product_profit(sf_dir: str):
    """TPC-H Q9-shape product-type profit: revenue from parts whose name
    contains 'red', grouped by supplier nation × order year. Same
    dim-broadcast + single fact shuffle plan as q_market_share; the
    combine is bounded by nations × years (≤ 25 × 7)."""
    part = _docs_small(sf_dir, "part", ["p_partkey", "p_name"])
    red = set(
        part.loc[part["p_name"].str.contains("red"), "p_partkey"].tolist()
    )
    nation = _docs_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    supp_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    dims_ref = ray.put((red, supp_nat, nat_name))

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"],
             num_blocks=parts)

    def red_only(t: pa.Table) -> pa.Table:
        red_, _, _ = ray.get(dims_ref)
        m = pc.is_in(t.column("l_partkey"),
                     value_set=pa.array(sorted(red_), pa.int64()))
        return t.filter(m).drop_columns(["l_partkey"])

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
                 num_blocks=parts)

    def year_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
        })

    joined = _broadcast_fact_attach(
        li, orders.map_batches(year_of, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["o_year"], pre=red_only,
    )
    if joined is None:  # pragma: no cover - orders beyond broadcast cap
        joined = li.map_batches(red_only, batch_format="pyarrow").join(
            orders.map_batches(year_of, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

    def partial(t: pa.Table) -> pd.DataFrame:
        _, supp_nat_, nat_name_ = ray.get(dims_ref)
        df = t.to_pandas()
        rev4 = _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        out = pd.DataFrame({
            "nation": df["l_suppkey"].map(supp_nat_).map(nat_name_),
            "o_year": df["o_year"].to_numpy(np.int64),
            "profit4": rev4,
        })
        return out.groupby(["nation", "o_year"], as_index=False)[
            "profit4"
        ].sum()

    out = _combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["nation", "o_year"], ["profit4"],
    )
    out["profit"] = round_half_away(
        out["profit4"].to_numpy(np.int64) / 10000.0, 2
    )
    out["o_year"] = out["o_year"].astype(np.int64)
    return out[["nation", "o_year", "profit"]].sort_values(
        ["nation", "o_year"]
    ).reset_index(drop=True)


def q_important_parts(sf_dir: str):
    """TPC-H Q11-shape important stock: parts whose lineitem revenue
    exceeds 1.5x the MEAN per-part revenue — the scale-invariant analog
    of Q11's 0.0001/SF fraction (a fixed corpus share selects nothing
    once part count grows). Per-part keys grow with the data, so the
    per-batch partials flow through _combine_partials under a cap with
    a distributed groupby-sum fallback; the threshold compare is exact
    integer (2·value·n > 3·total — no float)."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_discount"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rev4 = _rev4(df["l_extendedprice"].to_numpy(), df["l_discount"].to_numpy())
        out = pd.DataFrame({"p_partkey": df["l_partkey"].to_numpy(np.int64),
                            "rev4": rev4})
        return out.groupby("p_partkey", as_index=False)["rev4"].sum()

    partials = li.map_batches(partial, batch_format="pyarrow")
    per_part = _combine_partials(partials, ["p_partkey"], ["rev4"],
                                 cap=2_000_000)
    if per_part is None:  # pragma: no cover - >2M distinct parts regime
        from ray.data.aggregate import Sum

        per_part = (
            partials.groupby("p_partkey")
            .aggregate(Sum("rev4", alias_name="rev4"))
            .to_pandas()
        )
    total = int(per_part["rev4"].sum())
    n_parts = len(per_part)
    keep = per_part[
        per_part["rev4"].to_numpy(np.int64).astype(object) * (2 * n_parts)
        > 3 * total
    ].copy()
    keep["value"] = round_half_away(keep["rev4"].to_numpy(np.int64) / 10000.0, 2)
    keep["p_partkey"] = keep["p_partkey"].astype(np.int64)
    return keep[["p_partkey", "value"]].sort_values(
        ["value", "p_partkey"], ascending=[False, True]
    ).reset_index(drop=True)


def q_waiting_orders(sf_dir: str):
    """TPC-H Q21-shape sole-delay supplier: among multi-supplier 'F'
    orders, credit the supplier holding the order's UNIQUE latest
    shipdate; top 10 suppliers by wait count.

    Plan: lineitem ⋈ (F-filtered orders) hash join, then ONE hash-bucket
    shuffle on l_orderkey so each order's lines are co-located; the
    per-bucket kernel computes max-shipdate uniqueness with vectorized
    pandas groupby transforms. Per-supplier wait counts combine under a
    cap (supplier count grows with SF) with a distributed fallback;
    winner names come from the supplier dim broadcast."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_shipdate"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderstatus"], num_blocks=parts)

    def f_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.equal(t.column("o_orderstatus"), "F")
        ).select(["o_orderkey"])

    joined = li.join(
        orders.map_batches(f_only, batch_format="pyarrow"),
        join_type="inner", num_partitions=parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def bucket_waits(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("l_orderkey")
        multi = grp["l_suppkey"].transform("nunique") >= 2
        at_max = g["l_shipdate"] == grp["l_shipdate"].transform("max")
        sub = g[multi & at_max]
        w = sub.groupby("l_orderkey")["l_suppkey"].agg(["nunique", "min"])
        winners = w.loc[w["nunique"] == 1, "min"]
        vc = winners.value_counts()
        return pd.DataFrame({
            "s_suppkey": vc.index.to_numpy(np.int64),
            "numwait": vc.to_numpy(np.int64),
        })

    per_bucket = (
        _with_bucket(joined, "l_orderkey", 32)
        .groupby("__bucket")
        .map_groups(bucket_waits, batch_format="pandas")
    )
    waits = _combine_partials(per_bucket, ["s_suppkey"], ["numwait"],
                              cap=2_000_000)
    if waits is None:  # pragma: no cover - >2M suppliers regime
        from ray.data.aggregate import Sum

        waits = (
            per_bucket.groupby("s_suppkey")
            .aggregate(Sum("numwait", alias_name="numwait"))
            .to_pandas()
        )
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = waits.merge(supp, on="s_suppkey", how="inner")
    out["numwait"] = out["numwait"].astype(np.int64)
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out.sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True]
    ).head(10)[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2-shape min-cost supplier: for every part with p_size >= 30
    the supplier offering the lowest lineitem price (cents, exact int),
    tie-broken by the smallest suppkey.

    The per-part minimum is a MERGEABLE partial: each batch compacts to
    one (partkey → lexicographic-min (price, suppkey)) row via
    sort+drop_duplicates, and the driver combine re-applies the same
    kernel under a cap. Past the cap a hash-bucket shuffle co-locates
    each part's offers so the in-bucket kernel is globally exact. Winner
    names come from the already-read part dim and the supplier dim
    broadcast."""
    part = _docs_small(sf_dir, "part", ["p_partkey", "p_name", "p_size"])
    big = part[part["p_size"] >= 30]
    keys = set(big["p_partkey"].tolist())
    keys_ref = ray.put(keys)

    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_extendedprice"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        m = pc.is_in(t.column("l_partkey"),
                     value_set=pa.array(sorted(ks), pa.int64()))
        t = t.filter(m)
        df = pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "s_suppkey": t.column("l_suppkey").to_numpy(),
            "price_cents": np.rint(
                t.column("l_extendedprice").to_numpy() * 100
            ).astype(np.int64),
        })
        return df.sort_values(
            ["p_partkey", "price_cents", "s_suppkey"]
        ).drop_duplicates("p_partkey")

    partials = li.map_batches(partial, batch_format="pyarrow")
    cap = 2_000_000
    frames: list[pd.DataFrame] = []
    total = 0
    best: pd.DataFrame | None = None
    for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > cap:
            best = None
            break
    else:
        best = (
            pd.concat(frames, ignore_index=True)
            .sort_values(["p_partkey", "price_cents", "s_suppkey"])
            .drop_duplicates("p_partkey")
            if frames
            else pd.DataFrame({"p_partkey": [], "s_suppkey": [],
                               "price_cents": []})
        )
    if best is None:  # pragma: no cover - >2M qualifying parts regime
        from ..stages.temporal import _with_bucket

        def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(
                ["p_partkey", "price_cents", "s_suppkey"]
            ).drop_duplicates("p_partkey")

        best = (
            _with_bucket(partials, "p_partkey", 64)
            .groupby("__bucket")
            .map_groups(bucket_min, batch_format="pandas")
            .to_pandas()[["p_partkey", "s_suppkey", "price_cents"]]
        )
    supp = _docs_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = best.merge(big[["p_partkey", "p_name"]], on="p_partkey").merge(
        supp, on="s_suppkey"
    )
    out["price"] = round_half_away(
        out["price_cents"].to_numpy(np.int64) / 100.0, 2
    )
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out[["p_partkey", "p_name", "s_suppkey", "s_name", "price"]
               ].sort_values("p_partkey").reset_index(drop=True)


def q_priority_linecounts(sf_dir: str):
    """TPC-H Q12-shape conditional line counts: 1996-shipped lineitems
    joined to their order header, counting URGENT/HIGH-priority vs other
    lines per l_linestatus. ONE fact-fact hash shuffle; the combine is
    bounded by distinct linestatus values."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linestatus", "l_shipdate"],
             num_blocks=parts)

    def in_1996(t: pa.Table) -> pa.Table:
        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), lo),
                    pc.less(t.column("l_shipdate"), hi))
        return t.filter(m).select(["l_orderkey", "l_linestatus"])

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderpriority"], num_blocks=parts)
    joined = li.map_batches(in_1996, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        hi = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        out = pd.DataFrame({
            "l_linestatus": df["l_linestatus"],
            "high_line_count": np.where(hi, 1, 0).astype(np.int64),
            "low_line_count": np.where(hi, 0, 1).astype(np.int64),
        })
        return out.groupby("l_linestatus", as_index=False).sum()

    out = _combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["l_linestatus"], ["high_line_count", "low_line_count"],
    )
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


def q_dominant_supplier_counts(sf_dir: str):
    """TPC-H Q20-shape dominant-share semi-aggregate: per supplier, how
    many parts it dominated in 1996 (its shipped quantity strictly more
    than half the part's total — exact int compare on centiquantities).

    ONE hash-bucket shuffle on l_partkey co-locates a part's 1996 lines;
    the in-bucket kernel computes part totals and (part, supplier) sums
    together and emits per-supplier domination counts, which combine
    under a supplier-cardinality cap with a distributed fallback."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
             num_blocks=_n_cpus())

    def in_1996(t: pa.Table) -> pa.Table:
        lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), lo),
                    pc.less(t.column("l_shipdate"), hi))
        t = t.filter(m)
        q100 = pc.cast(pc.round(pc.multiply(t.column("l_quantity"), 100.0)),
                       pa.int64())
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "l_suppkey": t.column("l_suppkey"),
                         "q100": q100})

    def bucket_dominators(g: pd.DataFrame) -> pd.DataFrame:
        pair = g.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "q100"
        ].sum()
        tot = pair.groupby("l_partkey")["q100"].transform("sum")
        dom = pair[pair["q100"] * 2 > tot]
        vc = dom["l_suppkey"].value_counts()
        return pd.DataFrame({
            "s_suppkey": vc.index.to_numpy(np.int64),
            "n_parts": vc.to_numpy(np.int64),
        })

    per_bucket = (
        _with_bucket(li.map_batches(in_1996, batch_format="pyarrow"),
                     "l_partkey", 32)
        .groupby("__bucket")
        .map_groups(bucket_dominators, batch_format="pandas")
    )
    out = _combine_partials(per_bucket, ["s_suppkey"], ["n_parts"],
                            cap=2_000_000)
    if out is None:  # pragma: no cover - >2M suppliers regime
        from ray.data.aggregate import Sum

        out = (
            per_bucket.groupby("s_suppkey")
            .aggregate(Sum("n_parts", alias_name="n_parts"))
            .to_pandas()
        )
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return out.sort_values(
        ["n_parts", "s_suppkey"], ascending=[False, True]
    ).reset_index(drop=True)


def q_value_zscore(sf_dir: str):
    """Per-event-type z-score of every event's value — the
    broadcast-moments window shape: per-group (n, Σv, Σv²) sufficient
    stats on EXACT fixed-point milliunits (Python-int Σv² so the second
    moment can't overflow int64 at scale) combine driver-side (groups =
    event types, bounded), broadcast once via ray.put, and a map-only
    second pass computes z = (v·n − Σv)/√(n·Σv² − Σv²) identically to
    the oracle's HUGEINT arithmetic — shared exact integer operands make
    the final float hash-stable; both sides round to 6."""
    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v3 = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1),
            "s": v3,
            "ss": [int(x) * int(x) for x in v3],  # Python ints: no overflow
        })
        return df.groupby("event_type", as_index=False).sum()

    stats = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "s", "ss"],
    )
    import math

    # the discriminant n·Σv² − (Σv)² exceeds 2^53, so it must be closed
    # over EXACT Python ints before the one rounding int→double both
    # engines share (DuckDB casts the same HUGEINT); the numerator
    # v·n − Σv stays well inside int64
    mom = pd.DataFrame({
        "event_type": stats["event_type"],
        "__n": stats["n"].astype(np.int64),
        "__s": stats["s"].astype(np.int64),
        "__d": [
            math.sqrt(int(r.n) * int(r.ss) - int(r.s) * int(r.s))
            for r in stats.itertuples()
        ],
    })
    mom_ref = ray.put(mom)

    def zmap(t: pa.Table) -> pd.DataFrame:
        m = ray.get(mom_ref)
        df = pd.DataFrame({
            "event_id": t.column("event_id").to_numpy(),
            "event_type": t.column("event_type").to_pandas(),
            "__v": np.rint(t.column("value").to_numpy() * 1000).astype(
                np.int64
            ),
        }).merge(m, on="event_type", how="left")
        num = (df["__v"].to_numpy(np.int64) * df["__n"].to_numpy(np.int64)
               - df["__s"].to_numpy(np.int64))
        d = df["__d"].to_numpy(np.float64)
        z = np.where(d > 0, num.astype(np.float64) / d, 0.0)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "event_type": df["event_type"],
            "z": round_half_away(z, 6),
        })

    return ev.map_batches(zmap, batch_format="pyarrow").sort("event_id")


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


def q_value_mad(sf_dir: str):
    """Per-event-type robust center/spread: exact median and MAD of the
    value column via a BOUNDED-DOMAIN HISTOGRAM — values quantize to
    milliunits, so the per-(type, v3) count partials are capped by the
    value domain (≤ types × 561k rows at ANY corpus scale), and the
    driver closes both medians from cumulative counts in exact
    half-integer arithmetic that the oracle's quantile interpolation
    reproduces bit-for-bit."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "v3": np.rint(t.column("value").to_numpy() * 1000).astype(
                np.int64
            ),
            "n": np.int64(1),
        })
        return df.groupby(["event_type", "v3"], as_index=False)["n"].sum()

    hist = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v3"], ["n"],
    )

    def hist_median2(vals: np.ndarray, cnts: np.ndarray) -> int:
        """2× the interpolated median of a weighted int histogram
        (sorted by value) — exact integer."""
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        i1 = int(np.searchsorted(cum, (n - 1) // 2 + 1))
        i2 = int(np.searchsorted(cum, n // 2 + 1))
        return int(vals[i1]) + int(vals[i2])

    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("v3")
        vals = g["v3"].to_numpy(np.int64)
        cnts = g["n"].to_numpy(np.int64)
        m2 = hist_median2(vals, cnts)  # 2·median in milliunits
        dv = np.abs(2 * vals - m2)  # |v − med| in half-milliunits
        dh = pd.DataFrame({"dv": dv, "n": cnts}).groupby(
            "dv", as_index=False
        )["n"].sum().sort_values("dv")
        d2 = hist_median2(dh["dv"].to_numpy(np.int64),
                          dh["n"].to_numpy(np.int64))
        rows.append({
            "event_type": et,
            "med": round_half_away(np.array([m2 / 2 / 1000.0]), 6)[0],
            "mad": round_half_away(np.array([d2 / 4 / 1000.0]), 6)[0],
        })
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


def q_event_type_pairs(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users performed both. ONE hash-bucket shuffle on user_id
    co-locates a user's rows; the in-bucket kernel dedups (user, type)
    and self-merges per user; the pair partials combine bounded by
    type-vocabulary²."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"],
             num_blocks=_n_cpus())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"]).size()
        return pd.DataFrame({
            "type_a": out.index.get_level_values(0),
            "type_b": out.index.get_level_values(1),
            "n_users": out.to_numpy(np.int64),
        })

    per_bucket = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    out = _combine_partials(per_bucket, ["type_a", "type_b"], ["n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q_daily_value_change(sf_dir: str):
    """Aggregate-then-window: daily value totals (exact milliunit int
    sums, clock-bounded combine) with day-over-day percent change closed
    on the driver from the SAME exact integers the oracle's lag() sees —
    the canonical small-series window after a big distributed reduce."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"], num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        v3 = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        return pd.DataFrame({"day": day, "s3": v3}).groupby(
            "day", as_index=False
        )["s3"].sum()

    d = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["s3"]
    ).sort_values("day").reset_index(drop=True)
    s3 = d["s3"].to_numpy(np.int64)
    prev = np.roll(s3, 1)
    keep = np.arange(len(d)) > 0
    keep &= prev != 0
    out = pd.DataFrame({
        "day": d["day"].to_numpy(np.int64)[keep],
        "total": round_half_away(s3[keep] / 1000.0, 6),
        "pct_change": round_half_away(
            (s3[keep] - prev[keep]).astype(np.float64) / prev[keep], 6
        ),
    })
    return out.sort_values("day").reset_index(drop=True)


def q_kmeans_1d(sf_dir: str):
    """Iterative Lloyd's k-means (k=4, 2 refinement rounds) over the
    event-value axis — the distributed iterative-algorithm family with
    an EXACT oracle: a single pass builds the bounded-domain milliunit
    histogram (the same domain-capped combine as q_value_mad), then both
    refinement rounds run driver-side on the weighted histogram with
    centroids as int-exact rationals, so the oracle's unrolled CTE chain
    assigns and averages bit-identically. At corpus scale the histogram
    stays ≤ |value domain| rows regardless of row count — iterating on
    it costs no further cluster passes."""
    ev = _pq(sf_dir, "events", columns=["value"], num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v3 = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        return pd.DataFrame({"v3": v3, "n": np.int64(1)}).groupby(
            "v3", as_index=False
        )["n"].sum()

    hist = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["v3"], ["n"]
    ).sort_values("v3").reset_index(drop=True)
    vals = hist["v3"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    mn, mx = float(vals.min()), float(vals.max())
    k = 4
    cents = np.array([mn + (mx - mn) * (2 * i + 1) / (2.0 * k)
                      for i in range(k)])

    fv = vals.astype(np.float64)
    assign = None
    for _ in range(2):
        # argmin over |v − c_j|, first-min tie-break (matches the
        # oracle's ORDER BY dist, i LIMIT 1)
        d = np.abs(fv[:, None] - cents[None, :])
        assign = np.argmin(d, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                s = int((vals[m] * cnts[m]).sum())
                n = int(cnts[m].sum())
                cents[j] = float(s) / float(n)
    out = []
    for j in range(k):
        m = assign == j
        if not m.any():  # pragma: no cover - empty cluster
            continue
        n = int(cnts[m].sum())
        s = int((vals[m] * cnts[m]).sum())
        out.append({"cluster": np.int64(j), "n": np.int64(n),
                    "centroid": round_half_away(
                        np.array([float(s) / float(n) / 1000.0]), 6)[0]})
    return pd.DataFrame(out).sort_values("cluster").reset_index(drop=True)


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

    from ..sources.tables import write_partitioned

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


def q_user_drawdown(sf_dir: str):
    """Per-user running-max / drawdown window: for every event, the
    user's cumulative value peak so far and how far below it this event
    sits — the cummax window op (monotone-accumulate, not cumsum). ONE
    hash-bucket shuffle on user_id; in-bucket pandas sort + C-kernel
    groupby cummax on exact milliunit ints; row order within a user is
    pinned by (ts, event_id) so LAG-free determinism holds."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        v3 = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        g = g.assign(__v3=v3)
        peak = g.groupby("user_id")["__v3"].cummax().to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "peak": round_half_away(peak / 1000.0, 6),
            "drawdown": round_half_away((peak - v3) / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")


def q_key_skew(sf_dir: str):
    """Partition-skew diagnostic: the distribution of per-user event
    counts as a count-of-counts histogram — the measurement that decides
    when a groupby key needs salting. ONE hash-bucket shuffle computes
    exact per-user counts (users never straddle buckets); the
    count-of-counts partial stream is bounded by the max per-key
    multiplicity, not by users."""
    from ..stages.temporal import _with_bucket

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


def q_latest_events(sf_dir: str):
    """Dedup-by-recency (the CDC / ingest-compaction op): keep each
    (user, day)'s LAST event — max ts, event_id tie-break — emitting one
    surviving row per key. ONE hash-bucket shuffle on user_id (a user's
    rows carry all its days); the in-bucket kernel is a vectorized
    sort + drop_duplicates(keep=last), globally exact because keys never
    straddle buckets."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        g = g.assign(day=day)
        g = g.sort_values(["user_id", "day", "ts", "event_id"])
        last = g.drop_duplicates(["user_id", "day"], keep="last")
        return pd.DataFrame({
            "user_id": last["user_id"].to_numpy(np.int64),
            "day": last["day"].to_numpy(np.int64),
            "event_id": last["event_id"].to_numpy(np.int64),
            "event_type": last["event_type"].to_numpy(dtype=object),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort(["user_id", "day"])


def q_source_diversity(sf_dir: str):
    """Per-source token diversity: Simpson index 1 − Σc²/N² floor-scaled
    to 1e6 — the corpus-mix health metric, chosen over Shannon entropy
    because it closes over EXACT integers (Σc² in unbounded Python ints
    / HUGEINT; no libm log can cross the hash gate). The (source, token)
    count partials shuffle vocabulary-sized through the capped combine;
    Σc² per source is then a bounded fold."""
    docs = _pq(sf_dir, "documents", columns=["source", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column("text").to_pandas().fillna("")
        src = t.column("source").to_pandas()
        toks = texts.str.lower().str.findall(r"\w+")
        lens = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().dropna().to_numpy(dtype=object)
        srcs = np.repeat(src.to_numpy(dtype=object), lens)
        df = pd.DataFrame({"source": srcs, "tok": flat, "n": np.int64(1)})
        return df.groupby(["source", "tok"], as_index=False)["n"].sum()

    partials = docs.map_batches(partial, batch_format="pyarrow")
    counts = _combine_partials(partials, ["source", "tok"], ["n"],
                               cap=2_000_000)
    if counts is None:  # pragma: no cover - vocab past the driver cap
        from ray.data.aggregate import Sum

        summed = partials.groupby(["source", "tok"]).aggregate(
            Sum("n", alias_name="n")
        )

        def sq_partial(t: pa.Table) -> pd.DataFrame:
            df = t.to_pandas()
            return pd.DataFrame({
                "source": df["source"],
                "n_tok": df["n"].astype(np.int64),
                "sq": [int(x) * int(x) for x in df["n"]],
            }).groupby("source", as_index=False).sum()

        counts = None
        folded = _combine_partials(
            summed.map_batches(sq_partial, batch_format="pyarrow"),
            ["source"], ["n_tok", "sq"],
        )
    else:
        counts["sq"] = [int(x) * int(x) for x in counts["n"]]
        counts["n_tok"] = counts["n"].astype(np.int64)
        folded = counts.groupby("source", as_index=False)[
            ["n_tok", "sq"]
        ].sum()
    out_rows = []
    for r in folded.itertuples():
        n, sq = int(r.n_tok), int(r.sq)
        out_rows.append({
            "source": r.source,
            "n_tokens": np.int64(n),
            "simpson6": np.int64((n * n - sq) * 1_000_000 // (n * n)),
        })
    return pd.DataFrame(out_rows).sort_values("source").reset_index(drop=True)


def q_click_to_purchase(sf_dir: str):
    """Attribution-window lead join: for every click, how many purchases
    the SAME user makes within the following 7 days (exclusive of the
    click instant) — the conversion-attribution op. ONE hash-bucket
    shuffle on user_id co-locates each user's clicks and purchases; the
    in-bucket kernel sorts each user's purchase timestamps once and
    answers every click with two vectorized np.searchsorted calls
    (O((C+P) log P) per user, never the C×P self-join the naive SQL
    plan would do)."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    win = np.int64(7 * 86_400_000_000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        is_p = (g["event_type"] == "purchase").to_numpy()
        is_c = (g["event_type"] == "click").to_numpy()
        p_uid, p_ts = uid[is_p], ts[is_p]
        c_uid, c_ts = uid[is_c], ts[is_c]
        # ≤-semantics both edges (shared lexsort merge-count helper)
        lo = _merge_count(p_uid, p_ts, c_uid, c_ts)
        hi = _merge_count(p_uid, p_ts, c_uid, c_ts + win)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[is_c],
            "n_purchases_7d": (hi - lo).astype(np.int64),
        })

    out = (
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")


def q_revenue_gini(sf_dir: str):
    """Revenue concentration (exact Gini over per-customer revenue) —
    the GLOBAL-ORDER aggregate done distributed end-to-end: no driver
    sort, no global rank materialization.

    Plan: (1) per-customer exact int revenue via the one-shuffle
    lineitem ⋈ orders + custkey-bucket partials; (2) a VALUE-RANGE
    second shuffle (16 ordered buckets on evenly spaced revenue
    boundaries — skew affects balance, never exactness); (3) each
    ordered bucket locally sorts and emits (count, Σx, Σi₀·x) with
    bucket-local 1-based ranks; (4) the driver closes
    Σi·x = Σ_b (six_b + offset_b·sx_b) over B=16 rows using cumulative
    counts as offsets — valid because ties contribute the same Σi·x
    under ANY permutation, so bucket-boundary tie splits are harmless.
    All sums are unbounded Python ints (Σi·x overflows int64 at ~2M
    customers); the oracle closes the same HUGEINT formula
    gini6 = ⌊(2Σix − (n+1)Σx)·10⁶ / (n·Σx)⌋."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    joined = _li_orders_custkey(sf_dir, parts)

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        return _per_customer_rev4(g)[["x"]]

    revs = (
        _with_bucket(joined, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(per_cust, batch_format="pandas")
    ).materialize()  # consumed twice: bounds scan + range shuffle

    # range boundaries from the exact global min/max (two scalar
    # partials per block — one cheap pass)
    def mm(t: pa.Table) -> pd.DataFrame:
        x = t.column("x").to_numpy()
        return pd.DataFrame({"k": [0], "mn": [int(x.min())],
                             "mx": [int(x.max())]}) if len(x) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mn": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    bounds = pd.concat(
        list(revs.map_batches(mm, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )
    lo, hi = int(bounds["mn"].min()), int(bounds["mx"].max())
    n_rb = 16
    width = max(1, (hi - lo) // n_rb + 1)

    def to_range_bucket(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy()
        rb = ((x - lo) // width).astype(np.int64)
        return pa.table({"x": t.column("x"), "__rb": pa.array(rb)})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(g["x"].to_numpy(np.int64))
        xo = x.astype(object)  # unbounded ints: Σi·x overflows int64
        i0 = np.arange(1, len(x) + 1, dtype=np.int64).astype(object)
        return pd.DataFrame({
            "rb": [np.int64(g["__rb"].iloc[0])],
            "cnt": [np.int64(len(x))],
            "sx": [str(int(xo.sum()))],       # strings: exceed int64
            "six": [str(int((i0 * xo).sum()))],
        })

    stats = pd.concat(
        list(
            revs.map_batches(to_range_bucket, batch_format="pyarrow")
            .groupby("__rb")
            .map_groups(bucket_stats, batch_format="pandas")
            .iter_batches(batch_size=1024, batch_format="pandas")
        ),
        ignore_index=True,
    ).sort_values("rb")

    n = int(stats["cnt"].sum())
    sx = sum(int(s) for s in stats["sx"])
    six = 0
    offset = 0
    for r in stats.itertuples():
        six += int(r.six) + offset * int(r.sx)
        offset += int(r.cnt)
    gini6 = (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx)
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "total_rev": round_half_away(np.array([sx / 10000.0]), 2),
        "gini6": [np.int64(gini6)],
    })


def q_range_moving_sum(sf_dir: str):
    """Time-RANGE window frame (vs q_moving_avg's ROWS frame): per
    event, the user's value sum over the trailing 24 HOURS — the frame
    every rate-limit / rolling-exposure feature uses. ONE hash-bucket
    shuffle on user_id; the in-bucket kernel is per-user prefix sums +
    one vectorized searchsorted for the window's left edge (O(n log n)
    per bucket, no per-row loop). Exact milliunit int sums; ties inside
    a user share a timestamp and are all included (RANGE semantics —
    frame bounds depend on ts VALUE, not row position)."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())
    win = np.int64(24 * 3600 * 1_000_000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        v3 = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(v3)])  # prefix sums

        # RANGE frame bounds via the shared lexsort merge-count: rows of
        # OTHER users appear in both edge counts and cancel in
        # cs[hi] − cs[lo], so no segment clamping is needed
        lo = _merge_count(uid, ts, uid, ts - win, q_first=True)
        hi = _merge_count(uid, ts, uid, ts, q_first=False)
        s3 = cs[hi] - cs[lo]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "sum_24h": round_half_away(s3 / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")


def q_missing_days(sf_dir: str):
    """Calendar-gap detection: days inside the stream's [min, max] span
    with ZERO events — the data-freshness / ingestion-hole check, over
    the sparse slice ``event_id % 397 == 0`` (denser slices still cover
    every day of the 30-day span, so their gap set is degenerately
    empty). The
    distinct-day set is a clock-bounded combine (days, not rows); the
    complement closes on the driver against the integer day range."""
    ev = _pq(sf_dir, "events", columns=["event_id", "ts"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()[eid % 397 == 0]
        day = np.unique(ts // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"day": day, "n": np.int64(1)})

    days = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["n"]
    )["day"].to_numpy(np.int64)
    full = np.arange(days.min(), days.max() + 1, dtype=np.int64)
    missing = np.setdiff1d(full, days)
    return pd.DataFrame({"day": missing})


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


def q_customer_revenue_pctile(sf_dir: str):
    """Distributed GLOBAL percent-rank per customer (the companion op to
    q_revenue_gini's global-order aggregate, but materializing the rank
    itself): per-customer exact revenue → ordered value-range buckets →
    in-bucket min-rank + cumulative bucket offsets. Ties are safe by
    construction — equal revenues map to the SAME range bucket, so
    rank() min-tie semantics close in-bucket. No driver sort; the
    output is the per-customer table itself. pct6 =
    ⌊(rank−1)·10⁶/(n−1)⌋ exact-integer both sides."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    joined = _li_orders_custkey(sf_dir, parts)

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        return _per_customer_rev4(g)

    revs = (
        _with_bucket(joined, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(per_cust, batch_format="pandas")
    ).materialize()  # consumed twice: bounds pass + range shuffle

    def mm(t: pa.Table) -> pd.DataFrame:
        x = t.column("x").to_numpy()
        if not len(x):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "mn": pd.Series([], dtype=np.int64),
                                 "mx": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"k": [0], "mn": [int(x.min())],
                             "mx": [int(x.max())], "n": [len(x)]})

    bframes = pd.concat(
        list(revs.map_batches(mm, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )
    lo, hi = int(bframes["mn"].min()), int(bframes["mx"].max())
    n = int(bframes["n"].sum())
    n_rb = 16
    width = max(1, (hi - lo) // n_rb + 1)

    def to_rb(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy()
        rb = ((x - lo) // width).astype(np.int64)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "x": t.column("x"), "__rb": pa.array(rb)})

    # per-bucket counts → cumulative offsets (16 rows on the driver)
    rb_ds = revs.map_batches(to_rb, batch_format="pyarrow").materialize()

    def rb_count(t: pa.Table) -> pd.DataFrame:
        rb = t.column("__rb").to_numpy()
        u, c = np.unique(rb, return_counts=True)
        return pd.DataFrame({"rb": u.astype(np.int64),
                             "cnt": c.astype(np.int64)})

    cnts = _combine_partials(
        rb_ds.map_batches(rb_count, batch_format="pyarrow"), ["rb"], ["cnt"]
    ).sort_values("rb")
    offsets = dict(zip(
        cnts["rb"].tolist(),
        np.concatenate([[0], np.cumsum(cnts["cnt"].to_numpy())[:-1]]).tolist(),
    ))
    off_ref = ray.put(offsets)
    n_ref = ray.put(n)

    def bucket_rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["__rb"].iloc[0])]
        nn = ray.get(n_ref)
        g = g.sort_values(["x", "o_custkey"])
        x = g["x"].to_numpy(np.int64)
        # rank() min-tie: first index of each distinct value run
        first = np.searchsorted(x, x, side="left")
        rank = first + off + 1
        pct6 = (rank - 1).astype(object) * 1_000_000 // max(nn - 1, 1)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(np.int64),
            "revenue": round_half_away(x / 10000.0, 2),
            "pct6": pct6.astype(np.int64),
        })

    out = rb_ds.groupby("__rb").map_groups(bucket_rank,
                                           batch_format="pandas")
    return out.sort("o_custkey")


def q_user_ema(sf_dir: str):
    """Per-user integer EMA (alpha = 1/2): e_t = (e_{t-1} + v_t) // 2 —
    a TRUE per-key recurrence that no SQL window/prefix-scan form
    expresses (the floor divide breaks linearity, unlike cumsum/cummax).
    ONE hash-bucket shuffle on user_id, then an in-bucket WAVEFRONT
    kernel: rows are laid out by (step, user) so recurrence step j is a
    single vectorized numpy op across every user's j-th event at once —
    O(rows) total work, O(max chain length) kernel launches, zero
    per-row Python. Exact milliunit ints end-to-end; the oracle replays
    the identical integer recurrence as a recursive CTE."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        m = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        rn = g.groupby("user_id").cumcount().to_numpy(np.int64)
        order = np.lexsort((u, rn))  # wavefront layout: step-major
        u2, m2, rn2 = u[order], m[order], rn[order]
        e = np.empty_like(m2)
        nsteps = int(rn2[-1]) + 1
        starts = np.searchsorted(rn2, np.arange(nsteps + 1))
        e[starts[0]:starts[1]] = m2[starts[0]:starts[1]]
        for j in range(1, nsteps):
            cur = slice(starts[j], starts[j + 1])
            prev = slice(starts[j - 1], starts[j])
            # users at step j are a prefix-closed subset of step j-1,
            # both slices sorted by user -> align by searchsorted
            pos = np.searchsorted(u2[prev], u2[cur])
            e[cur] = (e[prev][pos] + m2[cur]) // 2  # values >= 0
        df = pd.DataFrame({"user_id": u2, "rn": rn2, "e": e})
        last = df.loc[df.groupby("user_id")["rn"].idxmax()]
        return pd.DataFrame({
            "user_id": last["user_id"].to_numpy(np.int64),
            "n_events": last["rn"].to_numpy(np.int64) + 1,
            "ema": round_half_away(last["e"].to_numpy(np.int64) / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("user_id")


def q_value_outliers(sf_dir: str):
    """Robust per-type outlier counts: events farther than 3 MAD from
    the DISCRETE median (quantile_disc semantics — always a real data
    point, index floor((n-1)/2)). Reuses the bounded-domain milliunit
    histogram of q_value_mad: ONE pass builds per-(type, v3) count
    partials capped by the VALUE DOMAIN, and the driver closes median,
    MAD and the outlier count from the same histogram — no second scan
    over the corpus at any scale. All decisions are exact-integer."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "v3": np.rint(t.column("value").to_numpy() * 1000).astype(
                np.int64
            ),
            "n": np.int64(1),
        })
        return df.groupby(["event_type", "v3"], as_index=False)["n"].sum()

    hist = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v3"], ["n"],
    )

    def disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        """quantile_disc(0.5) over a weighted int histogram sorted by
        value: the element at 0-based index floor((n-1)/2)."""
        cum = np.cumsum(cnts)
        idx = (int(cum[-1]) - 1) // 2
        return int(vals[np.searchsorted(cum, idx + 1)])

    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("v3")
        vals = g["v3"].to_numpy(np.int64)
        cnts = g["n"].to_numpy(np.int64)
        med3 = disc_median(vals, cnts)
        dv = np.abs(vals - med3)
        dh = pd.DataFrame({"dv": dv, "n": cnts}).groupby(
            "dv", as_index=False)["n"].sum().sort_values("dv")
        mad3 = disc_median(dh["dv"].to_numpy(np.int64),
                           dh["n"].to_numpy(np.int64))
        rows.append({
            "event_type": et,
            "med": round_half_away(np.array([med3 / 1000.0]), 6)[0],
            "mad": round_half_away(np.array([mad3 / 1000.0]), 6)[0],
            "n_outliers": int(cnts[dv > 3 * mad3].sum()),
            "n_events": int(cnts.sum()),
        })
    return pd.DataFrame(rows).sort_values("event_type").reset_index(
        drop=True)


def q_peak_in_transit(sf_dir: str):
    """Sweep-line MAX-CONCURRENCY: each lineitem occupies its supplier
    for a delivery window [shipdate, shipdate + quantity days); the
    query returns each supplier's PEAK number of simultaneously open
    windows — the interval-stabbing aggregate that needs an ordered
    prefix scan, not a groupby. Endpoint deltas are netted per
    (supplier, day) BEFORE the scan, so tie ordering is immaterial and
    in-bucket state is bounded by suppliers × active days, not rows.
    ONE hash-bucket shuffle on l_suppkey; exact integer throughout."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem",
             columns=["l_suppkey", "l_shipdate", "l_quantity"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        s = g["l_suppkey"].to_numpy(np.int64)
        d0 = g["l_shipdate"].to_numpy().astype("datetime64[D]").astype(
            np.int64)
        d1 = d0 + np.rint(g["l_quantity"].to_numpy()).astype(np.int64)
        ev = pd.DataFrame({
            "s": np.concatenate([s, s]),
            "d": np.concatenate([d0, d1]),
            "delta": np.concatenate([
                np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]),
        })
        net = ev.groupby(["s", "d"], as_index=False)["delta"].sum()
        net = net.sort_values(["s", "d"])
        run = net.groupby("s")["delta"].cumsum().to_numpy(np.int64)
        peaks = pd.DataFrame({
            "s": net["s"].to_numpy(np.int64), "r": run,
        }).groupby("s", as_index=False)["r"].max()
        return pd.DataFrame({
            "l_suppkey": peaks["s"].to_numpy(np.int64),
            "peak": peaks["r"].to_numpy(np.int64),
        })

    out = (
        _with_bucket(li, "l_suppkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("l_suppkey")


def q_mutual_best_match(sf_dir: str):
    """MUTUAL-ARGMIN join (stable best-bidirectional-match): the
    (part, supplier) pairs where the supplier is that part's cheapest
    offer AND the part is that supplier's cheapest offer — both argmins
    lexicographic on exact cents with key tiebreak. Each direction is a
    MERGEABLE per-batch compaction (one row per key survives a batch);
    the supplier side is dimension-bounded, so it broadcasts as the
    mutual filter over the part-side argmin stream — no pairwise join.
    Past the cap the part side falls back to a hash-bucket shuffle,
    the same contract as q_cheapest_supplier."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_extendedprice"],
             num_blocks=_n_cpus())

    # ONE scan emits BOTH per-batch argmin compactions, tagged by
    # direction (0 = per-part, 1 = per-supplier) — the fact table is
    # read and decoded once, not once per direction
    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "s_suppkey": t.column("l_suppkey").to_numpy(),
            "c": np.rint(
                t.column("l_extendedprice").to_numpy() * 100
            ).astype(np.int64),
        })
        pb = df.sort_values(["p_partkey", "c", "s_suppkey"]
                            ).drop_duplicates("p_partkey")
        sb = df.sort_values(["s_suppkey", "c", "p_partkey"]
                            ).drop_duplicates("s_suppkey")
        return pd.concat([pb.assign(dir=np.int64(0)),
                          sb.assign(dir=np.int64(1))], ignore_index=True)

    empty = pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                          "s_suppkey": pd.Series([], dtype=np.int64),
                          "c": pd.Series([], dtype=np.int64)})

    def close(df: pd.DataFrame, by: str, other: str) -> pd.DataFrame:
        return (df.sort_values([by, "c", other]).drop_duplicates(by)
                if len(df) else empty)

    partials = li.map_batches(partial, batch_format="pyarrow")
    cap = 2_000_000
    frames, total = [], 0
    for b in partials.iter_batches(batch_size=65536,
                                   batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > cap:
            break
    else:
        both = (pd.concat(frames, ignore_index=True) if frames
                else empty.assign(dir=np.int64(0)))
        part_best = close(both[both["dir"] == 0], "p_partkey", "s_suppkey")
        supp_best = close(both[both["dir"] == 1], "s_suppkey", "p_partkey")
        frames = None
    if frames is not None:  # pragma: no cover - >2M distinct keys regime
        from ..stages.temporal import _with_bucket

        def closer(by, other):
            def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
                return g.sort_values([by, "c", other]).drop_duplicates(by)

            side = partials.filter(
                expr=f"dir == {0 if by == 'p_partkey' else 1}")
            return (_with_bucket(side, by, 64)
                    .groupby("__bucket")
                    .map_groups(bucket_min, batch_format="pandas")
                    .to_pandas()[["p_partkey", "s_suppkey", "c"]])

        part_best = closer("p_partkey", "s_suppkey")
        supp_best = closer("s_suppkey", "p_partkey")

    # mutual filter: supplier side is dim-bounded → dict lookup
    want = dict(zip(supp_best["s_suppkey"].astype(np.int64),
                    supp_best["p_partkey"].astype(np.int64)))
    pk = part_best["p_partkey"].to_numpy(np.int64)
    sk = part_best["s_suppkey"].to_numpy(np.int64)
    keep = np.fromiter((want.get(s) == p for p, s in zip(pk, sk)),
                       bool, len(pk))
    out = pd.DataFrame({
        "p_partkey": pk[keep],
        "s_suppkey": sk[keep],
        "price": round_half_away(
            part_best["c"].to_numpy(np.int64)[keep] / 100.0, 2),
    })
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_hits_scores(sf_dir: str):
    """Unnormalized 2-round integer HITS over the derived link graph
    (stages/graph.py::hits_scores): hub = Σ in-degrees of out-neighbors,
    auth = Σ hubs of in-neighbors — the alternating power iteration,
    exact-int so the unrolled-CTE oracle gates the iterative dataflow."""
    from ..stages.graph import hits_scores

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_shuffle_partitions(4 * n))
    return hits_scores(docs, n=n).sort("doc_id")


def q_kcore(sf_dir: str):
    """3-round k-core peel (k = 5) of the undirected link multigraph
    (stages/graph.py::kcore_members): iterative induced-subgraph degree
    recompute + threshold peel — the fixpoint-style graph op where each
    round depends on the previous round's SET, not just its values.
    Survivors with their final induced degree."""
    from ..stages.graph import kcore_members

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_shuffle_partitions(4 * n))
    return kcore_members(docs, n=n, k=5, rounds=3).sort("doc_id")


def q_late_events(sf_dir: str):
    """Streaming-watermark late-event flagging: events 'arrive' in a
    deterministic md5-permuted order (simulating out-of-order delivery);
    an event is LATE if the watermark — the max event-time seen over
    ALL earlier arrivals, globally — is more than 15 days ahead of it.
    The global ordered scan distributes as ORDERED HASH-RANGE BUCKETS
    (the customer_revenue_pctile move): the uniform arrival hash is cut
    into 16 value ranges, pass 1 ships one (bucket, max ts) partial per
    block, the driver closes per-bucket CARRY-IN watermarks from the
    prefix maxima, and pass 2 flags in-bucket with a shifted prefix-max
    kernel seeded by the carry-in. No global sort, no driver scan;
    exact epoch-µs integers end-to-end."""
    from ..functions.urls import md5_hash64_many

    L_US = np.int64(15 * 86_400_000_000)
    N_RB = 16
    ev = _pq(sf_dir, "events", columns=["event_id", "ts"],
             num_blocks=_n_cpus())

    def add_arr(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        arr = md5_hash64_many([f"arr:{i}" for i in ids])
        rb = (arr >> np.uint64(60)).astype(np.int64)  # 16 value ranges
        return pa.table({
            "event_id": t.column("event_id"),
            # epoch-µs regardless of the source timestamp resolution
            "ts": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                          pa.int64()),
            "arr": pa.array(arr, pa.uint64()),
            "__rb": pa.array(rb, pa.int64()),
        })

    keyed = ev.map_batches(add_arr, batch_format="pyarrow").materialize()

    def rb_max(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"rb": t.column("__rb").to_numpy(),
                           "mx": t.column("ts").to_numpy()})
        return df.groupby("rb", as_index=False)["mx"].max()

    # max-combine by hand (the shared _combine_partials sums)
    part = pd.concat(
        list(keyed.map_batches(rb_max, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    ).groupby("rb", as_index=False)["mx"].max().sort_values("rb")

    # carry-in watermark per bucket = max ts over all LOWER buckets
    carry: dict[int, int | None] = {}
    run = None
    for rb in range(N_RB):
        carry[rb] = run
        row = part[part["rb"] == rb]
        if len(row):
            m = int(row["mx"].iloc[0])
            run = m if run is None else max(run, m)
    carry_ref = ray.put(carry)

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        cin = ray.get(carry_ref)[int(g["__rb"].iloc[0])]
        g = g.sort_values(["arr", "event_id"])
        ts = g["ts"].to_numpy(np.int64)
        prev = np.empty_like(ts)
        prev[1:] = np.maximum.accumulate(ts[:-1])
        if cin is None:
            prev[0] = ts[0]  # global first arrival: never late
        else:
            prev[0] = cin
            prev = np.maximum(prev, np.int64(cin))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "is_late": (prev - L_US > ts).astype(np.int64),
        })

    out = keyed.groupby("__rb").map_groups(flag, batch_format="pandas")
    return out.sort("event_id")


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


def q_quantized_topk(sf_dir: str):
    """Int8 scalar-quantization ANN (the memory-bound corpus path: 64
    uint8 codes per vector instead of 64 floats — 8× less object-store
    traffic per probe, and integer dot products instead of float ones).

    Plan: per-dim min/max partials (dims × blocks rows, bounded at any
    corpus size) combine on the driver; the affine code table never
    materializes — each batch quantizes itself against the broadcast
    (min, range) and scores the broadcast query codes with one int64
    matmul; per-block top-10 partials merge on the driver (k × blocks).
    Scores are EXACT integers, so the oracle gate has no float hazard
    anywhere past quantization, and the quantizer itself mirrors
    DuckDB's expression tree operand for operand."""
    from ..stages.similarity import _emb_matrix

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"],
              num_blocks=_n_cpus())

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                                 "mn": pd.Series([], dtype=np.float64),
                                 "mx": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"dim": np.arange(m.shape[1], dtype=np.int64),
                             "mn": m.min(axis=0), "mx": m.max(axis=0)})

    stats = pd.concat(
        list(emb.map_batches(mm_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    ).groupby("dim", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = stats.sort_values("dim")["mn"].to_numpy(np.float64)
    mx = stats.sort_values("dim")["mx"].to_numpy(np.float64)
    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)

    def quantize(m: np.ndarray) -> np.ndarray:
        # identical operand order to the oracle:
        # floor((v - mn) / (mx - mn) * 255 + 0.5); degenerate dims → 0
        c = np.floor((m - mn) / safe * 255 + 0.5).astype(np.int64)
        c[:, rng <= 0] = 0
        return c

    q_row = emb.filter(expr="vec_id == 1").take(1)[0]
    cq = quantize(
        np.asarray(q_row["embedding"], dtype=np.float64)[None, :]
    )[0]
    bref = ray.put((mn, safe, rng, cq))

    def topk_partial(t: pa.Table) -> pd.DataFrame:
        mn_, safe_, rng_, cq_ = ray.get(bref)
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.int64)})
        c = np.floor((m - mn_) / safe_ * 255 + 0.5).astype(np.int64)
        c[:, rng_ <= 0] = 0
        score = c @ cq_
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -score))[:10]
        return pd.DataFrame({"vec_id": ids[order], "score": score[order]})

    parts = pd.concat(
        list(emb.map_batches(topk_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )
    out = parts.sort_values(["score", "vec_id"],
                            ascending=[False, True]).head(10)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    out["score"] = out["score"].astype(np.int64)
    return out.reset_index(drop=True)


def q_rp_buckets(sf_dir: str):
    """Random-projection (Johnson–Lindenstrauss / sign-LSH) bucket
    histogram: project every embedding onto 8 deterministic ±1
    hyperplanes (sign = bit j of the md5-derived 64-bit hash of the
    DIMENSION, the repo's SQL-mirrorable hash) and count vectors per
    8-bit sign bucket — the partitioning step of a sharded ANN build,
    gated exactly. Values are fixed-pointed to 1e-6 integer units
    BEFORE projecting, so the signed sums (and therefore every bucket
    id) are exact integers on both sides. Map-only partials; the
    combine is bounded by 2^8 buckets at any corpus size."""
    from ..functions.urls import md5_hash64_many
    from ..stages.similarity import _emb_matrix

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"],
              num_blocks=_n_cpus())
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    h = md5_hash64_many([f"rp{d}" for d in range(dim)])
    signs = (
        ((h[:, None] >> np.arange(8, dtype=np.uint64)[None, :])
         & np.uint64(1)).astype(np.int64) * 2 - 1
    )  # (dim, 8)
    sref = ray.put(signs)

    def partial(t: pa.Table) -> pd.DataFrame:
        s = ray.get(sref)
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        v6 = round_half_away(m * 1_000_000).astype(np.int64)
        proj = v6 @ s  # exact int64: |v6| ≲ 3e6 × 64 dims ≪ 2^63
        bucket = ((proj > 0).astype(np.int64)
                  << np.arange(8, dtype=np.int64)).sum(axis=1)
        u, c = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"bucket": u, "n": c})

    out = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"), ["bucket"], ["n"]
    )
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


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


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval top-20 for a fixed 3-term query; see _bm25_top."""
    return _bm25_top(sf_dir, 20)


def q_span_kind_stats(sf_dir: str):
    """Interleaved-span analytics over the CRAWLED corpus (the north
    rule's payload: ``spans: list<struct<kind,text,media_ref,offset>>``):
    per span kind, how many spans the crawl fetched, their total text
    codepoints, and how many carry a media reference. Exercises the
    nested-struct explode path end to end — ``pc.list_flatten`` over
    zero-copy Arrow batches of the checkpoint, no Python per row; the
    combine is bounded by the kind vocabulary (≤ 9). The oracle derives
    every span length from the deterministic synthesis formulas in
    pipelines/derived.py over the BFS-reachable set."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["status", "spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.equal(t.column("status"), "ok"))
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        if not len(flat):
            return pd.DataFrame({"kind": pd.Series([], dtype=str),
                                 "n_spans": pd.Series([], dtype=np.int64),
                                 "sum_chars": pd.Series([], dtype=np.int64),
                                 "n_media": pd.Series([], dtype=np.int64)})
        chars = pc.utf8_length(flat.field("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        media = (
            pc.utf8_length(flat.field("media_ref")).to_numpy(
                zero_copy_only=False) > 0
        ).astype(np.int64)
        df = pd.DataFrame({"kind": flat.field("kind").to_pandas(),
                           "n_spans": np.int64(1),
                           "sum_chars": chars, "n_media": media})
        return df.groupby("kind", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["kind"], ["n_spans", "sum_chars", "n_media"],
    )
    for c in ("n_spans", "sum_chars", "n_media"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("kind").reset_index(drop=True)


def q_pareto_parts(sf_dir: str):
    """Skyline (Pareto frontier) of parts — maximize p_size, minimize
    price — the dominance operator behind "best tradeoff" curation
    passes. Plan: ONE map-only pass emits per-block (size, min_cents)
    partials (O(blocks × |size domain|) rows — p_size is a bounded
    small-int domain, so the driver combine is a few thousand rows at
    ANY corpus scale); the global frontier closes on the driver with an
    exclusive running min over sizes descending; keepers broadcast back
    into a map-side filter. Zero shuffles. A point survives iff its
    price equals its size's min AND beats every strictly-larger size's
    min (duplicates of a frontier point all survive — they are not
    STRICTLY dominated), which is exactly the oracle's NOT EXISTS."""
    parts = _pq(sf_dir, "part",
                columns=["p_partkey", "p_size", "p_retailprice"],
                num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = round_half_away(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {"p_size": t.column("p_size").to_numpy(zero_copy_only=False),
             "cents": cents}
        )
        return df.groupby("p_size", as_index=False)["cents"].min()

    mins = (
        parts.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("p_size", as_index=False)["cents"]
        .min()
        .sort_values("p_size", ascending=False)
    )
    c = mins["cents"].to_numpy(np.int64)
    # exclusive running min over strictly larger sizes
    best_larger = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(c)[:-1])
    )
    frontier = mins[c < best_larger]
    keeper = dict(zip(frontier["p_size"], frontier["cents"]))

    def pick(t: pa.Table) -> pd.DataFrame:
        cents = round_half_away(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        sizes = t.column("p_size").to_numpy(zero_copy_only=False)
        want = pd.Series(sizes).map(keeper).to_numpy()
        keep = ~pd.isna(want)
        keep[keep] &= cents[keep] == want[keep].astype(np.int64)
        return pd.DataFrame(
            {
                "p_partkey": t.column("p_partkey").to_numpy(
                    zero_copy_only=False
                )[keep],
                "p_size": sizes[keep],
                "price_cents": cents[keep],
            }
        )

    out = parts.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_interval_coverage(sf_dir: str):
    """Merged-interval (gaps-and-islands) coverage per user: each event
    opens an interval of ``round(value*1000) × 0.1 s``; overlapping or
    touching intervals coalesce, and the report is (n_islands, total
    covered µs) per user — the interval-union operator behind session
    coverage / airtime / utilization analytics. ONE hash-bucket shuffle
    on user_id co-locates a user's events; the in-bucket kernel is all
    vectorized pandas (sort → per-user cummax-shift → island cumsum →
    two groupbys); per-user results are tiny and gather at the end.
    All arithmetic is integer µs so partials are exactly mergeable."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def bucket_cover(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_islands": pd.Series([], dtype=np.int64),
                 "covered_us": pd.Series([], dtype=np.int64)}
            )
        s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        dur = (
            round_half_away(g["value"].to_numpy(np.float64) * 1000.0)
            * 100000.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {"u": g["user_id"].to_numpy(), "s": s, "e": s + dur}
        ).sort_values(["u", "s", "e"], kind="stable")
        cm = df.groupby("u", sort=False)["e"].cummax()
        prev = cm.groupby(df["u"], sort=False).shift(1)
        new_island = (
            df["s"].to_numpy() > prev.to_numpy()
        ) | prev.isna().to_numpy()
        df["gid"] = np.cumsum(new_island)
        isl = df.groupby(["u", "gid"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        isl["span"] = isl["e"] - isl["s"]
        return isl.groupby("u", as_index=False).agg(
            n_islands=("gid", "count"), covered_us=("span", "sum")
        ).rename(columns={"u": "user_id"})

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(
            lambda g: bucket_cover(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def q_value_percentiles(sf_dir: str):
    """Interpolated percentiles (PERCENTILE_CONT p25/p50/p75/p90) per
    event type — the distribution-report companion to value_mad's exact
    median: ONE bounded-domain milliunit histogram pass (per-(type, v3)
    count partials, capped by the value domain at any corpus size),
    then the driver closes every percentile in EXACT ×20 fixed-point
    integer arithmetic (20 = lcm of the quartile/decile denominators),
    so interpolation carries no float error at all; results are
    multiples of 5e-5, putting the 6-decimal gate ulp-safe against the
    oracle's float interpolation."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "v3": np.rint(t.column("value").to_numpy() * 1000).astype(
                np.int64
            ),
            "n": np.int64(1),
        })
        return df.groupby(["event_type", "v3"], as_index=False)["n"].sum()

    hist = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v3"], ["n"],
    )

    Q20 = {"p25": 5, "p50": 10, "p75": 15, "p90": 18}
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("v3")
        vals = g["v3"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(cum[-1])
        row = {"event_type": et}
        for name, q20 in Q20.items():
            pos20 = (n - 1) * q20  # exact ×20 rank
            lo_i = int(np.searchsorted(cum, pos20 // 20 + 1))
            frac20 = pos20 % 20
            lo = int(vals[lo_i])
            if frac20:
                hi_i = int(np.searchsorted(cum, pos20 // 20 + 2))
                r20 = 20 * lo + (int(vals[hi_i]) - lo) * frac20
            else:
                r20 = 20 * lo
            row[name] = round_half_away(np.array([r20 / 20000.0]), 6)[0]
        rows.append(row)
    if not rows:  # empty events table: typed empty frame, no KeyError
        return pd.DataFrame(
            columns=["event_type", "p25", "p50", "p75", "p90"]
        )
    out = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    return out


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
    from ..stages.sampling import _unit_hash

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


def q_posting_lists(sf_dir: str):
    """Inverted-index build (the indexing half of retrieval): per term,
    document frequency plus the first 15 postings (ascending doc_ids,
    comma-joined). Each document is exactly ONE input row, so
    within-batch (doc, term) dedup is globally exact — no shuffle ever;
    the per-batch partial is (term, df, first-15-ids), O(vocab × blocks)
    rows to the driver, and the driver closes a k-bounded merge (the
    global first-15 is contained in the union of per-block first-15s).
    At 100 TB the partial stream stays vocabulary-bounded; a
    corpus-sized vocabulary would instead shuffle (term, doc_id) by
    term hash — this corpus' vocab is 31 terms, so the driver close is
    the right plan at any row count."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text"],
               num_blocks=_n_cpus())
    K = 15

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = t.column("text").to_pandas().fillna("").str.split(" ")
        lens = toks.str.len().to_numpy(np.int64)
        if not lens.sum():
            return pd.DataFrame({"term": pd.Series([], dtype=str),
                                 "df": pd.Series([], dtype=np.int64),
                                 "post": pd.Series([], dtype=str)})
        flat = pd.DataFrame({
            "term": np.concatenate(toks.to_numpy()),
            "doc_id": np.repeat(ids, lens),
        }).drop_duplicates().sort_values(["term", "doc_id"])
        g = flat.groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            post=("doc_id", lambda s: ",".join(map(str, s.head(K)))),
        )
        return g

    parts = pd.concat(
        list(docs.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    )
    rows = []
    for term, g in parts.groupby("term"):
        ids = np.sort(np.concatenate([
            np.fromstring(p, dtype=np.int64, sep=",") if p else
            np.array([], np.int64) for p in g["post"]
        ]))[:K]
        rows.append({
            "term": term,
            "df": np.int64(g["df"].sum()),
            "postings": ",".join(map(str, ids)),
        })
    return (pd.DataFrame(rows).sort_values("term").reset_index(drop=True)
            if rows else
            pd.DataFrame(columns=["term", "df", "postings"]))


def q_rerank_topk(sf_dir: str):
    """Two-stage retrieval (candidate generation → rerank), the shape
    every RAG/training-data retrieval pipeline runs: BM25 selects 50
    lexical candidates over the streamed corpus (exact integer scores,
    _bm25_top), then ONLY those 50 are reranked by exact embedding
    cosine against the query vector (vec_id 0) and the top 10 returned
    with both scores. The rerank side reads the embeddings table with a
    pushed-down ``is_in`` filter — candidate-set-sized, never
    corpus-sized, which is what makes the two-stage plan the 100 TB
    answer (a full-corpus cosine would be embedding_topk; here the
    expensive scorer touches 50 rows regardless of corpus size)."""
    cand = _bm25_top(sf_dir, 50)
    cand_ids = cand["doc_id"].to_numpy(np.int64)
    import pyarrow.parquet as pq

    q0 = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))
    )
    queries = {
        "ids": np.array([0], dtype=np.int64),
        "matrix": np.array(q0.column("embedding").to_pylist(),
                           dtype=np.float64),
    }
    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    id_set = pa.array(cand_ids, pa.int64())
    emb = emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=id_set)),
        batch_format="pyarrow",
    )
    rer = brute_force_topk(emb, queries, k=10).copy()
    rer["cos"] = rer["cos"].round(6)
    out = rer.merge(cand, left_on="vec_id", right_on="doc_id")[
        ["doc_id", "score6", "cos"]
    ]
    out = out.sort_values(["cos", "doc_id"], ascending=[False, True]).head(10)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score6"] = out["score6"].astype(np.int64)
    return out.reset_index(drop=True)


def q_event_throttle(sf_dir: str):
    """Streaming event throttling (rate-limit dedup): an event is KEPT
    iff it is the first of its (user, event_type) key or arrives ≥ 60 s
    after the key's previous event (lag-based throttle — the stateless
    window form every stream engine ships, not the kept-chain
    recurrence). ONE hash-bucket shuffle on user_id co-locates each
    key's full history; the in-bucket kernel is a vectorized
    lexsort + diff (no per-row Python), and what leaves each bucket is
    a (event_type × {kept,dropped}) count partial — clock-bounded at
    any corpus size."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())
    GAP = 60_000_000  # 60 s in µs

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["event_type"].to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        gap_ok = np.empty(len(u), dtype=bool)
        gap_ok[0] = True
        gap_ok[1:] = (ts[1:] - ts[:-1]) >= GAP
        kept = first | gap_ok
        df = pd.DataFrame({"event_type": et, "kept": kept})
        out = df.groupby("event_type", as_index=False).agg(
            kept=("kept", "sum"), n=("kept", "size"))
        out["dropped"] = out["n"] - out["kept"]
        return out[["event_type", "kept", "dropped"]]

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["event_type"], ["kept", "dropped"])
    out["kept"] = out["kept"].astype(np.int64)
    out["dropped"] = out["dropped"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def q_user_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP): each event's value
    is weighted by the µs interval to the user's NEXT event (the
    held-until-replaced semantics of market/metric rollups); users whose
    events all share one timestamp are excluded (zero total weight).
    ONE hash-bucket shuffle on user_id, then a fully vectorized
    in-bucket kernel (lexsort + shifted diff + groupby sums) — each
    user's row count and output row are bucket-local, so nothing beyond
    the per-user result rows ever moves. Weighted sums run in float64
    with exact-integer µs weights; both sides round half-away to 6 (the
    ~1e-15 relative summation-order noise is 9 orders below the grid)."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        v = g["value"].to_numpy(np.float64)[order]
        last = np.empty(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        last[-1] = True
        dt = np.empty(len(u), dtype=np.float64)
        dt[:-1] = (ts[1:] - ts[:-1]).astype(np.float64)
        dt[last] = 0.0
        df = pd.DataFrame({"user_id": u, "num": v * dt, "den": dt,
                           "n_intervals": (~last).astype(np.int64)})
        agg = df.groupby("user_id", as_index=False).sum()
        agg = agg[agg["den"] > 0]
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(np.int64),
            "twap": round_half_away(
                agg["num"].to_numpy() / agg["den"].to_numpy(), 6),
            "n_intervals": agg["n_intervals"].to_numpy(np.int64),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("user_id")


def q_type_affinity(sf_dir: str):
    """Set-similarity matrix over the (bounded) event-type vocabulary:
    Jaccard between every two types' distinct-user sets — the audience
    overlap report. ONE hash-bucket shuffle on user_id makes the
    per-bucket (user, type) dedup globally exact; the kernel emits
    diagonal rows (ta = tb → per-type distinct-user partials) and
    upper-triangle rows (co-occurrence partials) in one frame — the
    combine stream is types² × buckets. Counts stay exact integers; the
    single closing division is the only float, identical on both sides."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "event_type"]].drop_duplicates()
        singles = d.groupby("event_type", as_index=False).size()
        singles = pd.DataFrame({"ta": singles["event_type"],
                                "tb": singles["event_type"],
                                "n": singles["size"]})
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = m.groupby(["event_type_x", "event_type_y"],
                          as_index=False).size()
        pairs = pd.DataFrame({"ta": pairs["event_type_x"],
                              "tb": pairs["event_type_y"],
                              "n": pairs["size"]})
        return pd.concat([singles, pairs], ignore_index=True)

    parts = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["ta", "tb"], ["n"],
    )
    diag = {r.ta: int(r.n) for r in parts[parts["ta"] == parts["tb"]]
            .itertuples()}
    up = parts[parts["ta"] != parts["tb"]].copy()
    co = up["n"].to_numpy(np.int64)
    na = up["ta"].map(diag).to_numpy(np.int64)
    nb = up["tb"].map(diag).to_numpy(np.int64)
    return pd.DataFrame({
        "ta": up["ta"].to_numpy(),
        "tb": up["tb"].to_numpy(),
        "co": co,
        "jaccard": round_half_away(co / (na + nb - co), 6),
    }).sort_values(["ta", "tb"]).reset_index(drop=True)


def q_regr_by_type(sf_dir: str):
    """Per-group simple linear regression (value vs days since
    2024-01-01) via the same mergeable sufficient statistics as
    q_grouped_corr: one (n, Σx, Σy, Σxy, Σx²) row per (block, type),
    driver closes slope/intercept over the bounded type set. The time
    axis is anchored at a FIXED epoch so x ∈ [0, ~30] — slope is
    mathematically shift-invariant, and the small-|x| frame keeps the
    cancellation error of the closed form ~7 orders below the 1e-6
    rounding grid on both slope and intercept (an unanchored x ≈ 2e4
    days would put the intercept's error at the grid)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
             num_blocks=_n_cpus())
    T0 = 1_704_067_200_000_000  # 2024-01-01 in µs
    DAY = 86_400_000_000.0

    def partial(t: pa.Table) -> pd.DataFrame:
        x = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             - T0).astype(np.float64) / DAY
        y = t.column("value").to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        })
        return df.groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "sx", "sy", "sxy", "sxx"],
    )
    n = out["n"].to_numpy(np.float64)
    sx, sy = out["sx"].to_numpy(), out["sy"].to_numpy()
    sxy, sxx = out["sxy"].to_numpy(), out["sxx"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = sy / n - slope * (sx / n)
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype(np.int64),
        "slope": round_half_away(slope, 6),
        "icept": round_half_away(icept, 6),
    }).sort_values("event_type").reset_index(drop=True)


def q_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence: the top-100 part pairs that ship in
    the same order at least twice (support ≥ 2), ordered by support —
    the frequent-itemset primitive behind association-rule mining. ONE
    hash-bucket shuffle on l_orderkey co-locates each basket; the
    in-bucket kernel dedups (order, part), self-merges the tiny baskets
    (TPC-H baskets are ≤ 7 lines, so ≤ 21 pairs per order) and
    partial-counts pairs — what leaves each bucket is the bucket's
    (pa, pb, n) partial, never the raw pair stream. The close is
    plan-capped: under the cap ONE driver combine; past it the partials
    re-shuffle by hash(pa) — a pair's rows always share pa, so the
    per-bucket (pa, pb) sum and per-bucket top-100 partial are exact,
    and the driver closes over buckets × 100 rows at any corpus size."""
    from ..stages.temporal import _with_bucket

    lt = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"],
                        as_index=False).size()
        return pd.DataFrame({"pa": out["l_partkey_x"].to_numpy(np.int64),
                             "pb": out["l_partkey_y"].to_numpy(np.int64),
                             "n": out["size"].to_numpy(np.int64)})

    partials = (
        _with_bucket(lt, "l_orderkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] >= 2].sort_values(
            ["n", "pa", "pb"], ascending=[False, True, True])
        return df.head(100).reset_index(drop=True)

    merged = _combine_partials(partials, ["pa", "pb"], ["n"],
                               cap=2_000_000)
    if merged is not None:
        return close(merged)
    # distributed close: re-shuffle the pair partials by hash(pa) — both
    # rows of any (pa, pb) land together, so the per-bucket sum + local
    # top-100 are exact and the driver sees buckets × 100 rows
    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pa", "pb"], as_index=False)["n"].sum()
        return close(s)

    tops = (
        _with_bucket(partials, "pa", 64)
        .groupby("__bucket")
        .map_groups(bucket_top, batch_format="pandas")
    )
    return close(tops.to_pandas())


def q_user_streaks(sf_dir: str):
    """Gap-and-islands: each user's LONGEST run of consecutive active
    days plus their total distinct active days — the retention-quality
    report. ONE hash-bucket shuffle on user_id co-locates each user's
    history; the kernel is fully vectorized (µs → day ordinal, distinct
    (user, day) sort, island break vector where user changes or the day
    gap ≠ 1, `np.add.reduceat`-free run lengths via break indices) and
    emits one row per user — output is user-bounded, never
    event-bounded."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        day = g["ts"].astype("int64").to_numpy() // DAY
        d = pd.DataFrame({"u": u, "d": day}).drop_duplicates()
        order = np.lexsort((d["d"].to_numpy(), d["u"].to_numpy()))
        u = d["u"].to_numpy()[order]
        day = d["d"].to_numpy()[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        isl = np.cumsum(brk) - 1
        run = np.bincount(isl)  # length of each island
        isl_user = u[brk]       # owner of each island
        out = pd.DataFrame({"user_id": isl_user, "run": run})
        agg = out.groupby("user_id", as_index=False).agg(
            max_streak=("run", "max"), n_active_days=("run", "sum"))
        agg["max_streak"] = agg["max_streak"].astype(np.int64)
        agg["n_active_days"] = agg["n_active_days"].astype(np.int64)
        return agg

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
        .select_columns(["user_id", "max_streak", "n_active_days"])
    )
    return out.sort("user_id")


def q_benford_cents(sf_dir: str):
    """Benford first-significant-digit audit over order totals (exact
    integer cents): observed count + share per digit 1–9 next to the
    Benford expectation log10(1 + 1/d) — the classic synthetic-data /
    fraud smoke test. Map-only: per-batch bincount over the first digit
    (extracted with a 13-step vectorized divide-down, exact for any
    int64 — no float log in the data path) → 9-key driver combine."""
    od = _pq(sf_dir, "orders", columns=["o_totalprice"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        d = cents.copy()
        for _ in range(18):  # int64 < 1e19 has ≤ 19 digits: 18 divides
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        n = np.bincount(d, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64),
                             "n": n.astype(np.int64)})

    out = _combine_partials(
        od.map_batches(partial, batch_format="pyarrow"), ["digit"], ["n"])
    out = out[out["n"] > 0].reset_index(drop=True)
    total = float(out["n"].sum())
    dig = out["digit"].to_numpy(np.float64)
    return pd.DataFrame({
        "digit": out["digit"].astype(np.int64),
        "n": out["n"].astype(np.int64),
        "share": round_half_away(out["n"].to_numpy() / total, 6),
        "expected": round_half_away(np.log10(1.0 + 1.0 / dig), 6),
    }).sort_values("digit").reset_index(drop=True)


def q_ship_lag(sf_dir: str):
    """Fulfillment lag by order priority: days from o_orderdate to the
    order's LAST l_shipdate (count, mean, max) — the big–big
    order⋈lineitem join done the scalable way: BOTH tables hash-bucket
    on the shared orderkey (one shuffle each, no broadcast of an
    unbounded side), the in-bucket kernel reduces lineitem to one max
    per order, merges, and emits per-priority (n, Σlag, max lag)
    partials — the combine stream is priorities × buckets (≤ 5 × 32
    rows) at any corpus size."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    lt = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"],
             num_blocks=_n_cpus())
    od = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
             num_blocks=_n_cpus())

    def lt_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t.column("l_orderkey"), pa.int64()),
            "us": pc.cast(t.column("l_shipdate"), pa.int64()),
            "prio": pa.nulls(t.num_rows, pa.string()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def od_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t.column("o_orderkey"), pa.int64()),
            "us": pc.cast(t.column("o_orderdate"), pa.int64()),
            "prio": pc.cast(t.column("o_orderpriority"), pa.string()),
            "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    both = lt.map_batches(lt_side, batch_format="pyarrow").union(
        od.map_batches(od_side, batch_format="pyarrow"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        o = g[g["side"] == 1]
        ms = l.groupby("key", as_index=False)["us"].max()
        m = o.merge(ms, on="key", suffixes=("_o", "_l"))
        if m.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype=str),
                "n_orders": pd.Series([], dtype=np.int64),
                "sum_lag": pd.Series([], dtype=np.int64),
                "max_lag": pd.Series([], dtype=np.int64)})
        lag = (m["us_l"].to_numpy(np.int64)
               - m["us_o"].to_numpy(np.int64)) // DAY
        df = pd.DataFrame({"o_orderpriority": m["prio"].to_numpy(),
                           "lag": lag})
        agg = df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("lag", "size"), sum_lag=("lag", "sum"),
            max_lag=("lag", "max"))
        return agg

    partials = (
        _with_bucket(both, "key", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    df = _gather_capped(partials)  # ≤ priorities × buckets rows
    agg = df.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum"), sum_lag=("sum_lag", "sum"),
        max_lag=("max_lag", "max"))
    return pd.DataFrame({
        "o_orderpriority": agg["o_orderpriority"],
        "n_orders": agg["n_orders"].astype(np.int64),
        "avg_lag_days": round_half_away(
            agg["sum_lag"].to_numpy(np.float64)
            / agg["n_orders"].to_numpy(np.float64), 6),
        "max_lag_days": agg["max_lag"].astype(np.int64),
    }).sort_values("o_orderpriority").reset_index(drop=True)


def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over the event-type
    alphabet: for every (prev, next) pair of a user's consecutive
    events, the transition count and row-normalized probability — the
    behavioral-model fit every clickstream stack runs. ONE hash-bucket
    shuffle on user_id co-locates each user's ordered history; the
    kernel is a lexsort + shifted compare (no Python per row) and emits
    type²-bounded count partials, so the combine stream is types² ×
    buckets at any corpus size."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"],
    )
    row_tot = out.groupby("prev_type")["n"].transform("sum").to_numpy(
        np.float64)
    return pd.DataFrame({
        "prev_type": out["prev_type"],
        "next_type": out["next_type"],
        "n": out["n"].astype(np.int64),
        "p": round_half_away(out["n"].to_numpy(np.float64) / row_tot, 6),
    }).sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def q_order_intervals(sf_dir: str):
    """Repeat-purchase cadence: the gap in days between each customer's
    consecutive orders, reported as a bounded histogram (0-7 / 8-30 /
    31-90 / 91-365 / 366+ days) with per-bucket count and total gap —
    the lifecycle-marketing report. ONE hash-bucket shuffle on
    o_custkey; the kernel is lexsort + masked diff; what leaves each
    bucket is the 5-row histogram partial."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    od = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_custkey", "o_orderdate"],
             num_blocks=_n_cpus())
    EDGES = np.array([7, 30, 90, 365], dtype=np.int64)
    LABELS = np.array(["0-7", "8-30", "31-90", "91-365", "366+"],
                      dtype=object)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["o_orderkey"].to_numpy(np.int64),
            g["o_orderdate"].astype("int64").to_numpy(),
            g["o_custkey"].to_numpy(np.int64),
        ))
        c = g["o_custkey"].to_numpy(np.int64)[order]
        d = g["o_orderdate"].astype("int64").to_numpy()[order]
        same = c[1:] == c[:-1]
        gap = (d[1:] - d[:-1])[same] // DAY
        b = np.searchsorted(EDGES, gap, side="left")
        df = pd.DataFrame({"bucket": LABELS[b], "n": np.int64(1),
                           "sum_gap_days": gap})
        return df.groupby("bucket", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(od, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["bucket"], ["n", "sum_gap_days"],
    )
    out["n"] = out["n"].astype(np.int64)
    out["sum_gap_days"] = out["sum_gap_days"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def q_revenue_rollup(sf_dir: str):
    """Region → nation revenue ROLLUP (grand total, per-region
    subtotals, per-nation detail in one result; NULL levels coalesced
    to 'ALL' on both sides). Customer geography is attached by
    broadcast (customer→nation is bounded relative to the fact scan at
    gate scale; past the cap the star fallback joins distribute), the
    fact partial is exact integer cents per (region, nation) — a
    25-key stream — and the driver emits all three rollup levels from
    that one partial. Revenue stays integer cents until the final /100."""
    od = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
             num_blocks=_n_cpus())
    cu = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    na = _pq(sf_dir, "nation",
             columns=["n_nationkey", "n_name", "n_regionkey"])
    re = _pq(sf_dir, "region", columns=["r_regionkey", "r_name"])
    ndf = _gather_capped(na)
    rdf = _gather_capped(re)
    nat = ndf.merge(rdf, left_on="n_regionkey", right_on="r_regionkey")
    nat_key = {int(r.n_nationkey): (str(r.r_name), str(r.n_name))
               for r in nat.itertuples()}

    attached = _broadcast_fact_attach(
        od, cu, "o_custkey", "c_custkey", ["c_nationkey"])
    if attached is None:  # past the customer cap: distributed hash join
        attached = od.join(cu, join_type="inner", num_partitions=_n_cpus(),
                           on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"nk": nk.astype(np.int64), "cents": cents,
                           "n_orders": np.int64(1)})
        return df.groupby("nk", as_index=False).sum()

    out = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["nk"], ["cents", "n_orders"],
    )
    out["r_name"] = out["nk"].map(lambda k: nat_key[int(k)][0])
    out["n_name"] = out["nk"].map(lambda k: nat_key[int(k)][1])
    detail = out[["r_name", "n_name", "cents", "n_orders"]]
    reg = detail.groupby("r_name", as_index=False)[
        ["cents", "n_orders"]].sum()
    reg["n_name"] = "ALL"
    tot = pd.DataFrame({"r_name": ["ALL"], "n_name": ["ALL"],
                        "cents": [detail["cents"].sum()],
                        "n_orders": [detail["n_orders"].sum()]})
    allr = pd.concat([detail, reg, tot], ignore_index=True)
    return pd.DataFrame({
        "r_name": allr["r_name"],
        "n_name": allr["n_name"],
        "revenue": round_half_away(
            allr["cents"].to_numpy(np.float64) / 100.0, 2),
        "n_orders": allr["n_orders"].astype(np.int64),
    }).sort_values(["r_name", "n_name"]).reset_index(drop=True)


def _fk_orphan_count(
    probe: rd.Dataset, probe_key: str, build: rd.Dataset, build_key: str,
    cap: int = 2_000_000,
) -> tuple[int, int]:
    """(n_probe_rows, n_orphans) for one FK relationship. Plan-capped:
    a bounded build side broadcasts its sorted distinct keys into the
    probe scan (map-only); past the cap BOTH sides hash-bucket on the
    key and the in-bucket kernel anti-counts — exact at any size, one
    shuffle each, nothing but (hits, misses) partials leave a bucket."""
    from ..stages.temporal import _with_bucket

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


def q_fk_orphans(sf_dir: str, cap: int = 2_000_000):
    """Referential-integrity audit across every FK edge of the star
    schema: per relationship, total probe rows and rows whose key has
    no match in the referenced table — the ingest-quality gate run
    before any join-dependent pipeline. Each edge picks its plan by
    build size (broadcast distinct-key probe vs co-partitioned
    anti-count); output is one row per edge."""
    fks = [
        ("lineitem.l_orderkey->orders",
         ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("lineitem.l_partkey->part",
         ("lineitem", "l_partkey"), ("part", "p_partkey")),
        ("lineitem.l_suppkey->supplier",
         ("lineitem", "l_suppkey"), ("supplier", "s_suppkey")),
        ("orders.o_custkey->customer",
         ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("customer.c_nationkey->nation",
         ("customer", "c_nationkey"), ("nation", "n_nationkey")),
        ("nation.n_regionkey->region",
         ("nation", "n_regionkey"), ("region", "r_regionkey")),
    ]
    import pyarrow.parquet as pq

    def _keys_under_cap(bt: str, bk: str, cap: int = cap):
        """Sorted build keys, or None past the cap. The gate is the
        parquet METADATA row count (exact for a bare key column — no
        filter narrows it), so a bounded build costs one driver column
        read with zero Ray fixed latency, and an unbounded one is
        rejected without reading a byte."""
        path = os.path.join(sf_dir, f"{bt}.parquet")
        if pq.ParquetFile(path).metadata.num_rows > cap:
            return None
        return np.sort(
            pq.read_table(path, columns=[bk]).column(bk)
            .to_numpy(zero_copy_only=False).astype(np.int64))

    keysets = {name: _keys_under_cap(bt, bk)
               for name, (_pt, _pk), (bt, bk) in fks}
    fused = [(name, pt, pk) for name, (pt, pk), _b in fks
             if keysets[name] is not None]
    rows = []
    if fused:
        # ONE Ray execution for every broadcast-checkable edge: each
        # probe table maps to the same fixed-width partial row (zeros
        # for the other tables' edges), the sides union, and a single
        # driver combine closes all counts
        refs = ray.put({n: keysets[n] for n, _pt, _pk in fused})
        idx_of = {name: j for j, (name, _pt, _pk) in enumerate(fused)}
        n_edges_f = len(fused)
        vcols = [c for j in range(n_edges_f)
                 for c in (f"e{j}_n", f"e{j}_o")]

        def make_partial(my_edges):
            def partial(t: pa.Table) -> pd.DataFrame:
                ks = ray.get(refs)
                rec = {"g": np.zeros(1, dtype=np.int64)}
                rec.update({c: [0] for c in vcols})
                for name, _pt, pk in my_edges:
                    j = idx_of[name]
                    k = t.column(pk).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    hit, _i = _sorted_lookup(ks[name], k)
                    rec[f"e{j}_n"] = [len(k)]
                    rec[f"e{j}_o"] = [int((~hit).sum())]
                return pd.DataFrame(rec)
            return partial

        sides = []
        for pt in sorted({pt for _n, pt, _pk in fused}):
            mine = [e for e in fused if e[1] == pt]
            cols = sorted({pk for _n, _pt, pk in mine})
            sides.append(
                _pq(sf_dir, pt, columns=cols, num_blocks=_n_cpus())
                .map_batches(make_partial(mine), batch_format="pyarrow"))
        ds = sides[0]
        for s in sides[1:]:
            ds = ds.union(s)
        out1 = _combine_partials(ds, ["g"], vcols)
        for name, _pt, _pk in fused:
            j = idx_of[name]
            rows.append({"fk": name,
                         "n_rows": int(out1[f"e{j}_n"].iloc[0]),
                         "n_orphans": int(out1[f"e{j}_o"].iloc[0])})
    for name, (pt, pk), (bt, bk) in fks:
        if keysets[name] is not None:
            continue
        n_rows, n_orph = _fk_orphan_count(
            _pq(sf_dir, pt, columns=[pk], num_blocks=_n_cpus()),
            pk, _pq(sf_dir, bt, columns=[bk]), bk, cap=cap)
        rows.append({"fk": name, "n_rows": n_rows, "n_orphans": n_orph})
    out = pd.DataFrame(rows)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_orphans"] = out["n_orphans"].astype(np.int64)
    return out.sort_values("fk").reset_index(drop=True)


def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency fit over the corpus vocabulary: ln(freq) vs
    ln(rank) least-squares slope/intercept across the top-100 tokens —
    the one-number lexical-naturalness screen for synthetic or scraped
    text. Token-count partials combine under a vocabulary cap (past it
    the counts re-shuffle by hash(token) with per-bucket top-100
    partials — a pair of (freq, token) orders is global because each
    token lives in ONE bucket); the ln/regression close runs on ≤ 100
    driver rows."""
    from ..stages.temporal import _with_bucket

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


def q_value_anova(sf_dir: str):
    """One-way ANOVA of event value across the event-type alphabet
    (F statistic + effect size η²) — the does-this-feature-matter
    screen. Map-only sufficient statistics per (block, type) in EXACT
    integer 1e-3 units (Σx and Σx² partials sum Python ints, so no
    corpus size can overflow or reorder them); the driver closes over
    one row per type with identical float ops on both sides."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v = round_half_away(
            t.column("value").to_numpy() * 1000.0).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1),
            # object dtype: partials sum arbitrary-precision Python ints
            "s1": v.astype(object),
            "s2": (v.astype(object) * v.astype(object)),
        })
        return df.groupby("event_type", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "s1", "s2"],
    ).sort_values("event_type")
    n = g["n"].to_numpy(np.float64)
    s1 = g["s1"].astype(np.float64).to_numpy() / 1000.0
    s2 = g["s2"].astype(np.float64).to_numpy() / 1e6
    N, S1 = n.sum(), s1.sum()
    k = len(g)
    ssb = float((s1 * s1 / n).sum() - S1 * S1 / N)
    ssw = float((s2 - s1 * s1 / n).sum())
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pd.DataFrame({
        "k": np.array([k], dtype=np.int64),
        "n": np.array([int(N)], dtype=np.int64),
        "f_stat": round_half_away(np.array([f]), 6),
        "eta_sq": round_half_away(np.array([ssb / (ssb + ssw)]), 6),
    })


def q_supplier_ontime(sf_dir: str):
    """Supplier on-time scorecard: per supplier, lineitem count and the
    share shipped within 90 days of the order date. The order date
    attaches to the fact scan by broadcast under the cap (distributed
    hash join past it — the cap picks the plan); per-supplier (n,
    on-time) partials combine under a supplier-count cap with a
    hash-bucket groupby fallback."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_shipdate"],
             num_blocks=_n_cpus())
    od = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    od64 = od.map_batches(
        lambda t: pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "ord_us": pc.cast(t.column("o_orderdate"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    joined = _broadcast_fact_attach(
        li, od64, "l_orderkey", "o_orderkey", ["ord_us"])
    if joined is None:  # orders beyond the broadcast cap
        joined = li.join(od64, join_type="inner",
                         num_partitions=_n_cpus(),
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pd.DataFrame:
        ship = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy()
        ontime = (ship - t.column("ord_us").to_numpy()) <= 90 * DAY
        df = pd.DataFrame({
            "l_suppkey": t.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_lines": np.int64(1),
            "n_ontime": ontime.astype(np.int64),
        })
        return df.groupby("l_suppkey", as_index=False).sum()

    partials = joined.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["l_suppkey"],
                            ["n_lines", "n_ontime"], cap=2_000_000)
    if out is None:  # supplier universe past the cap: bucket groupby
        out = (
            _with_bucket(partials, "l_suppkey", 64)
            .groupby("__bucket")
            .map_groups(
                lambda g: g.groupby("l_suppkey", as_index=False)[
                    ["n_lines", "n_ontime"]].sum(),
                batch_format="pandas")
        ).to_pandas()
    return pd.DataFrame({
        "l_suppkey": out["l_suppkey"].astype(np.int64),
        "n_lines": out["n_lines"].astype(np.int64),
        "ontime_rate": round_half_away(
            out["n_ontime"].to_numpy(np.float64)
            / out["n_lines"].to_numpy(np.float64), 6),
    }).sort_values("l_suppkey").reset_index(drop=True)


def q_stickiness(sf_dir: str):
    """Weekly DAU/WAU stickiness: per ISO week (Monday-truncated), the
    distinct weekly actives, total user-days, active calendar days, and
    the avg-DAU/WAU ratio — the engagement-quality metric. ONE
    hash-bucket shuffle on user_id makes the (user, week, day) dedup
    bucket-local and the WAU/user-day partials exactly summable
    (buckets partition users); the week's active-day set is
    calendar-bounded and closes on the driver."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["ts"].astype("int64").to_numpy() // DAY
        wk = d - (d + 3) % 7  # 1970-01-01 is a Thursday; Monday start
        dd = pd.DataFrame({"u": u, "wk": wk, "d": d}).drop_duplicates()
        ud = dd.groupby("wk", as_index=False).size().rename(
            columns={"size": "user_days"})
        wau = dd[["u", "wk"]].drop_duplicates().groupby(
            "wk", as_index=False).size().rename(columns={"size": "wau"})
        days = dd[["wk", "d"]].drop_duplicates()
        days["day_bit"] = np.int64(1) << (
            (days["d"] - days["wk"]).to_numpy(np.int64))
        db = days.groupby("wk", as_index=False)["day_bit"].sum()
        out = ud.merge(wau, on="wk").merge(db, on="wk")
        return out

    parts = _gather_capped(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
    )  # ≤ weeks × buckets rows (calendar-bounded)
    agg = parts.groupby("wk", as_index=False).agg(
        wau=("wau", "sum"), user_days=("user_days", "sum"),
        day_bits=("day_bit", lambda s: np.bitwise_or.reduce(
            s.to_numpy(np.int64))))
    n_days = np.array([bin(int(b)).count("1") for b in agg["day_bits"]],
                      dtype=np.int64)
    wk_ts = pd.to_datetime(agg["wk"].to_numpy(np.int64) * DAY, unit="us")
    return pd.DataFrame({
        "wk": wk_ts,
        "wau": agg["wau"].astype(np.int64),
        "user_days": agg["user_days"].astype(np.int64),
        "n_days": n_days,
        "stickiness": round_half_away(
            agg["user_days"].to_numpy(np.float64) / n_days
            / agg["wau"].to_numpy(np.float64), 6),
    }).sort_values("wk").reset_index(drop=True)


def q_graph_reciprocity(sf_dir: str):
    """Reciprocity of the derived-web expander graph (directed edges by
    the synthesis formulas of pipelines/derived.py, captcha hosts
    pruned, self-loops excluded): the share of edges whose reverse edge
    also exists — the link-farm / mutual-citation signal. Edge emission
    is map-only (all three formula dsts of a doc live in its batch, so
    batch-local dedup is globally exact); the reverse-edge check
    hash-buckets on the UNORDERED pair key, so both directions of any
    pair land together and the kernel's sorted adjacent-compare emits
    count partials only."""
    from ..stages.temporal import _with_bucket

    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_n_cpus())
    n = docs.count()

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        d = d[d % 37 != 3]
        src = np.concatenate([d, d, d])
        dst = np.concatenate([(7 * d + 1) % n, (13 * d + 2) % n,
                              (29 * d + 5) % n])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        e = np.unique(np.stack([src, dst], axis=1), axis=0)
        lo = np.minimum(e[:, 0], e[:, 1])
        hi = np.maximum(e[:, 0], e[:, 1])
        return pa.table({
            "lo": pa.array(lo),
            "hi": pa.array(hi),
            "fwd": pa.array((e[:, 0] == lo).astype(np.int8)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["lo"].to_numpy(np.int64)
        hi = g["hi"].to_numpy(np.int64)
        f = g["fwd"].to_numpy(np.int8)
        order = np.lexsort((f, hi, lo))
        lo, hi, f = lo[order], hi[order], f[order]
        both = ((lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
                & (f[1:] != f[:-1]))
        return pd.DataFrame({"g": np.zeros(1, dtype=np.int64),
                             "n_edges": [len(lo)],
                             "n_recip": [int(both.sum()) * 2]})

    out = _combine_partials(
        _with_bucket(docs.map_batches(edges, batch_format="pyarrow"),
                     "lo", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["g"], ["n_edges", "n_recip"],
    )
    ne = int(out["n_edges"].iloc[0])
    nr = int(out["n_recip"].iloc[0])
    return pd.DataFrame({
        "n_edges": np.array([ne], dtype=np.int64),
        "n_recip": np.array([nr], dtype=np.int64),
        "reciprocity": round_half_away(np.array([nr / ne]), 6),
    })


def q_basket_sizes(sf_dir: str):
    """Order-size distribution: how many orders have k lineitems, for
    every observed k — the basket-shape profile driving join and
    pair-emission cost models. ONE hash-bucket shuffle on l_orderkey;
    the kernel counts lines per order and emits the bucket's bounded
    (k → n_orders) histogram partial (TPC-H baskets are ≤ 7 lines)."""
    from ..stages.temporal import _with_bucket

    lt = _pq(sf_dir, "lineitem", columns=["l_orderkey"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("l_orderkey", as_index=False).size().rename(
            columns={"size": "k"})
        h = per.groupby("k", as_index=False).size()
        return pd.DataFrame({"n_lines": h["k"].to_numpy(np.int64),
                             "n_orders": h["size"].to_numpy(np.int64)})

    out = _combine_partials(
        _with_bucket(lt, "l_orderkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["n_lines"], ["n_orders"],
    )
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("n_lines").reset_index(drop=True)


def q_rfm_segments(sf_dir: str):
    """RFM segmentation: each customer's recency (days from last order
    to the fixed 2002-01-01 anchor), frequency, and monetary total (exact
    cents) classified into five fixed segments; output is the bounded
    per-segment census (count, avg order frequency, avg lifetime value).
    ONE hash-bucket shuffle on o_custkey; per-customer reduce and
    segment assignment happen in-bucket, and only the 5-row partials
    leave."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    # anchor past the corpus' last order date: recency is non-negative,
    # so numpy floor-div and DuckDB's truncating // agree
    ANCHOR = int(pd.Timestamp("2002-01-01").value // 1000)
    od = _pq(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        cents = round_half_away(
            g["o_totalprice"].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        df = pd.DataFrame({
            "c": g["o_custkey"].to_numpy(np.int64),
            "d": g["o_orderdate"].astype("int64").to_numpy(),
            "cents": cents, "n": np.int64(1)})
        per = df.groupby("c", as_index=False).agg(
            last=("d", "max"), freq=("n", "sum"), cents=("cents", "sum"))
        rec = (ANCHOR - per["last"].to_numpy(np.int64)) // DAY
        freq = per["freq"].to_numpy(np.int64)
        seg = np.select(
            [(rec <= 365) & (freq >= 8), (rec <= 545) & (freq >= 6),
             (rec > 1095) & (freq >= 6), rec > 1095],
            ["champion", "loyal", "at_risk", "hibernating"],
            default="regular")
        out = pd.DataFrame({"segment": seg, "n_customers": np.int64(1),
                            "freq": freq, "cents": per["cents"]})
        return out.groupby("segment", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(od, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["segment"], ["n_customers", "freq", "cents"],
    )
    nc = out["n_customers"].to_numpy(np.float64)
    return pd.DataFrame({
        "segment": out["segment"],
        "n_customers": out["n_customers"].astype(np.int64),
        "avg_freq": round_half_away(
            out["freq"].to_numpy(np.float64) / nc, 6),
        "avg_ltv": round_half_away(
            out["cents"].to_numpy(np.float64) / 100.0 / nc, 2),
    }).sort_values("segment").reset_index(drop=True)


def q_knn_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embedding table — the
    label-quality / split-leakage probe run before training a classifier
    head. Brute-force scoring: the (bounded) reference matrix broadcasts
    ONCE via ``ray.put`` and each batch scores against it with one
    numpy matmul (the IVF/LSH stages are the documented scale path for
    an unbounded reference set); ranking uses the repo-wide rounded-6
    cosine with vec_id tie-break, so both engines pick the same
    neighbor. Per-label (n, n_correct) partials combine on the driver."""
    emb = _pq(sf_dir, "embeddings",
              columns=["vec_id", "embedding", "label"])
    ref = _gather_capped(emb)
    assert ref is not None, (
        "knn_accuracy: reference set past the broadcast cap — use the "
        "IVF/LSH stages (stages/similarity.py) for an unbounded corpus"
    )
    ids = ref["vec_id"].to_numpy(np.int64)
    labels = ref["label"].to_numpy(np.int64)
    m = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref_ref = ray.put((ids, labels, mn))

    def partial(t: pa.Table) -> pd.DataFrame:
        r_ids, r_labels, r_mn = ray.get(ref_ref)
        q_ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        q_lab = t.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64)
        qm = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(
            np.float64)
        qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        cos = qn @ r_mn.T
        c6 = round_half_away(cos * 1e6).astype(np.int64)
        # composite argmax key: rounded-6 cosine desc, then vec_id asc.
        # The tie-break term is the DENSE RANK of vec_id (0..n-1), not
        # the raw id — raw ids past the multiplier would outweigh a
        # whole cosine step and flip the order
        id_rank = np.argsort(np.argsort(r_ids)).astype(np.int64)
        n_ref = np.int64(len(r_ids) + 1)
        key = c6 * n_ref - id_rank[None, :]
        # mask self-matches
        key[q_ids[:, None] == r_ids[None, :]] = np.iinfo(np.int64).min
        nn = np.argmax(key, axis=1)
        df = pd.DataFrame({
            "label": q_lab, "n": np.int64(1),
            "n_correct": (r_labels[nn] == q_lab).astype(np.int64)})
        return df.groupby("label", as_index=False).sum()

    out = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["label"], ["n", "n_correct"],
    )
    return pd.DataFrame({
        "label": out["label"].astype(np.int64),
        "n": out["n"].astype(np.int64),
        "n_correct": out["n_correct"].astype(np.int64),
        "acc": round_half_away(
            out["n_correct"].to_numpy(np.float64)
            / out["n"].to_numpy(np.float64), 6),
    }).sort_values("label").reset_index(drop=True)


def q_customer_360(sf_dir: str):
    """Customer-360: per shared key, behavioral totals (events) joined
    with purchase totals (orders) — the canonical big–big cross-dataset
    join. BOTH sides pre-aggregate inside their batch scan (exact
    integer units), so what shuffles is one bounded partial row per
    (batch, key), not the raw streams; ONE hash-bucket co-location then
    sums per key and keeps keys present on both sides (inner join)."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "value"],
             num_blocks=_n_cpus())
    od = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
             num_blocks=_n_cpus())

    def ev_side(t: pa.Table) -> pd.DataFrame:
        v3 = round_half_away(
            t.column("value").to_numpy() * 1000.0).astype(np.int64)
        df = pd.DataFrame({
            "key": t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_events": np.int64(1), "v3": v3,
            "n_orders": np.int64(0), "cents": np.int64(0),
            "has_ev": np.int8(1), "has_od": np.int8(0)})
        return df.groupby("key", as_index=False).agg(
            n_events=("n_events", "sum"), v3=("v3", "sum"),
            n_orders=("n_orders", "sum"), cents=("cents", "sum"),
            has_ev=("has_ev", "max"), has_od=("has_od", "max"))

    def od_side(t: pa.Table) -> pd.DataFrame:
        cents = round_half_away(
            t.column("o_totalprice").to_numpy() * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "key": t.column("o_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_events": np.int64(0), "v3": np.int64(0),
            "n_orders": np.int64(1), "cents": cents,
            "has_ev": np.int8(0), "has_od": np.int8(1)})
        return df.groupby("key", as_index=False).agg(
            n_events=("n_events", "sum"), v3=("v3", "sum"),
            n_orders=("n_orders", "sum"), cents=("cents", "sum"),
            has_ev=("has_ev", "max"), has_od=("has_od", "max"))

    both = ev.map_batches(ev_side, batch_format="pyarrow").union(
        od.map_batches(od_side, batch_format="pyarrow"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("key", as_index=False).agg(
            n_events=("n_events", "sum"), v3=("v3", "sum"),
            n_orders=("n_orders", "sum"), cents=("cents", "sum"),
            has_ev=("has_ev", "max"), has_od=("has_od", "max"))
        agg = agg[(agg["has_ev"] == 1) & (agg["has_od"] == 1)]
        return pd.DataFrame({
            "user_id": agg["key"].to_numpy(np.int64),
            "n_events": agg["n_events"].to_numpy(np.int64),
            "sum_value": round_half_away(
                agg["v3"].to_numpy(np.float64) / 1000.0, 6),
            "n_orders": agg["n_orders"].to_numpy(np.int64),
            "total_spend": round_half_away(
                agg["cents"].to_numpy(np.float64) / 100.0, 2),
        })

    out = (
        _with_bucket(both, "key", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
        .select_columns(["user_id", "n_events", "sum_value",
                         "n_orders", "total_spend"])
    )
    return out.sort("user_id")


def q_host_depth_profile(sf_dir: str):
    """Per-host crawl shape over the checkpointed frontier: pages
    fetched, min/max BFS depth and mean depth — the skew report a
    crawl operator reads before re-salting hot hosts. Streams the
    checkpoint pruned to (host, depth); partials are (host × depth)
    counts (wave-bounded), and min/max/mean close on the driver from
    that bounded table — frontier size never lands anywhere."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["host", "depth"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "host": t.column("host").to_pandas(),
            "depth": t.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n": np.int64(1)})
        return df.groupby(["host", "depth"], as_index=False).sum()

    hd = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["host", "depth"], ["n"],
    )
    hd["sum_depth"] = hd["depth"] * hd["n"]
    g = hd.groupby("host", as_index=False).agg(
        n_pages=("n", "sum"), min_depth=("depth", "min"),
        max_depth=("depth", "max"), sum_depth=("sum_depth", "sum"))
    return pd.DataFrame({
        "host": g["host"],
        "n_pages": g["n_pages"].astype(np.int64),
        "min_depth": g["min_depth"].astype(np.int32),
        "max_depth": g["max_depth"].astype(np.int32),
        "avg_depth": round_half_away(
            g["sum_depth"].to_numpy(np.float64)
            / g["n_pages"].to_numpy(np.float64), 6),
    }).sort_values("host").reset_index(drop=True)


def q_captcha_rate_by_host(sf_dir: str):
    """Captcha-wall incidence per host over the crawled corpus (S8
    analytics): fetched pages, captcha hits, rate — the
    block-detection dashboard behind proxy/header rotation decisions.
    Map-only count partials over (host, captcha flag), host-bounded
    combine."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["host", "captcha_text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        cap = (pc.utf8_length(t.column("captcha_text")).to_numpy(
            zero_copy_only=False) > 0).astype(np.int64)
        df = pd.DataFrame({
            "host": t.column("host").to_pandas(),
            "n_pages": np.int64(1), "n_captcha": cap})
        return df.groupby("host", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["host"], ["n_pages", "n_captcha"],
    )
    return pd.DataFrame({
        "host": out["host"],
        "n_pages": out["n_pages"].astype(np.int64),
        "n_captcha": out["n_captcha"].astype(np.int64),
        "captcha_rate": round_half_away(
            out["n_captcha"].to_numpy(np.float64)
            / out["n_pages"].to_numpy(np.float64), 6),
    }).sort_values("host").reset_index(drop=True)


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


def q_brand_share(sf_dir: str):
    """Share-of-voice: each brand's part count and share WITHIN its
    part type — the window-share pattern (count / sum-over-partition)
    on a vocabulary-bounded pair domain. Map-only partials; the window
    normalization closes on the driver over (type × brand) rows."""
    parts = _pq(sf_dir, "part", columns=["p_type", "p_brand"],
                num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "p_type": t.column("p_type").to_pandas(),
            "p_brand": t.column("p_brand").to_pandas(),
            "n_parts": np.int64(1)})
        return df.groupby(["p_type", "p_brand"], as_index=False).sum()

    out = _combine_partials(
        parts.map_batches(partial, batch_format="pyarrow"),
        ["p_type", "p_brand"], ["n_parts"],
    )
    tot = out.groupby("p_type")["n_parts"].transform("sum").to_numpy(
        np.float64)
    return pd.DataFrame({
        "p_type": out["p_type"], "p_brand": out["p_brand"],
        "n_parts": out["n_parts"].astype(np.int64),
        "share": round_half_away(
            out["n_parts"].to_numpy(np.float64) / tot, 6),
    }).sort_values(["p_type", "p_brand"]).reset_index(drop=True)


def q_split_leakage(sf_dir: str):
    """Split-leakage audit over the event stream: a USER-keyed 80/20
    hash split must put no user on both sides, while the naive
    EVENT-keyed split leaks almost every active user — the
    contamination check run before training on behavioral data. ONE
    hash-bucket shuffle on user_id; per-user membership for both
    schemes reduces in-bucket (users partition across buckets, so the
    three counters sum exactly)."""
    from ..functions.urls import md5_hash64_many
    from ..stages.temporal import _with_bucket

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


def q_time_to_purchase(sf_dir: str):
    """Activation funnel timing: per user, days from their FIRST event
    to their FIRST purchase, reported as a bounded histogram (same-day /
    1-7 / 8-30 / 31+ days) plus the never-purchased cohort — the
    activation-latency report. ONE hash-bucket shuffle on user_id; the
    kernel reduces each user to two firsts and emits the 5-row
    partial."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"],
             num_blocks=_n_cpus())
    EDGES = np.array([0, 7, 30], dtype=np.int64)
    LABELS = np.array(["0_same_day", "1-7", "8-30", "31+"], dtype=object)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        first = pd.DataFrame({"u": u, "ts": ts}).groupby(
            "u", as_index=False)["ts"].min()
        isp = g["event_type"].to_numpy() == "purchase"
        fp = pd.DataFrame({"u": u[isp], "ts": ts[isp]}).groupby(
            "u", as_index=False)["ts"].min()
        m = first.merge(fp, on="u", how="left", suffixes=("_f", "_p"))
        never = int(m["ts_p"].isna().sum())
        got = m.dropna(subset=["ts_p"])
        gap = (got["ts_p"].to_numpy(np.int64)
               - got["ts_f"].to_numpy(np.int64)) // DAY
        b = np.searchsorted(EDGES, gap, side="left")  # count edges < gap
        h = pd.DataFrame({"bucket": LABELS[b], "n_users": np.int64(1)})
        out = h.groupby("bucket", as_index=False).sum()
        return pd.concat(
            [out, pd.DataFrame({"bucket": ["never"],
                                "n_users": [never]})],
            ignore_index=True)

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["bucket"], ["n_users"],
    )
    out = out[out["n_users"] > 0]
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def q_monthly_churn(sf_dir: str):
    """Month-over-month churn: per calendar month, active users and the
    share of them inactive the NEXT month (the last observed month is
    excluded — churn there is right-censored). ONE hash-bucket shuffle
    on user_id; each user's distinct-month set reduces in-bucket to
    (month, active, churned) partials; the observed-month maximum is
    data-bounded and closes on the driver."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[M]")
        mo = ts.astype(np.int64)  # months since 1970-01
        d = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                          "m": mo}).drop_duplicates()
        order = np.lexsort((d["m"].to_numpy(), d["u"].to_numpy()))
        u = d["u"].to_numpy()[order]
        m = d["m"].to_numpy()[order]
        nxt_same = np.zeros(len(u), dtype=bool)
        nxt_same[:-1] = (u[1:] == u[:-1]) & (m[1:] == m[:-1] + 1)
        df = pd.DataFrame({"month": m, "n_active": np.int64(1),
                           "n_churned": (~nxt_same).astype(np.int64)})
        return df.groupby("month", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["month"], ["n_active", "n_churned"],
    )
    out = out[out["month"] < out["month"].max()]  # censor last month
    mo_ts = pd.to_datetime(
        out["month"].to_numpy(np.int64).astype("datetime64[M]"))
    return pd.DataFrame({
        "month": mo_ts,
        "n_active": out["n_active"].astype(np.int64),
        "n_churned": out["n_churned"].astype(np.int64),
        "churn_rate": round_half_away(
            out["n_churned"].to_numpy(np.float64)
            / out["n_active"].to_numpy(np.float64), 6),
    }).sort_values("month").reset_index(drop=True)


def q_repurchase_rate(sf_dir: str):
    """Repurchase signal over the basket stream: of every distinct
    (customer, part) pair, the share bought in MORE than one order —
    the loyalty/consumable-vs-durable split. The customer key attaches
    to the fact scan by broadcast under the cap (hash join past it);
    ONE hash-bucket shuffle on the composite pair then reduces each
    pair to its distinct-order count, and only (n_pairs, n_repurchased)
    counters leave a bucket."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
             num_blocks=_n_cpus())
    od = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = _broadcast_fact_attach(
        li, od, "l_orderkey", "o_orderkey", ["o_custkey"])
    if joined is None:  # orders beyond the broadcast cap
        joined = li.join(od, join_type="inner",
                         num_partitions=_n_cpus(),
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def pre(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "cust": t.column("o_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "part": t.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "ok": t.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        return df.drop_duplicates()  # batch-local (cust,part,order) dedup

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["cust", "part", "ok"]].drop_duplicates()
        per = d.groupby(["cust", "part"], as_index=False).size()
        return pd.DataFrame({
            "g": np.zeros(1, dtype=np.int64),
            "n_pairs": [len(per)],
            "n_repurchased": [int((per["size"] > 1).sum())]})

    out = _combine_partials(
        _with_bucket(joined.map_batches(pre, batch_format="pyarrow"),
                     "cust", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["g"], ["n_pairs", "n_repurchased"],
    )
    np_, nr = int(out["n_pairs"].iloc[0]), int(out["n_repurchased"].iloc[0])
    return pd.DataFrame({
        "n_pairs": np.array([np_], dtype=np.int64),
        "n_repurchased": np.array([nr], dtype=np.int64),
        "repurchase_rate": round_half_away(np.array([nr / np_]), 6),
    })


def q_pareto_revenue(sf_dir: str):
    """Revenue concentration: the exact share of total revenue held by
    the top-20 % of customers — the 80/20 report as a GLOBAL-ORDER
    aggregate done without any global sort. Per-customer exact
    fixed-point revenue (one co-partition join + bucket reduce), then
    ITERATIVE range refinement: each pass histograms the candidate
    value range into 16 (count, Σ) buckets (driver sees 16 rows), whole
    buckets above the boundary fold into the running top-k sum, and
    only the boundary bucket re-scans — the candidate set shrinks
    ~16× per pass, integer widths guarantee termination (width 1 =
    one distinct value, closed in O(1)), and no pass lands more than a
    capped gather on the driver. Ties at the boundary value are
    share-exact by construction (sum = value × needed)."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders"))
    joined = _li_orders_custkey(sf_dir, parts)
    revs = (
        _with_bucket(joined, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(_per_customer_rev4, batch_format="pandas")
    ).materialize()  # consumed once per refinement pass

    def totals(t: pa.Table) -> pd.DataFrame:
        x = t.column("x").to_numpy()
        # object: Python-int partial, overflow-proof at any block size
        s = sum(int(v) for v in x) if len(x) else 0
        return pd.DataFrame({"g": [0], "n": [len(x)],
                             "s": pd.Series([s], dtype=object),
                             "mn": [int(x.min()) if len(x) else 2**63 - 1],
                             "mx": [int(x.max()) if len(x) else -2**63]})

    # ONE pass folds all four partials (n/s sum; mn/mx fold by hand)
    tf = pd.concat(list(
        revs.map_batches(totals, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    n, tot = int(tf["n"].sum()), int(tf["s"].sum())
    blo, bhi = int(tf["mn"].min()), int(tf["mx"].max())
    k = (n + 4) // 5  # ceil(0.2 n), 0.2 = 1/5 exactly
    need, acc = k, 0

    while need > 0:
        width = max(1, (bhi - blo) // 16 + 1)
        lo_c, w_c = blo, width

        def hist(t: pa.Table) -> pd.DataFrame:
            x = t.column("x").to_numpy()
            x = x[(x >= lo_c) & (x <= bhi)]
            if not len(x):
                # int64 dtype for the EMPTY frame: Ray's block-size
                # estimator chokes on size-0 object Series (benign but
                # noisy); concat with non-empty object partials still
                # promotes to object, so exactness is unchanged
                return pd.DataFrame({"rb": pd.Series([], dtype=np.int64),
                                     "cnt": pd.Series([], dtype=np.int64),
                                     "s": pd.Series([], dtype=np.int64)})
            rb = (x - lo_c) // w_c
            df = pd.DataFrame({"rb": rb, "cnt": np.int64(1),
                               "s": x.astype(object)})
            return df.groupby("rb", as_index=False).sum()

        h = _combine_partials(
            revs.map_batches(hist, batch_format="pyarrow"),
            ["rb"], ["cnt", "s"],
        ).sort_values("rb", ascending=False)
        nxt = None
        for r in h.itertuples():
            if int(r.cnt) <= need:
                acc += int(r.s)
                need -= int(r.cnt)
            else:
                b_lo = lo_c + int(r.rb) * w_c
                b_hi = min(bhi, b_lo + w_c - 1)
                if b_lo == b_hi:  # one distinct value: ties close exact
                    acc += b_lo * need
                    need = 0
                else:
                    nxt = (b_lo, b_hi)
                break
        if need == 0:
            break
        assert nxt is not None
        blo, bhi = nxt

    return pd.DataFrame({
        "n_customers": np.array([n], dtype=np.int64),
        "k": np.array([k], dtype=np.int64),
        "top_revenue": round_half_away(np.array([acc / 10000.0]), 2),
        "total_revenue": round_half_away(np.array([tot / 10000.0]), 2),
        "share": round_half_away(np.array([acc / tot]), 6),
    })


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
    from ..functions.urls import md5_hash64_many

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


def q_decayed_counts(sf_dir: str):
    """Recency-weighted activity: per event type, the exponentially
    decayed event count (half-life = 7 days against the fixed
    2024-03-01 anchor) next to the raw count — the freshness-weighted
    popularity signal. The decay weight is EXACT by construction:
    age is floored to whole half-lives j, weight = 2^(40−j) integer
    units (zero past 40 half-lives), so partials sum as integers and
    the single /2^40 float happens once, identically, on both sides."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000
    ANCHOR = int(pd.Timestamp("2024-03-01").value // 1000)

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        age_days = np.maximum(0, (ANCHOR - ts) // DAY)
        j = np.minimum(age_days // 7, 40).astype(np.int64)
        w = (np.int64(1) << (np.int64(40) - j))
        w[age_days // 7 > 40] = 0
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1),
            # object: Python-int partials, exact at any corpus size
            "w40": w.astype(object)})
        return df.groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "w40"],
    )
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype(np.int64),
        "decayed": round_half_away(
            np.array([int(x) / float(1 << 40) for x in out["w40"]]), 6),
    }).sort_values("event_type").reset_index(drop=True)


def q_value_moments(sf_dir: str):
    """Per-event-type skewness and excess kurtosis via INTEGER-EXACT
    raw moments: values are exact cents by construction, so each batch
    emits Python-int partials S1..S4 = Σx..Σx⁴ (object dtype — S1⁴
    reaches ~1e32 at sf0.1, far past int64) that sum exactly under any
    partitioning. The scaled central moments

        M2 = n·S2 − S1²
        M3 = n²·S3 − 3n·S2·S1 + 2·S1³
        M4 = n³·S4 − 4n²·S3·S1 + 6n·S2·S1² − 3·S1⁴

    are exact integers, and the cents scale cancels in both ratios, so

        skew = M3 / M2^1.5      kurt = M4 / M2² − 3

    need exactly three float conversions + one sqrt each — the oracle
    evaluates the identical HUGEINT expression tree, so the only float
    noise is the final correctly-rounded divisions (round 6 absorbs the
    ≤1-ulp int→double cast difference on >2⁵³ magnitudes)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        c = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        co = c.astype(object)  # Python-int arithmetic: exact powers
        c2 = co * co
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1), "s1": co, "s2": c2, "s3": c2 * co,
            "s4": c2 * c2,
        })
        return df.groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "s1", "s2", "s3", "s4"],
    )
    rows = []
    for r in out.itertuples():
        n, s1, s2, s3, s4 = (int(r.n), int(r.s1), int(r.s2), int(r.s3),
                             int(r.s4))
        m2 = n * s2 - s1 * s1
        m3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1 ** 3
        m4 = (n ** 3 * s4 - 4 * n * n * s3 * s1
              + 6 * n * s2 * s1 * s1 - 3 * s1 ** 4)
        d2 = float(m2)
        rows.append({
            "event_type": r.event_type, "n": np.int64(n),
            "mean": float(s1) / float(n) / 100.0,
            "skew": float(m3) / (d2 * np.sqrt(d2)),
            "kurt": float(m4) / (d2 * d2) - 3.0,
        })
    df = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    for c in ("mean", "skew", "kurt"):
        df[c] = round_half_away(df[c].to_numpy(), 6)
    return df


def q_hour_entropy(sf_dir: str):
    """Temporal-concentration entropy: per event type, the Shannon
    entropy (bits) of its hour-of-day histogram — 0 when all events
    land in one hour, log2(24)≈4.585 when uniform. The burstiness
    signal a scheduler uses to provision crawl/ingest capacity.

    Distributed as bounded (event_type × 24)-cell count partials;
    the driver closes H = log2(n) − (Σ_h c_h·log2 c_h)/n. Cross-engine
    determinism: each c·log2(c) term is QUANTIZED to 1e-6 units and the
    sum runs over the exact integers (the hopping-window move — float
    summation order can never flip the hash; the residual risk is a
    libm log2 1-ulp difference landing exactly on a .5e-6 boundary)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "hour": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "hour"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], ["c"],
    )
    rows = []
    for et, g in out.groupby("event_type"):
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        q = round_half_away(
            c.astype(np.float64) * np.log2(c.astype(np.float64)) * 1e6
        ).astype(np.int64)
        h = float(np.log2(float(n))) - (float(int(q.sum())) / 1e6) / n
        rows.append({"event_type": et, "n": np.int64(n),
                     "hours_seen": np.int64(len(c)),
                     "entropy": h})
    df = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    df["entropy"] = round_half_away(df["entropy"].to_numpy(), 6)
    return df


def q_chi2_type_dow(sf_dir: str):
    """Chi-square independence test of event_type × day-of-week — "is
    traffic mix stable across the week?" (the drift alarm a pipeline
    health monitor runs). Day-of-week is computed from epoch days as
    (day+4) % 7 (0=Sunday) on BOTH sides, dodging engine-specific
    calendar functions.

    Distributed as bounded (type × 7) count partials; the driver forms
    the FULL cross grid (absent cells count 0 but still carry expected
    mass) and closes χ² = Σ (O−E)²/E. Each cell term is deterministic
    (integer counts → two correctly-rounded float ops), and the
    cross-cell sum is QUANTIZED to 1e-6 units so summation order can
    never flip the hash (the hopping-window move)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "dow": (ts // DAY + 4) % 7, "c": np.int64(1)})
        return df.groupby(["event_type", "dow"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "dow"], ["c"],
    )
    piv = out.pivot_table(index="event_type", columns="dow", values="c",
                          aggfunc="sum", fill_value=0)
    obs = piv.to_numpy(np.int64)
    n = int(obs.sum())
    row_t = obs.sum(axis=1).astype(np.float64)
    col_t = obs.sum(axis=0).astype(np.float64)
    exp = row_t[:, None] * col_t[None, :] / float(n)
    dif = obs.astype(np.float64) - exp
    term = dif * dif / exp
    chi2 = float(int(round_half_away(term * 1e6).astype(np.int64).sum())
                 ) / 1e6
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame({
        "n": [np.int64(n)], "dof": [np.int64(dof)],
        "chi2": round_half_away(np.array([chi2]), 6),
    })


def q_theil_sen_trend(sf_dir: str):
    """Theil–Sen robust trend of daily order revenue: the MEDIAN of all
    pairwise day-to-day slopes — immune to the outlier days that wreck
    a least-squares fit (the seasonal-revenue drift estimator). Daily
    revenue sums are exact cents (bounded by the CALENDAR, not the data
    scale: ~2.4k days → ~2.9M pairs close on the driver in one numpy
    broadcast even at 100 TB, because more data only fattens days, it
    doesn't add them). Each pairwise slope is one exact-int subtraction
    pair + one correctly-rounded double division, so the median (mean
    of the two middle elements when even) is bit-identical to the
    oracle's self-join."""
    o = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "rev": cents})
        return df.groupby("day", as_index=False).sum()

    daily = _combine_partials(
        o.map_batches(partial, batch_format="pyarrow"), ["day"], ["rev"],
    ).sort_values("day")
    d = daily["day"].to_numpy(np.int64)
    r = daily["rev"].to_numpy(np.int64)
    iu, ju = np.triu_indices(len(d), k=1)
    slopes = (r[ju] - r[iu]).astype(np.float64) / (
        d[ju] - d[iu]).astype(np.float64)
    med = float(np.median(slopes))
    return pd.DataFrame({
        "n_days": [np.int64(len(d))],
        "n_pairs": [np.int64(len(slopes))],
        "slope_cents_per_day": round_half_away(np.array([med]), 6),
    })


def q_gini_by_nation(sf_dir: str):
    """Per-nation revenue inequality: exact Gini of per-customer revenue
    WITHIN each nation — q_revenue_gini's value-range bucket plan
    generalized to a GROUPED close. Plan: (1) the one-shuffle
    lineitem ⋈ orders → per-customer exact int revenue; (2) nationkey
    attached broadcast-side (searchsorted over the bounded customer map;
    hash-join fallback past the cap); (3) per-nation [lo,hi] bounds as a
    25-row bounded partial; (4) ONE range shuffle keyed
    nationkey·16 + rb — bucket-local sorts emit (cnt, Σx, Σi₀·x);
    (5) the driver closes 25 ginis over ≤400 rows with unbounded ints —
    ties split across bucket boundaries are harmless because equal x
    contribute the same Σi·x under any rank permutation."""
    from ..stages.temporal import _with_bucket
    import pyarrow.parquet as pq

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    joined = _li_orders_custkey(sf_dir, parts)

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    bdf = _gather_capped(cust)
    if bdf is not None:
        # fused plan: nationkey attached INSIDE the per-customer group
        # kernel (one searchsorted against the broadcast customer map) —
        # saves a full pass + materialize over the two-stage fallback
        srt = bdf.sort_values("c_custkey")
        keys_ref = ray.put(srt["c_custkey"].to_numpy(np.int64))
        nk_ref = ray.put(srt["c_nationkey"].to_numpy(np.int64))

        def per_cust_nk(g: pd.DataFrame) -> pd.DataFrame:
            s = _per_customer_rev4(g)
            keys, nk = ray.get(keys_ref), ray.get(nk_ref)
            hit, idx = _sorted_lookup(keys,
                                      s["o_custkey"].to_numpy(np.int64))
            s = s.loc[hit].copy()  # inner-join semantics
            s["c_nationkey"] = nk[idx[hit]]
            return s

        withnat = (
            _with_bucket(joined, "o_custkey", 32)
            .groupby("__bucket")
            .map_groups(per_cust_nk, batch_format="pandas")
        )
    else:  # past the customer cap: distributed hash join
        revs = (
            _with_bucket(joined, "o_custkey", 32)
            .groupby("__bucket")
            .map_groups(lambda g: _per_customer_rev4(g),
                        batch_format="pandas")
        )
        withnat = revs.join(cust, join_type="inner", num_partitions=parts,
                            on=("o_custkey",), right_on=("c_custkey",))
    withnat = withnat.materialize()  # consumed twice: bounds + shuffle

    def mm(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "nk": t.column("c_nationkey").to_numpy(zero_copy_only=False
                                                   ).astype(np.int64),
            "mn": t.column("x").to_numpy(zero_copy_only=False),
            "mx": t.column("x").to_numpy(zero_copy_only=False)})
        return df.groupby("nk", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))

    bounds = pd.concat(
        list(withnat.map_batches(mm, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    ).groupby("nk", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))
    NB = 16
    n_nat = int(bounds["nk"].max()) + 1
    lo_a = np.zeros(n_nat, dtype=np.int64)
    w_a = np.ones(n_nat, dtype=np.int64)
    for r in bounds.itertuples():
        lo_a[r.nk] = int(r.mn)
        w_a[r.nk] = max(1, (int(r.mx) - int(r.mn)) // NB + 1)

    def to_rb(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False
                                              ).astype(np.int64)
        key = nk * NB + (x - lo_a[nk]) // w_a[nk]
        return pa.table({"x": pa.array(x), "nk": pa.array(nk),
                         "__rb": pa.array(key.astype(np.int64))})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(g["x"].to_numpy(np.int64))
        xo = x.astype(object)
        i0 = np.arange(1, len(x) + 1, dtype=np.int64).astype(object)
        return pd.DataFrame({
            "key": [np.int64(g["__rb"].iloc[0])],
            "nk": [np.int64(g["nk"].iloc[0])],
            "cnt": [np.int64(len(x))],
            "sx": [str(int(xo.sum()))],        # strings: exceed int64
            "six": [str(int((i0 * xo).sum()))],
        })

    stats = pd.concat(
        list(withnat.map_batches(to_rb, batch_format="pyarrow")
             .groupby("__rb")
             .map_groups(bucket_stats, batch_format="pandas")
             .iter_batches(batch_size=1024, batch_format="pandas")),
        ignore_index=True,
    ).sort_values("key")

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rows = []
    for nk, g in stats.groupby("nk", sort=True):
        n = int(g["cnt"].sum())
        sx = sum(int(s) for s in g["sx"])
        six, offset = 0, 0
        for r in g.itertuples():  # already key-ordered within nk
            six += int(r.six) + offset * int(r.sx)
            offset += int(r.cnt)
        gini6 = (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx)
        rows.append({
            "n_name": names[int(nk)], "n_customers": np.int64(n),
            "total_rev": float(round_half_away(
                np.array([sx / 10000.0]), 2)[0]),
            "gini6": np.int64(gini6)})
    return pd.DataFrame(rows).sort_values("n_name").reset_index(drop=True)


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the derived link graph: the Pearson
    correlation of (total-degree(src), total-degree(dst)) over directed
    edges — positive when hubs link to hubs (the crawl-frontier shape
    diagnostic: assortative webs concentrate politeness pressure).

    Plan: the one-shuffle degree table (stages/graph.py::degree_table),
    total degree attached to the streaming edge set broadcast-side
    (hash-join fallback past the cap), then INTEGER-EXACT correlation
    partials m, Σx, Σy, Σxy, Σx², Σy² (object ints — Σx² reaches ~1e19
    past int64 on fat graphs) closed on the driver:

        r = (m·Σxy − Σx·Σy) / (√(m·Σx²−(Σx)²) · √(m·Σy²−(Σy)²))

    three int→double casts + two sqrts, the identical HUGEINT expression
    tree the oracle evaluates — round 6 absorbs the ≤1-ulp cast noise."""
    from ..stages.graph import degree_table, edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    deg = degree_table(docs, n=n, num_partitions=parts).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "d": pc.add(t.column("out_degree"), t.column("in_degree"))}),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: src attach + dst attach
    edges = edges_dataset(docs, n)

    e1 = _broadcast_fact_attach(edges, deg, "src", "doc_id", ["d"])
    if e1 is not None:
        e1 = e1.map_batches(
            lambda t: t.rename_columns(
                ["dx" if c == "d" else c for c in t.column_names]),
            batch_format="pyarrow")
        e2 = _broadcast_fact_attach(e1, deg, "dst", "doc_id", ["d"])
    else:
        e2 = None
    if e2 is None:  # distributed plan: two hash joins
        dx = deg.map_batches(
            lambda t: pa.table({"sk": t.column("doc_id"),
                                "dx": t.column("d")}),
            batch_format="pyarrow")
        dy = deg.map_batches(
            lambda t: pa.table({"dk": t.column("doc_id"),
                                "d": t.column("d")}),
            batch_format="pyarrow")
        e2 = edges.join(dx, join_type="inner", num_partitions=parts,
                        on=("src",), right_on=("sk",)
                        ).join(dy, join_type="inner",
                               num_partitions=parts,
                               on=("dst",), right_on=("dk",))

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t.column("dx").to_numpy(zero_copy_only=False
                                    ).astype(np.int64).astype(object)
        y = t.column("d").to_numpy(zero_copy_only=False
                                   ).astype(np.int64).astype(object)
        return pd.DataFrame({
            "k": [np.int64(0)], "m": [np.int64(len(x))],
            "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxy": [int((x * y).sum())], "sxx": [int((x * x).sum())],
            "syy": [int((y * y).sum())]})

    out = _combine_partials(
        e2.map_batches(partial, batch_format="pyarrow"),
        ["k"], ["m", "sx", "sy", "sxy", "sxx", "syy"],
    )
    m, sx, sy = int(out["m"][0]), int(out["sx"][0]), int(out["sy"][0])
    sxy, sxx, syy = (int(out["sxy"][0]), int(out["sxx"][0]),
                     int(out["syy"][0]))
    num = m * sxy - sx * sy
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    r = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
    return pd.DataFrame({
        "n_edges": [np.int64(m)],
        "assortativity": round_half_away(np.array([r]), 6),
    })


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


def q_cusum_drift(sf_dir: str):
    """CUSUM change-point scan over daily event value: the day k where
    the cumulative deviation from the global mean peaks — the classic
    sequential drift detector (did the traffic mix shift, and when?).
    INTEGER-EXACT: with S_k the cents prefix sum and T the total,
    D_k = n·S_k − k·T is an exact integer whose max/argmax need no
    floats; the reported deviation converts once, identically, on both
    sides (D_k/n/100 dollars). Ties break to the earliest day."""
    daily = _daily_value_cents(sf_dir)
    x = daily["x"].to_numpy(np.int64).astype(object)
    n = len(x)
    sk = np.cumsum(x)
    tot = int(sk[-1])
    k = np.arange(1, n + 1, dtype=np.int64).astype(object)
    dev = n * sk - k * tot
    ad = np.array([abs(int(v)) for v in dev], dtype=object)
    best = int(np.argmax(ad))  # first max = earliest day (day-sorted)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "peak_day": [np.int64(daily["day"].iloc[best])],
        "peak_dev": round_half_away(
            np.array([float(int(ad[best])) / float(n) / 100.0]), 6),
    })


def q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of daily event value (adjacent rows of the
    day-ordered daily series): the momentum/mean-reversion diagnostic a
    capacity planner reads before trusting tomorrow ≈ today. Pearson r
    over (x_t, x_{t+1}) pairs from INTEGER-EXACT sums m, Σx, Σy, Σxy,
    Σx², Σy² — the oracle's lead() self-pairing closes the identical
    HUGEINT expression tree, so only the final casts/sqrt are float."""
    daily = _daily_value_cents(sf_dir)
    v = daily["x"].to_numpy(np.int64).astype(object)
    x, y = v[:-1], v[1:]
    m = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    num = m * sxy - sx * sy
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    r = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
    return pd.DataFrame({
        "n_pairs": [np.int64(m)],
        "autocorr": round_half_away(np.array([r]), 6),
    })


def q_local_clustering(sf_dir: str):
    """Per-node local clustering coefficient of the (undirected) link
    graph: cc(v) = 2·t(v) / (d(v)·(d(v)−1)) with d the distinct-neighbor
    count and t the closed-wedge count — the triads-vs-stars shape
    signal (a crawler's link-farm detector: farms cluster, feeds don't).

    Two plans behind the usual cap. UNDER it (edge list gathers), the
    whole computation is one vectorized driver kernel — unique packed
    keys, doubled-list lexsort, segmented triu wedges, searchsorted
    closure — because four hash shuffles of a small graph are pure
    fixed cost. PAST it, the distributed wedge plan: (1) undirected
    edge dedup = ONE (a,b)-hash groupby; (2) wedge emission per
    neighbor group with the degree riding along as a sentinel row
    (O(d²) rows per node — bounded here by the 3-out-regular
    construction; a hub-skewed graph would salt/cap this stage);
    (3) wedge closure probed against the BROADCAST packed edge-key set
    (sorted-array searchsorted, zero shuffle) or a distributed
    (x,y)⋈(a,b) hash join when even that exceeds the cap; (4) ONE
    count/max groupby + ONE left_outer assembly join so nodes with no
    edges / no closed wedges keep exact-zero rows. cc is reported as
    the exact integer floor cc6 = ⌊2t·10⁶/(d(d−1))⌋ — no float ever;
    the fallback-equality test pins both plans equal."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    edf = _gather_capped(edges)
    if edf is not None:  # driver kernel: the whole graph is small
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        m = s != d
        a = np.minimum(s[m], d[m])
        b = np.maximum(s[m], d[m])
        keys = np.unique(a * n + b)            # deduped undirected edges
        ua, ub = keys // n, keys % n
        v = np.concatenate([ua, ub])           # doubled neighbor list
        w = np.concatenate([ub, ua])
        order = np.lexsort((w, v))
        v, w = v[order], w[order]
        brk = np.ones(len(v), dtype=bool)
        brk[1:] = v[1:] != v[:-1]
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(v))
        deg_full = np.zeros(n, dtype=np.int64)
        deg_full[v[starts]] = ends - starts
        tri_full = np.zeros(n, dtype=np.int64)
        for st, en in zip(starts, ends):        # tiny segments (d ≤ ~12)
            dd = en - st
            if dd < 2:
                continue
            iu, ju = np.triu_indices(dd, k=1)
            pk = w[st + iu] * n + w[st + ju]
            i = np.searchsorted(keys, pk)
            i[i == len(keys)] = 0
            tri_full[v[st]] = int((keys[i] == pk).sum())
        denom = np.maximum(deg_full * (deg_full - 1), 1)
        cc6 = np.where(deg_full >= 2,
                       (2 * tri_full * 1_000_000) // denom, 0)
        return pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "deg": deg_full, "tri": tri_full,
            "cc6": cc6.astype(np.int64)})

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        return pa.table({
            "a": pa.array(np.minimum(s[m], d[m]), pa.int64()),
            "b": pa.array(np.maximum(s[m], d[m]), pa.int64())})

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).count()
           .map_batches(lambda t: t.select(["a", "b"]),
                        batch_format="pyarrow")
           ).materialize()  # consumed thrice: degree, wedges, closure

    def both(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(np.concatenate([a, b]), pa.int64()),
            "w": pa.array(np.concatenate([b, a]), pa.int64())})

    nbr = und.map_batches(both, batch_format="pyarrow")

    # degree rides ALONG the wedge stream (one sentinel row per node,
    # x = y = −1, always surviving the closure filter) so ONE
    # count/max groupby recovers (deg, tri) together — saves the
    # separate degree shuffle + second assembly join of the naive plan
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        w = np.sort(g["w"].to_numpy(np.int64))
        v = np.int64(g["v"].iloc[0])
        d = len(w)
        if d < 2:
            return pd.DataFrame({"v": [v], "deg": [np.int64(d)],
                                 "x": [np.int64(-1)],
                                 "y": [np.int64(-1)]})
        iu, ju = np.triu_indices(d, k=1)
        return pd.DataFrame({
            "v": np.concatenate([[v], np.full(len(iu), v)]),
            "deg": np.int64(d),
            "x": np.concatenate([[-1], w[iu]]).astype(np.int64),
            "y": np.concatenate([[-1], w[ju]]).astype(np.int64)})

    wed = nbr.groupby("v").map_groups(wedges, batch_format="pandas")

    bdf = _gather_capped(und)
    if bdf is not None:  # broadcast closure probe: zero extra shuffles
        keys = np.sort(bdf["a"].to_numpy(np.int64) * n
                       + bdf["b"].to_numpy(np.int64))
        kref = ray.put(keys)

        def probe(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(ks, x * n + y)
            keep = pa.array(hit | (x == -1))
            return pa.table({
                "v": pc.array_filter(t.column("v"), keep),
                "deg": pc.array_filter(t.column("deg"), keep)})

        closed = wed.map_batches(probe, batch_format="pyarrow")
    else:  # distributed closure: (x,y) ⋈ (a,b) hash join + sentinels
        sentinels = wed.map_batches(
            lambda t: t.filter(pc.equal(t.column("x"), -1)).select(
                ["v", "deg"]),
            batch_format="pyarrow")
        closed = wed.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("x"), -1)),
            batch_format="pyarrow",
        ).join(und, join_type="inner", num_partitions=parts,
               on=("x", "y"), right_on=("a", "b")
               ).map_batches(lambda t: t.select(["v", "deg"]),
                             batch_format="pyarrow").union(sentinels)
    from ray.data import aggregate as _agg
    tri = closed.groupby("v").aggregate(
        _agg.Count(alias_name="rows"),
        _agg.Max("deg", alias_name="deg"))

    out = docs.join(
        tri.map_batches(lambda t: pa.table(
            {"tv": t.column("v"),
             "d": pc.cast(t.column("deg"), pa.int64()),
             # sentinel row contributes 1 to the count: tri = rows − 1
             "t": pc.subtract(pc.cast(t.column("rows"), pa.int64()),
                              pa.scalar(1, pa.int64()))}),
            batch_format="pyarrow"),
        join_type="left_outer", num_partitions=parts,
        on=("doc_id",), right_on=("tv",),
    )

    def close(t: pa.Table) -> pa.Table:
        d = np.nan_to_num(t.column("d").to_numpy(zero_copy_only=False
                                                 ).astype(np.float64),
                          nan=0).astype(np.int64)
        tr = np.nan_to_num(t.column("t").to_numpy(zero_copy_only=False
                                                  ).astype(np.float64),
                           nan=0).astype(np.int64)
        denom = np.maximum(d * (d - 1), 1)
        cc6 = np.where(d >= 2, (2 * tr * 1_000_000) // denom, 0)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "deg": pa.array(d, pa.int64()),
            "tri": pa.array(tr, pa.int64()),
            "cc6": pa.array(cc6.astype(np.int64), pa.int64())})

    return out.map_batches(close, batch_format="pyarrow")


# Poisson(1) inverse-CDF thresholds as exact uint64 constants
# (floor(CDF_k · 2^64), k = 0..7; draws past T_7 truncate to w = 8).
# Hardcoded identically in the oracle SQL so the weight of every
# (event, replicate) pair is an exact integer comparison on both sides.
_POIS1_T = np.array([
    6786177901268885274, 13572355802537770549, 16965444753172213186,
    18096474403383694065, 18379231815936564285, 18435783298447138329,
    18445208545532234003, 18446555009401533385, 18446723317385195808,
], dtype=np.uint64)


def q_poisson_bootstrap(sf_dir: str):
    """One-pass Poisson bootstrap of the per-event-type mean value —
    the 100 TB way to put an error bar on a streaming aggregate: no
    resampling shuffle, no data copy. Each of B=32 replicates weights
    every event by a DETERMINISTIC Poisson(1) draw (md5-derived uniform
    against hardcoded inverse-CDF thresholds, truncated at 8), so one
    scan emits bounded (type × B) partials Σw, Σw·x — exact integers —
    and the driver closes replicate means. The bootstrap s.e. is the
    sample std of the B means, each QUANTIZED to 1e-6 before the exact
    integer variance close (B·Σq² − (Σq)²) / (B·(B−1)) — summation
    order can never flip the hash."""
    from ..functions.urls import md5_hash64_many

    B = 32
    ev = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t.column("event_id").to_numpy(zero_copy_only=False
                                            ).astype(np.int64)
        cents = np.rint(t.column("value").to_numpy() * 100
                        ).astype(np.int64)
        et = t.column("event_type").to_pandas().to_numpy()
        frames = []
        for b in range(B):
            u = md5_hash64_many(
                np.char.add(f"boot:{b}:", ids.astype(str)))
            w = np.searchsorted(_POIS1_T, u, side="right").astype(
                np.int64)  # w = #{k : T_k <= u} = truncated Poisson(1)
            frames.append(pd.DataFrame({
                "event_type": et, "b": np.int64(b), "sw": w,
                "swx": w * cents, "n": np.int64(1)}))
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["event_type", "b"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "b"], ["sw", "swx", "n"],
    )
    rows = []
    for et, g in out.groupby("event_type"):
        n = int(g["n"].sum()) // B
        q = np.array([
            int(round_half_away(np.array(
                [float(int(r.swx)) / float(int(r.sw)) / 100.0 * 1e6]
            ))[0]) for r in g.itertuples()], dtype=object)
        sq, sqq = int(q.sum()), int((q * q).sum())
        var_micro2 = float(B * sqq - sq * sq) / float(B * (B - 1))
        rows.append({
            "event_type": et, "n": np.int64(n),
            "boot_mean": float(int(sq)) / float(B) / 1e6,
            "boot_se": np.sqrt(var_micro2) / 1e6,
        })
    df = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    for c in ("boot_mean", "boot_se"):
        df[c] = round_half_away(df[c].to_numpy(), 6)
    return df


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between the click and
    purchase value distributions — the drift test for "do conversions
    spend like clicks browse?". INTEGER-EXACT at any scale: the partial
    is a per-cents-value count pair (bounded by the VALUE RANGE, ≤49k
    distinct cents, not by data size), and the statistic closes as
    max_v |n₂·C₁(v) − n₁·C₂(v)| over the sorted value axis — all ints;
    D is reported as the exact floor d6 = ⌊maxdev·10⁶/(n₁·n₂)⌋ with the
    tie broken to the smallest attaining value."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        cents = np.rint(t.column("value").to_numpy()[m] * 100
                        ).astype(np.int64)
        one = (et[m] == "click").astype(np.int64)
        df = pd.DataFrame({"v": cents, "c1": one, "c2": 1 - one})
        return df.groupby("v", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["v"], ["c1", "c2"],
    ).sort_values("v")
    a = np.cumsum(out["c1"].to_numpy(np.int64))
    b = np.cumsum(out["c2"].to_numpy(np.int64))
    n1, n2 = int(a[-1]), int(b[-1])
    dev = np.abs(n2 * a - n1 * b)  # ≤ n1·n2 ≈ 1e10 at sf0.1: int64-safe
    best = int(np.argmax(dev))  # first max = smallest v (v-sorted)
    d6 = int(dev[best]) * 1_000_000 // (n1 * n2)
    return pd.DataFrame({
        "n1": [np.int64(n1)], "n2": [np.int64(n2)],
        "at_cents": [np.int64(out["v"].iloc[best])],
        "d6": [np.int64(d6)],
    })


def q_source_kl(sf_dir: str):
    """Per-source lexical drift: KL(source unigram dist ‖ corpus
    unigram dist) in bits — the distribution-shift score a corpus-mix
    designer reads before upweighting a source. Per-batch
    (source, token) count partials combine into a vocabulary-bounded
    table (the corpus vocabulary is fixed by construction; a growing
    vocab would reuse q_source_vocab's hash-bucket fallback), then the
    driver closes KL_s = (1/n_s)·Σ_t c_st·log2(c_st·N / (n_s·c_t)) with
    each term QUANTIZED to 1e-6 before the exact integer sum — the
    identical expression tree the oracle evaluates."""
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
    ct = st.groupby("tok")["c"].sum()
    nn = float(int(st["c"].sum()))
    rows = []
    for src, g in st.groupby("source"):
        n = int(g["c"].sum())
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        gt = ct.loc[g["tok"]].to_numpy(np.int64).astype(np.float64)
        ratio = c * nn / (float(n) * gt)
        q = round_half_away(c * np.log2(ratio) * 1e6).astype(np.int64)
        rows.append({
            "source": src, "n_tokens": np.int64(n),
            "kl_bits": float(int(q.sum())) / 1e6 / float(n)})
    df = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    df["kl_bits"] = round_half_away(df["kl_bits"].to_numpy(), 6)
    return df


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
    from ..stages.temporal import _with_bucket

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


def q_scd2_user_tier(sf_dir: str):
    """SCD-2 interval build (the warehouse "slowly changing dimension"
    move): collapse each user's event stream into validity intervals of
    their spend tier (value < 10 → low, < 100 → mid, else high), one
    row per consecutive same-tier run with [valid_from, valid_to) in
    epoch-µs (open tail = −1). Gaps-and-islands, fully distributed: ONE
    hash-bucket shuffle on user_id, then a vectorized kernel (lexsort
    by (user, ts, event_id), tier-change break vector, island bincount,
    next-island valid_from by array shift). Output is run-bounded —
    every column integer/categorical, so the gate is hash-exact."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        order = np.lexsort((eid, t, u))
        u, t, v = u[order], t[order], v[order]
        tier = np.where(v < 10, 0, np.where(v < 100, 1, 2)).astype(
            np.int8)
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (tier[1:] != tier[:-1])
        isl = np.cumsum(brk) - 1
        n_ev = np.bincount(isl)
        iu, it, ifrom = u[brk], tier[brk], t[brk]
        ito = np.concatenate([ifrom[1:], [-1]])
        ito[np.concatenate([iu[1:] != iu[:-1], [True]])] = -1
        names = np.array(["low", "mid", "high"])
        return pd.DataFrame({
            "user_id": iu, "tier": names[it],
            "valid_from_us": ifrom, "valid_to_us": ito,
            "n_events": n_ev.astype(np.int64)})

    return (_with_bucket(ev, "user_id", 32)
            .groupby("__bucket")
            .map_groups(kernel, batch_format="pandas"))


def q_pagerank_damped(sf_dir: str):
    """Damped (d = 0.85) PageRank over the derived link graph, 3 rounds
    of integer-floor power iteration (stages/graph.py::damped_pagerank)
    — the authority score a crawl scheduler feeds back into frontier
    priority. Exact integer weights end-to-end; the oracle unrolls the
    identical three rounds as CTEs."""
    from ..stages.graph import damped_pagerank

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return damped_pagerank(docs, n=n, iters=3, num_partitions=parts)


def q_item_cf(sf_dir: str):
    """Item-item collaborative filtering over the top-50 parts (by
    distinct buyers; ties → partkey): for each vocabulary part, its
    best co-purchase match by customer-set cosine — the "customers who
    bought X also bought Y" recommender built the 100 TB way: the pair
    plane is VOCABULARY-bounded (≤50×50 count partials), never
    part-catalog- or customer-bounded.

    Plan: (1) one lineitem ⋈ orders shuffle, custkey-bucketed distinct
    (customer, part); (2) part-popularity counts (capped combine,
    distributed sort+limit fallback) pick the vocabulary, broadcast
    sorted; (3) the SAME bucketed distinct stream re-emits per-customer
    vocab pairs via a pandas self-merge — bounded (i, j) count
    partials; (4) the driver closes cosines c/√(n_a·n_b) — exact ints
    into one deterministic float tree, ties → smaller partkey."""
    from ..stages.temporal import _with_bucket

    V = 50
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                 num_blocks=parts)
    # custkey attaches into the streaming lineitem scan from the
    # broadcast orders map (no join shuffle); hash join past the cap
    joined = _broadcast_fact_attach(
        li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    if joined is None:
        joined = li.join(orders, join_type="inner",
                         num_partitions=parts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def distinct_cp(g: pd.DataFrame) -> pd.DataFrame:
        return g[["o_custkey", "l_partkey"]].drop_duplicates()

    cp = (_with_bucket(joined, "o_custkey", 32)
          .groupby("__bucket")
          .map_groups(distinct_cp, batch_format="pandas")
          ).materialize()  # consumed twice: popularity + pair emission

    def pcount(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "p": t.column("l_partkey").to_numpy(zero_copy_only=False),
            "n": np.int64(1)})
        return df.groupby("p", as_index=False).sum()

    pcounts = _combine_partials(
        cp.map_batches(pcount, batch_format="pyarrow"),
        ["p"], ["n"], cap=2_000_000,
    )
    if pcounts is not None:
        top = pcounts.sort_values(["n", "p"],
                                  ascending=[False, True]).head(V)
    else:  # part catalog past the cap: distributed count + sort
        top = (cp.map_batches(pcount, batch_format="pyarrow")
               .groupby("p").sum("n")
               .sort([("sum(n)", "descending"), ("p", "ascending")])
               .limit(V).to_pandas()
               .rename(columns={"sum(n)": "n"}))
    vocab = top.sort_values("p")
    vkeys = vocab["p"].to_numpy(np.int64)
    vn = vocab["n"].to_numpy(np.int64)
    kref = ray.put(vkeys)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(kref)
        p = g["l_partkey"].to_numpy(np.int64)
        hit, idx = _sorted_lookup(ks, p)
        df = pd.DataFrame({"c": g["o_custkey"].to_numpy(np.int64)[hit],
                           "i": idx[hit]})
        m = df.merge(df, on="c")
        m = m[m["i_x"] < m["i_y"]]
        out = pd.DataFrame({"i": m["i_x"], "j": m["i_y"],
                            "cab": np.int64(1)})
        return out.groupby(["i", "j"], as_index=False).sum()

    co = _combine_partials(
        _with_bucket(cp, "o_custkey", 32)
        .groupby("__bucket").map_groups(pairs, batch_format="pandas"),
        ["i", "j"], ["cab"],
    )
    best: dict[int, tuple[float, int]] = {}
    for r in co.itertuples():
        i, j, c = int(r.i), int(r.j), int(r.cab)
        cos = float(c) / np.sqrt(float(vn[i]) * float(vn[j]))
        for a, b in ((i, j), (j, i)):
            cur = best.get(a)
            cand = (-cos, int(vkeys[b]))
            if cur is None or cand < cur:
                best[a] = cand
    rows = [{"part": np.int64(vkeys[a]),
             "n_cust": np.int64(vn[a]),
             "best_match": np.int64(pb),
             "cos6": float(round_half_away(np.array([-negc]), 6)[0])}
            for a, (negc, pb) in best.items()]
    return pd.DataFrame(rows).sort_values("part").reset_index(drop=True)


def q_ltv_cohorts(sf_dir: str):
    """Cohort lifetime-value curve: customers grouped by first-order
    month, each cohort's revenue laid out by account age (months since
    cohort) with the running cumulative — the LTV table a growth team
    reads off a warehouse. ONE custkey-bucket shuffle computes each
    customer's cohort and emits CALENDAR-BOUNDED (cohort, age) cent
    partials (months² rows at any data scale); the driver closes exact
    integer cumsums per cohort. Month ids are pure integer arithmetic
    on (year, month) so no engine calendar function can drift."""
    from ..stages.temporal import _with_bucket

    o = _pq(sf_dir, "orders",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(g["o_orderdate"])
        m = ((dt.dt.year - 1992) * 12 + dt.dt.month - 1).to_numpy(
            np.int64)
        ck = g["o_custkey"].to_numpy(np.int64)
        cents = np.rint(g["o_totalprice"].to_numpy() * 100
                        ).astype(np.int64)
        cohort = pd.Series(m).groupby(ck).transform("min").to_numpy()
        df = pd.DataFrame({"cohort": cohort, "age": m - cohort,
                           "cents": cents})
        return df.groupby(["cohort", "age"], as_index=False).sum()

    rv = _combine_partials(
        _with_bucket(o, "o_custkey", 32).groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["cohort", "age"], ["cents"],
    ).sort_values(["cohort", "age"]).reset_index(drop=True)
    cum = rv.groupby("cohort")["cents"].cumsum().to_numpy(np.int64)
    return pd.DataFrame({
        "cohort": rv["cohort"].astype(np.int64),
        "age": rv["age"].astype(np.int64),
        "revenue": round_half_away(
            rv["cents"].to_numpy(np.int64) / 100.0, 2),
        "cum_revenue": round_half_away(cum / 100.0, 2)})


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension mean/std profile of the embedding column — the
    feature-drift monitor of a vector pipeline (a collapsed dimension
    or a scale blowout shows up here first). Exercises the
    list<float> path end-to-end: zero-copy flatten of the fixed-width
    list, per-batch QUANTIZED moment partials (round(x·10⁶) → exact
    Python-int Σq, Σq² — dimension-bounded, 64 rows at any scale), and
    a driver close whose only floats are the final casts — the oracle
    unnests with generate_subscripts and runs the identical tree."""
    emb = _pq(sf_dir, "embeddings", columns=["embedding"],
              num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        n, dim = t.num_rows, len(flat) // max(t.num_rows, 1)
        q = round_half_away(flat * 1e6).astype(np.int64).astype(object)
        df = pd.DataFrame({
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), n),
            "n": np.int64(1), "sq": q, "sqq": q * q})
        return df.groupby("dim", as_index=False).sum()

    out = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["dim"], ["n", "sq", "sqq"],
    )
    rows = []
    for r in out.itertuples():
        n, sq, sqq = int(r.n), int(r.sq), int(r.sqq)
        mean = float(sq) / 1e6 / float(n)
        var = float(n * sqq - sq * sq) / float(n * (n - 1))
        rows.append({"dim": np.int64(r.dim), "n": np.int64(n),
                     "mean": mean, "std": np.sqrt(var) / 1e6})
    df = pd.DataFrame(rows).sort_values("dim").reset_index(drop=True)
    for c in ("mean", "std"):
        df[c] = round_half_away(df[c].to_numpy(), 6)
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
    from ..stages.textstats import _EN_STOP_RE, _count

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
    from ..stages.textstats import BPE_ISH, _count

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


def q_rolling_median_revenue(sf_dir: str):
    """Trailing 7-day MEDIAN of daily order revenue — the robust
    smoother next to q_moving_avg's mean frame (a single spike day
    can't move it). Daily cents are the calendar-bounded exact-int
    combine; each window median is an order statistic of ≤7 exact ints
    (mean of the two middles on even partial frames — identical
    interpolation in numpy and the oracle's windowed median())."""
    o = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "rev": cents})
        return df.groupby("day", as_index=False).sum()

    daily = _combine_partials(
        o.map_batches(partial, batch_format="pyarrow"), ["day"], ["rev"],
    ).sort_values("day").reset_index(drop=True)
    r = daily["rev"].to_numpy(np.int64)
    med = np.array([float(np.median(r[max(0, i - 6):i + 1]))
                    for i in range(len(r))])
    return pd.DataFrame({
        "day": daily["day"].astype(np.int64),
        "revenue": round_half_away(r / 100.0, 2),
        "med7": round_half_away(med / 100.0, 2)})


def q_host_link_locality(sf_dir: str):
    """Per-host link locality of the derived web: what share of each
    host's out-links stay on the host (host = doc_id mod 3 by
    construction) — the crawl-frontier dispersion signal (high locality
    = per-host politeness dominates; low = the frontier fans out).
    Pure map-side arithmetic over the edge stream into a 3-row bounded
    combine; the ratio is one rounded division from exact ints."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        from ..stages.graph import CAPTCHA_MOD, CAPTCHA_RES, EDGE_MULS
        ids = t.column("doc_id").to_numpy(zero_copy_only=False
                                          ).astype(np.int64)
        ids = ids[ids % CAPTCHA_MOD != CAPTCHA_RES]
        src = np.repeat(ids % 3, len(EDGE_MULS))
        dst = np.stack([((a * ids + b) % n) % 3 for a, b in EDGE_MULS],
                       axis=1).ravel()
        df = pd.DataFrame({"host": src,
                           "internal": (src == dst).astype(np.int64),
                           "total": np.int64(1)})
        return df.groupby("host", as_index=False).sum()

    out = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["host"], ["internal", "total"],
    ).sort_values("host").reset_index(drop=True)
    return pd.DataFrame({
        "host": out["host"].astype(np.int64),
        "internal": out["internal"].astype(np.int64),
        "total": out["total"].astype(np.int64),
        "locality": round_half_away(
            out["internal"].to_numpy(np.int64)
            / out["total"].to_numpy(np.int64), 6)})


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
        from ..functions.urls import md5_hash64_many

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


def q_day_jaccard(sf_dir: str):
    """Day-over-day audience overlap: Jaccard similarity of consecutive
    days' active-user sets — the churn-velocity dial (1.0 = the same
    users every day, →0 = a fully new audience daily). ONE user-bucket
    shuffle co-locates each user's distinct active days; the kernel
    emits CALENDAR-BOUNDED per-day partials (active count + next-day
    intersection count via one sorted diff), and the driver closes
    |A∩B| / (|A|+|B|−|A∩B|) from exact ints."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["ts"].astype("int64").to_numpy() // DAY
        dd = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
        u = dd["u"].to_numpy()
        d = dd["d"].to_numpy()
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        nxt = (u[1:] == u[:-1]) & (d[1:] - d[:-1] == 1)
        act = pd.DataFrame({"d": d, "act": np.int64(1),
                            "inter": np.int64(0)})
        itr = pd.DataFrame({"d": d[:-1][nxt], "act": np.int64(0),
                            "inter": np.int64(1)})
        df = pd.concat([act, itr], ignore_index=True)
        return df.groupby("d", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32).groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["d"], ["act", "inter"],
    ).sort_values("d").reset_index(drop=True)
    a = out["act"].to_numpy(np.int64)
    inter = out["inter"].to_numpy(np.int64)
    # row i pairs day_i with day_i+1 ONLY when they are consecutive
    consec = np.zeros(len(a), dtype=bool)
    consec[:-1] = np.diff(out["d"].to_numpy(np.int64)) == 1
    b = np.roll(a, -1)
    ix = inter[consec]
    un = a[consec] + b[consec] - ix
    return pd.DataFrame({
        "day": out["d"].to_numpy(np.int64)[consec],
        "active": a[consec],
        "next_active": b[consec],
        "intersect": ix,
        "jaccard": round_half_away(ix / un, 6)})


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


def q_qn_scale(sf_dir: str):
    """Qn-style robust scale of daily order revenue: the first-quartile
    order statistic of all pairwise |x_i − x_j| (Rousseeuw & Croux's
    outlier-immune spread — a 50%-breakdown alternative to stddev).
    Daily cents are the CALENDAR-BOUNDED exact-int combine (the
    Theil–Sen argument: more data fattens days, it doesn't add them);
    the ~3M pairwise differences close on the driver as one numpy
    partition — the k-th smallest of exact integers, no floats until
    the final cents→dollars cast."""
    o = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "rev": cents})
        return df.groupby("day", as_index=False).sum()

    daily = _combine_partials(
        o.map_batches(partial, batch_format="pyarrow"), ["day"], ["rev"],
    )
    r = daily["rev"].to_numpy(np.int64)
    iu, ju = np.triu_indices(len(r), k=1)
    d = np.abs(r[ju] - r[iu])
    m = len(d)
    k = (m + 3) // 4  # ceil(m/4): the lower-quartile order statistic
    qn = int(np.partition(d, k - 1)[k - 1])
    return pd.DataFrame({
        "n_days": [np.int64(len(r))],
        "n_pairs": [np.int64(m)],
        "k": [np.int64(k)],
        "qn": round_half_away(np.array([qn / 100.0]), 2)})


def q_markov2_transitions(sf_dir: str):
    """SECOND-order Markov transitions: for every (prev2, prev1, next)
    trigram of a user's ordered event stream, the count and the
    probability conditioned on the (prev2, prev1) context — the model
    that catches "view→click means purchase, error→click means retry"
    where the first-order matrix (q_event_transitions) can't. Same ONE
    user-bucket shuffle, doubly-shifted compare kernel, and a
    types³-bounded combine (125 cells at any corpus size); the
    conditional is one rounded division from exact ints."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        df = pd.DataFrame({"prev2": et[:-2][same],
                           "prev1": et[1:-1][same],
                           "next_type": et[2:][same]})
        out = df.groupby(["prev2", "prev1", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev2", "prev1", "next_type"], ["n"],
    )
    ctx = out.groupby(["prev2", "prev1"])["n"].transform("sum").to_numpy(
        np.float64)
    df = pd.DataFrame({
        "prev2": out["prev2"], "prev1": out["prev1"],
        "next_type": out["next_type"],
        "n": out["n"].astype(np.int64),
        "p": round_half_away(out["n"].to_numpy(np.float64) / ctx, 6)})
    return df.sort_values(["prev2", "prev1", "next_type"]).reset_index(
        drop=True)


def q_spearman_value_k(sf_dir: str):
    """EXACT distributed Spearman rank correlation between event value
    and the props 'k' field — "does spend co-move with the campaign
    knob?" asked rank-wise, immune to either column's distribution.
    The trick that makes it exact at any scale: average ranks with
    ties are half-integers, so DOUBLED ranks r2 = 2·(#below) + (#eq) + 1
    are INTEGERS computable from the two marginal histograms — and both
    marginals are VALUE-RANGE-bounded (≤49k distinct cents, ≤bounded
    k), as is the joint (v, k) table the cross-moment needs. Every sum
    (Σr2x, Σr2x², Σr2x·r2y via joint counts) is an exact Python int; ρ
    closes with the assortativity expression tree, so the only floats
    are the final casts/sqrts. The joint combine carries a cap with a
    distributed groupby fallback for unbounded-cardinality schemas."""
    from ..functions.text import json_int_field

    ev = _pq(sf_dir, "events", columns=["value", "props"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        k = json_int_field(t.column("props"), "k").to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"v": v, "k": k, "c": np.int64(1)})
        return df.groupby(["v", "k"], as_index=False).sum()

    joint = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["v", "k"], ["c"], cap=4_000_000,
    )
    if joint is None:  # pragma: no cover - unbounded joint cardinality
        joint = (ev.map_batches(partial, batch_format="pyarrow")
                 .groupby(["v", "k"]).sum("c")
                 .to_pandas().rename(columns={"sum(c)": "c"}))

    def rank2_map(keys: np.ndarray, cnt: np.ndarray):
        order = np.argsort(keys)
        ks, cs = keys[order], cnt[order]
        below = np.concatenate([[0], np.cumsum(cs)[:-1]])
        return dict(zip(ks.tolist(),
                        (2 * below + cs + 1).astype(object).tolist()))

    hv = joint.groupby("v", as_index=False)["c"].sum()
    hk = joint.groupby("k", as_index=False)["c"].sum()
    rx = rank2_map(hv["v"].to_numpy(np.int64), hv["c"].to_numpy(np.int64))
    ry = rank2_map(hk["k"].to_numpy(np.int64), hk["c"].to_numpy(np.int64))
    n = sx = sy = sxy = sxx = syy = 0
    for r in joint.itertuples():
        c, x, y = int(r.c), rx[int(r.v)], ry[int(r.k)]
        n += c
        sx += c * x
        sy += c * y
        sxy += c * x * y
        sxx += c * x * x
        syy += c * y * y
    num = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    rho = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
    return pd.DataFrame({
        "n": [np.int64(n)],
        "spearman": round_half_away(np.array([rho]), 6)})


def q_lag_xcorr(sf_dir: str):
    """Lead–lag cross-correlation: Pearson(clicks_t, purchases_{t+L})
    for lags L = 0..7 days — "how many days does a click take to turn
    into a purchase at the aggregate level?". One calendar-bounded
    combine of per-day (click, purchase) counts serves all eight lags;
    each lag's correlation closes from exact integer sums over the
    overlapping day range with the shared deterministic float tree."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()[m]
        one = (et[m] == "click").astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "clicks": one,
                           "purchases": 1 - one})
        return df.groupby("day", as_index=False).sum()

    daily = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["clicks", "purchases"],
    ).sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    # reindex onto the dense [min, max] day grid (absent days = 0) so a
    # lag join is a plain array shift on both sides
    lo, hi = int(days.min()), int(days.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    p = np.zeros(hi - lo + 1, dtype=np.int64)
    c[days - lo] = daily["clicks"].to_numpy(np.int64)
    p[days - lo] = daily["purchases"].to_numpy(np.int64)
    rows = []
    for lag in range(8):
        x = c[:len(c) - lag] if lag else c
        y = p[lag:]
        m = len(x)
        xo, yo = x.astype(object), y.astype(object)
        sx, sy = int(xo.sum()), int(yo.sum())
        sxy = int((xo * yo).sum())
        sxx, syy = int((xo * xo).sum()), int((yo * yo).sum())
        num = m * sxy - sx * sy
        vx, vy = m * sxx - sx * sx, m * syy - sy * sy
        r = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        rows.append({"lag": np.int64(lag), "n_days": np.int64(m),
                     "xcorr": r})
    df = pd.DataFrame(rows)
    df["xcorr"] = round_half_away(df["xcorr"].to_numpy(), 6)
    return df


def q_common_neighbors(sf_dir: str):
    """Link prediction over the derived link graph: the top-20
    NON-adjacent page pairs ranked by common-neighbor count — the
    classic "should these two pages link?" candidate list (and, for a
    crawler, the seed list for discovering missing hub→hub edges).

    Two plans behind the usual cap (the q_local_clustering pattern).
    UNDER it the whole graph gathers once and a vectorized driver
    kernel closes it (doubled-list lexsort → segmented triu wedge
    pairs → one np.unique count → searchsorted anti-probe against the
    packed edge keys): four hash shuffles of a small graph are pure
    fixed cost. PAST it the distributed plan runs: undirected edge
    dedup (ONE (a,b) groupby), per-apex wedge-pair emission
    (O(d²)/node, bounded by the 3-out-regular construction; a
    hub-skewed graph would salt/cap the stage), ONE (x,y) count
    groupby, then the anti-join against the edge set — broadcast
    searchsorted probe under the cap, distributed left_outer+is_null
    past it — and a per-block partial top-k so only blocks×20 rows
    ever reach the driver. The fallback-equality test pins both plans
    equal."""
    from ..stages.graph import edges_dataset
    from ray.data import aggregate as _agg

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    K = 20
    empty = pd.DataFrame({"a": np.zeros(0, np.int64),
                          "b": np.zeros(0, np.int64),
                          "cn": np.zeros(0, np.int64)})

    edf = _gather_capped(edges)
    if edf is not None:  # driver kernel: the whole graph is small
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        m = s != d
        a = np.minimum(s[m], d[m])
        b = np.maximum(s[m], d[m])
        keys = np.unique(a * n + b)            # deduped undirected edges
        ua, ub = keys // n, keys % n
        v = np.concatenate([ua, ub])           # doubled neighbor list
        w = np.concatenate([ub, ua])
        order = np.lexsort((w, v))
        v, w = v[order], w[order]
        brk = np.ones(len(v), dtype=bool)
        brk[1:] = v[1:] != v[:-1]
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(v))
        chunks = []
        for st, en in zip(starts, ends):        # tiny segments (d ≤ ~12)
            dd = en - st
            if dd < 2:
                continue
            iu, ju = np.triu_indices(dd, k=1)
            chunks.append(w[st + iu] * n + w[st + ju])
        if not chunks:
            return empty
        uniq, cnt = np.unique(np.concatenate(chunks), return_counts=True)
        hit, _ = _sorted_lookup(keys, uniq)     # drop already-adjacent
        uniq, cnt = uniq[~hit], cnt[~hit]
        if not len(uniq):
            return empty
        top = np.lexsort((uniq, -cnt))[:K]
        return pd.DataFrame({
            "a": (uniq[top] // n).astype(np.int64),
            "b": (uniq[top] % n).astype(np.int64),
            "cn": cnt[top].astype(np.int64)}).reset_index(drop=True)

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        return pa.table({
            "a": pa.array(np.minimum(s[m], d[m]), pa.int64()),
            "b": pa.array(np.maximum(s[m], d[m]), pa.int64())})

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).count()
           .map_batches(lambda t: t.select(["a", "b"]),
                        batch_format="pyarrow")
           ).materialize()  # consumed twice: wedge emission + anti-join

    def both(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(np.concatenate([a, b]), pa.int64()),
            "w": pa.array(np.concatenate([b, a]), pa.int64())})

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        w = np.sort(g["w"].to_numpy(np.int64))
        if len(w) < 2:
            return pd.DataFrame({"x": np.zeros(0, np.int64),
                                 "y": np.zeros(0, np.int64)})
        iu, ju = np.triu_indices(len(w), k=1)
        return pd.DataFrame({"x": w[iu], "y": w[ju]})

    cn = (und.map_batches(both, batch_format="pyarrow")
          .groupby("v").map_groups(wedge_pairs, batch_format="pandas")
          .groupby(["x", "y"]).aggregate(_agg.Count(alias_name="cn")))

    bdf = _gather_capped(und)
    if bdf is not None:  # broadcast anti-probe: zero extra shuffles
        keys = np.sort(bdf["a"].to_numpy(np.int64) * n
                       + bdf["b"].to_numpy(np.int64))
        kref = ray.put(keys)

        def anti(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(ks, x * n + y)
            return t.filter(pa.array(~hit))

        non = cn.map_batches(anti, batch_format="pyarrow")
    else:  # distributed anti: left_outer ⋈ edges, keep the misses
        marked = und.map_batches(
            lambda t: t.append_column(
                "hit", pa.array(np.ones(len(t), np.int64))),
            batch_format="pyarrow")
        non = cn.join(
            marked, join_type="left_outer", num_partitions=parts,
            on=("x", "y"), right_on=("a", "b"),
        ).map_batches(
            lambda t: t.filter(pc.is_null(t.column("hit")))
                       .select(["x", "y", "cn"]),
            batch_format="pyarrow")

    def block_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column("x").to_numpy(zero_copy_only=False),
            "b": t.column("y").to_numpy(zero_copy_only=False),
            "cn": pc.cast(t.column("cn"), pa.int64()).to_numpy(
                zero_copy_only=False)})
        df = df.sort_values(["cn", "a", "b"],
                            ascending=[False, True, True]).head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = non.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if not len(out):
        return empty
    out = out.sort_values(["cn", "a", "b"],
                          ascending=[False, True, True]).head(K)
    return out.astype(np.int64).reset_index(drop=True)


def q_mann_whitney(sf_dir: str):
    """Exact Mann–Whitney U (Wilcoxon rank-sum) test between the click
    and purchase value distributions — "do conversions spend from the
    same distribution clicks browse?", the nonparametric companion to
    ks_test. INTEGER-EXACT at any scale: the partial is a per-milliunit
    (value, c_click, c_purchase) count pair bounded by the VALUE DOMAIN
    (not data size), and tie-corrected average ranks are kept as
    DOUBLED integers (2·avg_rank = 2·cum_before + ties + 1, the
    spearman_value_k move) so U₁/U₂ close in unbounded-int arithmetic.
    The rank-biserial effect size is the single float division
    (u1_x2−u2_x2)/(2·n1·n2), the identical expression the oracle
    evaluates."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        v3 = np.rint(t.column("value").to_numpy()[m] * 1000
                     ).astype(np.int64)
        one = (et[m] == "click").astype(np.int64)
        df = pd.DataFrame({"v": v3, "c1": one, "c2": 1 - one})
        return df.groupby("v", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["v"], ["c1", "c2"],
    ).sort_values("v")
    c1 = out["c1"].to_numpy(np.int64)
    c2 = out["c2"].to_numpy(np.int64)
    t_ = c1 + c2
    cum_before = np.concatenate([[0], np.cumsum(t_)[:-1]])
    r2 = 2 * cum_before + t_ + 1  # doubled average rank per distinct v
    n1, n2 = int(c1.sum()), int(c2.sum())
    r1x2 = int((c1.astype(object) * r2.astype(object)).sum())
    u1x2 = r1x2 - n1 * (n1 + 1)
    u2x2 = 2 * n1 * n2 - u1x2
    rb = round_half_away(
        np.array([(u1x2 - u2x2) / (2.0 * n1 * n2)]), 6)[0]
    return pd.DataFrame({
        "n1": [np.int64(n1)], "n2": [np.int64(n2)],
        "u1_x2": [np.int64(u1x2)], "u2_x2": [np.int64(u2x2)],
        "rb": [rb]})


def q_mutual_info(sf_dir: str):
    """Mutual information I(event_type; day-of-week) in bits — the
    association strength behind chi2_type_dow's significance test (the
    number a feature-selection pass actually ranks by). Day-of-week is
    (epoch_day+4) % 7 on BOTH sides (no calendar functions). The
    partial is the bounded (type × 7) count grid; the driver closes
    I = (1/N)·Σ n_ij·log2(n_ij·N / (n_i·n_j)) with each term QUANTIZED
    to 1e-6 before the exact integer sum — the identical expression
    tree the oracle evaluates (the source_kl move)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "et": t.column("event_type").to_pandas(),
            "dow": (ts // DAY + 4) % 7, "c": np.int64(1)})
        return df.groupby(["et", "dow"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["et", "dow"], ["c"],
    )
    nij = out["c"].to_numpy(np.int64).astype(np.float64)
    ni = out.groupby("et")["c"].transform("sum").to_numpy(np.int64
                                                          ).astype(np.float64)
    nj = out.groupby("dow")["c"].transform("sum").to_numpy(np.int64
                                                           ).astype(np.float64)
    n = float(int(out["c"].sum()))
    q = round_half_away(
        nij * np.log2(nij * n / (ni * nj)) * 1e6).astype(np.int64)
    mi = float(int(q.sum())) / 1e6 / n
    return pd.DataFrame({
        "n": [np.int64(n)],
        "mi_bits": [round_half_away(np.array([mi]), 6)[0]]})


def q_weighted_median(sf_dir: str):
    """Quantity-weighted median extended price (cents) per return flag
    — "what price point does the MIDDLE UNIT ship at?" (each line
    weighted by its quantity, so a 50-unit line counts 50×; the
    inventory-value analogue of value_mad's exact median). One bounded
    histogram pass: per-(flag, cents) weight-sum partials are capped by
    the PRICE DOMAIN at any corpus size, and the driver closes the
    lower weighted median (smallest price with 2·cumweight ≥ total) in
    pure integer arithmetic."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_extendedprice", "l_quantity"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "rf": t.column("l_returnflag").to_pandas(),
            "pc_": np.rint(t.column("l_extendedprice").to_numpy() * 100
                           ).astype(np.int64),
            "w": np.rint(t.column("l_quantity").to_numpy()
                         ).astype(np.int64)})
        return df.groupby(["rf", "pc_"], as_index=False)["w"].sum()

    hist = _combine_partials(
        li.map_batches(partial, batch_format="pyarrow"),
        ["rf", "pc_"], ["w"],
    )
    rows = []
    for rf, g in hist.groupby("rf"):
        g = g.sort_values("pc_")
        cw = np.cumsum(g["w"].to_numpy(np.int64))
        tw = int(cw[-1])
        i = int(np.searchsorted(2 * cw, tw))  # first 2·cw ≥ tw
        rows.append({"l_returnflag": rf, "total_weight": np.int64(tw),
                     "wmedian_cents": np.int64(g["pc_"].iloc[i])})
    if not rows:
        return pd.DataFrame(columns=["l_returnflag", "total_weight",
                                     "wmedian_cents"])
    return pd.DataFrame(rows).sort_values("l_returnflag"
                                          ).reset_index(drop=True)


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
    from ..stages.dedup import ngram_jaccard_join

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


def q_bfs_distances(sf_dir: str):
    """Directed BFS hop distance from the seed page (doc 0) over the
    derived link graph — the reachability/depth structure the crawl's
    wave scheduler computes implicitly, exposed as a query (its oracle
    is a RECURSIVE CTE, a shape no other graph query exercises).
    Unreachable docs report dist −1; rounds cap at 64 on BOTH sides
    (≫ the ~log₃(n) diameter of the 3-out construction).

    Driver fast path under the cap: one CSR (lexsort + searchsorted)
    frontier sweep. Past it the edge list stays a Dataset and each BFS
    round is ONE map_batches scan emitting the next frontier's dsts
    (the frontier broadcasts via ray.put; the dist array is bounded by
    the NODE count, the same budget the pagerank/kcore family already
    carries — at 1e10 nodes this family would move to the
    components_minlabel join-propagation plan)."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    edf = _gather_capped(edges)
    dist = _bfs_dist_from(0, n, edf, edges)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "dist": dist})


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


def q_graph_diameter(sf_dir: str):
    """Double-sweep diameter probe of the directed link graph: BFS
    from doc 0 picks the farthest reachable node (max dist, smallest
    id on ties), a second BFS from THERE reports its eccentricity —
    the classic 2-sweep lower bound on graph diameter (exact on trees,
    near-exact on expander-like link graphs; a crawler reads it as
    "how many waves until the frontier dies"). Both sweeps share
    :func:`_bfs_dist_from` — one gathered CSR under the edge cap,
    per-round Dataset scans past it — and the oracle is a PAIR of
    recursive CTEs, the second seeded by the first's argmax."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    edf = _gather_capped(edges)

    d0 = _bfs_dist_from(0, n, edf, edges)
    reach0 = np.nonzero(d0 >= 0)[0]
    # argmax dist, smallest node on ties (reach0 ascending → argmax
    # returns the first = smallest attaining node)
    seed = int(reach0[np.argmax(d0[reach0])])
    ecc0 = int(d0[seed])
    d1 = _bfs_dist_from(seed, n, edf, edges)
    reach1 = np.nonzero(d1 >= 0)[0]
    far = int(reach1[np.argmax(d1[reach1])])
    return pd.DataFrame({
        "sweep_seed": [np.int64(seed)], "ecc0": [np.int64(ecc0)],
        "ecc_seed": [np.int64(d1[far])], "far_node": [np.int64(far)],
        "n_reachable": [np.int64(len(reach1))]})


def q_cuped_uplift(sf_dir: str):
    """CUPED-adjusted A/B uplift on event value — the
    variance-reduction estimator an experimentation platform runs
    (Deng et al. 2013): arms = user_id parity, pre/post periods split
    at the corpus midpoint timestamp, covariate x = user's pre-period
    value sum, outcome y = post-period sum; θ = cov(x,y)/var(x) pooled
    over ALL users, uplift_cuped = uplift_raw − θ·(x̄_B − x̄_A).

    Distribution: ONE pass emits per-(user) milliunit pre/post sum
    partials (combined table bounded by user count); the driver closes
    every moment in unbounded Python ints and evaluates the identical
    float expression tree the oracle does. The midpoint comes from an
    exact (min,max) epoch combine — no calendar functions."""
    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def span(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        return pd.DataFrame({"mn": [np.int64(ts.min())],
                             "mx": [np.int64(ts.max())]})

    # per-block extrema gather — bounded by block count, not data size
    ext = ev.map_batches(span, batch_format="pyarrow").to_pandas()
    mid = (int(ext["mn"].min()) + int(ext["mx"].max())) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        v3 = np.rint(t.column("value").to_numpy() * 1000
                     ).astype(np.int64)
        pre = ts < mid
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(
                zero_copy_only=False),
            "x": np.where(pre, v3, 0), "y": np.where(pre, 0, v3)})
        return df.groupby("user_id", as_index=False).sum()

    u = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["x", "y"],
    )
    uid = u["user_id"].to_numpy(np.int64)
    x = [int(v) for v in u["x"]]
    y = [int(v) for v in u["y"]]
    nn = len(u)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a_ * b_ for a_, b_ in zip(x, y))
    theta = float(nn * sxy - sx * sy) / float(nn * sxx - sx * sx)
    arm = uid % 2
    n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
    sx0 = sum(v for v, a_ in zip(x, arm) if a_ == 0)
    sx1 = sx - sx0
    sy0 = sum(v for v, a_ in zip(y, arm) if a_ == 0)
    sy1 = sy - sy0
    raw_m = float(sy1) / float(n1) - float(sy0) / float(n0)
    dx_m = float(sx1) / float(n1) - float(sx0) / float(n0)
    return pd.DataFrame({
        "n_a": [np.int64(n0)], "n_b": [np.int64(n1)],
        "theta": [round_half_away(np.array([theta]), 6)[0]],
        "uplift_raw": [round_half_away(np.array([raw_m / 1000.0]),
                                       6)[0]],
        "uplift_cuped": [round_half_away(
            np.array([(raw_m - theta * dx_m) / 1000.0]), 6)[0]]})


def q_geo_knn(sf_dir: str):
    """Geospatial k-nearest-neighbors: each doc gets a DETERMINISTIC
    md5-derived coordinate (micro-degrees, the engine's synthetic
    stand-in for a geo-tagged corpus) and the query returns the 10
    docs nearest a fixed anchor by EXACT INTEGER squared planar
    distance — no trig, no floats, so the top-k order can never
    ulp-flip between engines. The scale shape is the canonical
    distributed k-NN: map-only per-block partial top-k (blocks×10 rows
    ever reach the driver), same as embedding_topk's reduce."""
    from ..stages.sampling import _unit_hash

    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_n_cpus())
    LAT0, LON0, K = 37_774_900, -122_419_400, 10

    def block_topk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lat = (_unit_hash(ids, "geolat:") % np.uint64(180_000_001)
               ).astype(np.int64) - 90_000_000
        lon = (_unit_hash(ids, "geolon:") % np.uint64(360_000_001)
               ).astype(np.int64) - 180_000_000
        d2 = (lat - LAT0) ** 2 + (lon - LON0) ** 2
        df = pd.DataFrame({"doc_id": ids, "lat_u": lat, "lon_u": lon,
                           "d2": d2}).sort_values(["d2", "doc_id"]
                                                  ).head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = docs.map_batches(block_topk, batch_format="pyarrow"
                           ).to_pandas()
    return (out.sort_values(["d2", "doc_id"]).head(K)
            .astype(np.int64).reset_index(drop=True))


def q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction over the derived link graph: the
    top-20 non-adjacent pairs by Σ_z 1/log2(deg(z)) over shared
    neighbors z — common_neighbors' degree-weighted sibling (rare hubs
    count more than popular ones). Each wedge term is QUANTIZED to an
    integer (round(10⁶/log2(d))), so per-pair scores close in exact
    integer sums on both sides and the top-20 order (aa6 DESC, a, b)
    can never float-flip.

    Same two plans as q_common_neighbors: vectorized driver kernel
    under the edge-gather cap (weighted np.bincount over packed wedge
    keys); past it the distributed wedge plan with the apex term
    riding the wedge stream into ONE (x,y) Sum groupby, the
    broadcast/join anti-probe, and per-block partial top-k."""
    from ..stages.graph import edges_dataset
    from ray.data import aggregate as _agg

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    K = 20
    empty = pd.DataFrame({"a": np.zeros(0, np.int64),
                          "b": np.zeros(0, np.int64),
                          "aa6": np.zeros(0, np.int64)})

    edf = _gather_capped(edges)
    if edf is not None:  # driver kernel
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        m = s != d
        a = np.minimum(s[m], d[m])
        b = np.maximum(s[m], d[m])
        keys = np.unique(a * n + b)
        ua, ub = keys // n, keys % n
        v = np.concatenate([ua, ub])
        w = np.concatenate([ub, ua])
        order = np.lexsort((w, v))
        v, w = v[order], w[order]
        brk = np.ones(len(v), dtype=bool)
        brk[1:] = v[1:] != v[:-1]
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(v))
        pk_chunks, t_chunks = [], []
        for st, en in zip(starts, ends):
            dd = en - st
            if dd < 2:
                continue
            term = int(round_half_away(
                np.array([1_000_000.0 / np.log2(float(dd))]))[0])
            iu, ju = np.triu_indices(dd, k=1)
            pk_chunks.append(w[st + iu] * n + w[st + ju])
            t_chunks.append(np.full(len(iu), term, dtype=np.int64))
        if not pk_chunks:
            return empty
        pk = np.concatenate(pk_chunks)
        tv = np.concatenate(t_chunks)
        uniq, inv = np.unique(pk, return_inverse=True)
        # integer-valued float64 adds are exact below 2^53
        aa6 = np.bincount(inv, weights=tv).astype(np.int64)
        hit, _ = _sorted_lookup(keys, uniq)
        uniq, aa6 = uniq[~hit], aa6[~hit]
        if not len(uniq):
            return empty
        top = np.lexsort((uniq, -aa6))[:K]
        return pd.DataFrame({
            "a": (uniq[top] // n).astype(np.int64),
            "b": (uniq[top] % n).astype(np.int64),
            "aa6": aa6[top]}).reset_index(drop=True)

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        m = s != d
        return pa.table({
            "a": pa.array(np.minimum(s[m], d[m]), pa.int64()),
            "b": pa.array(np.maximum(s[m], d[m]), pa.int64())})

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["a", "b"]).count()
           .map_batches(lambda t: t.select(["a", "b"]),
                        batch_format="pyarrow")
           ).materialize()

    def both(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(np.concatenate([a, b]), pa.int64()),
            "w": pa.array(np.concatenate([b, a]), pa.int64())})

    def wedge_terms(g: pd.DataFrame) -> pd.DataFrame:
        w = np.sort(g["w"].to_numpy(np.int64))
        if len(w) < 2:
            return pd.DataFrame({"x": np.zeros(0, np.int64),
                                 "y": np.zeros(0, np.int64),
                                 "t": np.zeros(0, np.int64)})
        term = int(round_half_away(
            np.array([1_000_000.0 / np.log2(float(len(w)))]))[0])
        iu, ju = np.triu_indices(len(w), k=1)
        return pd.DataFrame({"x": w[iu], "y": w[ju],
                             "t": np.full(len(iu), term, np.int64)})

    aa = (und.map_batches(both, batch_format="pyarrow")
          .groupby("v").map_groups(wedge_terms, batch_format="pandas")
          .groupby(["x", "y"]).aggregate(_agg.Sum("t", alias_name="aa6")))

    bdf = _gather_capped(und)
    if bdf is not None:
        keys = np.sort(bdf["a"].to_numpy(np.int64) * n
                       + bdf["b"].to_numpy(np.int64))
        kref = ray.put(keys)

        def anti(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            x = t.column("x").to_numpy(zero_copy_only=False)
            y = t.column("y").to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(ks, x * n + y)
            return t.filter(pa.array(~hit))

        non = aa.map_batches(anti, batch_format="pyarrow")
    else:
        marked = und.map_batches(
            lambda t: t.append_column(
                "hit", pa.array(np.ones(len(t), np.int64))),
            batch_format="pyarrow")
        non = aa.join(
            marked, join_type="left_outer", num_partitions=parts,
            on=("x", "y"), right_on=("a", "b"),
        ).map_batches(
            lambda t: t.filter(pc.is_null(t.column("hit")))
                       .select(["x", "y", "aa6"]),
            batch_format="pyarrow")

    def block_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column("x").to_numpy(zero_copy_only=False),
            "b": t.column("y").to_numpy(zero_copy_only=False),
            "aa6": pc.cast(t.column("aa6"), pa.int64()).to_numpy(
                zero_copy_only=False)})
        df = df.sort_values(["aa6", "a", "b"],
                            ascending=[False, True, True]).head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = non.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if not len(out):
        return empty
    out = out.sort_values(["aa6", "a", "b"],
                          ascending=[False, True, True]).head(K)
    return out.astype(np.int64).reset_index(drop=True)


def q_burstiness(sf_dir: str):
    """Per-event-type burstiness B = (σ−μ)/(σ+μ) of same-user
    inter-event gaps (whole seconds) — the Goh–Barabási measure that
    separates periodic traffic (B→−1) from Poisson (B≈0) from bursty
    human behavior (B→+1). One hash-bucket shuffle puts every user's
    stream in one group (the lag_deltas layout); the kernel lexsorts
    (user, type, ts) once and diffs; gaps then reduce to a
    DOMAIN-BOUNDED (type, gap_s) histogram (distinct whole-second gaps
    ≤ the corpus time span, not data size), so the driver closes exact
    HUGEINT-equivalent Σg/Σg² from unbounded Python ints and B is the
    single float expression both sides evaluate."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts"],
             num_blocks=_n_cpus())

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, et, u))
        u, et, ts = u[order], et[order], ts[order]
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap_s = (ts[1:] - ts[:-1])[same] // 1_000_000
        df = pd.DataFrame({"event_type": et[1:][same], "gap_s": gap_s,
                           "c": np.int64(1)})
        return df.groupby(["event_type", "gap_s"], as_index=False).sum()

    hist = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(gaps, batch_format="pandas"),
        ["event_type", "gap_s"], ["c"],
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        gs = [int(x) for x in g["gap_s"]]
        cs = [int(x) for x in g["c"]]
        nn = sum(cs)
        sg = sum(c * x for c, x in zip(cs, gs))
        sg2 = sum(c * x * x for c, x in zip(cs, gs))
        sigma = np.sqrt(float(nn * sg2 - sg * sg)) / float(nn)
        mu = float(sg) / float(nn)
        rows.append({"event_type": et, "n_gaps": np.int64(nn),
                     "burstiness": round_half_away(
                         np.array([(sigma - mu) / (sigma + mu)]), 6)[0]})
    if not rows:
        return pd.DataFrame(columns=["event_type", "n_gaps",
                                     "burstiness"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t statistic between click and purchase
    values — the parametric sibling of mann_whitney/ks_test, closing
    the two-sample testing family. Reuses the domain-bounded milliunit
    histogram partial; the driver recovers exact Σv/Σv² per side as
    unbounded Python ints and evaluates the identical float expression
    tree the oracle does: t = (m₁−m₂)/√(s₁²/n₁ + s₂²/n₂) with sample
    (n−1) variances."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        v3 = np.rint(t.column("value").to_numpy()[m] * 1000
                     ).astype(np.int64)
        one = (et[m] == "click").astype(np.int64)
        df = pd.DataFrame({"v": v3, "c1": one, "c2": 1 - one})
        return df.groupby("v", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["v"], ["c1", "c2"],
    )
    vs = [int(x) for x in out["v"]]

    def moments(counts) -> tuple[int, int, int]:
        cs = [int(x) for x in counts]
        return (sum(cs), sum(c * v for c, v in zip(cs, vs)),
                sum(c * v * v for c, v in zip(cs, vs)))

    n1, sv1, sq1 = moments(out["c1"])
    n2, sv2, sq2 = moments(out["c2"])
    a = float(n1 * sq1 - sv1 * sv1) / (float(n1) * float(n1 - 1)
                                       ) / float(n1)
    b = float(n2 * sq2 - sv2 * sv2) / (float(n2) * float(n2 - 1)
                                       ) / float(n2)
    t_stat = (float(sv1) / float(n1) - float(sv2) / float(n2)
              ) / np.sqrt(a + b)
    return pd.DataFrame({
        "n1": [np.int64(n1)], "n2": [np.int64(n2)],
        "mean1": [round_half_away(
            np.array([float(sv1) / float(n1) / 1000.0]), 6)[0]],
        "mean2": [round_half_away(
            np.array([float(sv2) / float(n2) / 1000.0]), 6)[0]],
        "t": [round_half_away(np.array([t_stat]), 6)[0]]})


def q_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values) distinct-user sketch per event type —
    the OTHER classic cardinality sketch next to hll_distinct, with a
    deterministic md5 hash space shared verbatim with the oracle. The
    partial is map-only and BOUNDED: each block contributes its k=64
    smallest distinct user hashes per type (types × 64 rows), the
    driver merges and closes est = (k−1)·2⁶⁴ // h_(k) in unbounded
    ints; fewer than k distinct observed ⇒ the merged union IS the
    exact distinct set and the count is exact (same CASE the oracle
    evaluates)."""
    from ..stages.sampling import _unit_hash

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"],
             num_blocks=_n_cpus())
    K = 64

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        hv = _unit_hash(
            t.column("user_id").to_numpy(zero_copy_only=False), "kmv:")
        df = pd.DataFrame({"event_type": et, "hv": hv})
        df = df.drop_duplicates()
        return (df.sort_values(["event_type", "hv"])
                  .groupby("event_type", as_index=False).head(K))

    mins = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for et, g in mins.groupby("event_type"):
        hv = np.unique(g["hv"].to_numpy(np.uint64))
        if len(hv) >= K:
            est = ((K - 1) << 64) // int(hv[K - 1])
        else:
            est = len(hv)  # union of block top-ks = the full set
        rows.append({"event_type": et, "kmv_est": np.int64(est)})
    if not rows:
        return pd.DataFrame(columns=["event_type", "kmv_est"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


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


def q_open_orders_daily(sf_dir: str):
    """Open-order backlog timeline: for every day on which the count
    changes, how many orders are in flight (placed but not yet fully
    shipped — close = max ship day + 1). The classic interval-stacking
    sweep, distributed as ±1 DELTA partials on a DAY-DOMAIN-BOUNDED
    axis: per-order close days reduce per batch, the (day, delta)
    combine is capped by the calendar, and the driver closes one
    cumsum. Under the cap the per-order close table gathers once and
    joins the broadcast orders map in pandas; past it a Ray
    groupby-max + hash join produce the same deltas (fallback pinned
    equal by test)."""
    DAY = 86_400_000_000
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"],
             num_blocks=parts)

    def close_partial(t: pa.Table) -> pd.DataFrame:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        rd = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy() // DAY
        df = pd.DataFrame({"ok": ok, "rd": rd})
        return df.groupby("ok", as_index=False).max()

    closes = li.map_batches(close_partial, batch_format="pyarrow")
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
                 num_blocks=parts)

    cdf = _gather_capped(closes)
    odf = _gather_capped(orders) if cdf is not None else None
    if cdf is not None and odf is not None:  # driver close
        per_order = cdf.groupby("ok", as_index=False)["rd"].max()
        od = pd.DataFrame({
            "ok": odf["o_orderkey"].to_numpy(np.int64),
            "od": odf["o_orderdate"].to_numpy("datetime64[us]"
                                              ).astype(np.int64) // DAY})
        j = per_order.merge(od, on="ok", how="inner")
        deltas = pd.concat([
            pd.DataFrame({"day": j["od"], "delta": np.int64(1)}),
            pd.DataFrame({"day": j["rd"] + 1, "delta": np.int64(-1)}),
        ]).groupby("day", as_index=False)["delta"].sum()
    else:  # distributed: groupby-max + hash join, delta partials
        per_order = closes.groupby("ok").max("rd")

        def od_of(t: pa.Table) -> pa.Table:
            return pa.table({
                "ok2": t.column("o_orderkey"),
                "od": pa.array(
                    pc.cast(t.column("o_orderdate"), pa.int64()
                            ).to_numpy() // DAY, pa.int64())})

        j = per_order.join(
            orders.map_batches(od_of, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("ok",), right_on=("ok2",))

        def to_deltas(t: pa.Table) -> pd.DataFrame:
            rd = pc.cast(t.column("max(rd)"), pa.int64()).to_numpy(
                zero_copy_only=False)
            od = t.column("od").to_numpy(zero_copy_only=False)
            return pd.DataFrame({
                "day": np.concatenate([od, rd + 1]),
                "delta": np.concatenate([
                    np.ones(len(od), np.int64),
                    np.full(len(rd), -1, np.int64)])}
            ).groupby("day", as_index=False).sum()

        deltas = _combine_partials(
            j.map_batches(to_deltas, batch_format="pyarrow"),
            ["day"], ["delta"],
        )
    deltas = deltas.sort_values("day").reset_index(drop=True)
    return pd.DataFrame({
        "day": deltas["day"].to_numpy(np.int64),
        "open_orders": np.cumsum(deltas["delta"].to_numpy(np.int64))})


def _tdiv(num: int, den: int) -> int:
    """Integer division truncating toward ZERO — DuckDB's `//` semantics
    (Python's `//` floors toward -inf, which differs on negative
    numerators). Every signed fixed-point close that an oracle mirrors
    with `//` must go through this so both sides truncate identically."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q


def q_kruskal_wallis(sf_dir: str):
    """Kruskal–Wallis H test across the five event-type value
    distributions — the k-sample generalization of mann_whitney (rank
    ANOVA), answering "do ANY of the types spend from a different
    distribution?" without normality assumptions. INTEGER-EXACT at any
    scale: the partial is the VALUE-DOMAIN-bounded (type, milliunit)
    count grid; tie-corrected average ranks are the DOUBLED integers
    2·cum_before + t + 1 closed from the global histogram, and H, the
    tie factor and the corrected H are all ×1e6 integer floors over
    unbounded Python ints — the identical floor-expression tree the
    oracle evaluates (no float anywhere)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "v": np.rint(t.column("value").to_numpy() * 1000
                         ).astype(np.int64),
            "c": np.int64(1),
        })
        return df.groupby(["event_type", "v"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )
    if grid is None or len(grid) == 0:
        return pd.DataFrame(columns=["n", "h6", "tie6", "h_adj6"])
    marg = grid.groupby("v", as_index=False)["c"].sum().sort_values("v")
    t_v = marg["c"].to_numpy(np.int64)
    cum_before = np.concatenate([[0], np.cumsum(t_v)[:-1]])
    r2 = 2 * cum_before + t_v + 1  # doubled average rank per distinct v
    r2_of = dict(zip(marg["v"].to_numpy(np.int64).tolist(),
                     r2.tolist()))
    N = int(t_v.sum())
    s6 = 0
    for _, g in grid.groupby("event_type"):
        c = g["c"].to_numpy(np.int64)
        vs = g["v"].to_numpy(np.int64)
        r2g = sum(int(ci) * r2_of[int(vi)] for ci, vi in zip(c, vs))
        n_g = int(c.sum())
        s6 += (10**6 * r2g * r2g) // (4 * n_g)
    h6 = (3 * s6) // (N * (N + 1)) - 3 * (N + 1) * 10**6
    T = sum(int(t) ** 3 - int(t) for t in t_v)
    tie6 = 10**6 - (10**6 * T) // (N**3 - N)
    h_adj6 = _tdiv(h6 * 10**6, tie6)
    return pd.DataFrame({
        "n": [np.int64(N)], "h6": [np.int64(h6)],
        "tie6": [np.int64(tie6)], "h_adj6": [np.int64(h_adj6)]})


def q_kendall_tau(sf_dir: str):
    """Per-event-type Kendall tau-b between value and the props 'k'
    campaign knob — the pairwise-concordance companion to
    spearman_value_k (tau is what you trust when the relationship is
    monotone but heavily tied). NO pair is ever enumerated: both axes
    are DOMAIN-bounded (milliunit value × k∈[0,100)), so the partial is
    the (type, v, k) count grid and the driver closes concordant /
    discordant counts from one 2-D prefix-sum over the dense per-type
    matrix — O(cells), exact unbounded-int arithmetic (object dtype past
    the int64-safe size), vs the oracle's literal O(n²) pair join. The
    signed effect closes as the ×1e6 trunc-div of (C−D)·|C−D| over
    (n0−Tv)(n0−Tk) — tau_b², sign carried — matching DuckDB's
    truncating `//`."""
    from ..functions.text import json_int_field

    ev = _pq(sf_dir, "events", columns=["event_type", "value", "props"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "v": np.rint(t.column("value").to_numpy() * 1000
                         ).astype(np.int64),
            "k": json_int_field(t.column("props"), "k").to_numpy(
                zero_copy_only=False),
            "c": np.int64(1),
        })
        return df.groupby(["event_type", "v", "k"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v", "k"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        vs = np.unique(g["v"].to_numpy(np.int64))
        ks = np.unique(g["k"].to_numpy(np.int64))
        vi = np.searchsorted(vs, g["v"].to_numpy(np.int64))
        ki = np.searchsorted(ks, g["k"].to_numpy(np.int64))
        n = int(g["c"].sum())
        # int64 products are safe while C ≤ n²/2 < 2^63; past that the
        # dense grid flips to Python-int (object) arithmetic
        dt = np.int64 if n < 3_000_000_000 else object
        M = np.zeros((len(vs), len(ks)), dtype=dt)
        M[vi, ki] = g["c"].to_numpy(np.int64).astype(dt)
        P = M.cumsum(axis=0).cumsum(axis=1)  # inclusive 2-D prefix
        # S_lt[i,j] = #points with v' < vs[i] AND k' < ks[j]
        S_lt = np.zeros_like(P)
        S_lt[1:, 1:] = P[:-1, :-1]
        row_tot = M.sum(axis=1).cumsum()  # #points with v' <= vs[i]
        S_gt = np.zeros_like(P)  # v' < vs[i] AND k' > ks[j]
        S_gt[1:, :] = (row_tot[:-1, None] - P[:-1, :])
        C = int((M * S_lt).sum())
        D = int((M * S_gt).sum())
        tv = g.groupby("v")["c"].sum().to_numpy(np.int64)
        tk = g.groupby("k")["c"].sum().to_numpy(np.int64)
        Tv = sum(int(t) * (int(t) - 1) for t in tv) // 2
        Tk = sum(int(t) * (int(t) - 1) for t in tk) // 2
        n0 = n * (n - 1) // 2
        num = (C - D) * abs(C - D) * 10**6
        den = (n0 - Tv) * (n0 - Tk)
        rows.append({
            "event_type": et, "n": np.int64(n), "conc": np.int64(C),
            "disc": np.int64(D),
            "tau_s6": np.int64(_tdiv(num, den) if den else 0)})
    if not rows:
        return pd.DataFrame(
            columns=["event_type", "n", "conc", "disc", "tau_s6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_eps_segments(sf_dir: str):
    """1-D epsilon-gap clustering of each event type's value support —
    DBSCAN(minPts=1) on the value line: sorted distinct milliunit
    values split wherever a gap exceeds eps=1000 (one currency unit).
    Reports per type the segment count, the heaviest segment's event
    mass and the widest segment's span — the shape screen that says
    whether a type's spend is one band or many islands. The partial is
    the bounded (type, v) histogram; the driver closes boundaries with
    one diff over the sorted support. All integers."""
    EPS = 1000
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "v": np.rint(t.column("value").to_numpy() * 1000
                         ).astype(np.int64),
            "c": np.int64(1),
        })
        return df.groupby(["event_type", "v"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        brk = np.concatenate([[True], np.diff(v) > EPS])
        seg = np.cumsum(brk) - 1
        n_seg = int(seg[-1]) + 1
        mass = np.zeros(n_seg, np.int64)
        np.add.at(mass, seg, c)
        idx_first = np.flatnonzero(brk)
        idx_last = np.concatenate([idx_first[1:] - 1, [len(v) - 1]])
        span = v[idx_last] - v[idx_first]
        rows.append({
            "event_type": et, "n_segments": np.int64(n_seg),
            "max_mass": np.int64(mass.max()),
            "max_span": np.int64(span.max())})
    if not rows:
        return pd.DataFrame(
            columns=["event_type", "n_segments", "max_mass", "max_span"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_ols2_hour_dow(sf_dir: str):
    """Two-feature OLS per event type — value (milliunits) regressed on
    hour-of-day and day-of-week jointly, the multi-regressor step past
    regr_by_type's single slope ("is the weekend effect real once you
    control for hour?"). EXACT: the partial is the nine integer moment
    sums (n, Σh, Σd, Σh², Σd², Σhd, Σv, Σvh, Σvd) per type — a
    5-row combine at any corpus size — and the driver closes the 3×3
    normal equations by CRAMER'S RULE in unbounded Python ints, emitting
    each coefficient as the ×1e6 trunc-div of two determinants (the
    identical HUGEINT cofactor expansion the oracle evaluates; no float,
    no matrix solve)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
             num_blocks=_n_cpus())
    HOUR, DAY = 3_600_000_000, 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        h = (ts // HOUR) % 24
        d = (ts // DAY + 4) % 7
        v = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "n": np.int64(1), "sh": h, "sd": d, "shh": h * h,
            "sdd": d * d, "shd": h * d, "sv": v, "svh": v * h,
            "svd": v * d})
        return df.groupby("event_type", as_index=False).sum()

    mom = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        ["n", "sh", "sd", "shh", "sdd", "shd", "sv", "svh", "svd"],
    )
    rows = []
    for _, r in mom.iterrows():
        n, sh, sd = int(r["n"]), int(r["sh"]), int(r["sd"])
        shh, sdd, shd = int(r["shh"]), int(r["sdd"]), int(r["shd"])
        sv, svh, svd = int(r["sv"]), int(r["svh"]), int(r["svd"])
        det = (n * (shh * sdd - shd * shd)
               - sh * (sh * sdd - shd * sd)
               + sd * (sh * shd - shh * sd))
        det0 = (sv * (shh * sdd - shd * shd)
                - sh * (svh * sdd - shd * svd)
                + sd * (svh * shd - shh * svd))
        det1 = (n * (svh * sdd - shd * svd)
                - sv * (sh * sdd - shd * sd)
                + sd * (sh * svd - svh * sd))
        det2 = (n * (shh * svd - svh * shd)
                - sh * (sh * svd - svh * sd)
                + sv * (sh * shd - shh * sd))
        rows.append({
            "event_type": r["event_type"], "n": np.int64(n),
            "b0_6": np.int64(_tdiv(10**6 * det0, det)),
            "b_hour6": np.int64(_tdiv(10**6 * det1, det)),
            "b_dow6": np.int64(_tdiv(10**6 * det2, det))})
    if not rows:
        return pd.DataFrame(
            columns=["event_type", "n", "b0_6", "b_hour6", "b_dow6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_theil_index(sf_dir: str):
    """Theil T inequality index of each event type's value distribution
    — the log-based, exactly-decomposable cousin of revenue_gini ("how
    concentrated is spend, in nats?"). The partial is the VALUE-DOMAIN-
    bounded (type, milliunit) histogram; the driver quantizes each
    distinct value's term (v/μ)·ln(v/μ) to 1e-6 BEFORE the count-
    weighted exact integer sum (the source_kl / mutual_info move), so
    the only floats are the per-distinct-value term evaluations the
    oracle replicates verbatim; the close is one integer trunc-div
    by n."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "v": np.rint(t.column("value").to_numpy() * 1000
                         ).astype(np.int64),
            "c": np.int64(1),
        })
        return df.groupby(["event_type", "v"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n, S = int(c.sum()), int((v * c).sum())
        mu = S / n  # float64, the identical expression the oracle casts
        ratio = v.astype(np.float64) / mu
        t6 = round_half_away(1e6 * ratio * np.log(ratio)
                             ).astype(np.int64)
        q = int((t6.astype(object) * c.astype(object)).sum())
        theil6 = _tdiv(q, n)
        rows.append({"event_type": et, "n": np.int64(n),
                     "sum3": np.int64(S), "theil6": np.int64(theil6)})
    if not rows:
        return pd.DataFrame(columns=["event_type", "n", "sum3",
                                     "theil6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_harmonic_centrality(sf_dir: str):
    """Harmonic centrality of the three biggest link hubs: for the
    top-3 in-degree pages (tie-break: smaller doc_id), H = Σ 1/d(u,v)
    over all reachable v≠u — the "how fast can this page's influence
    spread" score that closeness can't give on a disconnected web. Per-
    distance terms quantize as 1e6 // d (integer floor, matching SQL),
    so H6 is an exact integer sum over the BFS distance histogram. The
    in-degree partial is node-count-bounded (the pagerank/kcore
    budget); each hub's BFS reuses the bfs_distances sweep — CSR on the
    driver under the cap, one map_batches scan per round past it. The
    oracle is a 3-seed RECURSIVE CTE."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    def dst_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "v": t.column("dst").to_numpy(zero_copy_only=False),
            "c": np.int64(1)})
        return df.groupby("v", as_index=False).sum()

    indeg = _combine_partials(
        edges.map_batches(dst_partial, batch_format="pyarrow"),
        ["v"], ["c"],
    ).sort_values(["c", "v"], ascending=[False, True])
    seeds = indeg.head(3)

    edf = _gather_capped(edges)
    rows = []
    for _, s in seeds.iterrows():
        u, d_in = int(s["v"]), int(s["c"])
        dist = _bfs_dist_from(u, n, edf, edges)
        reach = dist[(dist > 0)]
        h6 = int(sum(10**6 // int(d) for d in reach))
        rows.append({"doc_id": np.int64(u), "in_deg": np.int64(d_in),
                     "n_reach": np.int64(len(reach)),
                     "h6": np.int64(h6)})
    return pd.DataFrame(rows).sort_values("doc_id"
                                          ).reset_index(drop=True)


def q_type_hour_cosine(sf_dir: str):
    """Pairwise cosine similarity between event types' 24-hour activity
    profiles — "which behaviors share a daily rhythm?" (the profile-
    space companion to type_affinity's co-user lift). The partial is
    the bounded (type × 24) count grid; every pair closes as the EXACT
    integer cos²×1e6 = (a·b)²·1e6 // (‖a‖²‖b‖²) — the squared-cosine
    trick that avoids both sqrts (dot products of counts are
    non-negative, so no sign is lost). Unbounded Python ints, no
    float."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24,
            "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    prof = {}
    for et, g in grid.groupby("event_type"):
        v = np.zeros(24, dtype=np.int64)
        v[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        prof[et] = v
    ets = sorted(prof)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            # 24-term python-int dots: immune to int64 overflow at any
            # corpus size (counts can exceed 3e9 per cell at 100 TB)
            dot = sum(int(x) * int(y)
                      for x, y in zip(prof[a], prof[b]))
            na = sum(int(x) * int(x) for x in prof[a])
            nb = sum(int(x) * int(x) for x in prof[b])
            rows.append({
                "type_a": a, "type_b": b,
                "cos2_6": np.int64((dot * dot * 10**6) // (na * nb))})
    if not rows:
        return pd.DataFrame(columns=["type_a", "type_b", "cos2_6"])
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]
                                          ).reset_index(drop=True)


def q_type_user_jaccard(sf_dir: str):
    """Jaccard overlap between event types' USER SETS — "are clickers
    the same people as buyers?", the audience-overlap matrix next to
    type_hour_cosine's rhythm match. The partial is the distinct
    (type, user) pair stream (bounded by users × types); the driver
    closes each pair's |A∩B|·1e6 // |A∪B| from one sorted merge per
    pair of per-type user arrays. Exact integers throughout."""
    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "user_id": t.column("user_id").to_numpy(
                zero_copy_only=False)})
        return df.drop_duplicates()

    pairs = _combine_partials(
        ev.map_batches(
            lambda t: partial(t).assign(c=np.int64(1)),
            batch_format="pyarrow"),
        ["event_type", "user_id"], ["c"],
    )
    users = {et: np.unique(g["user_id"].to_numpy(np.int64))
             for et, g in pairs.groupby("event_type")}
    ets = sorted(users)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            inter = len(np.intersect1d(users[a], users[b],
                                       assume_unique=True))
            union = len(users[a]) + len(users[b]) - inter
            rows.append({
                "type_a": a, "type_b": b, "n_inter": np.int64(inter),
                "jac6": np.int64(inter * 10**6 // union if union
                                 else 0)})
    if not rows:
        return pd.DataFrame(columns=["type_a", "type_b", "n_inter",
                                     "jac6"])
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]
                                          ).reset_index(drop=True)


def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonal index of event activity and spend: per dow,
    count share and value share ×7 (so a flat week reads 1e6 across the
    board) — the calendar-shape screen a capacity planner reads before
    trusting any daily forecast. One bounded (dow) partial; the indices
    close as exact integer floors (count_d·7·1e6 // N and
    sum3_d·7·1e6 // S3)."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "dow": (ts // DAY + 4) % 7,
            "c": np.int64(1),
            "s3": np.rint(t.column("value").to_numpy() * 1000
                          ).astype(np.int64)})
        return df.groupby("dow", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["dow"], ["c", "s3"],
    ).sort_values("dow")
    N, S = int(g["c"].sum()), int(g["s3"].sum())
    return pd.DataFrame({
        "dow": g["dow"].to_numpy(np.int64),
        "n": g["c"].to_numpy(np.int64),
        "cnt_idx6": np.array([int(c) * 7 * 10**6 // N
                              for c in g["c"]], np.int64),
        "val_idx6": np.array([int(s) * 7 * 10**6 // S
                              for s in g["s3"]], np.int64),
    }).reset_index(drop=True)


def q_decile_lift(sf_dir: str):
    """Customer revenue decile lift curve — customers ranked by exact
    revenue, cut into 10 rank-width deciles, each reporting headcount,
    revenue and CUMULATIVE revenue share (the table behind every
    "bottom 50% of customers = X% of revenue" claim; the curve whose
    single-number summary is revenue_gini). Distributed global order
    WITHOUT a global sort: per-customer int revenue (custkey-bucket
    groupby), then a 16-way VALUE-RANGE shuffle; pass 1 gathers the 16
    bucket counts → rank offsets; pass 2 re-runs the range buckets with
    the offsets in the task closure, so every row's global rank — and
    decile rn·10//n — is known bucket-locally. Equal revenues straddling
    a boundary are harmless: decile populations are fixed by rank
    arithmetic and tied rows carry identical x, so the sums are
    permutation-invariant (the gini tie argument). Per-decile sums ride
    as strings (they exceed int64 at ~1e9 customers); the driver closes
    160 rows in unbounded ints."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    joined = _li_orders_custkey(sf_dir, parts)

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        return _per_customer_rev4(g)[["x"]]

    revs = (
        _with_bucket(joined, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(per_cust, batch_format="pandas")
    ).materialize()  # consumed thrice: bounds, counts, decile pass

    def mm(t: pa.Table) -> pd.DataFrame:
        x = t.column("x").to_numpy()
        return pd.DataFrame({"k": [0], "mn": [int(x.min())],
                             "mx": [int(x.max())]}) if len(x) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mn": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    bounds = pd.concat(
        list(revs.map_batches(mm, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    lo, hi = int(bounds["mn"].min()), int(bounds["mx"].max())
    width = max(1, (hi - lo) // 16 + 1)

    def to_range_bucket(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy()
        rb = ((x - lo) // width).astype(np.int64)
        return pa.table({"x": t.column("x"), "__rb": pa.array(rb)})

    rb_cnt = _combine_partials(
        revs.map_batches(to_range_bucket, batch_format="pyarrow")
            .map_batches(
                lambda t: pd.DataFrame(
                    {"rb": t.column("__rb").to_numpy(),
                     "cnt": np.int64(1)}
                ).groupby("rb", as_index=False).sum(),
                batch_format="pyarrow"),
        ["rb"], ["cnt"],
    ).sort_values("rb")
    n = int(rb_cnt["cnt"].sum())
    offs = dict(zip(
        rb_cnt["rb"].tolist(),
        (np.cumsum(rb_cnt["cnt"].to_numpy(np.int64))
         - rb_cnt["cnt"].to_numpy(np.int64)).tolist()))

    def bucket_deciles(g: pd.DataFrame) -> pd.DataFrame:
        o = offs[int(g["__rb"].iloc[0])]
        x = np.sort(g["x"].to_numpy(np.int64))
        dec = (o + np.arange(len(x), dtype=np.int64)) * 10 // n
        out = []
        for d in np.unique(dec):
            xs = x[dec == d].astype(object)
            out.append({"decile": np.int64(d),
                        "n_cust": np.int64(len(xs)),
                        "sx": str(int(xs.sum()))})
        return pd.DataFrame(out)

    parts_df = pd.concat(
        list(revs.map_batches(to_range_bucket, batch_format="pyarrow")
             .groupby("__rb")
             .map_groups(bucket_deciles, batch_format="pandas")
             .iter_batches(batch_size=1024, batch_format="pandas")),
        ignore_index=True)
    agg = []
    for d, g in parts_df.groupby("decile"):
        agg.append({"decile": int(d),
                    "n_cust": int(g["n_cust"].sum()),
                    "sx": sum(int(s) for s in g["sx"])})
    agg.sort(key=lambda r: r["decile"])
    total = sum(r["sx"] for r in agg)
    cum, rows = 0, []
    for r in agg:
        cum += r["sx"]
        rows.append({
            "decile": np.int64(r["decile"]),
            "n_cust": np.int64(r["n_cust"]),
            "rev": round_half_away(
                np.array([r["sx"] / 10000.0]), 2)[0],
            "cum_share6": np.int64(cum * 10**6 // total)})
    return pd.DataFrame(rows)


def q_supplier_hhi(sf_dir: str):
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation — "is this nation's supply base one megavendor or a
    real market?" (the supply-side mirror of decile_lift's demand
    curve). Per-supplier exact revenue via a suppkey-bucket groupby;
    nationkey attaches from the broadcast supplier map (hash-join
    fallback past the cap); per-nation Σx and Σx² ride as STRINGS
    (x² overflows int64 once a supplier clears ~1e9 in revenue) and
    HHI closes as the exact integer (Σx²)·10⁶ // (Σx)² over ≤25
    rows."""
    from ..stages.temporal import _with_bucket

    parts = _shuffle_partitions(_row_count(sf_dir, "lineitem"))
    li = _pq(sf_dir, "lineitem",
             columns=["l_suppkey", "l_extendedprice", "l_discount"],
             num_blocks=parts)

    def per_supp(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "sk": g["l_suppkey"].to_numpy(np.int64),
            "x": _rev4(g["l_extendedprice"].to_numpy(),
                       g["l_discount"].to_numpy()),
        }).groupby("sk", as_index=False)["x"].sum()

    srev = (
        _with_bucket(li, "l_suppkey", 32)
        .groupby("__bucket")
        .map_groups(per_supp, batch_format="pandas")
    )
    supp = _pq(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    attached = _broadcast_fact_attach(
        srev, supp, "sk", "s_suppkey", ["s_nationkey"])
    if attached is None:  # distributed hash join past the cap
        attached = srev.join(
            supp, join_type="inner", num_partitions=parts,
            on=("sk",), right_on=("s_suppkey",))

    def nation_stats(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(np.int64).astype(object)
        return pd.DataFrame({
            "nk": [np.int64(g["s_nationkey"].iloc[0])],
            "n_suppliers": [np.int64(len(x))],
            "sx": [str(int(x.sum()))],
            "sxx": [str(int((x * x).sum()))]})

    st = pd.concat(
        list(attached.groupby("s_nationkey")
             .map_groups(nation_stats, batch_format="pandas")
             .iter_batches(batch_size=1024, batch_format="pandas")),
        ignore_index=True)
    nat = _gather_capped(_pq(sf_dir, "nation",
                             columns=["n_nationkey", "n_name"]))
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rows = []
    for r in st.itertuples():
        sx, sxx = int(r.sx), int(r.sxx)
        rows.append({
            "n_name": name_of[int(r.nk)],
            "n_suppliers": np.int64(r.n_suppliers),
            "hhi6": np.int64(sxx * 10**6 // (sx * sx))})
    return pd.DataFrame(rows).sort_values("n_name"
                                          ).reset_index(drop=True)


def q_last_touch_attribution(sf_dir: str):
    """Last-touch attribution: each purchase credits its value to the
    latest click by the same user at-or-before it and within 7 days —
    the marketing-credit join behind click_to_purchase's lag curve.
    Distributed as ONE user-hash bucket shuffle; inside each bucket a
    vectorized pd.merge_asof (by=user, tolerance=7d, backward) matches
    every purchase, and what leaves the bucket is the CALENDAR-bounded
    (day, n_purch, n_attr, attr_v3) partial — never the matches
    themselves. Daily totals close as exact integer sums."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    WINDOW = 7 * DAY
    ev = _pq(sf_dir, "events",
             columns=["event_type", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    def bucket_attr(g: pd.DataFrame) -> pd.DataFrame:
        tu = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64), "tu": tu,
            "et": g["event_type"].to_numpy(),
            "v3": np.rint(g["value"].to_numpy(np.float64) * 1000
                          ).astype(np.int64)})
        p = df[df["et"] == "purchase"].sort_values("tu")
        c = df[df["et"] == "click"].sort_values("tu")
        m = pd.merge_asof(
            p, c[["user_id", "tu"]].assign(ctu=c["tu"]),
            on="tu", by="user_id", direction="backward",
            tolerance=WINDOW)
        day = m["tu"].to_numpy(np.int64) // DAY
        attr = m["ctu"].notna().to_numpy()
        out = pd.DataFrame({
            "day": day, "n_purch": np.int64(1),
            "n_attr": attr.astype(np.int64),
            "attr_v3": np.where(attr, m["v3"].to_numpy(np.int64), 0)})
        return out.groupby("day", as_index=False).sum()

    parts = (
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(bucket_attr, batch_format="pandas")
    )
    out = _combine_partials(parts, ["day"],
                            ["n_purch", "n_attr", "attr_v3"])
    if out is None or len(out) == 0:
        return pd.DataFrame(columns=["day", "n_purch", "n_attr",
                                     "attr_v3"])
    out = out.sort_values("day").reset_index(drop=True)
    return pd.DataFrame({
        "day": out["day"].to_numpy(np.int64),
        "n_purch": out["n_purch"].to_numpy(np.int64),
        "n_attr": out["n_attr"].to_numpy(np.int64),
        "attr_v3": out["attr_v3"].to_numpy(np.int64)})


def q_knn_degree_spectrum(sf_dir: str):
    """Average neighbor in-degree per source in-degree class — the
    k-nn(k) spectrum whose single-number slope is degree_assortativity
    ("do popular pages link to popular pages, across the whole degree
    range?"). In-degrees come from one node-count-bounded combine and
    broadcast into a second edge scan via ray.put (the pagerank-family
    budget); each edge emits into the bounded (k, cnt, Σindeg_dst)
    grid and every class closes as the exact integer floor
    Σindeg·1e6 // cnt."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    def dst_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "v": t.column("dst").to_numpy(zero_copy_only=False),
            "c": np.int64(1)})
        return df.groupby("v", as_index=False).sum()

    ind = _combine_partials(
        edges.map_batches(dst_partial, batch_format="pyarrow"),
        ["v"], ["c"],
    )
    indeg = np.zeros(n, dtype=np.int64)
    indeg[ind["v"].to_numpy(np.int64)] = ind["c"].to_numpy(np.int64)
    ref = ray.put(indeg)

    def edge_partial(t: pa.Table) -> pd.DataFrame:
        deg = ray.get(ref)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": deg[s], "cnt": np.int64(1),
                           "s_nbr": deg[d]})
        return df.groupby("k", as_index=False).sum()

    g = _combine_partials(
        edges.map_batches(edge_partial, batch_format="pyarrow"),
        ["k"], ["cnt", "s_nbr"],
    ).sort_values("k")
    return pd.DataFrame({
        "k": g["k"].to_numpy(np.int64),
        "n_edges": g["cnt"].to_numpy(np.int64),
        "knn6": np.array([int(s) * 10**6 // int(c) for s, c in
                          zip(g["s_nbr"], g["cnt"])], np.int64),
    }).reset_index(drop=True)


def q_brand_type_cramer(sf_dir: str):
    """Cramér's V association between part brand and type — "does
    product line follow brand?", the effect-size reading chi2_type_dow
    deliberately stops short of. Bounded (brand × container) count
    grid; χ² terms quantize to 1e-6 before the exact integer sum (the
    chi2 move), and V² closes as the pure integer division
    q // (n·(min(r,c)−1)) — reported squared ×1e6 so no sqrt ever
    enters the comparison."""
    pt = _pq(sf_dir, "part", columns=["p_brand", "p_type"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "b": t.column("p_brand").to_pandas().to_numpy(),
            "k": t.column("p_type").to_pandas().to_numpy(),
            "c": np.int64(1)})
        return df.groupby(["b", "k"], as_index=False).sum()

    grid = _combine_partials(
        pt.map_batches(partial, batch_format="pyarrow"),
        ["b", "k"], ["c"],
    )
    piv = grid.pivot_table(index="b", columns="k", values="c",
                           aggfunc="sum", fill_value=0)
    obs = piv.to_numpy(np.int64)
    n = int(obs.sum())
    row_t = obs.sum(axis=1).astype(np.float64)
    col_t = obs.sum(axis=0).astype(np.float64)
    exp = row_t[:, None] * col_t[None, :] / float(n)
    dif = obs.astype(np.float64) - exp
    q = int(round_half_away(dif * dif / exp * 1e6
                            ).astype(np.int64).sum())
    r, c_ = obs.shape
    v2_6 = q // (n * (min(r, c_) - 1))
    return pd.DataFrame({
        "n": [np.int64(n)], "r_levels": [np.int64(r)],
        "c_levels": [np.int64(c_)],
        "chi2": round_half_away(np.array([q / 1e6]), 6),
        "v2_6": [np.int64(v2_6)]})


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


def q_value_tail_probs(sf_dir: str):
    """Tail probabilities P(value > 1), P(> 10), P(> 100) per event
    type, ×1e6 — the heavy-tail screen that says whether value_moments'
    variance is trustworthy or one whale away from meaningless. One
    map-only partial of four bounded counters per type; floors close
    exact."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v3 = np.rint(t.column("value").to_numpy() * 1000
                     ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "n": np.int64(1),
            "g1": (v3 > 1000).astype(np.int64),
            "g10": (v3 > 10000).astype(np.int64),
            "g100": (v3 > 100000).astype(np.int64)})
        return df.groupby("event_type", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "g1", "g10", "g100"],
    ).sort_values("event_type")
    return pd.DataFrame({
        "event_type": g["event_type"].to_numpy(),
        "n": g["n"].to_numpy(np.int64),
        "p_gt1_6": np.array([int(a) * 10**6 // int(b)
                             for a, b in zip(g["g1"], g["n"])], np.int64),
        "p_gt10_6": np.array([int(a) * 10**6 // int(b)
                              for a, b in zip(g["g10"], g["n"])],
                             np.int64),
        "p_gt100_6": np.array([int(a) * 10**6 // int(b)
                               for a, b in zip(g["g100"], g["n"])],
                              np.int64),
    }).reset_index(drop=True)


def q_psi_drift(sf_dir: str):
    """Population Stability Index of each event type's value
    distribution between the first and second half of the calendar —
    the model-monitoring drift score (PSI > 0.2 = retrain) computed the
    ray-native way: values bin into FIXED power-of-two milliunit bands
    (⌊log2 v3⌋, ≤30 bins, data-independent), the partial is the bounded
    (type, half, bin) grid, and the driver sums per-bin terms
    (p−q)·ln(p/q) quantized to 1e-6 (bins missing on either side are
    skipped on BOTH sides — the standard finite-sample convention). The
    half boundary is the exact midpoint day of the observed range, from
    one cheap min/max partial."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def mm(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"k": [np.int64(0)],
                             "mn": [np.int64(d.min())],
                             "mx": [np.int64(d.max())]}) if len(d) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mn": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    b = pd.concat(
        list(ev.map_batches(mm, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    mid = (int(b["mn"].min()) + int(b["mx"].max()) + 1) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        v3 = np.rint(t.column("value").to_numpy() * 1000
                     ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "half": (d >= mid).astype(np.int64),
            "bin": np.floor(np.log2(v3.astype(np.float64))
                            ).astype(np.int64),
            "c": np.int64(1)})
        return df.groupby(["event_type", "half", "bin"],
                          as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "half", "bin"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        piv = g.pivot_table(index="bin", columns="half", values="c",
                            aggfunc="sum", fill_value=0)
        c1 = piv[0].to_numpy(np.int64) if 0 in piv else \
            np.zeros(len(piv), np.int64)
        c2 = piv[1].to_numpy(np.int64) if 1 in piv else \
            np.zeros(len(piv), np.int64)
        n1, n2 = int(c1.sum()), int(c2.sum())
        m = (c1 > 0) & (c2 > 0)
        p = c1[m].astype(np.float64) / float(n1)
        qq = c2[m].astype(np.float64) / float(n2)
        t6 = round_half_away(1e6 * (p - qq) * np.log(p / qq)
                             ).astype(np.int64)
        rows.append({"event_type": et, "n_first": np.int64(n1),
                     "n_second": np.int64(n2),
                     "psi6": np.int64(int(t6.sum()))})
    if not rows:
        return pd.DataFrame(columns=["event_type", "n_first",
                                     "n_second", "psi6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_returnflag_priority_lift(sf_dir: str):
    """Association lift between line return flag and order priority —
    observed/expected per cell, ×1e6 ("are urgent orders returned more
    often?"). The o_orderpriority attaches to the lineitem scan from
    the broadcast orders map (hash-join fallback past the cap — the
    star-join posture); the partial is the bounded (flag × priority)
    grid and every cell closes as the EXACT integer
    lift6 = o·N·10⁶ // (rowT·colT) — no float, no χ² detour."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderpriority"],
                 num_blocks=parts)

    # priorities are a bounded enum — integer-code them so the
    # broadcast attach stays int64 end to end
    pr = _gather_capped(
        orders.map_batches(
            lambda t: pd.DataFrame(
                {"p": t.column("o_orderpriority").to_pandas()}
            ).drop_duplicates(),
            batch_format="pyarrow"))
    plist = sorted(pr["p"].unique()) if pr is not None else []
    code_of = {p: i for i, p in enumerate(plist)}

    def code(t: pa.Table) -> pa.Table:
        p = t.column("o_orderpriority").to_pandas().map(code_of)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "pcode": pa.array(p.to_numpy(np.int64), pa.int64())})

    coded = orders.map_batches(code, batch_format="pyarrow")
    attached = _broadcast_fact_attach(
        li, coded, "l_orderkey", "o_orderkey", ["pcode"])
    if attached is None:  # distributed hash join past the cap
        attached = li.join(coded, join_type="inner",
                           num_partitions=parts,
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "flag": t.column("l_returnflag").to_pandas().to_numpy(),
            "pcode": t.column("pcode").to_numpy(zero_copy_only=False),
            "c": np.int64(1)})
        return df.groupby(["flag", "pcode"], as_index=False).sum()

    grid = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["flag", "pcode"], ["c"],
    )
    piv = grid.pivot_table(index="flag", columns="pcode", values="c",
                           aggfunc="sum", fill_value=0)
    obs = piv.to_numpy(np.int64)
    n = int(obs.sum())
    rt = obs.sum(axis=1)
    ct = obs.sum(axis=0)
    rows = []
    for i, f in enumerate(piv.index):
        for j, pc_ in enumerate(piv.columns):
            rows.append({
                "l_returnflag": f,
                "o_orderpriority": plist[int(pc_)],
                "n": np.int64(obs[i, j]),
                "lift6": np.int64(
                    int(obs[i, j]) * n * 10**6
                    // (int(rt[i]) * int(ct[j])))})
    return pd.DataFrame(rows).sort_values(
        ["l_returnflag", "o_orderpriority"]).reset_index(drop=True)


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


def q_peak_hour_share(sf_dir: str):
    """Peak activity hour per event type and the share of traffic it
    carries (×1e6) — the load-concentration number a capacity planner
    pairs with dow_seasonality (ties break to the earlier hour on both
    sides). Bounded (type × 24) partial; exact integer close."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        g = g.sort_values(["c", "h"], ascending=[False, True])
        n = int(g["c"].sum())
        rows.append({
            "event_type": et,
            "peak_hour": np.int64(g["h"].iloc[0]),
            "n": np.int64(n),
            "peak_share6": np.int64(int(g["c"].iloc[0]) * 10**6 // n)})
    if not rows:
        return pd.DataFrame(columns=["event_type", "peak_hour", "n",
                                     "peak_share6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_new_vs_returning(sf_dir: str):
    """Monthly revenue split between NEW customers (first-ever order
    that month) and returning ones — the growth-quality decomposition
    behind ltv_cohorts ("is revenue growth acquisition or retention?").
    Per-customer first month comes from one pre-reduced groupby-min
    (batch partials compact the stream before the shuffle); it attaches
    to the order scan via the broadcast map (hash-join fallback past
    the cap) and the CALENDAR-bounded (month, new?) partial closes with
    exact cents and integer-floor shares."""
    parts = _shuffle_partitions(_row_count(sf_dir, "orders"))
    orders = _pq(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_totalprice"],
                 num_blocks=parts)

    def to_cm(t: pa.Table) -> pa.Table:
        m = (t.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[M]").astype(np.int64))
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        return pa.table({
            "ck": t.column("o_custkey"),
            "m": pa.array(m, pa.int64()),
            "cents": pa.array(cents, pa.int64())})

    fact = orders.map_batches(to_cm, batch_format="pyarrow")
    def first_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"ck": t.column("ck").to_numpy(zero_copy_only=False),
             "m": t.column("m").to_numpy(zero_copy_only=False)}
        ).groupby("ck", as_index=False).min()
        # Arrow block out (pandas blocks cost the downstream
        # sort-groupby 13x — see never_ordered_parts)
        return pa.table({
            "ck": pa.array(df["ck"].to_numpy(np.int64), pa.int64()),
            "m": pa.array(df["m"].to_numpy(np.int64), pa.int64())})

    firsts = (
        fact.map_batches(first_partial, batch_format="pyarrow")
        .groupby("ck").min("m")
        .map_batches(
            lambda t: pa.table({
                "ck": t.column("ck"),
                "fm": pc.cast(t.column("min(m)"), pa.int64())}),
            batch_format="pyarrow")
    )
    attached = _broadcast_fact_attach(fact, firsts, "ck", "ck", ["fm"])
    if attached is None:  # distributed hash join past the cap
        attached = fact.join(
            firsts.map_batches(
                lambda t: t.rename_columns(["ck2", "fm"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("ck",), right_on=("ck2",))

    def partial(t: pa.Table) -> pd.DataFrame:
        m = t.column("m").to_numpy(zero_copy_only=False)
        new = (m == t.column("fm").to_numpy(zero_copy_only=False)
               ).astype(np.int64)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "month": m, "n_new": new, "n_ret": 1 - new,
            "new_cents": np.where(new == 1, cents, 0),
            "ret_cents": np.where(new == 0, cents, 0),
        }).groupby("month", as_index=False).sum()

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["month"], ["n_new", "n_ret", "new_cents", "ret_cents"],
    ).sort_values("month")
    return pd.DataFrame({
        "month": g["month"].to_numpy(np.int64),
        "n_new": g["n_new"].to_numpy(np.int64),
        "n_ret": g["n_ret"].to_numpy(np.int64),
        "new_cents": g["new_cents"].to_numpy(np.int64),
        "ret_cents": g["ret_cents"].to_numpy(np.int64),
        "new_share6": np.array(
            [int(a) * 10**6 // (int(a) + int(b)) for a, b in
             zip(g["new_cents"], g["ret_cents"])], np.int64),
    }).reset_index(drop=True)


def q_crawl_fairness(sf_dir: str):
    """Jain's fairness index over per-host fetched-page counts from the
    engine crawl's checkpoint — the single number behind
    slot_apportionment ("did the politeness scheduler starve a host?").
    Jain = (Σx)²/(n·Σx²) closes as an exact ×1e6 integer floor over the
    host-bounded count combine; 1e6 = perfectly even, 1e6/n = one host
    took everything."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"), columns=["host"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"host": t.column("host").to_pandas(),
                           "x": np.int64(1)})
        return df.groupby("host", as_index=False).sum()

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["host"], ["x"],
    )
    xs = [int(x) for x in g["x"]]
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    return pd.DataFrame({
        "n_hosts": [np.int64(n)], "n_pages": [np.int64(sx)],
        "jain6": [np.int64(sx * sx * 10**6 // (n * sxx))]})


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


def q_scc_stats(sf_dir: str):
    """Strongly connected components of the directed link graph — the
    DIRECTED counterpart of connected_components (a page cluster that
    links back and forth is a crawl trap candidate; one-way tendrils
    are not). Driver Tarjan under the edge cap; past it the FW-BW-TRIM
    plan in _scc_labels keeps per-node state node-bounded and runs
    every propagation round as one distributed edge scan. Output: the
    SCC size histogram (label = min doc_id, same as the oracle's
    recursive mutual-reachability closure)."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    edf = _gather_capped(edges)
    scc = _scc_labels(n, edf, edges)
    sizes = np.bincount(scc)
    sizes = sizes[sizes > 0]
    uq, cnt = np.unique(sizes, return_counts=True)
    return pd.DataFrame({"scc_size": uq.astype(np.int64),
                         "n_sccs": cnt.astype(np.int64)})


def q_type_hour_ruzicka(sf_dir: str):
    """Weighted (Ruzicka) Jaccard between event types' 24-hour count
    profiles — Σmin/Σmax over aligned hours, the magnitude-aware
    companion to type_hour_cosine (cosine forgives scale; Ruzicka
    punishes a type that is 10× busier at the same hours). Bounded
    (type × 24) partial; every pair closes as exact integer
    Σmin·1e6 // Σmax."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    prof = {}
    for et, g in grid.groupby("event_type"):
        v = np.zeros(24, dtype=np.int64)
        v[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        prof[et] = v
    ets = sorted(prof)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            smin = int(np.minimum(prof[a], prof[b]).sum())
            smax = int(np.maximum(prof[a], prof[b]).sum())
            rows.append({
                "type_a": a, "type_b": b, "n_min": np.int64(smin),
                "ruz6": np.int64(smin * 10**6 // smax if smax else 0)})
    if not rows:
        return pd.DataFrame(columns=["type_a", "type_b", "n_min",
                                     "ruz6"])
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]
                                          ).reset_index(drop=True)


def q_orphan_pages(sf_dir: str):
    """Orphan pages (in-degree 0 — discoverable only from the seed
    list) per host: the dark-matter inventory a crawl-coverage audit
    starts from. In-degrees combine node-bounded, broadcast once via
    ray.put into the document scan; per-host counters close exact."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    def dst_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "v": t.column("dst").to_numpy(zero_copy_only=False),
            "c": np.int64(1)})
        return df.groupby("v", as_index=False).sum()

    ind = _combine_partials(
        edges.map_batches(dst_partial, batch_format="pyarrow"),
        ["v"], ["c"],
    )
    indeg = np.zeros(n, dtype=np.int64)
    indeg[ind["v"].to_numpy(np.int64)] = ind["c"].to_numpy(np.int64)
    ref = ray.put(indeg)

    def host_partial(t: pa.Table) -> pd.DataFrame:
        deg = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False
                                          ).astype(np.int64)
        df = pd.DataFrame({
            "h": ids % 3, "n_pages": np.int64(1),
            "n_orphans": (deg[ids] == 0).astype(np.int64)})
        return df.groupby("h", as_index=False).sum()

    g = _combine_partials(
        docs.map_batches(host_partial, batch_format="pyarrow"),
        ["h"], ["n_pages", "n_orphans"],
    ).sort_values("h")
    return pd.DataFrame({
        "host": [f"www.synthd{int(h)}.mx" for h in g["h"]],
        "n_pages": g["n_pages"].to_numpy(np.int64),
        "n_orphans": g["n_orphans"].to_numpy(np.int64),
    }).reset_index(drop=True)


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


def q_gap_fill_ffill(sf_dir: str):
    """Calendar densification + forward fill of the daily revenue
    series: every day in [min, max] gets a row, missing days carry the
    last observed value and a was_missing flag — the gap-repair step
    every downstream forecaster assumes has already happened
    (missing_days finds the holes; this closes them). Daily cents are
    the shared calendar-bounded combine; the spine + fill is one driver
    cumsum-index trick over ≤ a few thousand rows at any corpus
    size."""
    o = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy() // DAY
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        return pd.DataFrame({"day": d, "cents": cents}
                            ).groupby("day", as_index=False).sum()

    g = _combine_partials(
        o.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["cents"],
    ).sort_values("day")
    days = g["day"].to_numpy(np.int64)
    cents = g["cents"].to_numpy(np.int64)
    spine = np.arange(days[0], days[-1] + 1, dtype=np.int64)
    idx = np.searchsorted(days, spine, side="right") - 1
    return pd.DataFrame({
        "day": spine,
        "rev_cents": cents[idx],
        "was_missing": (~np.isin(spine, days)).astype(np.int64)})


def q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the engine's stopword-profile language ID
    (stages/textstats.lang_id — the fasttext-shaped stub) and the
    corpus ground-truth lang label: chance-corrected agreement, the
    honest version of raw accuracy when one language dominates. The
    partial is the bounded (lang × guess) confusion grid; po, pe and
    kappa close as exact unbounded-int arithmetic with kappa6 the
    ×1e6 trunc-div (N·Σdiag − Σrᵢcᵢ) / (N² − Σrᵢcᵢ) the oracle
    replicates in HUGEINT."""
    from ..stages.textstats import lang_id

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


def q_backlog_aging(sf_dir: str):
    """Order-backlog aging buckets at the calendar-midpoint snapshot:
    orders placed but not fully shipped at the snapshot, banded by age
    (≤30 / 31–90 / >90 days) with headcount and exact open cents — the
    point-in-time cut of open_orders_daily's timeline. Per-order close
    days reduce per batch; under the cap one driver join closes the
    buckets, past it the same groupby-max + hash join re-executes
    distributed (pinned equal by the shared fallback test pattern)."""
    DAY = 86_400_000_000
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_totalprice"],
                 num_blocks=parts)

    def od_part(t: pa.Table) -> pd.DataFrame:
        od = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"k": [np.int64(0)],
                             "mn": [np.int64(od.min())],
                             "mx": [np.int64(od.max())]}) if len(od) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mn": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    b = pd.concat(
        list(orders.map_batches(od_part, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    snap = (int(b["mn"].min()) + int(b["mx"].max())) // 2

    def close_partial(t: pa.Table) -> pd.DataFrame:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        rd_ = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"ok": ok, "rd": rd_}
                            ).groupby("ok", as_index=False).max()

    closes = li.map_batches(close_partial, batch_format="pyarrow")

    def bucket_frame(od: np.ndarray, cents: np.ndarray) -> pd.DataFrame:
        age = snap - od
        lab = np.where(age <= 30, "000-030",
                       np.where(age <= 90, "031-090", "090+"))
        return pd.DataFrame({"bucket": lab, "n_orders": np.int64(1),
                             "cents": cents}
                            ).groupby("bucket", as_index=False).sum()

    cdf = _gather_capped(closes)
    odf = _gather_capped(orders) if cdf is not None else None
    if cdf is not None and odf is not None:  # driver close
        per_order = cdf.groupby("ok", as_index=False)["rd"].max()
        od = (odf["o_orderdate"].to_numpy("datetime64[us]")
              .astype(np.int64) // DAY)
        o = pd.DataFrame({
            "ok": odf["o_orderkey"].to_numpy(np.int64), "od": od,
            "cents": np.rint(odf["o_totalprice"].to_numpy(np.float64)
                             * 100).astype(np.int64)})
        j = o.merge(per_order, on="ok", how="inner")
        j = j[(j["od"] <= snap) & (j["rd"] > snap)]
        out = bucket_frame(j["od"].to_numpy(np.int64),
                           j["cents"].to_numpy(np.int64))
    else:  # distributed: groupby-max + hash join, bucket partials
        per_order = closes.groupby("ok").max("rd")

        def od_of(t: pa.Table) -> pa.Table:
            return pa.table({
                "ok2": t.column("o_orderkey"),
                "od": pa.array(
                    pc.cast(t.column("o_orderdate"), pa.int64()
                            ).to_numpy() // DAY, pa.int64()),
                "cents": pa.array(
                    np.rint(t.column("o_totalprice").to_numpy() * 100
                            ).astype(np.int64), pa.int64())})

        j = per_order.join(
            orders.map_batches(od_of, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("ok",), right_on=("ok2",))

        def to_buckets(t: pa.Table) -> pd.DataFrame:
            rd_ = pc.cast(t.column("max(rd)"), pa.int64()).to_numpy(
                zero_copy_only=False)
            od = t.column("od").to_numpy(zero_copy_only=False)
            cents = t.column("cents").to_numpy(zero_copy_only=False)
            m = (od <= snap) & (rd_ > snap)
            return bucket_frame(od[m], cents[m])

        out = _combine_partials(
            j.map_batches(to_buckets, batch_format="pyarrow"),
            ["bucket"], ["n_orders", "cents"],
        )
    return out.sort_values("bucket").reset_index(drop=True).astype(
        {"n_orders": np.int64, "cents": np.int64})


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


def q_bowtie_decomposition(sf_dir: str):
    """Bow-tie decomposition of the directed web (Broder et al.'s
    CORE / IN / OUT / OTHER): the giant SCC, the pages that flow into
    it, the pages it flows out to, and the disconnected rest — THE
    canonical large-graph census a crawl-coverage planner starts from
    (IN pages need seeds; OUT pages are reachable anyway). Composes
    the repo's SCC labels (driver Tarjan / distributed FW-BW-TRIM)
    with two multi-source BFS sweeps (forward + reversed edges), all
    on the node-bounded budget; the oracle classifies against the full
    recursive reachability closure."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    edf = _gather_capped(edges)
    scc = _scc_labels(n, edf, edges)
    sizes = np.bincount(scc, minlength=n)
    core_label = int(np.argmax(sizes))  # ties → smaller label
    core = scc == core_label
    core_ids = np.flatnonzero(core)
    fwd = _bfs_reach_multi(core_ids, n, edf, edges, reverse=False)
    bwd = _bfs_reach_multi(core_ids, n, edf, edges, reverse=True)
    region = np.where(core, "CORE",
                      np.where(bwd, "IN",
                               np.where(fwd, "OUT", "OTHER")))
    counts = pd.Series(region).value_counts()
    return pd.DataFrame({
        "region": ["CORE", "IN", "OUT", "OTHER"],
        "n": [np.int64(counts.get(k, 0))
              for k in ["CORE", "IN", "OUT", "OTHER"]],
    }).sort_values("region").reset_index(drop=True)


def q_trimmed_mean(sf_dir: str):
    """10%-trimmed mean of value per event type — the outlier-immune
    location estimate between winsorized_stats (clamps) and value_mad
    (median): drop the n//10 smallest and largest observations, mean
    the middle exactly. The bounded (type, milliunit) histogram gives
    the cut boundaries by cumulative count, boundary cells split
    partially (sums of equal values are permutation-invariant, so rank
    ties cost nothing); mean closes as an exact ×1e6 integer floor of
    milliunits."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "v": np.rint(t.column("value").to_numpy() * 1000
                         ).astype(np.int64),
            "c": np.int64(1)})
        return df.groupby(["event_type", "v"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        k = n // 10
        cum = np.cumsum(c)
        total = int((v.astype(object) * c.astype(object)).sum())
        # bottom k: full cells where cum <= k, plus a partial cell
        def cut_sum(vv, cc, cm, kk):
            full = cm <= kk
            s = int((vv[full].astype(object)
                     * cc[full].astype(object)).sum())
            taken = int(cm[full][-1]) if full.any() else 0
            if taken < kk:
                nxt = int(np.searchsorted(cm, kk, side="left"))
                s += (kk - taken) * int(vv[nxt])
            return s
        bot = cut_sum(v, c, cum, k)
        top = cut_sum(v[::-1], c[::-1], np.cumsum(c[::-1]), k)
        mid = total - bot - top
        n_used = n - 2 * k
        rows.append({"event_type": et, "n_used": np.int64(n_used),
                     "mean_milli6": np.int64(mid * 10**6 // n_used)})
    if not rows:
        return pd.DataFrame(columns=["event_type", "n_used",
                                     "mean_milli6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)


def q_fill_time_percentiles(sf_dir: str):
    """Order fill time (order date → last line shipped) p50/p90 per
    order priority, PERCENTILE_DISC-exact: ranks are pure integer
    arithmetic (⌈p·n⌉ over the cumulative histogram), so no
    interpolation float ever appears. Per-order close days reduce per
    batch (the open_orders_daily first stage); the (priority, lag)
    grid is CALENDAR-bounded, so the cumulative walk closes on the
    driver at any corpus size. Priority attaches via the broadcast
    orders map with the hash-join fallback."""
    DAY = 86_400_000_000
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "orders")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"],
             num_blocks=parts)
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate",
                          "o_orderpriority"],
                 num_blocks=parts)

    def close_partial(t: pa.Table) -> pd.DataFrame:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        rd_ = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"ok": ok, "rd": rd_}
                            ).groupby("ok", as_index=False).max()

    closes = li.map_batches(close_partial, batch_format="pyarrow")

    cdf = _gather_capped(closes)
    odf = _gather_capped(orders) if cdf is not None else None
    if cdf is not None and odf is not None:  # driver close
        per_order = cdf.groupby("ok", as_index=False)["rd"].max()
        o = pd.DataFrame({
            "ok": odf["o_orderkey"].to_numpy(np.int64),
            "od": (odf["o_orderdate"].to_numpy("datetime64[us]")
                   .astype(np.int64) // DAY),
            "prio": odf["o_orderpriority"].to_numpy()})
        j = o.merge(per_order, on="ok", how="inner")
        grid = pd.DataFrame({
            "prio": j["prio"],
            "lag": j["rd"].to_numpy(np.int64)
            - j["od"].to_numpy(np.int64),
            "c": np.int64(1),
        }).groupby(["prio", "lag"], as_index=False).sum()
    else:  # distributed: groupby-max + hash join, grid partials
        per_order = closes.groupby("ok").max("rd")

        def od_of(t: pa.Table) -> pa.Table:
            return pa.table({
                "ok2": t.column("o_orderkey"),
                "od": pa.array(
                    pc.cast(t.column("o_orderdate"), pa.int64()
                            ).to_numpy() // DAY, pa.int64()),
                "prio": t.column("o_orderpriority")})

        jds = per_order.join(
            orders.map_batches(od_of, batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("ok",), right_on=("ok2",))

        def to_grid(t: pa.Table) -> pd.DataFrame:
            rd_ = pc.cast(t.column("max(rd)"), pa.int64()).to_numpy(
                zero_copy_only=False)
            od = t.column("od").to_numpy(zero_copy_only=False)
            return pd.DataFrame({
                "prio": t.column("prio").to_pandas().to_numpy(),
                "lag": rd_ - od, "c": np.int64(1),
            }).groupby(["prio", "lag"], as_index=False).sum()

        grid = _combine_partials(
            jds.map_batches(to_grid, batch_format="pyarrow"),
            ["prio", "lag"], ["c"],
        )
    rows = []
    for prio, g in grid.groupby("prio"):
        g = g.sort_values("lag")
        lag = g["lag"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        r50, r90 = (n + 1) // 2, (9 * n + 9) // 10
        p50 = int(lag[np.searchsorted(cum, r50, side="left")])
        p90 = int(lag[np.searchsorted(cum, r90, side="left")])
        rows.append({"o_orderpriority": prio, "n_orders": np.int64(n),
                     "p50_days": np.int64(p50),
                     "p90_days": np.int64(p90)})
    return pd.DataFrame(rows).sort_values("o_orderpriority"
                                          ).reset_index(drop=True)


def q_wave_branching(sf_dir: str):
    """Frontier branching factor per BFS wave of the engine crawl:
    pages first fetched at each depth and the wave-over-wave growth
    ratio ×1e6 — the number that says when the crawl flips from
    expansion to saturation (reads the same checkpoint as
    host_depth_profile; depth-bounded combine; integer floors)."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"), columns=["depth"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "depth": t.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n": np.int64(1)})
        return df.groupby("depth", as_index=False).sum()

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["depth"], ["n"],
    ).sort_values("depth").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    d = g["depth"].to_numpy(np.int64)
    growth = np.zeros(len(n), np.int64)
    for i in range(1, len(n)):
        growth[i] = (int(n[i]) * 10**6 // int(n[i - 1])
                     if d[i] == d[i - 1] + 1 else 0)
    return pd.DataFrame({
        "depth": d, "n_pages": n,
        "growth6": growth}).reset_index(drop=True)


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank from the seed page (doc 0): all teleport
    mass returns to the seed, so scores measure proximity-weighted
    authority AROUND the seed rather than global prestige — the
    recrawl-priority signal for a site-focused crawl. Three rounds of
    the SAME integer-floor power iteration as pagerank_damped
    (per-edge ⌊85·w/300⌋, out-degree 3 by construction): node-bounded
    weight arrays broadcast via ray.put, one distributed edge scan per
    round; only nodes holding mass emit. The oracle unrolls the
    identical three CTE rounds with the seed-only teleport."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    w = np.zeros(n, dtype=np.int64)
    w[0] = 1_000_000
    for _round in range(3):
        ref = ray.put(w)

        def contrib(t: pa.Table) -> pd.DataFrame:
            ww = ray.get(ref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            m = ww[s] > 0
            df = pd.DataFrame({"v": d[m], "c": (85 * ww[s[m]]) // 300})
            return df.groupby("v", as_index=False).sum()

        inc = _combine_partials(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["v"], ["c"],
        )
        w = np.zeros(n, dtype=np.int64)
        w[0] = 150_000
        if len(inc):
            np.add.at(w, inc["v"].to_numpy(np.int64),
                      inc["c"].to_numpy(np.int64))
    nz = np.flatnonzero(w > 0)
    return pd.DataFrame({"doc_id": nz.astype(np.int64),
                         "ppr": w[nz].astype(np.int64)})


def q_never_ordered_parts(sf_dir: str):
    """Cold-inventory census: parts that appear in NO lineitem, per
    brand with the never-ordered share ×1e6 — the anti-join every
    assortment review starts from. Distinct ordered partkeys pre-reduce
    per batch before one groupby; under the cap they broadcast as a
    sorted array into the part scan (map-side anti-join, zero
    shuffles), past it Ray's left_outer join + null filter runs the
    same semantics."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "lineitem"), _row_count(sf_dir, "part")
    )
    li = _pq(sf_dir, "lineitem", columns=["l_partkey"],
             num_blocks=parts)
    pt = _pq(sf_dir, "part", columns=["p_partkey", "p_brand"],
             num_blocks=parts)
    # Arrow blocks into the shuffle: Ray's sort-groupby over pandas
    # blocks measured 13x slower (29 s vs 2.2 s at sf0.1) than over
    # Arrow blocks for this exact stream
    ordered = (
        li.map_batches(
            lambda t: pa.table(
                {"pk": pc.unique(t.column("l_partkey").combine_chunks())}),
            batch_format="pyarrow")
        .groupby("pk").count()
    )
    odf = _gather_capped(ordered)
    if odf is not None:  # map-side anti-join against the sorted set
        keys = np.sort(odf["pk"].to_numpy(np.int64))
        kref = ray.put(keys)

        def partial(t: pa.Table) -> pd.DataFrame:
            ks = ray.get(kref)
            pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
            hit, _ = _sorted_lookup(ks, pk)
            return pd.DataFrame({
                "p_brand": t.column("p_brand").to_pandas().to_numpy(),
                "n_parts": np.int64(1),
                "n_never": (~hit).astype(np.int64),
            }).groupby("p_brand", as_index=False).sum()

        g = _combine_partials(
            pt.map_batches(partial, batch_format="pyarrow"),
            ["p_brand"], ["n_parts", "n_never"],
        )
    else:  # distributed left_outer + null filter
        j = pt.join(
            ordered.map_batches(
                lambda t: pa.table({
                    "pk": t.column("pk"),
                    "hit": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=parts,
            on=("p_partkey",), right_on=("pk",))

        def partial2(t: pa.Table) -> pd.DataFrame:
            hit = t.column("hit").to_pandas().fillna(0).to_numpy(
                np.int64)
            return pd.DataFrame({
                "p_brand": t.column("p_brand").to_pandas().to_numpy(),
                "n_parts": np.int64(1),
                "n_never": (hit == 0).astype(np.int64),
            }).groupby("p_brand", as_index=False).sum()

        g = _combine_partials(
            j.map_batches(partial2, batch_format="pyarrow"),
            ["p_brand"], ["n_parts", "n_never"],
        )
    g = g.sort_values("p_brand").reset_index(drop=True)
    return pd.DataFrame({
        "p_brand": g["p_brand"],
        "n_parts": g["n_parts"].to_numpy(np.int64),
        "n_never": g["n_never"].to_numpy(np.int64),
        "never_share6": np.array(
            [int(a) * 10**6 // int(b) for a, b in
             zip(g["n_never"], g["n_parts"])], np.int64)})


def q_linear_attribution(sf_dir: str):
    """LINEAR multi-touch attribution: each purchase splits its value
    EQUALLY across all of the user's clicks in the prior 7 days, and
    credit lands on the CLICK day — the fairness-motivated counterpart
    of last_touch_attribution (last-touch over-rewards the final ad).
    Per-click credit is the deterministic floor v3·10⁶ // k (micro-
    milliunits), so the split is exact integer arithmetic on both
    sides. One user-hash bucket shuffle; inside each bucket each
    purchase finds its click window with two searchsorteds and emits
    numpy slices (the only Python iteration is over PURCHASES — the
    conversion events, orders of magnitude sparser than the click
    stream the kernel never loops over); what leaves the bucket is the
    calendar-bounded (day, n_credits, credit) partial."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    WINDOW = 7 * DAY
    ev = _pq(sf_dir, "events",
             columns=["event_type", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    def bucket_attr(g: pd.DataFrame) -> pd.DataFrame:
        tu = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        v3 = np.rint(g["value"].to_numpy(np.float64) * 1000
                     ).astype(np.int64)
        # order clicks by (user, ts) so each user's clicks are a slice
        cm = et == "click"
        cu, ct = uid[cm], tu[cm]
        co = np.lexsort((ct, cu))
        cu, ct = cu[co], ct[co]
        # per purchase: [lo, hi) = user's clicks in (t-7d, t]
        pm = et == "purchase"
        pu, pt, pv = uid[pm], tu[pm], v3[pm]
        uniq, uidx = np.unique(cu, return_index=True)
        uend = np.append(uidx[1:], len(cu))
        pos = np.searchsorted(uniq, pu)
        has = (pos < len(uniq))
        pos = np.clip(pos, 0, max(len(uniq) - 1, 0))
        has &= (uniq[pos] == pu) if len(uniq) else np.zeros(len(pu), bool)
        rows = {"day": [], "n_credits": [], "credit": []}
        for i in np.flatnonzero(has):
            a, b_ = uidx[pos[i]], uend[pos[i]]
            lo = np.searchsorted(ct[a:b_], pt[i] - WINDOW, side="left")
            hi = np.searchsorted(ct[a:b_], pt[i], side="right")
            k = hi - lo
            if k <= 0:
                continue
            share = int(pv[i]) * 10**6 // int(k)
            days = ct[a + lo:a + hi] // DAY
            rows["day"].append(days)
            rows["n_credits"].append(np.ones(k, np.int64))
            rows["credit"].append(np.full(k, share, np.int64))
        if not rows["day"]:
            return pd.DataFrame({
                "day": pd.Series([], dtype=np.int64),
                "n_credits": pd.Series([], dtype=np.int64),
                "credit": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({
            "day": np.concatenate(rows["day"]),
            "n_credits": np.concatenate(rows["n_credits"]),
            "credit": np.concatenate(rows["credit"])})
        return df.groupby("day", as_index=False).sum()

    parts = (
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(bucket_attr, batch_format="pandas")
    )
    out = _combine_partials(parts, ["day"], ["n_credits", "credit"])
    if out is None or len(out) == 0:
        return pd.DataFrame(columns=["day", "n_credits", "credit"])
    out = out.sort_values("day").reset_index(drop=True)
    return pd.DataFrame({
        "day": out["day"].to_numpy(np.int64),
        "n_credits": out["n_credits"].to_numpy(np.int64),
        "credit": out["credit"].to_numpy(np.int64)})


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
    from ..stages.temporal import _with_bucket

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


def q_bucket_label_purity(sf_dir: str):
    """Label purity of the sign-LSH buckets from rp_buckets: per-bucket
    majority-label mass over total — the one-number check of whether
    the ANN sharding respects class structure (purity ≈ top-1 accuracy
    of a bucket-vote classifier). Same deterministic md5 ±1 planes and
    1e-6 fixed-point projection as rp_buckets (exact integer bucket
    ids on both sides); the (bucket, label) combine is bounded by
    2⁸ × labels and purity closes as an exact ×1e6 floor."""
    from ..functions.urls import md5_hash64_many
    from ..stages.similarity import _emb_matrix

    emb = _pq(sf_dir, "embeddings",
              columns=["vec_id", "embedding", "label"],
              num_blocks=_n_cpus())
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    h = md5_hash64_many([f"rp{d}" for d in range(dim)])
    signs = (
        ((h[:, None] >> np.arange(8, dtype=np.uint64)[None, :])
         & np.uint64(1)).astype(np.int64) * 2 - 1
    )
    sref = ray.put(signs)

    def partial(t: pa.Table) -> pd.DataFrame:
        s = ray.get(sref)
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({
                "bucket": pd.Series([], dtype=np.int64),
                "label": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64)})
        v6 = round_half_away(m * 1_000_000).astype(np.int64)
        proj = v6 @ s  # (n, 8) exact integer projections
        bucket = ((proj > 0).astype(np.int64)
                  * (1 << np.arange(8, dtype=np.int64))[None, :]
                  ).sum(axis=1)
        df = pd.DataFrame({
            "bucket": bucket,
            "label": t.column("label").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "c": np.int64(1)})
        return df.groupby(["bucket", "label"], as_index=False).sum()

    grid = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["bucket", "label"], ["c"],
    )
    maj = grid.groupby("bucket")["c"].max()
    n = int(grid["c"].sum())
    return pd.DataFrame({
        "n_buckets": [np.int64(len(maj))],
        "n_vecs": [np.int64(n)],
        "purity6": [np.int64(int(maj.sum()) * 10**6 // n)]})


def q_dow_adjusted_anomalies(sf_dir: str):
    """Top-10 anomaly days after removing the weekday effect: daily
    event counts are rescaled by the dow_seasonality index
    (adj = n·1e6 // idx6(dow)), so a busy Saturday no longer reads as
    an anomaly just for being Saturday. Calendar-bounded (day) and
    (dow) combines; adjusted scores are exact integer floors; top-10
    by adj desc, day asc — fully deterministic."""
    ev = _pq(sf_dir, "events", columns=["ts"], num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"day": d, "n": np.int64(1)}
                            ).groupby("day", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["n"],
    ).sort_values("day")
    day = g["day"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    N = int(n.sum())
    dow = (day + 4) % 7
    dsum = np.zeros(7, np.int64)
    np.add.at(dsum, dow, n)
    idx6 = np.array([int(s) * 7 * 10**6 // N for s in dsum], np.int64)
    adj = np.array([int(c) * 10**6 // int(idx6[w]) if idx6[w] else 0
                    for c, w in zip(n, dow)], np.int64)
    out = pd.DataFrame({"day": day, "n": n, "adj": adj})
    out = out.sort_values(["adj", "day"],
                          ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def q_customer_features(sf_dir: str):
    """Feature-store materialization: one wide row per customer with
    the churn-model features (recency days vs corpus horizon, order
    frequency, exact monetary cents, mean inter-order gap ×1e6,
    distinct active months) — the per-entity feature build every
    training pipeline runs before a model sees data. ONE custkey-bucket
    shuffle; the kernel closes every feature from the customer's own
    sorted slice (vectorized), and the output is the materialized
    feature frame itself (row count scales with customers — by design
    for a feature table). The corpus horizon comes from one scalar
    min/max partial."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    parts = _shuffle_partitions(_row_count(sf_dir, "orders"))
    orders = _pq(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_totalprice"],
                 num_blocks=parts)

    def mx(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"k": [np.int64(0)],
                             "mx": [np.int64(d.max())]}) if len(d) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    horizon = int(pd.concat(
        list(orders.map_batches(mx, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)["mx"].max())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy(np.int64)
        d = (g["o_orderdate"].to_numpy("datetime64[us]")
             .astype(np.int64) // DAY)
        mo = (g["o_orderdate"].to_numpy("datetime64[M]")
              .astype(np.int64))
        cents = np.rint(g["o_totalprice"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        o = np.lexsort((d, ck))
        ck, d, mo, cents = ck[o], d[o], mo[o], cents[o]
        first = np.concatenate([[True], ck[1:] != ck[:-1]])
        gid = np.cumsum(first) - 1
        n_g = int(gid[-1]) + 1 if len(gid) else 0
        freq = np.bincount(gid, minlength=n_g).astype(np.int64)
        mon = np.zeros(n_g, np.int64)
        np.add.at(mon, gid, cents)
        dmin = np.full(n_g, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(dmin, gid, d)
        dmax = np.zeros(n_g, np.int64)
        np.maximum.at(dmax, gid, d)
        # distinct months: new (customer, month) transitions in the
        # (ck, d)-sorted order (months are monotone within a customer)
        newmo = first | (np.concatenate([[np.int64(0)], mo[:-1]]) != mo)
        nmo = np.bincount(gid[newmo], minlength=n_g).astype(np.int64)
        gap6 = np.where(
            freq > 1,
            (dmax - dmin) * 10**6 // np.maximum(freq - 1, 1), 0)
        return pd.DataFrame({
            "o_custkey": ck[first],
            "recency_days": horizon - dmax,
            "frequency": freq,
            "monetary_cents": mon,
            "gap_days6": gap6,
            "n_months": nmo})

    out = (
        _with_bucket(orders, "o_custkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    ).to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True)


def q_log2_hist(sf_dir: str):
    """Fixed power-of-two milliunit histogram of value per event type
    (⌊log2 v3⌋ bands — the data-independent bins psi_drift compares
    across halves, exposed as the inspectable distribution itself).
    Map-only bounded partial; exact counts."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v3 = np.rint(t.column("value").to_numpy() * 1000
                     ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "bin": np.floor(np.log2(v3.astype(np.float64))
                            ).astype(np.int64),
            "n": np.int64(1)})
        return df.groupby(["event_type", "bin"], as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bin"], ["n"],
    ).sort_values(["event_type", "bin"]).reset_index(drop=True)
    return pd.DataFrame({
        "event_type": g["event_type"].to_numpy(),
        "bin": g["bin"].to_numpy(np.int64),
        "n": g["n"].to_numpy(np.int64)})


def q_nation_share_of_region(sf_dir: str):
    """Percent-of-parent rollup: each nation's exact order revenue and
    its share of its REGION's total ×1e6 — the two-level hierarchy
    read (region → nation) that revenue_rollup's flat grouping can't
    give. Customer nation attaches to the order scan via the broadcast
    customer map (hash-join fallback past the cap); the (nation)
    combine is 25-bounded and the region parent sums close on the
    driver with the 5-row nation/region dimension join."""
    parts = _shuffle_partitions(
        _row_count(sf_dir, "orders"), _row_count(sf_dir, "customer")
    )
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
                 num_blocks=parts)
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"],
               num_blocks=parts)
    attached = _broadcast_fact_attach(
        orders, cust, "o_custkey", "c_custkey", ["c_nationkey"])
    if attached is None:  # distributed hash join past the cap
        attached = orders.join(
            cust, join_type="inner", num_partitions=parts,
            on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        return pd.DataFrame({
            "nk": t.column("c_nationkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "cents": cents,
        }).groupby("nk", as_index=False).sum()

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["nk"], ["cents"],
    )
    nat = _gather_capped(_pq(sf_dir, "nation",
                             columns=["n_nationkey", "n_name",
                                      "n_regionkey"]))
    reg = _gather_capped(_pq(sf_dir, "region",
                             columns=["r_regionkey", "r_name"]))
    j = g.merge(nat, left_on="nk", right_on="n_nationkey")
    j = j.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    rtot = j.groupby("r_name")["cents"].transform("sum")
    return pd.DataFrame({
        "r_name": j["r_name"],
        "n_name": j["n_name"],
        "cents": j["cents"].astype(np.int64),
        "region_share6": np.array(
            [int(a) * 10**6 // int(b) for a, b in
             zip(j["cents"], rtot)], np.int64),
    }).sort_values(["r_name", "n_name"]).reset_index(drop=True)


def q_qq_click_purchase(sf_dir: str):
    """Q–Q table between the click and purchase value distributions:
    PERCENTILE_DISC-exact quantiles of BOTH at p = 5%..95% step 5 —
    the distribution-shape comparison behind ks_test's single number
    ("purchases aren't just shifted clicks, their tail bends here").
    Both quantile sets close from ONE value-domain-bounded histogram
    pass; ranks are pure integer ⌈p·n⌉ arithmetic."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        v3 = np.rint(t.column("value").to_numpy()[m] * 1000
                     ).astype(np.int64)
        return pd.DataFrame({"event_type": et[m], "v": v3,
                             "c": np.int64(1)}
                            ).groupby(["event_type", "v"],
                                      as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )

    def quantiles(g: pd.DataFrame) -> dict[int, int]:
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        out = {}
        for p in range(5, 100, 5):
            r = (p * n + 99) // 100  # ⌈p·n/100⌉
            out[p] = int(v[np.searchsorted(cum, r, side="left")])
        return out

    qc = quantiles(grid[grid["event_type"] == "click"])
    qp = quantiles(grid[grid["event_type"] == "purchase"])
    ps = list(range(5, 100, 5))
    return pd.DataFrame({
        "p": np.array(ps, np.int64),
        "click_v3": np.array([qc[p] for p in ps], np.int64),
        "purchase_v3": np.array([qp[p] for p in ps], np.int64)})


def q_host_link_matrix(sf_dir: str):
    """Full host-to-host link matrix of the derived web (source host ×
    destination host, count and row share ×1e6) — the off-diagonal
    mass host_link_locality's single ratio collapses away; a frontier
    dispatcher reads it as "which politeness queue feeds which". Pure
    map-side arithmetic over the edge stream; 9-cell bounded
    combine."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_n_cpus())
    edges = edges_dataset(docs, n)

    def partial(t: pa.Table) -> pd.DataFrame:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"hs": s % 3, "hd": d % 3,
                             "n": np.int64(1)}
                            ).groupby(["hs", "hd"],
                                      as_index=False).sum()

    g = _combine_partials(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["hs", "hd"], ["n"],
    )
    rt = g.groupby("hs")["n"].transform("sum")
    g = g.sort_values(["hs", "hd"]).reset_index(drop=True)
    return pd.DataFrame({
        "src_host": [f"www.synthd{int(h)}.mx" for h in g["hs"]],
        "dst_host": [f"www.synthd{int(h)}.mx" for h in g["hd"]],
        "n_links": g["n"].to_numpy(np.int64),
        "row_share6": np.array(
            [int(a) * 10**6 // int(b) for a, b in
             zip(g["n"], rt.loc[g.index])], np.int64)})


def q_power_users(sf_dir: str):
    """Power-user census: of the users active in the corpus' final 4
    ISO weeks, how many were active in EVERY one of them — the
    habit-formation number stickiness's DAU/WAU ratio only hints at.
    Distinct (user, week) pairs pre-reduce per batch; one user-hash
    bucket groupby counts distinct final-window weeks per user; the
    close is a 2-counter combine. The week horizon comes from one
    scalar max partial."""
    from ..stages.temporal import _with_bucket

    WEEK = 7 * 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def mx(t: pa.Table) -> pd.DataFrame:
        w = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             + 3 * 86_400_000_000) // WEEK  # Monday-aligned weeks
        return pd.DataFrame({"k": [np.int64(0)],
                             "mx": [np.int64(w.max())]}) if len(w) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    last_w = int(pd.concat(
        list(ev.map_batches(mx, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)["mx"].max())
    lo_w = last_w - 3

    def keep(t: pa.Table) -> pa.Table:
        w = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             + 3 * 86_400_000_000) // WEEK
        m = w >= lo_w
        return pa.table({
            "user_id": pa.array(
                t.column("user_id").to_numpy(zero_copy_only=False)[m],
                pa.int64()),
            "week": pa.array(w[m], pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "week"]].drop_duplicates()
        per = d.groupby("user_id").size()
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_active": [np.int64(len(per))],
            "n_power": [np.int64(int((per == 4).sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_active", "n_power"],
    )
    n_active = int(g["n_active"].sum())
    n_power = int(g["n_power"].sum())
    return pd.DataFrame({
        "n_active": [np.int64(n_active)],
        "n_power": [np.int64(n_power)],
        "power_share6": [np.int64(n_power * 10**6 // n_active
                                  if n_active else 0)]})


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
    from ..functions.urls import md5_hex_arrow

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


def q_containment_pairs(sf_dir: str):
    """EXACT overlap-coefficient (containment) self-join — quote/subset
    detection over the documents corpus with injected token-prefix
    quotes (doc_id<10 → +30000, the first max(4, 2·len//5) tokens):
    those pairs sit at C = 1.0 but Jaccard ≈ 0.4, which Jaccard-LSH
    and the Jaccard prefix filter structurally miss
    (stages/dedup.py::containment_join — probe-prefix × full-index
    bucketing with deterministic recall, distributed pair plane past
    the driver cap). Returns (a, b, c) with exact C ≥ 0.8."""
    from ..stages.dedup import containment_join

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


def q_frontier_dedup_rate(sf_dir: str):
    """Per-wave URL-seen hit rate of the engine crawl: of the candidate
    links wave d emitted, what share the dedup layer swallowed (already
    fetched, duplicate within the wave, or self-link) instead of
    fetching at wave d+1 — THE load number for sizing the cuckoo-shard
    actor pool (T1/J2: at 10^10-frontier scale, seen-hits are the
    requests the shards absorb so the fetchers never see them).

    Reads the same checkpoint as wave_branching; one spans-explode
    partial per batch (link spans per depth + rows per depth — captcha
    pages carry no link spans, so the ok-only filter is implicit in the
    data), depth-bounded combine, integer-floor close. The oracle
    replays the BFS reachability CTE: candidates(d) = edges out of
    min-depth-d nodes, new(d+1) = nodes first reached at d+1."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["depth", "spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        depth = (t.column("depth").to_numpy(zero_copy_only=False)
                 .astype(np.int64))
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), n_spans)
        if len(flat):
            is_link = pc.equal(flat.field("kind"), "link").to_numpy(
                zero_copy_only=False)
            links = np.bincount(row_of[is_link], minlength=len(t))
        else:
            links = np.zeros(len(t), dtype=np.int64)
        df = pd.DataFrame({"depth": depth, "n_pages": np.int64(1),
                           "n_links": links.astype(np.int64)})
        return df.groupby("depth", as_index=False).sum()

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["depth"], ["n_pages", "n_links"],
    ).sort_values("depth").reset_index(drop=True)
    d = g["depth"].to_numpy(np.int64)
    pages = g["n_pages"].to_numpy(np.int64)
    links = g["n_links"].to_numpy(np.int64)
    new_next = {int(dd): int(pp) for dd, pp in zip(d, pages)}
    rows = []
    for i in range(len(d)):
        cand = int(links[i])
        if cand == 0:
            continue
        nn = new_next.get(int(d[i]) + 1, 0)
        rows.append({"depth": int(d[i]), "n_candidates": cand,
                     "n_new": nn,
                     "seen_rate6": (cand - nn) * 10**6 // cand})
    out = pd.DataFrame(rows, columns=["depth", "n_candidates", "n_new",
                                      "seen_rate6"])
    return out.astype({"depth": np.int64, "n_candidates": np.int64,
                       "n_new": np.int64, "seen_rate6": np.int64})


def q_seasonality_strength(sf_dir: str):
    """Exact weekly-seasonality strength (one-way eta-squared of daily
    event counts grouped by position-in-week) over the corpus' complete
    weeks — the single number that says how much of daily-volume
    variance the weekly cycle explains (0 = flat, 1e6 = perfectly
    periodic), computed BEFORE anyone trusts a dow-adjusted forecast.

    Restricting to whole weeks from the first event day makes every
    group the same size W, so eta² = (7·ΣS_g² − T²)/(7W·Q − T²) closes
    in EXACT unbounded-int arithmetic (missing days count as zero days
    via the sums — they never need rows). One day-bounded count
    partial; everything else is driver integer math."""
    ev = _pq(sf_dir, "events", columns=["ts"], num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        df = pd.DataFrame({"day": day, "n": np.int64(1)})
        return df.groupby("day", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["n"])
    if g is None or not len(g):  # pragma: no cover - empty events
        return pd.DataFrame({"n_weeks": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "eta2_6": pd.Series([], dtype=np.int64)})
    g = g.sort_values("day").reset_index(drop=True)
    days = g["day"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    d0 = int(days.min())
    W = (int(days.max()) - d0 + 1) // 7
    m = days < d0 + 7 * W
    days, cnt = days[m], cnt[m]
    s_g = [0] * 7
    T = 0
    Q = 0
    for dd, cc in zip(days.tolist(), cnt.tolist()):
        s_g[(dd - d0) % 7] += cc
        T += cc
        Q += cc * cc
    num = 7 * sum(x * x for x in s_g) - T * T
    den = 7 * W * Q - T * T
    eta = num * 10**6 // den if den > 0 else 0
    return pd.DataFrame({"n_weeks": [np.int64(W)],
                         "n_events": [np.int64(T)],
                         "eta2_6": [np.int64(eta)]})


def q_centroid_distances(sf_dir: str):
    """Class-separation matrix: squared L2 distance between every pair
    of per-label embedding centroids — the scorecard read next to
    label_centroids before trusting a label-conditioned sampler or an
    IVF coarse quantizer (well-separated centroids ⇒ cheap routing).

    Closes ENTIRELY over the round-6 centroid table the
    label_centroids gate already proves equal on both sides, lifted to
    exact micro-unit integers (c6 = round(centroid·1e6)) so the
    distance sums are order-free integer arithmetic — no float
    summation ever crosses the gate. Driver math over a labels×dims
    bounded frame; the corpus pass is label_centroids' shuffle-free
    partial combine."""
    cents = q_label_centroids(sf_dir)
    c6 = np.rint(cents["centroid"].to_numpy() * 1e6).astype(np.int64)
    labels = cents["label"].to_numpy(np.int64)
    dims = cents["dim"].to_numpy(np.int64)
    uniq = np.unique(labels)
    d = int(dims.max()) + 1
    mat = np.zeros((len(uniq), d), dtype=np.int64)
    li = np.searchsorted(uniq, labels)
    mat[li, dims] = c6
    rows = []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            diff = mat[i] - mat[j]
            rows.append({
                "label_a": int(uniq[i]), "label_b": int(uniq[j]),
                "d2_12": int((diff * diff).sum()),
            })
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "d2_12"])
    return out.astype({"label_a": np.int64, "label_b": np.int64,
                       "d2_12": np.int64})


def q_brand_premium(sf_dir: str):
    """Mix-adjusted brand price premium (direct standardization): per
    brand, its mean retail price minus the price its PRODUCT-TYPE MIX
    would predict from type-level means — the scorecard that separates
    'expensive brand' from 'brand that sells expensive categories'.

    One (brand, type) cell partial pass (cells bounded by the catalog
    taxonomy, not rows), driver integer close: prices lift to cents
    (⌊p·100+0.5⌋, the price_cents convention), means floor to
    micro-dollars with identical operands on both sides, expected =
    Σ_type n_bt · type_mean6 // n_b — every division an integer floor,
    so the gate is arithmetic-identity, not float luck."""
    pt = _pq(sf_dir, "part", columns=["p_brand", "p_type", "p_retailprice"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "brand": t.column("p_brand").to_numpy(zero_copy_only=False),
            "ptype": t.column("p_type").to_numpy(zero_copy_only=False),
            "n": np.int64(1), "cents": cents})
        return df.groupby(["brand", "ptype"], as_index=False).sum()

    g = _combine_partials(
        pt.map_batches(partial, batch_format="pyarrow"),
        ["brand", "ptype"], ["n", "cents"])
    tm = g.groupby("ptype", as_index=False).agg(tn=("n", "sum"),
                                                tc=("cents", "sum"))
    tm["m6"] = [int(c) * 10**4 // int(n)
                for c, n in zip(tm["tc"], tm["tn"])]
    g = g.merge(tm[["ptype", "m6"]], on="ptype")
    g["exp_part"] = g["n"].astype(object) * g["m6"].astype(object)
    br = g.groupby("brand", as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum"), ep=("exp_part", "sum"))
    rows = []
    for _, r in br.iterrows():
        actual6 = int(r["cents"]) * 10**4 // int(r["n"])
        expected6 = int(r["ep"]) // int(r["n"])
        rows.append({"brand": r["brand"], "n_parts": int(r["n"]),
                     "actual6": actual6, "expected6": expected6,
                     "premium6": actual6 - expected6})
    out = pd.DataFrame(rows, columns=["brand", "n_parts", "actual6",
                                      "expected6", "premium6"])
    out = out.sort_values("brand").reset_index(drop=True)
    return out.astype({"n_parts": np.int64, "actual6": np.int64,
                       "expected6": np.int64, "premium6": np.int64})


def q_quantization_recall(sf_dir: str):
    """ANN-quality audit: per query, overlap@10 between the int8
    scalar-quantized top-10 (quantized_topk's scorer) and the EXACT
    top-10 by fixed-point dot product — the recall-of-the-compressed-
    index number a retrieval stack reads before trading 8× memory for
    quantization error. Queries = vec_ids 1..5.

    One stats pass (per-dim min/max partials, dims × blocks rows),
    then ONE corpus scan scores BOTH representations per batch (int64
    matmuls against the 5 broadcast query rows) and emits per-query
    per-scorer top-10 partials — the driver merges blocks × 5 × 2 × 10
    rows and closes the overlap count. Both scores are exact integers
    (codes 0..255; values in round-6 micro-units), so ranking ties pin
    by vec_id identically on both sides."""
    from ..stages.similarity import _emb_matrix

    emb = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"],
              num_blocks=_n_cpus())
    QIDS = np.arange(1, 6, dtype=np.int64)

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({"dim": pd.Series([], dtype=np.int64),
                                 "mn": pd.Series([], dtype=np.float64),
                                 "mx": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"dim": np.arange(m.shape[1], dtype=np.int64),
                             "mn": m.min(axis=0), "mx": m.max(axis=0)})

    stats = pd.concat(
        list(emb.map_batches(mm_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    ).groupby("dim", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = stats.sort_values("dim")["mn"].to_numpy(np.float64)
    mx = stats.sort_values("dim")["mx"].to_numpy(np.float64)
    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)

    def quantize(m: np.ndarray) -> np.ndarray:
        c = np.floor((m - mn) / safe * 255 + 0.5).astype(np.int64)
        c[:, rng <= 0] = 0
        return c

    qdf = (emb.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"),
                                    pa.array(QIDS, pa.int64()))),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    bref = ray.put((mn, safe, rng, quantize(Q), np.rint(Q * 1e6)
                    .astype(np.int64)))

    def topk_partial(t: pa.Table) -> pd.DataFrame:
        mn_, safe_, rng_, Qc, Q6 = ray.get(bref)
        m = _emb_matrix(t, "embedding")
        if not len(m):
            return pd.DataFrame({
                "scorer": pd.Series([], dtype=np.int64),
                "query_id": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.int64)})
        ids = (t.column("vec_id").to_numpy(zero_copy_only=False)
               .astype(np.int64))
        c = np.floor((m - mn_) / safe_ * 255 + 0.5).astype(np.int64)
        c[:, rng_ <= 0] = 0
        sq = c @ Qc.T
        se = np.rint(m * 1e6).astype(np.int64) @ Q6.T
        out = []
        for s_idx, sc in ((0, se), (1, sq)):
            for qi in range(sc.shape[1]):
                top = np.lexsort((ids, -sc[:, qi]))[:10]
                out.append(pd.DataFrame({
                    "scorer": np.int64(s_idx),
                    "query_id": np.int64(qi + 1),
                    "vec_id": ids[top],
                    "score": sc[top, qi]}))
        return pd.concat(out, ignore_index=True)

    parts = pd.concat(
        list(emb.map_batches(topk_partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    rows = []
    for qid in QIDS:
        tops = {}
        for s_idx in (0, 1):
            sub = parts[(parts["scorer"] == s_idx)
                        & (parts["query_id"] == qid)]
            sub = sub.sort_values(["score", "vec_id"],
                                  ascending=[False, True]).head(10)
            tops[s_idx] = set(sub["vec_id"].tolist())
        n = len(tops[0] & tops[1])
        rows.append({"query_id": int(qid), "n_overlap": n,
                     "recall6": n * 10**6 // 10})
    out = pd.DataFrame(rows, columns=["query_id", "n_overlap", "recall6"])
    return out.astype({"query_id": np.int64, "n_overlap": np.int64,
                       "recall6": np.int64})


def q_naive_forecast_mae(sf_dir: str):
    """Forecast backtest: mean absolute error of the seasonal-naive
    predictor (today's event count = count 7 days ago) over every day
    with a week-old reference — the baseline number any fancier
    forecaster must beat, and the honest way to quote forecastability
    without fitting anything. One day-bounded count partial; the close
    is driver integer math (sum |Δ| and an exact ppm floor)."""
    ev = _pq(sf_dir, "events", columns=["ts"], num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        return (pd.DataFrame({"day": day, "n": np.int64(1)})
                .groupby("day", as_index=False).sum())

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["n"])
    counts = {int(d): int(n) for d, n in zip(g["day"], g["n"])}
    if not counts:  # pragma: no cover - empty events
        return pd.DataFrame({"n_days": pd.Series([], dtype=np.int64),
                             "total_abs_err": pd.Series([], dtype=np.int64),
                             "mae6": pd.Series([], dtype=np.int64)})
    lo, hi = min(counts), max(counts)
    n_days = 0
    tot = 0
    for d in range(lo + 7, hi + 1):
        # every calendar day in range scores (missing days count 0)
        n_days += 1
        tot += abs(counts.get(d, 0) - counts.get(d - 7, 0))
    return pd.DataFrame({
        "n_days": [np.int64(n_days)],
        "total_abs_err": [np.int64(tot)],
        "mae6": [np.int64(tot * 10**6 // n_days if n_days else 0)]})


def q_host_wave_share(sf_dir: str):
    """Politeness fairness over time: per BFS wave, each host's share
    of the pages fetched that wave — the longitudinal view behind
    crawl_fairness's single Jain number (a scheduler can be fair in
    aggregate while starving a host early). Reads the crawl checkpoint;
    one (depth × host)-bounded count partial; integer-floor shares."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["depth", "host"])

    def partial(t: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({
            "depth": t.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "host": t.column("host").to_numpy(zero_copy_only=False),
            "n_pages": np.int64(1)})
            .groupby(["depth", "host"], as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["depth", "host"], ["n_pages"])
    tot = g.groupby("depth")["n_pages"].transform("sum")
    g["share6"] = (g["n_pages"].astype(np.int64) * 10**6
                   // tot.astype(np.int64))
    g = g.sort_values(["depth", "host"]).reset_index(drop=True)
    return g.astype({"depth": np.int64, "n_pages": np.int64,
                     "share6": np.int64})[
        ["depth", "host", "n_pages", "share6"]]


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


def q_timed_funnel(sf_dir: str):
    """Time-constrained conversion funnel: users with a view → click
    within 1 HOUR → purchase within 24 HOURS of that click — the
    attribution-grade funnel (funnel_users' ordered-subsequence check
    says 'eventually'; marketing windows say 'within the session').

    One user-hash bucket shuffle; the bucket kernel packs every user's
    events onto one number line (user_rank × BIG + relative_ts, BIG >
    bucket time span + both windows, so windows can never cross a user
    boundary) and closes all three stages with FOUR global
    searchsorteds — no per-user Python. Bound: user_rank × BIG must fit
    int64, i.e. ~3e5 users per bucket at multi-year µs spans — raise
    num_buckets with corpus size (the shuffle key, not the kernel, is
    the scale lever). Exact-count close; integer-floor share."""
    from ..stages.temporal import _with_bucket

    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.is_in(
            t.column("event_type"),
            pa.array(["view", "click", "purchase"])))
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        kind = np.zeros(len(t2), np.int8)
        kind[et == "click"] = 1
        kind[et == "purchase"] = 2
        return pa.table({
            "user_id": t2.column("user_id"),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "kind": pa.array(kind, pa.int8())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        kind = g["kind"].to_numpy()
        _, inv = np.unique(uid, return_inverse=True)
        rel = ts - ts.min()
        big = int(rel.max()) + 2 * DAY + HOUR + 10
        # loud failure instead of silent int64 wrap: raise num_buckets
        # if a bucket ever packs more users x span than 2^62
        assert int(inv.max() if len(inv) else 0) * big < 2**62
        key = inv.astype(np.int64) * big + rel
        v = np.sort(key[kind == 0])
        c = np.sort(key[kind == 1])
        p = np.sort(key[kind == 2])
        has_v = np.searchsorted(v, c) > np.searchsorted(v, c - HOUR)
        cg = c[has_v]
        conv = cg[np.searchsorted(p, cg + DAY, side="right")
                  > np.searchsorted(p, cg, side="right")]
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_users": [np.int64(len(np.unique(key[kind == 0] // big)))],
            "n_conv": [np.int64(len(np.unique(conv // big)))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_users", "n_conv"])
    nb = int(g["n_users"].sum())
    nc = int(g["n_conv"].sum())
    return pd.DataFrame({
        "n_users": [np.int64(nb)],
        "n_converted": [np.int64(nc)],
        "conv_share6": [np.int64(nc * 10**6 // nb if nb else 0)]})


def q_click_value_uplift(sf_dir: str):
    """Click-attribution value split: purchases WITH a click in the
    preceding hour (same user) vs without, with exact mean purchase
    values — the first number an attribution discussion reaches for
    ('do clicked purchases actually spend more?').

    Same packed-number-line kernel as timed_funnel (user_rank × BIG +
    relative_ts, one global searchsorted instead of per-user windows);
    purchase values ride along in milli-units so each bucket emits two
    (n, sum3) partials and the means close as integer floors."""
    from ..stages.temporal import _with_bucket

    HOUR = 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts",
                                        "value"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.is_in(t.column("event_type"),
                               pa.array(["click", "purchase"])))
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        v3 = np.rint(t2.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({
            "user_id": t2.column("user_id"),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "is_p": pa.array(et == "purchase"),
            "v3": pa.array(v3, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        isp = g["is_p"].to_numpy(bool)
        v3 = g["v3"].to_numpy(np.int64)
        _, inv = np.unique(uid, return_inverse=True)
        rel = ts - ts.min()
        big = int(rel.max()) + 2 * HOUR + 10
        assert int(inv.max() if len(inv) else 0) * big < 2**62
        key = inv.astype(np.int64) * big + rel
        c = np.sort(key[~isp])
        pk = key[isp]
        pv = v3[isp]
        clicked = (np.searchsorted(c, pk)
                   > np.searchsorted(c, pk - HOUR))
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_clicked": [np.int64(int(clicked.sum()))],
            "sum3_clicked": [np.int64(int(pv[clicked].sum()))],
            "n_bare": [np.int64(int((~clicked).sum()))],
            "sum3_bare": [np.int64(int(pv[~clicked].sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_clicked", "sum3_clicked", "n_bare", "sum3_bare"])
    rows = []
    for label, n, s3 in (
        ("clicked", int(g["n_clicked"].sum()),
         int(g["sum3_clicked"].sum())),
        ("bare", int(g["n_bare"].sum()), int(g["sum3_bare"].sum())),
    ):
        rows.append({"cohort": label, "n_purchases": n,
                     "mean6": s3 * 1000 // n if n else 0})
    out = pd.DataFrame(rows, columns=["cohort", "n_purchases", "mean6"])
    return out.astype({"n_purchases": np.int64, "mean6": np.int64})


_PART_SINK_CACHE: dict = {}


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
    from ..sources.tables import read_dataset, write_partitioned

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


def q_resume_skip_audit(sf_dir: str):
    """Resume contract as a driver query: write the events table
    through the resumable hive sink partitioned by event_type, then
    RE-RUN the identical write — the second pass must skip every
    sealed partition at the source (no re-read, no re-write) and seal
    nothing new. Emits one row per partition with both passes' sealed
    counts; the engine also hard-asserts the re-run sealed zero (the
    north rule's no-duplicate-work-after-restart guarantee, S7/§4.3,
    over DERIVED outputs — test_resume pins the same contract for the
    crawl store)."""
    from ..sources.tables import write_partitioned

    root = tempfile.mkdtemp(prefix="resume_audit_", dir="/tmp")

    def ev():
        return _pq(sf_dir, "events", columns=["event_type", "event_id"],
                   num_blocks=_n_cpus())

    first = write_partitioned(ev(), root, "event_type")
    second = write_partitioned(ev(), root, "event_type")
    assert second == [], (
        f"resume re-run resealed partitions: {second}")
    rows = [{"partition_value": v, "sealed_first_run": 1,
             "sealed_second_run": 0} for v in sorted(first)]
    out = pd.DataFrame(rows, columns=["partition_value",
                                      "sealed_first_run",
                                      "sealed_second_run"])
    return out.astype({"sealed_first_run": np.int64,
                       "sealed_second_run": np.int64})


def q_span_offset_profile(sf_dir: str):
    """Span-ORDER analytics over the interleaved payload: per span
    kind, how many spans the crawl fetched and where they sit in the
    document (sum + integer-floor mean of the offset column) — the
    positional fingerprint that makes span order auditable at a
    glance (M7's positional parse makes order load-bearing; a parser
    regression that reorders spans moves these means before any
    content diff notices). Zero-copy list<struct> explode; the
    combine is bounded by the kind vocabulary."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"), columns=["spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        if not len(flat):
            return pd.DataFrame({
                "kind": pd.Series([], dtype=str),
                "n_spans": pd.Series([], dtype=np.int64),
                "sum_offsets": pd.Series([], dtype=np.int64)})
        return (pd.DataFrame({
            "kind": flat.field("kind").to_numpy(zero_copy_only=False),
            "n_spans": np.int64(1),
            "sum_offsets": flat.field("offset").to_numpy(
                zero_copy_only=False).astype(np.int64)})
            .groupby("kind", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["kind"], ["n_spans", "sum_offsets"])
    g = g.sort_values("kind").reset_index(drop=True)
    g["mean_off6"] = (g["sum_offsets"].astype(np.int64) * 10**6
                      // g["n_spans"].astype(np.int64))
    return g.astype({"n_spans": np.int64, "sum_offsets": np.int64,
                     "mean_off6": np.int64})[
        ["kind", "n_spans", "sum_offsets", "mean_off6"]]


def q_gate_bias_matrix(sf_dir: str):
    """Language-bias audit of the Gopher quality gate: per language,
    how many docs pass the composite filter and how many fail the
    ENGLISH-stopword rule specifically — the known failure mode of
    English-centric gates on multilingual corpora (they silently
    depress non-English keep rates; this matrix is the number a
    curation review reads before applying per-language thresholds).
    Same integer cross-multiplication flags as gopher_filter, rolled
    up to a language-bounded partial combine."""
    from ..stages.textstats import _EN_STOP_RE, _count

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
    from ..stages.textstats import lang_id

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


def q_captcha_rate_by_wave(sf_dir: str):
    """Captcha-wall incidence per BFS wave — the longitudinal
    complement to captcha_rate_by_host: a rising per-wave rate means
    the crawl is walking into throttling as it goes deeper (the signal
    to slow the politeness budget), which the per-host aggregate
    averages away. Captcha fetches are identified by their single
    kind='captcha' span (S8: the wall page IS the payload);
    depth-bounded count partials; integer-floor rates."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["depth", "spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), n_spans)
        is_cap = np.zeros(len(t), dtype=bool)
        if len(flat):
            cap_rows = row_of[pc.equal(flat.field("kind"), "captcha")
                              .to_numpy(zero_copy_only=False)]
            is_cap[np.unique(cap_rows)] = True
        return (pd.DataFrame({
            "depth": t.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_pages": np.int64(1),
            "n_captcha": is_cap.astype(np.int64)})
            .groupby("depth", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["depth"], ["n_pages", "n_captcha"])
    g = g.sort_values("depth").reset_index(drop=True)
    g["captcha_rate6"] = (g["n_captcha"].astype(np.int64) * 10**6
                          // g["n_pages"].astype(np.int64))
    return g.astype({"depth": np.int64, "n_pages": np.int64,
                     "n_captcha": np.int64, "captcha_rate6": np.int64})[
        ["depth", "n_pages", "n_captcha", "captcha_rate6"]]


def q_link_wave_locality(sf_dir: str):
    """Wave-locality histogram of the crawl's link structure: for every
    link a fetched page emitted, the signed wave delta between the
    SOURCE's first-fetch wave and the TARGET's (−1 = the link
    discovered its target next wave; 0 = same wave; k>0 = it points k
    waves BACK) — the frontier-memory working-set profile: mass at
    large deltas means the URL-seen set must keep old waves hot
    forever, mass at −1 means it could age them out.

    Doc ids parse from the synthesis URLs (sku = 10^12 + id); the
    (doc, wave) map attaches to the link stream via the broadcast
    searchsorted path with the hash-join fallback past the cap
    (_broadcast_fact_attach — the caps pick the plan); the close is a
    delta-bounded count combine."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["url", "depth", "spans"])

    def _ids_of(urls: np.ndarray) -> np.ndarray:
        # url_of: ...?sku=<10^12 + id> — fixed 13-digit tail
        return np.array([int(u[-13:]) - 10**12 for u in urls],
                        dtype=np.int64)

    def edge_rows(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), n_spans)
        if len(flat):
            is_link = pc.equal(flat.field("kind"), "link").to_numpy(
                zero_copy_only=False)
            refs = flat.field("media_ref").to_numpy(
                zero_copy_only=False)[is_link]
            rows = row_of[is_link]
        else:
            refs = np.array([], dtype=object)
            rows = np.array([], dtype=np.int64)
        sd = (t.column("depth").to_numpy(zero_copy_only=False)
              .astype(np.int64))[rows]
        return pa.table({
            "dst_id": pa.array(_ids_of(refs), pa.int64()),
            "src_depth": pa.array(sd, pa.int64())})

    def depth_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(_ids_of(urls), pa.int64()),
            "dst_depth": pc.cast(t.column("depth"), pa.int64())})

    edges = docs.map_batches(edge_rows, batch_format="pyarrow")
    depth_ds = docs.map_batches(depth_rows, batch_format="pyarrow")
    attached = _broadcast_fact_attach(edges, depth_ds, "dst_id",
                                      "doc_id", ["dst_depth"])
    if attached is None:  # pragma: no cover - node map past the cap
        attached = edges.join(
            depth_ds, join_type="inner",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "documents")),
            on=("dst_id",), right_on=("doc_id",))

    def partial(t: pa.Table) -> pd.DataFrame:
        delta = (t.column("src_depth").to_numpy(zero_copy_only=False)
                 - t.column("dst_depth").to_numpy(zero_copy_only=False))
        return (pd.DataFrame({"wave_delta": delta.astype(np.int64),
                              "n_links": np.int64(1)})
                .groupby("wave_delta", as_index=False).sum())

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["wave_delta"], ["n_links"])
    g = g.sort_values("wave_delta").reset_index(drop=True)
    return g.astype({"wave_delta": np.int64, "n_links": np.int64})


def q_usable_tokens_by_source(sf_dir: str):
    """Post-gate token budget per feed: of each source's whitespace
    tokens, how many survive the Gopher quality gate — THE number a
    mixture plan allocates against (raw token counts overstate feeds
    full of filtered boilerplate). One fused map pass (gate flags +
    token count share the same Arrow RE2 scans, no second read);
    source-bounded partials; integer-floor share."""
    from ..stages.textstats import _EN_STOP_RE, _count

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


def q_cluster_separation(sf_dir: str):
    """Cluster-quality audit over the label 'clustering' of the
    embedding table: per label, the mean squared distance to its OWN
    round-6 centroid (intra scatter) vs the squared distance to the
    NEAREST other centroid — the silhouette-style separation ratio
    that says whether label-conditioned routing (IVF coarse layer,
    per-class samplers) will actually discriminate.

    Exact end to end: values lift to micro-unit ints and the intra
    scatter closes by the sum-of-squares identity Σ|x−c|² = Σ|x|² −
    2·c·Σx + n|c|² over (label × dim)-bounded integer partials — no
    float sum ever crosses the gate (centroids are the round-6 values
    the label_centroids gate already proves equal)."""
    from ..stages.similarity import _emb_matrix

    emb = _pq(sf_dir, "embeddings", columns=["embedding", "label"],
              num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        m = _emb_matrix(t, "embedding")
        x6 = np.rint(m * 1e6).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = x6.shape[1]
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, x6)
        rowsq = (x6 * x6).sum(axis=1)  # ≤ dims·(1e6)² per row: int64-safe
        sq = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sq, inv, rowsq)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # per-label scalars ride the (label, dim) partial on dim 0
        dim0 = np.tile(np.arange(d), len(uniq)) == 0
        return pd.DataFrame({
            "label": np.repeat(uniq, d).astype(np.int64),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "s6": sums.ravel(),
            "sq12": np.where(dim0, np.repeat(sq, d), 0),
            "n": np.where(dim0, np.repeat(counts, d), 0).astype(np.int64)})

    g = _combine_partials(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], ["s6", "sq12", "n"])
    cents = q_label_centroids(sf_dir)
    c6 = np.rint(cents["centroid"].to_numpy() * 1e6).astype(np.int64)
    cl = cents["label"].to_numpy(np.int64)
    cd = cents["dim"].to_numpy(np.int64)
    uniq = np.unique(cl)
    d = int(cd.max()) + 1
    cmat = np.zeros((len(uniq), d), dtype=np.int64)
    cmat[np.searchsorted(uniq, cl), cd] = c6
    g = g.sort_values(["label", "dim"]).reset_index(drop=True)
    smat = np.zeros((len(uniq), d), dtype=object)
    smat[np.searchsorted(uniq, g["label"].to_numpy(np.int64)),
         g["dim"].to_numpy(np.int64)] = g["s6"].to_numpy(np.int64)
    per = g.groupby("label", as_index=False).agg(
        sq12=("sq12", "sum"), n=("n", "sum"))
    rows = []
    for i, lb in enumerate(uniq):
        n = int(per.loc[per["label"] == lb, "n"].iloc[0])
        sq = int(per.loc[per["label"] == lb, "sq12"].iloc[0])
        c = cmat[i].astype(object)
        s = smat[i]
        intra = sq - 2 * int((c * s).sum()) + n * int((c * c).sum())
        others = [int(((cmat[j].astype(object) - c) ** 2).sum())
                  for j in range(len(uniq)) if j != i]
        nearest = min(others) if others else 0
        intra_mean = intra // n if n else 0
        rows.append({
            "label": int(lb), "n": n, "intra_mean12": intra_mean,
            "nearest_d2_12": nearest,
            "sep_ratio6": (nearest * 10**6 // intra_mean
                           if intra_mean > 0 else 0)})
    out = pd.DataFrame(rows, columns=["label", "n", "intra_mean12",
                                      "nearest_d2_12", "sep_ratio6"])
    return out.astype({c: np.int64 for c in out.columns})


def q_brand_return_rate(sf_dir: str):
    """Return-rate scorecard per part brand: share of lineitems flagged
    R — the merchandising-quality number behind returned_top_customers'
    customer view. Star shape: the part dimension broadcasts as a
    (p_partkey → brand-code) int index into the streaming lineitem
    scan (hash-join fallback past the cap via _broadcast_fact_attach);
    the close is a brand-bounded count combine with integer-floor
    rates."""
    parts = _shuffle_partitions(_row_count(sf_dir, "lineitem"))
    li = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"],
             num_blocks=parts)
    pt = _pq(sf_dir, "part", columns=["p_partkey", "p_brand"],
             num_blocks=_n_cpus())
    pdf = _gather_capped(pt)
    brands = None
    if pdf is not None:
        brands = np.sort(pdf["p_brand"].unique())
        code_of = {b: i for i, b in enumerate(brands)}

        def to_code(t: pa.Table) -> pa.Table:
            codes = np.array([code_of[b] for b in
                              t.column("p_brand").to_numpy(
                                  zero_copy_only=False)], dtype=np.int64)
            return pa.table({
                "p_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
                "bcode": pa.array(codes, pa.int64())})

        build = pt.map_batches(to_code, batch_format="pyarrow")
        fact = li.map_batches(
            lambda t: pa.table({
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "is_r": pc.cast(pc.equal(t.column("l_returnflag"), "R"),
                                pa.int64())}),
            batch_format="pyarrow")
        attached = _broadcast_fact_attach(fact, build, "l_partkey",
                                          "p_partkey", ["bcode"])
    else:  # pragma: no cover - part dim past the gather cap
        attached = None
    if attached is None:  # distributed hash-join plan
        attached = li.map_batches(
            lambda t: pa.table({
                "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
                "is_r": pc.cast(pc.equal(t.column("l_returnflag"), "R"),
                                pa.int64())}),
            batch_format="pyarrow").join(
            pt.map_batches(
                lambda t: pa.table({
                    "p_partkey": pc.cast(t.column("p_partkey"),
                                         pa.int64()),
                    "p_brand": t.column("p_brand")}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("l_partkey",), right_on=("p_partkey",))

        def partial_b(t: pa.Table) -> pd.DataFrame:
            return (pd.DataFrame({
                "brand": t.column("p_brand").to_numpy(
                    zero_copy_only=False),
                "n_lines": np.int64(1),
                "n_returned": t.column("is_r").to_numpy(
                    zero_copy_only=False)})
                .groupby("brand", as_index=False).sum())

        g = _combine_partials(
            attached.map_batches(partial_b, batch_format="pyarrow"),
            ["brand"], ["n_lines", "n_returned"])
    else:

        def partial(t: pa.Table) -> pd.DataFrame:
            return (pd.DataFrame({
                "bcode": t.column("bcode").to_numpy(zero_copy_only=False),
                "n_lines": np.int64(1),
                "n_returned": t.column("is_r").to_numpy(
                    zero_copy_only=False)})
                .groupby("bcode", as_index=False).sum())

        g = _combine_partials(
            attached.map_batches(partial, batch_format="pyarrow"),
            ["bcode"], ["n_lines", "n_returned"])
        g["brand"] = brands[g["bcode"].to_numpy(np.int64)]
    g = g.sort_values("brand").reset_index(drop=True)
    g["return_rate6"] = (g["n_returned"].astype(np.int64) * 10**6
                         // g["n_lines"].astype(np.int64))
    return g.astype({"n_lines": np.int64, "n_returned": np.int64,
                     "return_rate6": np.int64})[
        ["brand", "n_lines", "n_returned", "return_rate6"]]


def q_repeat_customer_share(sf_dir: str):
    """Repeat-buyer share per nation: of each nation's customers WITH
    at least one order, how many ordered twice or more — the
    acquisition-vs-loyalty geography behind new_vs_returning's time
    view. Per-customer order counts pre-reduce per batch, one
    customer-hash bucket groupby makes them exact, the nation attach
    broadcasts (customers' nations are dimension-bounded per bucket
    close), and the close is a nation-bounded combine."""
    from ..stages.temporal import _with_bucket

    orders = _pq(sf_dir, "orders", columns=["o_custkey"],
                 num_blocks=_n_cpus())
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_nationkey"],
               num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table({"ck": pa.array(u.astype(np.int64), pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("ck", as_index=False)["n"].sum()
        return pd.DataFrame({
            "ck": agg["ck"].to_numpy(np.int64),
            "repeat": (agg["n"].to_numpy(np.int64) >= 2)
            .astype(np.int64)})

    per_cust = (_with_bucket(orders.map_batches(pre,
                                                batch_format="pyarrow"),
                             "ck", 32)
                .groupby("__bucket")
                .map_groups(kernel, batch_format="pandas"))
    nat = _broadcast_fact_attach(
        per_cust.map_batches(
            lambda t: pa.table({
                "ck": pc.cast(t.column("ck"), pa.int64()),
                "repeat": pc.cast(t.column("repeat"), pa.int64())}),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.table({
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "nation": pc.cast(t.column("c_nationkey"), pa.int64())}),
            batch_format="pyarrow"),
        "ck", "c_custkey", ["nation"])
    if nat is None:  # pragma: no cover - customer dim past the cap
        nat = per_cust.join(
            cust, join_type="inner",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "customer")),
            on=("ck",), right_on=("c_custkey",)).map_batches(
            lambda t: t.append_column(
                "nation", pc.cast(t.column("c_nationkey"), pa.int64())),
            batch_format="pyarrow")

    def partial(t: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({
            "nation": t.column("nation").to_numpy(zero_copy_only=False),
            "n_buyers": np.int64(1),
            "n_repeat": t.column("repeat").to_numpy(
                zero_copy_only=False)})
            .groupby("nation", as_index=False).sum())

    g = _combine_partials(
        nat.map_batches(partial, batch_format="pyarrow"),
        ["nation"], ["n_buyers", "n_repeat"])
    g = g.sort_values("nation").reset_index(drop=True)
    g["repeat_share6"] = (g["n_repeat"].astype(np.int64) * 10**6
                          // g["n_buyers"].astype(np.int64))
    return g.astype({"nation": np.int64, "n_buyers": np.int64,
                     "n_repeat": np.int64, "repeat_share6": np.int64})[
        ["nation", "n_buyers", "n_repeat", "repeat_share6"]]


def q_single_source_parts(sf_dir: str):
    """Supply-risk census: distribution of parts by how many DISTINCT
    suppliers ever shipped them — the single-source-risk histogram a
    procurement review starts from (n_suppliers = 1 is the fragile
    bucket). Level 1 is the exact grouped count-distinct plane
    (pair-hash bucket dedup — stages/aggregates.count_distinct, the
    same-pair-same-bucket exchange); level 2 re-reduces the per-part
    counts to a histogram bounded by the max supplier fan-out, so
    nothing part-scale lands on the driver."""
    from ..stages.aggregates import count_distinct

    li = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"],
             num_blocks=_n_cpus())
    per_part = count_distinct(li, key_col="l_partkey",
                              value_col="l_suppkey")

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({
            "n_suppliers": t.column("n_distinct").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_parts": np.int64(1)})
            .groupby("n_suppliers", as_index=False).sum())

    g = _combine_partials(
        per_part.map_batches(hist_partial, batch_format="pyarrow"),
        ["n_suppliers"], ["n_parts"])
    g = g.sort_values("n_suppliers").reset_index(drop=True)
    tot = int(g["n_parts"].sum())
    g["part_share6"] = (g["n_parts"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n_suppliers": np.int64, "n_parts": np.int64,
                     "part_share6": np.int64})


def q_hour_dow_heatmap(sf_dir: str):
    """The 168-cell (day-of-week × hour) activity heatmap with exact
    mean event values — the ops view behind dow_seasonality and
    events_hourly combined: WHERE in the week the load and the spend
    actually sit. One calendar-bounded (≤168 cells) count partial;
    integer-floor means in micro-units."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        v3 = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return (pd.DataFrame({
            "dow": (ts // DAY + 4) % 7,
            "hour": (ts % DAY) // HOUR,
            "n_events": np.int64(1), "sum3": v3})
            .groupby(["dow", "hour"], as_index=False).sum())

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["dow", "hour"], ["n_events", "sum3"])
    g = g.sort_values(["dow", "hour"]).reset_index(drop=True)
    g["mean6"] = (g["sum3"].astype(np.int64) * 1000
                  // g["n_events"].astype(np.int64))
    return g.astype({"dow": np.int64, "hour": np.int64,
                     "n_events": np.int64, "sum3": np.int64,
                     "mean6": np.int64})


def q_order_month_profile(sf_dir: str):
    """Order seasonality by calendar month (1–12): order counts,
    revenue cents and the ×12 seasonal index (1e6 = flat year) — the
    orders-side complement to the events-side dow_seasonality. One
    12-cell partial; every index an integer floor."""
    orders = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
                 num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        month = (d.astype("datetime64[M]").astype(np.int64) % 12) + 1
        cents = np.rint(t.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return (pd.DataFrame({"month": month.astype(np.int64),
                              "n_orders": np.int64(1), "cents": cents})
                .groupby("month", as_index=False).sum())

    g = _combine_partials(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["month"], ["n_orders", "cents"])
    g = g.sort_values("month").reset_index(drop=True)
    tot_n = int(g["n_orders"].sum())
    g["count_index6"] = (g["n_orders"].astype(np.int64) * 12 * 10**6
                         // tot_n)
    return g.astype({"month": np.int64, "n_orders": np.int64,
                     "cents": np.int64, "count_index6": np.int64})


def q_segment_priority_mix(sf_dir: str):
    """Market-segment × order-priority mix: the (segment, priority)
    cross-tab with within-segment shares — the demand-shape view a
    fulfilment planner reads next to order_priority_counts. The
    customer dimension broadcasts as a (custkey → segment-code) int
    index into the order scan (hash-join fallback past the cap); the
    close combines ≤ segments × priorities cells."""
    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
                 num_blocks=_n_cpus())
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
               num_blocks=_n_cpus())
    cdf = _gather_capped(cust)
    if cdf is not None:
        segs = np.sort(cdf["c_mktsegment"].unique())
        code_of = {sg: i for i, sg in enumerate(segs)}
        build = cust.map_batches(
            lambda t: pa.table({
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "scode": pa.array(
                    [code_of[x] for x in t.column("c_mktsegment")
                     .to_numpy(zero_copy_only=False)], pa.int64())}),
            batch_format="pyarrow")
        fact = orders.map_batches(
            lambda t: pa.table({
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "o_orderpriority": t.column("o_orderpriority")}),
            batch_format="pyarrow")
        attached = _broadcast_fact_attach(fact, build, "o_custkey",
                                          "c_custkey", ["scode"])
        assert attached is not None

        def partial(t: pa.Table) -> pd.DataFrame:
            return (pd.DataFrame({
                "scode": t.column("scode").to_numpy(zero_copy_only=False),
                "priority": t.column("o_orderpriority").to_numpy(
                    zero_copy_only=False),
                "n_orders": np.int64(1)})
                .groupby(["scode", "priority"], as_index=False).sum())

        g = _combine_partials(
            attached.map_batches(partial, batch_format="pyarrow"),
            ["scode", "priority"], ["n_orders"])
        g["segment"] = segs[g["scode"].to_numpy(np.int64)]
    else:  # pragma: no cover - customer dim past the gather cap
        j = orders.join(
            cust, join_type="inner",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "orders")),
            on=("o_custkey",), right_on=("c_custkey",))
        g = _combine_partials(
            j.map_batches(
                lambda t: pd.DataFrame({
                    "segment": t.column("c_mktsegment").to_numpy(
                        zero_copy_only=False),
                    "priority": t.column("o_orderpriority").to_numpy(
                        zero_copy_only=False),
                    "n_orders": np.int64(1)})
                .groupby(["segment", "priority"], as_index=False).sum(),
                batch_format="pyarrow"),
            ["segment", "priority"], ["n_orders"])
    tot = g.groupby("segment")["n_orders"].transform("sum")
    g["seg_share6"] = (g["n_orders"].astype(np.int64) * 10**6
                       // tot.astype(np.int64))
    g = g.sort_values(["segment", "priority"]).reset_index(drop=True)
    return g.astype({"n_orders": np.int64, "seg_share6": np.int64})[
        ["segment", "priority", "n_orders", "seg_share6"]]


def q_round_value_bias(sf_dir: str):
    """Round-number bias audit: per event type, the share of values
    landing on whole units (v.000) — benford_cents' cousin for spotting
    synthetic or hand-entered pricing (organic values spread across the
    milli-digits; generated ones clump on round marks). Map-only,
    type-bounded combine, integer-floor shares."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        v3 = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return (pd.DataFrame({
            "event_type": t.column("event_type").to_numpy(
                zero_copy_only=False),
            "n": np.int64(1),
            "n_round": (v3 % 1000 == 0).astype(np.int64)})
            .groupby("event_type", as_index=False).sum())

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "n_round"])
    g = g.sort_values("event_type").reset_index(drop=True)
    g["round_share6"] = (g["n_round"].astype(np.int64) * 10**6
                         // g["n"].astype(np.int64))
    return g.astype({"n": np.int64, "n_round": np.int64,
                     "round_share6": np.int64})


def q_discount_uplift_curve(sf_dir: str):
    """Discount-band economics: per discount percent band, line count,
    quantity moved, gross vs discounted revenue (exact cents) — the
    curve a pricing review reads to see what each extra point of
    discount actually bought. Map-only over four pruned columns;
    the combine is bounded by the discount domain (11 bands)."""
    li = _pq(sf_dir, "lineitem",
             columns=["l_discount", "l_quantity", "l_extendedprice"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        disc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        qty = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        gross = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        net = gross * (100 - disc)  # cents × 100
        return (pd.DataFrame({
            "discount_pct": disc, "n_lines": np.int64(1),
            "qty": qty, "gross_cents": gross, "net_c100": net})
            .groupby("discount_pct", as_index=False).sum())

    g = _combine_partials(
        li.map_batches(partial, batch_format="pyarrow"),
        ["discount_pct"], ["n_lines", "qty", "gross_cents", "net_c100"])
    g = g.sort_values("discount_pct").reset_index(drop=True)
    g["net_cents"] = g["net_c100"].astype(np.int64) // 100
    return g.astype({c: np.int64 for c in
                     ["discount_pct", "n_lines", "qty", "gross_cents",
                      "net_cents"]})[
        ["discount_pct", "n_lines", "qty", "gross_cents", "net_cents"]]


def q_gate_length_bias(sf_dir: str):
    """Length-bias audit of the Gopher gate: keep rate by document
    length bucket (256-char bins, capped at 15) — the companion to
    gate_bias_matrix's language axis: composite gates systematically
    drop short docs (word-count floor) and the bin curve shows exactly
    where the cliff sits. Same integer flag kernel; bin-bounded
    combine."""
    from ..stages.textstats import _EN_STOP_RE, _count

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


def q_transition_lift(sf_dir: str):
    """Sequence-mining lift on the user transition matrix: for every
    (prev, next) event pair, observed transitions vs the independence
    expectation — lift6 = n·N·1e6 // (row_n·col_n), the integer-exact
    'is this sequence real or just marginals' screen that the raw
    Markov probabilities (event_transitions) can't answer. Same ONE
    user-bucket shuffle + shifted-compare kernel; the lift closes on
    the types²-bounded grid with pure integer arithmetic."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"])
    N = int(out["n"].sum())
    row = out.groupby("prev_type")["n"].transform("sum")
    col = out.groupby("next_type")["n"].transform("sum")
    out["lift6"] = [int(n) * N * 10**6 // (int(r) * int(c))
                    for n, r, c in zip(out["n"], row, col)]
    out = out.sort_values(["prev_type", "next_type"]).reset_index(
        drop=True)
    return out.astype({"n": np.int64, "lift6": np.int64})[
        ["prev_type", "next_type", "n", "lift6"]]


def q_session_conversion(sf_dir: str):
    """Session-outcome analytics: conversion rate by session size — of
    the 6-hour-gap sessions with k events, how many contain a purchase
    (the 'do longer sessions convert' curve product teams actually
    plot; sessionize alone reports shape, not outcome). ONE user-hash
    bucket shuffle; the kernel segments sessions with a shifted
    compare + cumsum (no per-session Python) and emits size-bucket
    partials (1..5, 6-10, 11+); integer-floor shares."""
    from ..stages.temporal import _with_bucket

    GAP = 21_600_000_000
    ev = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        isp = (g["event_type"].to_numpy()[order] == "purchase")
        brk = np.ones(len(u), dtype=np.int64)
        if len(u) > 1:
            brk[1:] = ((u[1:] != u[:-1])
                       | (ts[1:] - ts[:-1] > GAP)).astype(np.int64)
        sid = np.cumsum(brk) - 1
        n_sess = int(sid[-1]) + 1 if len(sid) else 0
        n = np.bincount(sid, minlength=n_sess)
        conv = np.bincount(sid[isp], minlength=n_sess) > 0
        bkt = np.where(n <= 5, n, np.where(n <= 10, 6, 7))
        return (pd.DataFrame({"size_bucket": bkt.astype(np.int64),
                              "n_sessions": np.int64(1),
                              "n_converting": conv.astype(np.int64)})
                .groupby("size_bucket", as_index=False).sum())

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["size_bucket"], ["n_sessions", "n_converting"])
    g = g.sort_values("size_bucket").reset_index(drop=True)
    g["conv_share6"] = (g["n_converting"].astype(np.int64) * 10**6
                        // g["n_sessions"].astype(np.int64))
    return g.astype({"size_bucket": np.int64, "n_sessions": np.int64,
                     "n_converting": np.int64, "conv_share6": np.int64})


def q_user_lifespan_hist(sf_dir: str):
    """User lifetime-span census: days between each user's first and
    last event, bucketed (0 same-day, 1-7, 8-30, 31-90, 91+) — the
    engagement-duration histogram behind retention_cohorts' monthly
    view. Per-batch (user → min/max ts) pre-reduce in ARROW blocks,
    one user-hash bucket groupby closes the extrema exactly, and the
    bucket kernel emits 5-cell partials."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        u, inv = np.unique(uid, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, ts)
        np.maximum.at(mx, inv, ts)
        return pa.table({
            "user_id": pa.array(u.astype(np.int64), pa.int64()),
            "mn": pa.array(mn, pa.int64()),
            "mx": pa.array(mx, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        span = ((agg["mx"].to_numpy(np.int64) // DAY)
                - (agg["mn"].to_numpy(np.int64) // DAY))
        bkt = np.select(
            [span == 0, span <= 7, span <= 30, span <= 90],
            [0, 1, 2, 3], default=4)
        return (pd.DataFrame({"span_bucket": bkt.astype(np.int64),
                              "n_users": np.int64(1)})
                .groupby("span_bucket", as_index=False).sum())

    g = _combine_partials(
        _with_bucket(ev.map_batches(pre, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["span_bucket"], ["n_users"])
    g = g.sort_values("span_bucket").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"span_bucket": np.int64, "n_users": np.int64,
                     "user_share6": np.int64})


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
    from ..stages.temporal import _with_bucket

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


def q_linenumber_contiguity(sf_dir: str):
    """Referential-integrity audit beyond fk_orphans: are each order's
    line numbers exactly 1..k (max == count == distinct)? Emits total
    orders, violating orders and the clean share — the ingestion-sanity
    check that catches dropped or doubled lines before any per-line
    aggregate is trusted. Per-batch (order → count, max, min) partials
    pre-reduce in Arrow; one order-hash bucket groupby closes exactly;
    3-integer summary."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"],
             num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = (t.column("l_linenumber").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        u, inv = np.unique(ok, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ln)
        mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, ln)
        return pa.table({
            "okey": pa.array(u.astype(np.int64), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "mx": pa.array(mx, pa.int64()),
            "mn": pa.array(mn, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("okey", as_index=False).agg(
            cnt=("cnt", "sum"), mx=("mx", "max"), mn=("mn", "min"))
        ok_flag = ((agg["mx"] == agg["cnt"]) & (agg["mn"] == 1))
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_orders": [np.int64(len(agg))],
            "n_violating": [np.int64(int((~ok_flag).sum()))]})

    g = _combine_partials(
        _with_bucket(li.map_batches(pre, batch_format="pyarrow"),
                     "okey", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_orders", "n_violating"])
    no, nv = int(g["n_orders"].sum()), int(g["n_violating"].sum())
    return pd.DataFrame({
        "n_orders": [np.int64(no)],
        "n_violating": [np.int64(nv)],
        "clean_share6": [np.int64((no - nv) * 10**6 // no if no else 0)]})


def q_compaction_plan(sf_dir: str):
    """Small-file compaction plan (the storage-maintenance op every
    streaming sink eventually needs): pack the (source × lang)
    partition cells into merge groups of ≤ 100 kB text bytes by
    next-fit-decreasing — deterministic, single-accumulator greedy, the
    same recurrence class as pack_sequences (an oversized cell keeps
    its own group; the overflowing cell OPENS the next group). Cell
    sizing is one taxonomy-bounded byte partial; the plan is driver
    arithmetic over ≤ sources × langs rows; the oracle replays the
    identical recurrence as a recursive CTE."""
    BUDGET = 100_000
    docs = _pq(sf_dir, "documents", columns=["source", "lang", "text"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({
            "source": t.column("source").to_numpy(zero_copy_only=False),
            "lang": t.column("lang").to_numpy(zero_copy_only=False),
            "bytes": pc.utf8_length(pc.fill_null(t.column("text"), ""))
            .to_numpy(zero_copy_only=False).astype(np.int64)})
            .groupby(["source", "lang"], as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "lang"], ["bytes"])
    g = g.sort_values(["bytes", "source", "lang"],
                      ascending=[False, True, True]).reset_index(drop=True)
    grp = np.zeros(len(g), dtype=np.int64)
    gid, acc = 1, 0
    for i, b in enumerate(g["bytes"].astype(int)):
        if i == 0:
            acc = b
        elif acc + b > BUDGET:
            gid += 1
            acc = b
        else:
            acc += b
        grp[i] = gid
    g["group_id"] = grp
    return g.astype({"bytes": np.int64, "group_id": np.int64})[
        ["source", "lang", "bytes", "group_id"]]


def q_politeness_schedule_audit(sf_dir: str):
    """The politeness SCHEDULE itself, oracle-gated (previously only
    golden/property-tested): per (wave, host), the scheduled request
    count, makespan and the SUM of virtual start times read back from
    the checkpoint's schedule tables. With this corpus' host configs
    the delay chain binds (P·D ≥ L), so the closed form collapses to
    start_k = k·D — the oracle recomputes n, (n−1)·D + L and
    D·n·(n−1)/2 from BFS reachability alone, so any regression in the
    scheduler's ordering, spacing or slot math breaks the hash gate.
    Streams each wave's schedule with host-bounded partials; waves are
    bounded by the BFS diameter."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    # ONE hive read of the whole schedule tree (wave is the partition
    # column; the terminal wave's empty table has no files to list)
    ds = read_dataset(os.path.join(ckpt, "schedule"),
                      columns=["url", "sched_start_ms", "sched_end_ms",
                               "wave"])

    def partial(t: pa.Table) -> pd.DataFrame:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        host = np.array([u.split("://", 1)[1].split("/", 1)[0]
                         for u in urls], dtype=object)
        return (pd.DataFrame({
            "wave": t.column("wave").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "host": host,
            "n_scheduled": np.int64(1),
            "sum_start_ms": t.column("sched_start_ms").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "max_end_ms": t.column("sched_end_ms").to_numpy(
                zero_copy_only=False).astype(np.int64)})
            .groupby(["wave", "host"], as_index=False)
            .agg(n_scheduled=("n_scheduled", "sum"),
                 sum_start_ms=("sum_start_ms", "sum"),
                 max_end_ms=("max_end_ms", "max")))

    # ONE (wave × host)-bounded gather closes sums AND the max
    # (max does not SUM-combine through _combine_partials)
    parts = pd.concat(
        list(ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    g = (parts.groupby(["wave", "host"], as_index=False)
         .agg(n_scheduled=("n_scheduled", "sum"),
              sum_start_ms=("sum_start_ms", "sum"),
              max_end_ms=("max_end_ms", "max")))
    g = g.sort_values(["wave", "host"]).reset_index(drop=True)
    return g.astype({"wave": np.int64, "n_scheduled": np.int64,
                     "sum_start_ms": np.int64, "max_end_ms": np.int64})[
        ["wave", "host", "n_scheduled", "sum_start_ms", "max_end_ms"]]


def q_crawl_order_audit(sf_dir: str):
    """The global crawl ORDER (O1) itself, oracle-gated: per (wave,
    host), the count, MINIMUM and SUM of the checkpoint schedule's
    global ``seq`` ranks. Because the frontier's total order is (wave,
    priority, host, url) and each wave carries a single priority class
    on this corpus, every (wave, host) owns one CONTIGUOUS seq block —
    so the oracle reconstructs min = running base and sum = n·base +
    n(n−1)/2 from BFS counts alone, and any reordering anywhere in the
    frontier pipeline (sort keys, seq offsets, salting) breaks the
    hash gate. Same host-bounded per-wave gathers as
    politeness_schedule_audit."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    ds = read_dataset(os.path.join(ckpt, "schedule"),
                      columns=["url", "seq", "wave"])

    def partial(t: pa.Table) -> pd.DataFrame:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        host = np.array([u.split("://", 1)[1].split("/", 1)[0]
                         for u in urls], dtype=object)
        seq = (t.column("seq").to_numpy(zero_copy_only=False)
               .astype(np.int64))
        return (pd.DataFrame({
            "wave": t.column("wave").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "host": host,
            "n_urls": np.int64(1), "min_seq": seq, "sum_seq": seq})
            .groupby(["wave", "host"], as_index=False)
            .agg(n_urls=("n_urls", "sum"), min_seq=("min_seq", "min"),
                 sum_seq=("sum_seq", "sum")))

    parts = pd.concat(
        list(ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    g = (parts.groupby(["wave", "host"], as_index=False)
         .agg(n_urls=("n_urls", "sum"),
              min_seq=("min_seq", "min"),
              sum_seq=("sum_seq", "sum")))
    g = g.sort_values(["wave", "host"]).reset_index(drop=True)
    return g.astype({"wave": np.int64, "n_urls": np.int64,
                     "min_seq": np.int64, "sum_seq": np.int64})[
        ["wave", "host", "n_urls", "min_seq", "sum_seq"]]


def q_crawl_manifest_audit(sf_dir: str):
    """The crawl's RECORDED per-wave metrics (T7/A1 — the manifest's
    admitted/scheduled counters, the engine's replacement for the
    reference's mutex-guarded visitsCount, scraper.go:40-46) gated
    against BFS truth: every wave's counters must equal the
    first-reach census, and the terminal wave must record zero. A
    counter drifting from the data it describes is the classic silent
    metrics bug; this makes it a hash-gate failure."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    man = CheckpointStore(ckpt).load_manifest()
    rows = sorted(
        (int(w), int(s["admitted"]), int(s["scheduled"]))
        for w, s in man["wave_stats"].items())
    return pd.DataFrame(
        [{"wave": w, "admitted": a, "scheduled": s} for w, a, s in rows]
    ).astype({"wave": np.int64, "admitted": np.int64,
              "scheduled": np.int64})


def q_seen_shard_audit(sf_dir: str):
    """The PERSISTED URL-seen state (the cuckoo shard snapshots a
    resume actually restores, S7/T1) gated against BFS truth: the
    final wave's shard files deserialize and their key counts must sum
    to exactly the reached-page census — so a snapshot that lost or
    duplicated keys (the resume-correctness failure mode) breaks the
    hash gate, not just the kill/resume integration test."""
    from ..state.cuckoo import CuckooFilter

    ckpt = _derived_crawl_ckpt(sf_dir)
    import glob as _glob

    man = CheckpointStore(ckpt).load_manifest()
    final = max(man["committed_waves"])
    paths = sorted(_glob.glob(
        os.path.join(ckpt, "urlseen", f"wave={final}", "shard=*.bin")))
    counts = [CuckooFilter.restore(open(p, "rb").read()).count
              for p in paths]
    return pd.DataFrame({
        "n_shards": [np.int64(len(counts))],
        "n_seen": [np.int64(int(sum(counts)))]})


def q_lineage_audit(sf_dir: str):
    """Fetch-lineage integrity (S6/M13): per wave, how many checkpoint
    rows carry a req_id equal to md5 of their OWN stored url — the
    reference's request-identity contract
    (/root/reference/pkg/scraper/scraper.go:112), recomputed from the
    data rather than trusted. The oracle demands every row pass, so a
    lineage writer that drifted from the id function (or a corrupted
    checkpoint column) fails the hash gate. Zero-copy md5 over the url
    column; depth-bounded combine."""
    from ..functions.urls import md5_hex_arrow

    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["url", "req_id", "depth"])

    def partial(t: pa.Table) -> pd.DataFrame:
        want = np.asarray(md5_hex_arrow(t.column("url")), dtype=object)
        got = t.column("req_id").to_numpy(zero_copy_only=False)
        return (pd.DataFrame({
            "wave": t.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_rows": np.int64(1),
            "n_req_id_ok": (want == got).astype(np.int64)})
            .groupby("wave", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["wave"], ["n_rows", "n_req_id_ok"])
    g = g.sort_values("wave").reset_index(drop=True)
    return g.astype({"wave": np.int64, "n_rows": np.int64,
                     "n_req_id_ok": np.int64})


def q_quarantine_audit(sf_dir: str):
    """The captcha-quarantine STORE itself (S8), gated per wave: the
    sidecar's quarantine tables must hold exactly the BFS captcha
    census (doc_id % 37 = 3 among that wave's first-reach set) — so a
    sidecar regression that drops or duplicates quarantine rows fails
    the hash gate, independent of the docs-table span view
    (captcha_rate_by_wave). Reads each wave's quarantine table;
    host-bounded gathers; empty waves contribute zero rows on both
    sides."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    ds = read_dataset(os.path.join(ckpt, "quarantine"),
                      columns=["req_id", "wave"])

    def partial(t: pa.Table) -> pd.DataFrame:
        return (pd.DataFrame({
            "wave": t.column("wave").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_quarantined": np.int64(1)})
            .groupby("wave", as_index=False).sum())

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["wave"], ["n_quarantined"])
    g = g[g["n_quarantined"] > 0].sort_values("wave").reset_index(
        drop=True)
    return g.astype({"wave": np.int64, "n_quarantined": np.int64})


def q_order_total_consistency(sf_dir: str):
    """Warehouse reconciliation: does o_totalprice equal the
    lineitem-derived total Σ extendedprice·(1−discount)·(1+tax)? Emits
    how many orders match to the cent and the mean absolute delta —
    the financial-integrity audit run before any revenue report, with
    whatever the data's truth is (both engines compute the identical
    fixed-point expression, so the gate holds regardless of whether
    the synthesis maintains the invariant). Per-order cent sums
    pre-reduce in Arrow through one order-hash bucket groupby; the
    order header attaches via the broadcast path with the hash-join
    fallback; 3-integer close."""
    from ..stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount",
                      "l_tax"],
             num_blocks=_n_cpus())
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"],
                 num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        ok = (t.column("l_orderkey").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        ep = np.rint(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        dc = np.rint(t.column("l_discount").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        tx = np.rint(t.column("l_tax").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        # cents × 10^4: ep·(100−d)·(100+t)
        val = ep * (100 - dc) * (100 + tx)
        u, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, val)
        return pa.table({"okey": pa.array(u, pa.int64()),
                         "s4": pa.array(s, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("okey", as_index=False)["s4"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    per_order = (_with_bucket(li.map_batches(pre, batch_format="pyarrow"),
                              "okey", 32)
                 .groupby("__bucket")
                 .map_groups(kernel, batch_format="pandas"))
    attached = _broadcast_fact_attach(
        per_order,
        orders.map_batches(
            lambda t: pa.table({
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "tc": pa.array(np.rint(
                    t.column("o_totalprice").to_numpy(
                        zero_copy_only=False) * 100).astype(np.int64),
                    pa.int64())}),
            batch_format="pyarrow"),
        "okey", "o_orderkey", ["tc"])
    if attached is None:  # pragma: no cover - orders past the cap
        attached = per_order.join(
            orders, join_type="inner",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "orders")),
            on=("okey",), right_on=("o_orderkey",)).map_batches(
            lambda t: t.append_column(
                "tc", pa.array(np.rint(
                    t.column("o_totalprice").to_numpy(
                        zero_copy_only=False) * 100).astype(np.int64),
                    pa.int64())),
            batch_format="pyarrow")

    def partial(t: pa.Table) -> pd.DataFrame:
        # derived total back to cents with half-away rounding of the
        # ×10^4 fixed-point sum: (s4 + 5000) // 10000
        s4 = t.column("s4").to_numpy(zero_copy_only=False)
        tc = t.column("tc").to_numpy(zero_copy_only=False)
        derived = (s4 + 5000) // 10000
        delta = np.abs(derived - tc)
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_orders": [np.int64(len(s4))],
            "n_exact": [np.int64(int((delta == 0).sum()))],
            "sum_abs_delta": [np.int64(int(delta.sum()))]})

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["k"], ["n_orders", "n_exact", "sum_abs_delta"])
    no = int(g["n_orders"].sum())
    ne = int(g["n_exact"].sum())
    sd = int(g["sum_abs_delta"].sum())
    return pd.DataFrame({
        "n_orders": [np.int64(no)], "n_exact": [np.int64(ne)],
        "exact_share6": [np.int64(ne * 10**6 // no if no else 0)],
        "mean_abs_delta_cents6": [np.int64(sd * 10**6 // no
                                           if no else 0)]})


def q_rich_club(sf_dir: str):
    """Rich-club connectivity of the link graph: for degree thresholds
    k ∈ {8, 10, 12}, the edge density among pages whose total degree
    exceeds k — a rising φ(k) means the hub pages preferentially link
    to EACH OTHER (the web's rich-club effect), which matters for
    crawl scheduling because hub-to-hub links keep re-feeding the
    frontier's hot set. Degrees come from the distributed degree
    table; each club broadcasts as a sorted id array into ONE edge
    scan that counts all three clubs' internal edges per batch
    (club-bounded combine); densities close as ×1e6 integer floors
    over the directed ordered-pair count."""
    from ..stages.graph import degree_table, edges_dataset

    KS = [8, 10, 12]
    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    deg = degree_table(docs, n=n, num_partitions=parts).to_pandas()
    tot = (deg["in_degree"].to_numpy(np.int64)
           + deg["out_degree"].to_numpy(np.int64))
    ids = deg["doc_id"].to_numpy(np.int64)
    clubs = {k: np.sort(ids[tot > k]) for k in KS}
    cref = ray.put(clubs)

    def partial(t: pa.Table) -> pd.DataFrame:
        cl = ray.get(cref)
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        rows = []
        for k, members in cl.items():
            sh, _ = _sorted_lookup(members, src)
            dh, _ = _sorted_lookup(members, dst)
            rows.append({"k": np.int64(k),
                         "n_edges": np.int64(
                             int((sh & dh & (src != dst)).sum()))})
        return pd.DataFrame(rows)

    edges = edges_dataset(_pq(sf_dir, "documents", columns=["doc_id"],
                              num_blocks=parts), n)
    g = _combine_partials(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["k"], ["n_edges"])
    out = []
    for k in KS:
        m = int(len(clubs[k]))
        e = int(g.loc[g["k"] == k, "n_edges"].sum()) if len(g) else 0
        poss = m * (m - 1)
        out.append({"k": k, "n_nodes": m, "n_edges": e,
                    "density6": e * 10**6 // poss if poss else 0})
    return pd.DataFrame(out, columns=["k", "n_nodes", "n_edges",
                                      "density6"]).astype(
        {c: np.int64 for c in ["k", "n_nodes", "n_edges", "density6"]})


def q_markov_entropy(sf_dir: str):
    """Behavioral predictability: the conditional entropy H(next|prev)
    of the user event-transition process in bits — the single number
    that says how far any next-event predictor can possibly get
    (transition_lift shows WHICH pairs deviate; this is how much
    structure there is at all). Same one-shuffle transition grid; the
    entropy closes on the driver over ≤ types² cells with round-6
    doubles (identical operand expressions on both sides, the
    hour_entropy convention)."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"])
    N = int(out["n"].sum())
    row = out.groupby("prev_type")["n"].transform("sum")
    p_joint = out["n"].to_numpy(np.float64) / float(N)
    p_cond = out["n"].to_numpy(np.float64) / row.to_numpy(np.float64)
    h = float(-(p_joint * np.log2(p_cond)).sum())
    return pd.DataFrame({
        "n_transitions": [np.int64(N)],
        "h_cond_bits": [round_half_away(np.array([h]), 6)[0]]})


def q_media_decode_batches(sf_dir: str):
    """Decode-pool work plan for the media corpus: group media items
    into codec-HOMOGENEOUS batches of 64 (per md5-derived format, in
    doc order) with per-batch payload byte totals — the actor-pool
    input manifest that keeps one decoder hot per batch and bounds
    per-task object-store bytes. One groupby per format (3 codec
    groups; the in-group plan is the same sequential recurrence class
    as pack_sequences — md5-shard the ids for wider parallelism at
    scale); bin-bounded output."""
    from ..functions.urls import md5_hex_arrow

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


def q_purchase_growth(sf_dir: str):
    """Basket-growth screen: among users with ≥ 2 purchases, how many
    spent MORE on their second purchase than their first (ties split
    out) — the early-lifecycle expansion signal ltv_cohorts aggregates
    away. One user-bucket shuffle; the kernel lexsorts (user, ts, id),
    takes each user's first two purchases by position, and compares
    exact milli-unit values; 4-integer close."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type", "value"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({
            "event_id": pc.cast(t2.column("event_id"), pa.int64()),
            "user_id": pc.cast(t2.column("user_id"), pa.int64()),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "v3": pa.array(np.rint(
                t2.column("value").to_numpy(zero_copy_only=False)
                * 1000).astype(np.int64), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].to_numpy(np.int64),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        v = g["v3"].to_numpy(np.int64)[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(u)))
        two = starts[lens >= 2]
        v1, v2 = v[two], v[two + 1]
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_repeat_buyers": [np.int64(len(two))],
            "n_grew": [np.int64(int((v2 > v1).sum()))],
            "n_tied": [np.int64(int((v2 == v1).sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_repeat_buyers", "n_grew", "n_tied"])
    nr = int(g["n_repeat_buyers"].sum())
    ngrew = int(g["n_grew"].sum())
    nt = int(g["n_tied"].sum())
    return pd.DataFrame({
        "n_repeat_buyers": [np.int64(nr)],
        "n_grew": [np.int64(ngrew)], "n_tied": [np.int64(nt)],
        "grew_share6": [np.int64(ngrew * 10**6 // nr if nr else 0)]})


def q_activity_spikes(sf_dir: str):
    """Burst shortlist: the 20 hottest (user, day) cells by event count
    (ties to smaller user then earlier day) — the review queue a
    rate-limit/abuse screen opens first, complementing burstiness'
    per-user dispersion score with the actual incidents. Per-batch
    (user, day) pre-reduce, one pair-bucket groupby makes counts
    exact, per-block partial top-20 bounds the gather to blocks × 20."""
    from ..stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "day": pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY,
            "n": np.int64(1)})
            .groupby(["user_id", "day"], as_index=False).sum())
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            "day": pa.array(df["day"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "__key": pa.array(
                df["user_id"].to_numpy(np.int64) * 100003
                + df["day"].to_numpy(np.int64), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["user_id", "day"], as_index=False)["n"].sum())
        top = agg.sort_values(["n", "user_id", "day"],
                              ascending=[False, True, True]).head(20)
        return top

    parts = pd.concat(
        list(_with_bucket(ev.map_batches(pre, batch_format="pyarrow"),
                          "__key", 32)
             .groupby("__bucket").map_groups(kernel,
                                             batch_format="pandas")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    out = parts.sort_values(["n", "user_id", "day"],
                            ascending=[False, True, True]).head(20)
    return out.reset_index(drop=True).astype(
        {"user_id": np.int64, "day": np.int64, "n": np.int64})[
        ["user_id", "day", "n"]]


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


def q_same_day_orders(sf_dir: str):
    """Same-day multi-order share: how many (customer, day) cells hold
    more than one order — the order-side duplicate/split-basket screen
    (dup_purchase_audit's cousin on the transactional table). One
    cell-bounded pre-reduce + pair-bucket groupby; 3-integer close."""
    from ..stages.temporal import _with_bucket

    orders = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
                 num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        day = d.astype("datetime64[D]").astype(np.int64)
        df = (pd.DataFrame({
            "ck": t.column("o_custkey").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "day": day, "n": np.int64(1)})
            .groupby(["ck", "day"], as_index=False).sum())
        return pa.table({
            "ck": pa.array(df["ck"].to_numpy(np.int64)),
            "day": pa.array(df["day"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "__key": pa.array(df["ck"].to_numpy(np.int64) * 100003
                              + df["day"].to_numpy(np.int64), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["ck", "day"], as_index=False)["n"].sum()
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_cells": [np.int64(len(agg))],
            "n_multi": [np.int64(int((agg["n"] >= 2).sum()))]})

    g = _combine_partials(
        _with_bucket(orders.map_batches(pre, batch_format="pyarrow"),
                     "__key", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_cells", "n_multi"])
    nc = int(g["n_cells"].sum())
    nm = int(g["n_multi"].sum())
    return pd.DataFrame({
        "n_cust_days": [np.int64(nc)], "n_multi": [np.int64(nm)],
        "multi_share6": [np.int64(nm * 10**6 // nc if nc else 0)]})


def q_value_sorted_head(sf_dir: str):
    """Ray Data's NATIVE global sort exercised end to end: the 20
    smallest (value, event_id) events via ``Dataset.sort(...).limit()``
    — the range-shuffle all-to-all every "ORDER BY ... LIMIT" becomes
    when the data no longer fits one node (the partial-top-k kernels
    elsewhere avoid it; this query deliberately takes the native path
    so the operator itself stays under the hash gate). Milli-unit
    integer sort keys; the unique event_id pins total order."""
    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "value"],
             num_blocks=_n_cpus())

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "v3": pa.array(np.rint(
                t.column("value").to_numpy(zero_copy_only=False)
                * 1000).astype(np.int64), pa.int64())})

    out = (ev.map_batches(keyed, batch_format="pyarrow")
           .sort(["v3", "event_id"]).limit(20).to_pandas())
    return out.astype({"event_id": np.int64, "v3": np.int64})[
        ["event_id", "v3"]]


def q_native_group_aggs(sf_dir: str):
    """Ray Data's NATIVE grouped multi-aggregate path (``groupby(...)
    .aggregate(Count, Sum, Min, Max)``) under the hash gate — the
    repo's hand-rolled partial combines exist for plans Ray's
    aggregate can't express (exact quantiles, sketches, fused stats);
    this query pins the native operator itself, on exact milli-unit
    integers, so a Ray upgrade that changes aggregate semantics or
    null handling is caught by the gate and not by a silent drift."""
    import ray.data.aggregate as agg

    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "v3": pa.array(np.rint(
                t.column("value").to_numpy(zero_copy_only=False)
                * 1000).astype(np.int64), pa.int64())})

    out = (ev.map_batches(keyed, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(agg.Count(alias_name="n_events"),
                      agg.Sum("v3", alias_name="sum3"),
                      agg.Min("v3", alias_name="min3"),
                      agg.Max("v3", alias_name="max3"))
           .to_pandas())
    out = out.sort_values("event_type").reset_index(drop=True)
    return out.astype({"n_events": np.int64, "sum3": np.int64,
                       "min3": np.int64, "max3": np.int64})[
        ["event_type", "n_events", "sum3", "min3", "max3"]]


def q_native_unique(sf_dir: str):
    """``Dataset.unique`` — the last native wide op without its own
    gate (sort/limit, groupby-aggregate and the joins have theirs):
    the distinct event-type domain via Ray's native distinct, returned
    sorted. Trivial output, deliberate coverage: SURVEY §2's contract
    maps DISTINCT to this operator, so it stays pinned across Ray
    upgrades."""
    ev = _pq(sf_dir, "events", columns=["event_type"],
             num_blocks=_n_cpus())
    vals = sorted(ev.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


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
    from ..stages.dedup import _candidate_shingle_sets, containment_join

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


def q_span_ref_integrity(sf_dir: str):
    """media_ref integrity over the interleaved payload: per span
    kind, how many spans carry a non-empty ref and how many of those
    parse as well-formed https URLs — the payload-contract audit for
    the `spans: list<struct<kind,text,media_ref,offset>>` schema (the
    input_hint's one typed side-channel): media and link spans must
    ALL carry valid refs, every other kind none. Zero-copy explode +
    one vectorized prefix check; kind-bounded combine."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"), columns=["spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        if not len(flat):
            return pd.DataFrame({
                "kind": pd.Series([], dtype=str),
                "n_spans": pd.Series([], dtype=np.int64),
                "n_with_ref": pd.Series([], dtype=np.int64),
                "n_ref_valid": pd.Series([], dtype=np.int64)})
        refs = flat.field("media_ref")
        nonempty = pc.not_equal(pc.fill_null(refs, ""), "")
        valid = pc.and_(nonempty, pc.starts_with(
            pc.fill_null(refs, ""), "https://"))
        return (pd.DataFrame({
            "kind": flat.field("kind").to_numpy(zero_copy_only=False),
            "n_spans": np.int64(1),
            "n_with_ref": nonempty.to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_ref_valid": valid.to_numpy(zero_copy_only=False)
            .astype(np.int64)})
            .groupby("kind", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["kind"], ["n_spans", "n_with_ref", "n_ref_valid"])
    g = g.sort_values("kind").reset_index(drop=True)
    return g.astype({"n_spans": np.int64, "n_with_ref": np.int64,
                     "n_ref_valid": np.int64})


def q_wave_bytes(sf_dir: str):
    """Crawl bandwidth curve: total text codepoints fetched per BFS
    wave (all spans of every page first fetched that wave) — the
    ingest-volume number a capacity plan reads next to wave_branching's
    page counts (pages and bytes diverge when captcha walls or short
    pages cluster in a wave). Zero-copy spans explode; depth-bounded
    combine; the oracle rebuilds every synthesis length formula per
    wave."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["depth", "spans"])

    def partial(t: pa.Table) -> pd.DataFrame:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), n_spans)
        depth = (t.column("depth").to_numpy(zero_copy_only=False)
                 .astype(np.int64))
        if len(flat):
            chars = pc.utf8_length(flat.field("text")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            per_row = np.bincount(row_of, weights=chars,
                                  minlength=len(t)).astype(np.int64)
        else:
            per_row = np.zeros(len(t), dtype=np.int64)
        return (pd.DataFrame({"wave": depth, "n_pages": np.int64(1),
                              "sum_chars": per_row})
                .groupby("wave", as_index=False).sum())

    g = _combine_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["wave"], ["n_pages", "sum_chars"])
    g = g.sort_values("wave").reset_index(drop=True)
    return g.astype({"wave": np.int64, "n_pages": np.int64,
                     "sum_chars": np.int64})


def q_crawl_critical_path(sf_dir: str):
    """The politeness-bound crawl duration model: per wave, the
    makespan (slowest host's last virtual end time) and WHICH host is
    the bottleneck (ties to the smaller host name) — the critical-path
    view that says where raising max_parallel or splitting a host
    would actually shorten the crawl, plus the total across waves.
    Same single hive scan as politeness_schedule_audit; per-wave
    argmax over the host-bounded grid."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    ds = read_dataset(os.path.join(ckpt, "schedule"),
                      columns=["url", "sched_end_ms", "wave"])

    def partial(t: pa.Table) -> pd.DataFrame:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        host = np.array([u.split("://", 1)[1].split("/", 1)[0]
                         for u in urls], dtype=object)
        return (pd.DataFrame({
            "wave": t.column("wave").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "host": host,
            "end_ms": t.column("sched_end_ms").to_numpy(
                zero_copy_only=False).astype(np.int64)})
            .groupby(["wave", "host"], as_index=False)["end_ms"].max())

    parts = pd.concat(
        list(ds.map_batches(partial, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    g = parts.groupby(["wave", "host"], as_index=False)["end_ms"].max()
    g = g.sort_values(["wave", "end_ms", "host"],
                      ascending=[True, False, True])
    top = g.groupby("wave", as_index=False).first().rename(
        columns={"host": "bottleneck_host", "end_ms": "makespan_ms"})
    top = top.sort_values("wave").reset_index(drop=True)
    return top.astype({"wave": np.int64, "makespan_ms": np.int64})[
        ["wave", "bottleneck_host", "makespan_ms"]]


def q_refetch_tiers(sf_dir: str):
    """Recrawl freshness tiering: split pages into three refetch tiers
    by link in-degree terciles (rank cuts at n/3 and 2n/3 over the
    (in_degree, node) order — the authority-based schedule where hub
    pages refresh daily and leaves monthly). The in-degree histogram
    is DOMAIN-bounded (fan-in ≤ a few dozen on any web-shaped graph),
    so the tercile thresholds close exactly from bounded count
    partials — no global sort; the tier census is a second pass over
    the same histogram."""
    from ..stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)

    def partial(t: pa.Table) -> pd.DataFrame:
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        vc = pd.Series(dst).value_counts()
        return pd.DataFrame({"node": vc.index.to_numpy(np.int64),
                             "ind": vc.to_numpy(np.int64)})

    per_node = _combine_partials(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["node"], ["ind"])
    # zero-in-degree pages exist too (n nodes total)
    n_zero = n - len(per_node)
    hist = per_node.groupby("ind").size().to_dict()
    if n_zero:
        hist[0] = hist.get(0, 0) + n_zero
    # rank cuts over (in_degree asc) order
    cut1, cut2 = n // 3, 2 * n // 3
    rows = []
    cum = 0
    tier_of_ind = {}
    for ind in sorted(hist):
        lo_rank = cum
        cum += hist[ind]
        tier_of_ind[ind] = (2 if lo_rank < cut1
                            else (1 if lo_rank < cut2 else 0))
    # tier 0 = hubs (highest in-degree block), 2 = leaves
    cen: dict = {}
    for ind, c in hist.items():
        t_ = tier_of_ind[ind]
        d = cen.setdefault(t_, [0, None, None])
        d[0] += c
        d[1] = ind if d[1] is None else min(d[1], ind)
        d[2] = ind if d[2] is None else max(d[2], ind)
    for t_ in sorted(cen):
        c, mn, mx = cen[t_]
        rows.append({"tier": t_, "n_pages": c,
                     "min_indegree": mn, "max_indegree": mx})
    return pd.DataFrame(rows).astype(
        {c: np.int64 for c in ["tier", "n_pages", "min_indegree",
                               "max_indegree"]})


def q_top_discoverers(sf_dir: str):
    """Discovery attribution: the 20 pages whose out-links pointed at
    the most NEXT-wave pages (edges with dst first fetched exactly one
    wave after src) — the 'productive hub' list a seed-selection pass
    reads (link_degrees counts all links; this counts only the ones
    that actually grew the frontier). Same packed edge stream + depth
    attach as link_wave_locality; per-src partials pre-reduce per
    batch and the shortlist closes by partial top-k."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    docs = read_dataset(os.path.join(ckpt, "docs"),
                        columns=["url", "depth", "spans"])

    def _ids_of(urls: np.ndarray) -> np.ndarray:
        return np.array([int(u[-13:]) - 10**12 for u in urls],
                        dtype=np.int64)

    def edge_rows(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        n_spans = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(len(t), dtype=np.int64), n_spans)
        if len(flat):
            is_link = pc.equal(flat.field("kind"), "link").to_numpy(
                zero_copy_only=False)
            refs = flat.field("media_ref").to_numpy(
                zero_copy_only=False)[is_link]
            rows = row_of[is_link]
        else:
            refs = np.array([], dtype=object)
            rows = np.array([], dtype=np.int64)
        src = _ids_of(t.column("url").to_numpy(
            zero_copy_only=False))[rows]
        sd = (t.column("depth").to_numpy(zero_copy_only=False)
              .astype(np.int64))[rows]
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "src_depth": pa.array(sd, pa.int64()),
            "dst_id": pa.array(_ids_of(refs), pa.int64())})

    def depth_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(_ids_of(urls), pa.int64()),
            "dst_depth": pc.cast(t.column("depth"), pa.int64())})

    edges = docs.map_batches(edge_rows, batch_format="pyarrow")
    depth_ds = docs.map_batches(depth_rows, batch_format="pyarrow")
    attached = _broadcast_fact_attach(edges, depth_ds, "dst_id",
                                      "doc_id", ["dst_depth"])
    if attached is None:  # pragma: no cover - node map past the cap
        attached = edges.join(
            depth_ds, join_type="inner",
            num_partitions=_shuffle_partitions(
                _row_count(sf_dir, "documents")),
            on=("dst_id",), right_on=("doc_id",))

    def partial(t: pa.Table) -> pd.DataFrame:
        src = t.column("src").to_numpy(zero_copy_only=False)
        sd = t.column("src_depth").to_numpy(zero_copy_only=False)
        dd = t.column("dst_depth").to_numpy(zero_copy_only=False)
        m = dd == sd + 1
        vc = pd.Series(src[m]).value_counts()
        return pd.DataFrame({"src": vc.index.to_numpy(np.int64),
                             "n_discovered": vc.to_numpy(np.int64)})

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["src"], ["n_discovered"])
    g = g.sort_values(["n_discovered", "src"],
                      ascending=[False, True]).head(20).reset_index(
        drop=True)
    return g.astype({"src": np.int64, "n_discovered": np.int64})


def q_seed_coverage(sf_dir: str):
    """Seed-robustness census: how much of the crawl's reach survives
    if seed 1 is lost — pages reachable from seed 0 alone vs the
    two-seed crawl, and the at-risk share (the number that justifies
    seed diversity before a domain migration kills a seed URL).
    Reuses the BFS-distance sweep from seed 0 (bfs_distances' plan)
    and the crawl checkpoint's census for the two-seed reach;
    3-integer close."""
    dist = q_bfs_distances(sf_dir)
    if isinstance(dist, rd.Dataset):  # pragma: no cover
        dist = dist.to_pandas()
    n_seed0 = int((dist["dist"].to_numpy() >= 0).sum())

    ckpt = _derived_crawl_ckpt(sf_dir)
    from ..sources.tables import read_dataset

    n_both = read_dataset(os.path.join(ckpt, "docs"),
                          columns=["depth"]).count()
    at_risk = n_both - n_seed0
    return pd.DataFrame({
        "n_reach_both": [np.int64(n_both)],
        "n_reach_seed0": [np.int64(n_seed0)],
        "n_at_risk": [np.int64(at_risk)],
        "at_risk_share6": [np.int64(at_risk * 10**6 // n_both
                                    if n_both else 0)]})


def q_canonical_collisions(sf_dir: str):
    """Frontier inflation from URL spelling variants: over the messy
    fixture, how many RAW spellings collapse to the same canonical
    form after normalization — the quantified version of the problem
    url_normalize exists to solve (one page entering the URL-seen set
    under several spellings burns seen-set memory AND politeness
    budget). The distinct count runs through the exact pair-bucket
    plane (stages/aggregates.count_distinct); 3-integer close."""
    from ..functions.urls import normalize_urls
    from ..stages.aggregates import count_distinct

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


def q_order_status_mix(sf_dir: str):
    """Order-status composition by order year: per (year, status),
    order count and within-year share — the fulfilment-state census
    over time (a rising year-over-year open share is the backlog
    alarm backlog_aging details). One (year × status)-bounded
    partial; integer-floor shares."""
    orders = _pq(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus"],
                 num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        yr = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return (pd.DataFrame({
            "year": yr,
            "status": t.column("o_orderstatus").to_numpy(
                zero_copy_only=False),
            "n_orders": np.int64(1)})
            .groupby(["year", "status"], as_index=False).sum())

    g = _combine_partials(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["year", "status"], ["n_orders"])
    tot = g.groupby("year")["n_orders"].transform("sum")
    g["year_share6"] = (g["n_orders"].astype(np.int64) * 10**6
                        // tot.astype(np.int64))
    g = g.sort_values(["year", "status"]).reset_index(drop=True)
    return g.astype({"year": np.int64, "n_orders": np.int64,
                     "year_share6": np.int64})[
        ["year", "status", "n_orders", "year_share6"]]


def q_doc_length_quantiles(sf_dir: str):
    """Per-language document-length norms: exact p50/p90 of n_chars
    per lang (quantile_cont semantics) — the length-prior a curation
    pass consults before setting per-language truncation or minimum
    thresholds (gate_length_bias shows the gate's length cliff; this
    shows where each language's mass actually sits). Same one-shuffle
    multi-key segment kernel as group_quantiles."""
    from ..stages.aggregates import group_quantiles

    docs = _pq(sf_dir, "documents", columns=["lang", "n_chars"],
               num_blocks=_n_cpus())
    out = group_quantiles(docs, key_col="lang", value_col="n_chars",
                          qs=(0.5, 0.9))
    if isinstance(out, rd.Dataset):
        out = out.to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def q_supplier_balance_profile(sf_dir: str):
    """Supplier financial-health census per nation: count, exact mean
    account balance (micro-units) and the in-debt share — the
    counterparty-risk screen next to supplier_hhi's concentration
    number. One nation-bounded partial; integer-floor means and
    shares (balances lift to cents; negatives floor toward −∞
    identically on both sides via HUGEINT // on the oracle)."""
    sup = _pq(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"],
              num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.rint(t.column("s_acctbal").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return (pd.DataFrame({
            "nation": t.column("s_nationkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_suppliers": np.int64(1),
            "cents": cents,
            "n_debt": (cents < 0).astype(np.int64)})
            .groupby("nation", as_index=False).sum())

    g = _combine_partials(
        sup.map_batches(partial, batch_format="pyarrow"),
        ["nation"], ["n_suppliers", "cents", "n_debt"])
    g = g.sort_values("nation").reset_index(drop=True)
    # DuckDB integer // TRUNCATES toward zero on negatives (Python
    # floors) — match DuckDB explicitly so an in-debt nation total
    # cannot flake the gate
    def _tdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    mean6 = [_tdiv(int(c) * 10**4, int(n))
             for c, n in zip(g["cents"], g["n_suppliers"])]
    g["mean6"] = np.array(mean6, dtype=np.int64)
    g["debt_share6"] = (g["n_debt"].astype(np.int64) * 10**6
                        // g["n_suppliers"].astype(np.int64))
    return g.astype({"nation": np.int64, "n_suppliers": np.int64,
                     "n_debt": np.int64})[
        ["nation", "n_suppliers", "mean6", "n_debt", "debt_share6"]]


def q_entry_event_mix(sf_dir: str):
    """Entry-point mix: each user's FIRST event type (pinned (ts,
    event_id) order) as a census with shares — the acquisition-surface
    view user_paths' full journeys bury (what share of users enter
    through a view vs a search vs a direct purchase). One user-bucket
    shuffle; first-of-segment kernel; type-bounded combine."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        vc = pd.Series(et[first]).value_counts()
        return pd.DataFrame({"entry_type": vc.index.to_numpy(object),
                             "n_users": vc.to_numpy(np.int64)})

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["entry_type"], ["n_users"])
    g = g.sort_values("entry_type").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n_users": np.int64, "user_share6": np.int64})


def q_exit_event_mix(sf_dir: str):
    """Exit-point mix: each user's LAST event type — entry_event_mix's
    churn-side mirror (a corpus whose journeys end on views, not
    purchases, has a conversion leak; one that ends on purchases has
    healthy session closure). Same kernel, last-of-segment."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        vc = pd.Series(et[last]).value_counts()
        return pd.DataFrame({"exit_type": vc.index.to_numpy(object),
                             "n_users": vc.to_numpy(np.int64)})

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["exit_type"], ["n_users"])
    g = g.sort_values("exit_type").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n_users": np.int64, "user_share6": np.int64})


def q_value_by_entry_type(sf_dir: str):
    """Acquisition-surface value: users grouped by their ENTRY event
    type, with each group's purchase-value total and exact mean per
    user — the census that prices an acquisition channel
    (entry_event_mix counts heads; this weighs wallets). One bucket
    kernel computes first-type AND per-user purchase milli-sums in the
    same pass; type-bounded combine; integer-floor means."""
    from ..stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type",
                      "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        v3 = np.rint(g["value"].to_numpy(np.float64)[order]
                     * 1000).astype(np.int64)
        isp = et == "purchase"
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        seg = np.cumsum(first) - 1
        n_seg = int(seg[-1]) + 1 if len(seg) else 0
        psum = np.zeros(n_seg, dtype=np.int64)
        np.add.at(psum, seg[isp], v3[isp])
        df = pd.DataFrame({"entry_type": et[first],
                           "n_users": np.int64(1), "sum3": psum})
        return df.groupby("entry_type", as_index=False).sum()

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["entry_type"], ["n_users", "sum3"])
    g = g.sort_values("entry_type").reset_index(drop=True)
    g["mean_per_user6"] = (g["sum3"].astype(np.int64) * 1000
                           // g["n_users"].astype(np.int64))
    return g.astype({"n_users": np.int64, "sum3": np.int64,
                     "mean_per_user6": np.int64})[
        ["entry_type", "n_users", "sum3", "mean_per_user6"]]


def q_quantity_hist(sf_dir: str):
    """Lineitem quantity histogram — the order-size demand curve over
    the bounded quantity domain (value_hist's fixed-bin pattern on the
    transactional table): per integer quantity, line count and share.
    Map-only bincount partials; domain-bounded combine."""
    li = _pq(sf_dir, "lineitem", columns=["l_quantity"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        q = np.rint(t.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        vc = pd.Series(q).value_counts()
        return pd.DataFrame({"quantity": vc.index.to_numpy(np.int64),
                             "n_lines": vc.to_numpy(np.int64)})

    g = _combine_partials(
        li.map_batches(partial, batch_format="pyarrow"),
        ["quantity"], ["n_lines"])
    g = g.sort_values("quantity").reset_index(drop=True)
    tot = int(g["n_lines"].sum())
    g["share6"] = (g["n_lines"].astype(np.int64) * 10**6 // tot)
    return g.astype({"quantity": np.int64, "n_lines": np.int64,
                     "share6": np.int64})
