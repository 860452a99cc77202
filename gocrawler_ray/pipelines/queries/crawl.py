"""Crawl-engine pipelines and checkpoint-backed audits — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403



def q_crawl_flagship(sf_dir: str):
    """The flagship end-to-end: crawl the derived web with the full
    engine, then run the items/enrichment pipeline over the FETCHED docs
    (parse + analyzer actor pool) — the reference's crawler + parser
    Lambda as one Ray-Data flow. Projected to the SQL-expressible item +
    enrichment columns so the DuckDB oracle (recursive-CTE reachability ×
    parse semantics × md5-bucket sentiment) verifies the WHOLE path:
    crawl admission, span parse, price kernel, review parse, analyzer."""
    import ray.data as rd

    from ...state.checkpoint import CheckpointStore
    from ..items import build_items

    ckpt = CheckpointStore(_derived_crawl_ckpt(sf_dir))
    docs = ckpt.read_all_docs_table()
    items = build_items(_from_arrow_sliced(docs), analyzer_concurrency=2)

    def project(t: pa.Table) -> pa.Table:
        # first-review extraction via Arrow offsets (functions/lists —
        # round-4 verdict #3): no to_pylist, no per-row Python
        from ...functions.lists import first_list_element

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
    from ...config import AMAZON
    from ...stages.analyzer import ReviewAnalyzer
    from ...stages.extract import parse_items_amazon
    from ...state.checkpoint import CheckpointStore
    from ..derived import derive_amazon_corpus

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
        from ...functions.lists import first_list_element, kv_lookup

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
    from ...state.checkpoint import CheckpointStore

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
    from ...sources.tables import read_dataset

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



def q_url_normalize(sf_dir: str):
    """URL canonicalization kernel (frontier hygiene, SURVEY §2.7
    hardening): lowercase scheme/host, strip fragment, drop default
    port, empty path → '/'. Pure Arrow kernels over deterministic messy
    spellings built from doc ids."""
    from ...functions.urls import normalize_urls

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
    from ...sources.tables import read_dataset

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



def q_host_depth_profile(sf_dir: str):
    """Per-host crawl shape over the checkpointed frontier: pages
    fetched, min/max BFS depth and mean depth — the skew report a
    crawl operator reads before re-salting hot hosts. Streams the
    checkpoint pruned to (host, depth); partials are (host × depth)
    counts (wave-bounded), and min/max/mean close on the driver from
    that bounded table — frontier size never lands anywhere."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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



def q_host_link_locality(sf_dir: str):
    """Per-host link locality of the derived web: what share of each
    host's out-links stay on the host (host = doc_id mod 3 by
    construction) — the crawl-frontier dispersion signal (high locality
    = per-host politeness dominates; low = the frontier fans out).
    Pure map-side arithmetic over the edge stream into a 3-row bounded
    combine; the ratio is one rounded division from exact ints."""
    from ...stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        from ...stages.graph import CAPTCHA_MOD, CAPTCHA_RES, EDGE_MULS
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



def q_crawl_fairness(sf_dir: str):
    """Jain's fairness index over per-host fetched-page counts from the
    engine crawl's checkpoint — the single number behind
    slot_apportionment ("did the politeness scheduler starve a host?").
    Jain = (Σx)²/(n·Σx²) closes as an exact ×1e6 integer floor over the
    host-bounded count combine; 1e6 = perfectly even, 1e6/n = one host
    took everything."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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



def q_orphan_pages(sf_dir: str):
    """Orphan pages (in-degree 0 — discoverable only from the seed
    list) per host: the dark-matter inventory a crawl-coverage audit
    starts from. In-degrees combine node-bounded, broadcast once via
    ray.put into the document scan; per-host counters close exact."""
    from ...stages.graph import edges_dataset

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



def q_wave_branching(sf_dir: str):
    """Frontier branching factor per BFS wave of the engine crawl:
    pages first fetched at each depth and the wave-over-wave growth
    ratio ×1e6 — the number that says when the crawl flips from
    expansion to saturation (reads the same checkpoint as
    host_depth_profile; depth-bounded combine; integer floors)."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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



def q_host_link_matrix(sf_dir: str):
    """Full host-to-host link matrix of the derived web (source host ×
    destination host, count and row share ×1e6) — the off-diagonal
    mass host_link_locality's single ratio collapses away; a frontier
    dispatcher reads it as "which politeness queue feeds which". Pure
    map-side arithmetic over the edge stream; 9-cell bounded
    combine."""
    from ...stages.graph import edges_dataset

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
    from ...sources.tables import read_dataset

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



def q_host_wave_share(sf_dir: str):
    """Politeness fairness over time: per BFS wave, each host's share
    of the pages fetched that wave — the longitudinal view behind
    crawl_fairness's single Jain number (a scheduler can be fair in
    aggregate while starving a host early). Reads the crawl checkpoint;
    one (depth × host)-bounded count partial; integer-floor shares."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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
    from ...sources.tables import write_partitioned

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
    from ...sources.tables import read_dataset

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



def q_captcha_rate_by_wave(sf_dir: str):
    """Captcha-wall incidence per BFS wave — the longitudinal
    complement to captcha_rate_by_host: a rising per-wave rate means
    the crawl is walking into throttling as it goes deeper (the signal
    to slow the politeness budget), which the per-host aggregate
    averages away. Captcha fetches are identified by their single
    kind='captcha' span (S8: the wall page IS the payload);
    depth-bounded count partials; integer-floor rates."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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
    from ...state.cuckoo import CuckooFilter

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
    from ...functions.urls import md5_hex_arrow

    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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



def q_span_ref_integrity(sf_dir: str):
    """media_ref integrity over the interleaved payload: per span
    kind, how many spans carry a non-empty ref and how many of those
    parse as well-formed https URLs — the payload-contract audit for
    the `spans: list<struct<kind,text,media_ref,offset>>` schema (the
    input_hint's one typed side-channel): media and link spans must
    ALL carry valid refs, every other kind none. Zero-copy explode +
    one vectorized prefix check; kind-bounded combine."""
    ckpt = _derived_crawl_ckpt(sf_dir)
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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
    from ...sources.tables import read_dataset

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
    from ...stages.graph import edges_dataset

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
    from ...sources.tables import read_dataset

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
