"""Link-graph analytics — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403



def q_pagerank_paths(sf_dir: str):
    """Iterative link-analysis (PageRank dataflow) over the derived web:
    3 rounds of edges⋈weights + groupby-sum shuffles with integer path
    counts (stages/graph.py::path_weights) — hash-exact, so the
    unrolled-CTE oracle gates the full iterative pipeline."""
    from ...stages.graph import path_weights

    n = _doc_count(sf_dir)
    # per round the join sees 3n edges + n weights
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return path_weights(docs, n=n, iters=3, num_partitions=parts)



def q_link_degrees(sf_dir: str):
    """In/out degree per page of the derived link graph: one distributed
    count shuffle + a left_outer stitch (stages/graph.py::degree_table)."""
    from ...stages.graph import degree_table

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return degree_table(docs, n=n, num_partitions=parts)



def q_triangle_count(sf_dir: str):
    """Triangle census of the derived link graph
    (stages/graph.py::triangle_stats): dedup'd low→high edge set, wedge
    join, closing-edge join — two hash shuffles end-to-end."""
    from ...stages.graph import triangle_stats

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



def q_kcore(sf_dir: str):
    """3-round k-core peel (k = 5) of the undirected link multigraph
    (stages/graph.py::kcore_members): iterative induced-subgraph degree
    recompute + threshold peel — the fixpoint-style graph op where each
    round depends on the previous round's SET, not just its values.
    Survivors with their final induced degree."""
    from ...stages.graph import kcore_members

    n = _doc_count(sf_dir)
    docs = _pq(sf_dir, "documents", columns=["doc_id"],
               num_blocks=_shuffle_partitions(4 * n))
    return kcore_members(docs, n=n, k=5, rounds=3).sort("doc_id")



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
    from ...stages.temporal import _with_bucket

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
    from ...stages.graph import degree_table, edges_dataset

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
    from ...stages.graph import edges_dataset

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



def q_pagerank_damped(sf_dir: str):
    """Damped (d = 0.85) PageRank over the derived link graph, 3 rounds
    of integer-floor power iteration (stages/graph.py::damped_pagerank)
    — the authority score a crawl scheduler feeds back into frontier
    priority. Exact integer weights end-to-end; the oracle unrolls the
    identical three rounds as CTEs."""
    from ...stages.graph import damped_pagerank

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    return damped_pagerank(docs, n=n, iters=3, num_partitions=parts)



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
    from ...stages.graph import edges_dataset
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
    from ...stages.graph import edges_dataset

    n = _doc_count(sf_dir)
    parts = _shuffle_partitions(4 * n)
    docs = _pq(sf_dir, "documents", columns=["doc_id"], num_blocks=parts)
    edges = edges_dataset(docs, n)
    edf = _gather_capped(edges)
    dist = _bfs_dist_from(0, n, edf, edges)
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "dist": dist})



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
    from ...stages.graph import edges_dataset

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
    from ...stages.graph import edges_dataset
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



def q_scc_stats(sf_dir: str):
    """Strongly connected components of the directed link graph — the
    DIRECTED counterpart of connected_components (a page cluster that
    links back and forth is a crawl trap candidate; one-way tendrils
    are not). Driver Tarjan under the edge cap; past it the FW-BW-TRIM
    plan in _scc_labels keeps per-node state node-bounded and runs
    every propagation round as one distributed edge scan. Output: the
    SCC size histogram (label = min doc_id, same as the oracle's
    recursive mutual-reachability closure)."""
    from ...stages.graph import edges_dataset

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
    from ...stages.graph import edges_dataset

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
    from ...stages.graph import edges_dataset

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
    from ...stages.graph import degree_table, edges_dataset

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
    from ...sources.tables import read_dataset

    n_both = read_dataset(os.path.join(ckpt, "docs"),
                          columns=["depth"]).count()
    at_risk = n_both - n_seed0
    return pd.DataFrame({
        "n_reach_both": [np.int64(n_both)],
        "n_reach_seed0": [np.int64(n_seed0)],
        "n_at_risk": [np.int64(at_risk)],
        "at_risk_share6": [np.int64(at_risk * 10**6 // n_both
                                    if n_both else 0)]})
