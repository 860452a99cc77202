"""Distributed link-graph operators over the derived crawl web.

The derived web (pipelines/derived.py) gives every non-captcha document
three out-links ``(7i+1)%N, (13i+2)%N, (29i+5)%N`` — an expander-ish
digraph. These operators run the classic link-analysis dataflows over
that edge set with Ray Data's shuffle primitives (the crawl-adjacent
analytics the reference's item pipeline never had, but any web-scale
corpus needs):

- :func:`edges_dataset` — documents → ``(src, dst)`` edge table
  (map-only, vectorized);
- :func:`degree_table` — in/out degree per node: one distributed
  ``groupby(dst).count()`` stitched back with a hash-shuffle
  ``left_outer`` join;
- :func:`path_weights` — K rounds of ``edges ⋈ weights on src`` →
  ``groupby(dst).sum()`` — the PageRank dataflow. Weights are INTEGER
  path counts (uniform start weight 1, no damping/normalization), so
  every iteration is hash-exact and a DuckDB oracle with K unrolled
  CTE joins gates the whole iterative pipeline; damped float PageRank
  is the identical two shuffles per round with a scalar multiply and a
  teleport add folded into the aggregate.

Partitioning contract at scale: the join and the groupby both hash on
the node-id domain. Ray 2.49's hash-shuffle join takes
``num_partitions`` explicitly; per-round state is one ``(node, w)``
table the size of the node set, kept in the OBJECT STORE via
``materialize()`` between rounds (iterative lineage otherwise re-runs
every previous round per reference — the state is O(nodes), distributed
and spillable, never a driver-side gather). Edge blocks are
materialized once and re-read every round, exactly how an N-node
cluster would pin its edge partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# byte-for-byte the derived-web expander constants (pipelines/derived.py)
EDGE_MULS = ((7, 1), (13, 2), (29, 5))
CAPTCHA_MOD = 37
CAPTCHA_RES = 3


def edges_dataset(documents: rd.Dataset, n: int) -> rd.Dataset:
    """``(src, dst)`` edges of the derived web. Captcha walls
    (``doc_id % 37 == 3``) emit no out-links — same pruning as the BFS
    oracle edge set (__ray_entry__._BFS_CTE)."""

    def to_edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        ids = ids[ids % CAPTCHA_MOD != CAPTCHA_RES]
        src = np.repeat(ids, len(EDGE_MULS))
        dst = np.stack([(a * ids + b) % n for a, b in EDGE_MULS], axis=1).ravel()
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return documents.map_batches(to_edges, batch_format="pyarrow")


def _path_weights_dense(documents: rd.Dataset, n: int, iters: int) -> rd.Dataset:
    """Dense power iteration (see :func:`path_weights`): per-block
    bincount partials against a broadcast weight vector, driver-summed.
    Exact: every weight and every partial sum is an integer < 2^53, so
    the float64 bincount accumulators round-trip losslessly (asserted
    each round). Assumes the node domain is exactly ``[0, n)`` — true
    for the derived web by construction (and asserted per block); pass
    ``dense_threshold=0`` to force the sparse plan on any other id
    domain."""
    import ray

    edges = edges_dataset(documents, n).materialize()
    w = np.ones(n, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(w)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            wv = ray.get(_ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            assert len(src) == 0 or (0 <= src.min() and src.max() < n)
            acc = np.bincount(dst, weights=wv[src].astype(np.float64), minlength=n)
            assert acc.max(initial=0.0) < 2**53
            return pa.table(
                {"acc": pa.array([acc.astype(np.int64).tobytes()], pa.binary())}
            )

        w_new = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for buf in b.column("acc").to_pylist():
                w_new += np.frombuffer(buf, dtype=np.int64)
        w = w_new
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "paths": pa.array(w, pa.int64()),
            }
        )
    )


def _as_weights(t: pa.Table, node_col: str, w_col: str) -> pa.Table:
    return pa.table(
        {
            "node": pc.cast(t.column(node_col), pa.int64()),
            "w": pc.cast(t.column(w_col), pa.int64()),
        }
    )


def degree_table(documents: rd.Dataset, n: int, num_partitions: int) -> rd.Dataset:
    """Per-node in/out degree. Out-degree is map-side arithmetic (3 or
    0); in-degree is one distributed count shuffle, joined back
    ``left_outer`` so zero-in-degree nodes keep a row."""
    edges = edges_dataset(documents, n)
    indeg = edges.groupby("dst").count()  # (dst, count())

    def node_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        out = np.where(ids % CAPTCHA_MOD == CAPTCHA_RES, 0, len(EDGE_MULS))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "out_degree": pa.array(out.astype(np.int64), pa.int64()),
            }
        )

    nodes = documents.map_batches(node_rows, batch_format="pyarrow")
    joined = nodes.join(
        indeg,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
        right_on=("dst",),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "out_degree": t.column("out_degree"),
                "in_degree": pc.coalesce(
                    pc.cast(t.column("count()"), pa.int64()), pa.scalar(0, pa.int64())
                ),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def path_weights(
    documents: rd.Dataset,
    n: int,
    iters: int,
    num_partitions: int,
    dense_threshold: int = 1 << 20,
) -> rd.Dataset:
    """K-step integer power iteration: ``w_{k+1}(dst) = Σ_{src→dst}
    w_k(src)``, ``w_0 ≡ 1`` — the (undamped, unnormalized) PageRank
    dataflow, integer-exact so the unrolled-CTE oracle hash-gates it.
    Returns ``(doc_id, paths)`` with 0 for nodes unreachable in k steps.

    Two physical plans, same result:

    - **dense** (``n ≤ dense_threshold``): the weight vector fits in one
      broadcastable numpy array (8 MB at the default threshold), so each
      round is ONE map job over the pinned edge partitions — every block
      bincounts its edges against the broadcast ``w`` and ships an 8n-byte
      partial vector; the driver sums the bounded partials (the HLL/
      bloom merge move). Zero shuffles per round vs two (join + groupby)
      on the sparse path — on a fixed-cost-dominated cluster that is the
      whole latency of the operator.
    - **sparse** (bigger ``n``): per-round state no longer broadcasts —
      the original hash-shuffle plan: ``edges ⋈ w on src`` →
      ``groupby(dst).sum``, state in the object store between rounds.
    """
    if n <= dense_threshold:
        return _path_weights_dense(documents, n, iters)
    edges = edges_dataset(documents, n).materialize()  # pinned edge partitions

    ids_ds = documents.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"), pa.int64())}),
        batch_format="pyarrow",
    )
    w = ids_ds.map_batches(
        lambda t: t.append_column(
            "w", pa.array(np.ones(t.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    for _ in range(iters):
        joined = edges.join(
            w,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )
        agg = joined.groupby("dst").sum("w")  # (dst, sum(w))
        # materialize per round: O(nodes) state in the object store —
        # without it the lazy lineage re-executes all prior rounds
        w = agg.map_batches(
            lambda t: _as_weights(t, "dst", "sum(w)"), batch_format="pyarrow"
        ).materialize()

    final = ids_ds.join(
        w.map_batches(
            lambda t: pa.table({"wnode": t.column("node"), "w": t.column("w")}),
            batch_format="pyarrow",
        ),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("node",),
        right_on=("wnode",),
    )
    return final.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("node"),
                "paths": pc.coalesce(
                    pc.cast(t.column("w"), pa.int64()), pa.scalar(0, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )


def triangle_stats(
    documents: rd.Dataset,
    n: int,
    num_partitions: int,
    driver_edge_cap: int | None = 2_000_000,
    driver_wedge_cap: int = 50_000_000,
):
    """Undirected triangle census of the derived web: (n_edges,
    n_wedges, n_triangles) over the dedup'd low→high-oriented edge set.

    The classic two-shuffle distributed plan (node-iterator join form):

    1. orient every edge low→high and DEDUP it with one hash-bucket
       shuffle on the low endpoint (a duplicate pair shares BOTH
       endpoints, so in-bucket dedup is globally exact);
    2. wedges = edges ⋈ edges on e1.b = e2.a — every (a < b < c) path;
    3. triangles = wedges ⋈ edges on (a, c) — the closing edge.

    Both joins hash on node ids; orientation bounds each wedge list by
    the SQUARE of the max oriented out-degree (the standard skew guard —
    high-degree hubs orient most incident edges inward). Counts come
    back as 1-row-per-block partials, never a row gather.

    ``driver_edge_cap``/``driver_wedge_cap``: under the caps the
    per-batch-deduped oriented edge stream gathers ONCE and the census
    closes driver-side with vectorized numpy (packed-key unique,
    bincount wedge counts, CSR wedge expansion + sorted-key
    searchsorted for the closing edge) — the two hash joins each pay
    1.5–2 s of fixed latency at any scale for the same three integers.
    The wedge cap is checked BEFORE expansion from exact per-node
    degree products, so a skewed graph can never blow up the driver;
    past either cap the distributed two-join plan below runs
    unchanged."""
    edges = edges_dataset(documents, n)

    def orient(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        m = src != dst
        lo = np.minimum(src[m], dst[m])
        hi = np.maximum(src[m], dst[m])
        ab = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                         "b": pa.array(ab[:, 1], pa.int64())})

    # the packed key a*n + b needs n² < 2^63
    if driver_edge_cap is not None and n < 3_000_000_000:
        oriented = edges.map_batches(orient, batch_format="pyarrow")
        chunks: list[np.ndarray] = []
        total_rows = 0
        for b in oriented.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
            chunks.append(
                b.column("a").to_numpy() * np.int64(n)
                + b.column("b").to_numpy()
            )
            total_rows += b.num_rows
            if total_rows > driver_edge_cap:
                chunks = None
                break
        if chunks is not None:
            packed = (
                np.unique(np.concatenate(chunks))
                if chunks
                else np.zeros(0, np.int64)
            )
            a = packed // n
            b_ = packed % n
            n_edges = len(packed)
            # everything below is O(edges + wedges) — no O(n) node-domain
            # allocation on the driver (a huge corpus with a tiny edge
            # set must stay cheap). packed is sorted, so edges are
            # grouped by source `a`; each edge's wedge fan-out is the
            # size of its DESTINATION's source range, found with two
            # searchsorteds per edge instead of a length-n bincount.
            starts = np.searchsorted(a, b_, side="left")
            ends = np.searchsorted(a, b_, side="right")
            reps = ends - starts  # per-edge wedge fan-out = outdeg(b)
            n_wedges = int(reps.sum())  # ≤ edge_cap² < 2^63
            if n_wedges <= driver_wedge_cap:
                # wedge (x < b < c): edge (x, b) × out-list of b —
                # concatenated ranges built with one repeat/arange
                # broadcast (no Python loop over edges)
                wx = np.repeat(a, reps)
                csum = np.cumsum(reps) - reps
                idx = (
                    np.repeat(starts - csum, reps)
                    + np.arange(n_wedges, dtype=np.int64)
                )
                wc = b_[idx]
                closing = wx * np.int64(n) + wc
                pos = np.searchsorted(packed, closing)
                pos[pos == len(packed)] = 0
                n_triangles = int(
                    (packed[pos] == closing).sum()
                ) if len(packed) else 0
                return n_edges, n_wedges, n_triangles

    def bucket_of(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        return t.append_column(
            "__bucket", pa.array((a % num_partitions).astype(np.int32))
        )

    def dedup_bucket(g) -> "pa.Table":
        d = g.drop_duplicates(subset=["a", "b"])
        return pa.table({"a": pa.array(d["a"].to_numpy(np.int64)),
                         "b": pa.array(d["b"].to_numpy(np.int64))})

    # bucket-shuffle dedup (duplicates share `a`, so bucketing on `a`
    # co-locates them)
    distinct = (
        edges.map_batches(orient, batch_format="pyarrow")
        .map_batches(bucket_of, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()  # reused by three dataflows below
    )

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    def total(ds: rd.Dataset) -> int:
        s = 0
        for b in ds.map_batches(count_rows, batch_format="pyarrow").iter_batches(
            batch_format="pandas"
        ):
            s += int(b["n"].sum())
        return s

    n_edges = total(distinct)
    wedges = distinct.join(
        distinct, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("a",), right_suffix="_r",
    )

    def wedge_project(t: pa.Table) -> pa.Table:
        # (a, b=b, c=b_r): a < b < c by orientation
        return pa.table({"a": t.column("a"), "c": t.column("b_r")})

    # materialize: consumed twice (count + closing join) — without it
    # the closing join re-executes the whole wedge shuffle from lineage
    wedge_ends = wedges.map_batches(
        wedge_project, batch_format="pyarrow"
    ).materialize()
    n_wedges = total(wedge_ends)
    closed = wedge_ends.join(
        distinct, join_type="inner", num_partitions=num_partitions,
        on=("a", "c"), right_on=("a", "b"),
    )
    n_triangles = total(closed)
    return n_edges, n_wedges, n_triangles


def _edge_bincount_rounds(
    edges: rd.Dataset, n: int, rounds: list
) -> list[np.ndarray]:
    """Run a sequence of broadcast-bincount rounds over pinned edge
    partitions (the dense plan of :func:`path_weights`): each round is
    ``(weight_vector, direction)`` → the gathered integer vector
    ``out[j] = Σ_{edges} w[other end]``. One map job per round, zero
    shuffles; partials are 8n-byte vectors summed on the driver. All
    weights stay integers < 2^53 (asserted), so every round is
    hash-exact. Sparse fallback for n beyond broadcast size is the
    path_weights join+groupby plan, identical semantics."""
    import ray

    outs = []
    w = rounds[0][0]
    for wv, forward in rounds:
        ref = ray.put(wv)

        def partial(t: pa.Table, _ref=ref, _fwd=forward) -> pa.Table:
            w_ = ray.get(_ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            if _fwd:  # accumulate at dst from src weights
                acc = np.bincount(
                    dst, weights=w_[src].astype(np.float64), minlength=n)
            else:     # accumulate at src from dst weights
                acc = np.bincount(
                    src, weights=w_[dst].astype(np.float64), minlength=n)
            assert acc.max(initial=0.0) < 2**53
            return pa.table({"acc": pa.array(
                [acc.astype(np.int64).tobytes()], pa.binary())})

        out = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for buf in b.column("acc").to_pylist():
                out += np.frombuffer(buf, dtype=np.int64)
        outs.append(out)
    return outs


def hits_scores(documents: rd.Dataset, n: int) -> rd.Dataset:
    """Unnormalized integer HITS, two alternating rounds: ``a1 =
    in-degree``, ``h1[u] = Σ_{u→v} a1[v]`` (hub), ``a2[v] = Σ_{u→v}
    h1[u]`` (authority). No normalization → every score is an exact
    int bounded by degree powers (not by n), so the unrolled-CTE oracle
    hash-gates the whole iterative dataflow; damped/normalized HITS is
    the identical rounds with a scalar fold. Three broadcast-bincount
    map jobs over pinned edges, zero shuffles (dense plan; sparse plan
    = path_weights' join+groupby per round)."""
    edges = edges_dataset(documents, n).materialize()
    ones = np.ones(n, dtype=np.int64)
    a1 = _edge_bincount_rounds(edges, n, [(ones, True)])[0]
    h1 = _edge_bincount_rounds(edges, n, [(a1, False)])[0]
    a2 = _edge_bincount_rounds(edges, n, [(h1, True)])[0]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "hub": pa.array(h1, pa.int64()),
        "auth": pa.array(a2, pa.int64()),
    }))


def kcore_members(
    documents: rd.Dataset, n: int, k: int = 5, rounds: int = 3
) -> rd.Dataset:
    """K-round k-core peel of the UNDIRECTED link multigraph: each
    round recomputes every active node's degree within the active-node
    induced subgraph and peels nodes below ``k`` (isolated nodes peel in
    round one). The round count is part of the operator contract (the
    oracle unrolls exactly ``rounds`` CTE stages); convergence detection
    is the same loop with an early-exit on an unchanged active count.
    Returns survivors with their final induced degree. Per round: ONE
    broadcast-bitmap bincount job over pinned edges — no shuffle."""
    import ray

    edges = edges_dataset(documents, n).materialize()
    active = np.ones(n, dtype=bool)
    deg = np.zeros(n, dtype=np.int64)
    for r in range(rounds + 1):  # final pass reports survivor degrees
        ref = ray.put(active)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            act = ray.get(_ref)
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            m = act[src] & act[dst]
            acc = (np.bincount(src[m], minlength=n)
                   + np.bincount(dst[m], minlength=n))
            return pa.table({"acc": pa.array(
                [acc.astype(np.int64).tobytes()], pa.binary())})

        deg = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for buf in b.column("acc").to_pylist():
                deg += np.frombuffer(buf, dtype=np.int64)
        if r == rounds:
            break  # degrees of the post-peel survivor set computed
        new_active = active & (deg >= k)
        if new_active.sum() == active.sum():
            break  # converged early; reported degrees already final
        active = new_active
    ids = np.flatnonzero(active).astype(np.int64)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "core_degree": pa.array(deg[ids], pa.int64()),
    }))


def damped_pagerank(
    documents: rd.Dataset,
    n: int,
    iters: int,
    num_partitions: int,
    dense_threshold: int = 1 << 20,
) -> rd.Dataset:
    """Damped PageRank with INTEGER-FLOOR semantics: w₀ ≡ 10⁶ and each
    round w'(v) = 150000 + Σ_{u→v} ⌊85·w(u)/300⌋ — the d=0.85 damped
    walk over the 3-out-regular derived web (the per-edge floor divides
    the emitter's mass across its out-degree 3; captcha walls emit
    nothing, so their mass drains — the dangling-mass drop is the
    documented semantics, exact on both engines). Every weight stays an
    integer, so the unrolled-CTE oracle hash-gates all ``iters`` rounds.

    Same two physical plans as :func:`path_weights`: dense broadcast
    bincount partials under ``dense_threshold`` (zero shuffles/round),
    else the edges ⋈ w → groupby(dst) hash-shuffle plan with per-round
    materialized O(nodes) state."""
    import ray

    edges = edges_dataset(documents, n).materialize()
    if n <= dense_threshold:
        w = np.full(n, 1_000_000, dtype=np.int64)
        for _ in range(iters):
            ref = ray.put(w)

            def partial(t: pa.Table, _ref=ref) -> pa.Table:
                wv = ray.get(_ref)
                src = t.column("src").to_numpy()
                dst = t.column("dst").to_numpy()
                contrib = (85 * wv[src]) // 300
                acc = np.bincount(
                    dst, weights=contrib.astype(np.float64), minlength=n)
                assert acc.max(initial=0.0) < 2**53
                return pa.table({"acc": pa.array(
                    [acc.astype(np.int64).tobytes()], pa.binary())})

            w_new = np.full(n, 150_000, dtype=np.int64)
            for b in edges.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow"):
                for buf in b.column("acc").to_pylist():
                    w_new += np.frombuffer(buf, dtype=np.int64)
            w = w_new
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "pr": pa.array(w, pa.int64())}))

    ids_ds = documents.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"),
                                            pa.int64())}),
        batch_format="pyarrow",
    )
    w = ids_ds.map_batches(
        lambda t: t.append_column("w", pa.array(
            np.full(t.num_rows, 1_000_000, dtype=np.int64))),
        batch_format="pyarrow",
    )
    for _ in range(iters):
        joined = edges.join(w, join_type="inner",
                            num_partitions=num_partitions,
                            on=("src",), right_on=("node",))
        contrib = joined.map_batches(
            lambda t: pa.table({
                "dst": t.column("dst"),
                "c": pa.array((85 * t.column("w").to_numpy(
                    zero_copy_only=False)) // 300, pa.int64())}),
            batch_format="pyarrow",
        )
        agg = contrib.groupby("dst").sum("c")
        w = ids_ds.join(
            agg.map_batches(lambda t: pa.table(
                {"anode": t.column("dst"), "s": t.column("sum(c)")}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("anode",),
        ).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "w": pa.array(150_000 + np.nan_to_num(
                    t.column("s").to_numpy(zero_copy_only=False
                                           ).astype(np.float64),
                    nan=0).astype(np.int64), pa.int64())}),
            batch_format="pyarrow",
        ).materialize()  # O(nodes) state between rounds
    return w.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "pr": t.column("w")}),
        batch_format="pyarrow",
    )
