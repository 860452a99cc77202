"""Statistical tests and value profiling — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403
from .text import q_source_vocab  # noqa: F401 — cross-family



def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: pair-hash bucket
    dedup then a partial-sum combine (stages/aggregates.py)."""
    from ...stages.aggregates import count_distinct

    ev = _pq(sf_dir, "events", columns=["event_type", "user_id"],
             num_blocks=_n_cpus())
    return count_distinct(ev, key_col="event_type", value_col="user_id")



def q_hll_distinct(sf_dir: str):
    """HyperLogLog register table (p=10) for distinct user_ids in
    events. The registers are integer-exact and SQL-reproducible; the
    float estimate is derived via hll_estimate (pytest asserts the
    accuracy envelope)."""
    from ...stages.aggregates import hll_registers

    ev = _pq(sf_dir, "events", columns=["user_id"], num_blocks=_n_cpus())
    return hll_registers(ev, value_col="user_id", p=10)



def q_group_quantiles(sf_dir: str):
    """Exact p50/p95 of event value per event_type (quantile_cont
    linear-interpolation semantics), one bucket shuffle + a vectorized
    multi-key segment kernel."""
    from ...stages.aggregates import group_quantiles

    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())
    return group_quantiles(ev, key_col="event_type", value_col="value",
                           qs=(0.5, 0.95))



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



def q_value_ranks(sf_dir: str):
    """Ranking-window family in one pass: per-event-type RANK (ties
    share), PERCENT_RANK, and NTILE(4) quartile over the pinned
    (value, event_id) order (stages/temporal.py::rank_windows) — one
    bucket shuffle, segment arithmetic for all keys, integer operands
    so the rank divisions hash-match SQL."""
    from ...stages.temporal import rank_windows

    ev = _pq(sf_dir, "events", columns=["event_type", "event_id", "value"],
             num_blocks=_n_cpus())
    return rank_windows(ev, "event_type", "value", "event_id", ntile=4)



def q_props_k_stats(sf_dir: str):
    """JSON unmarshal surface (SURVEY §2.8): extract the integer field
    ``k`` from the events' JSON props column with one vectorized Arrow
    regex pass (functions/text.py::json_int_field — never per-row
    json.loads), then a bounded per-type aggregate from per-block
    partials (missing keys COALESCE to -1 on both sides)."""
    from ...functions.text import json_int_field

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



def q_viewers_no_purchase(sf_dir: str):
    """EXCEPT set op: users who viewed but never purchased (within the
    sparse slice) — same pivot-partial stream, complementary
    predicate."""
    return _sparse_pivot_users(
        sf_dir, lambda df: (df["n_view"] > 0) & (df["n_purchase"] == 0)
    )



def q_value_scaled(sf_dir: str):
    """Per-event-type robust scaling of the value column —
    (value − median) / IQR (stages/aggregates.py::robust_scale): grouped
    quartiles via the hash-gate-proven quantile kernel, broadcast once,
    then one stateless map pass. The canonical two-phase
    global-stats-then-map normalization of a feature pipeline."""
    from ...stages.aggregates import robust_scale

    ev = _pq(sf_dir, "events", columns=["event_id", "event_type", "value"],
             num_blocks=_n_cpus())
    return robust_scale(ev, "event_type", "value").map_batches(
        lambda t: t.select(["event_id", "event_type", "value_scaled"]),
        batch_format="pyarrow",
    )



def q_heavy_hitters(sf_dir: str):
    """Count-min-sketch frequency estimates per user over the event
    stream (stages/aggregates.py::cms_counts): each block ships one
    fixed 32 KB counter matrix, the driver sums them, and the candidate
    keys (bounded user domain) read back as min-over-rows point
    queries. The sketch registers are integer-exact and md5-derived, so
    the SQL oracle rebuilds the identical sketch and the identical
    estimates — the gate verifies the sketch, not a float summary."""
    from ...stages.aggregates import cms_counts_and_keys, cms_estimate_many

    ev = _pq(sf_dir, "events", columns=["user_id"])
    # one pass: blocks ship (partial sketch, distinct keys) together
    sketch, keys = cms_counts_and_keys(ev, "user_id")
    est = cms_estimate_many(sketch, keys.tolist())
    return pa.table(
        {"user_id": pa.array(keys, pa.int64()), "est": pa.array(est, pa.int64())}
    )



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



def q_winsorized_stats(sf_dir: str):
    """Two-pass robust-stats pipeline (winsorization): exact per-class
    p5/p95 from the quantile kernel (a class-bounded table), broadcast
    via ray.put, then ONE stateless clip+sum pass over the stream —
    the compute-stats → broadcast → transform pattern that replaces a
    self-join at any scale. Bounds are rounded to 6 BEFORE clipping on
    both sides so the clip decisions are hash-identical."""
    from ...stages.aggregates import group_quantiles

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



def q_type_affinity(sf_dir: str):
    """Set-similarity matrix over the (bounded) event-type vocabulary:
    Jaccard between every two types' distinct-user sets — the audience
    overlap report. ONE hash-bucket shuffle on user_id makes the
    per-bucket (user, type) dedup globally exact; the kernel emits
    diagonal rows (ta = tb → per-type distinct-user partials) and
    upper-triangle rows (co-occurrence partials) in one frame — the
    combine stream is types² × buckets. Counts stay exact integers; the
    single closing division is the only float, identical on both sides."""
    from ...stages.temporal import _with_bucket

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
    from ...stages.temporal import _with_bucket

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



def q_basket_sizes(sf_dir: str):
    """Order-size distribution: how many orders have k lineitems, for
    every observed k — the basket-shape profile driving join and
    pair-emission cost models. ONE hash-bucket shuffle on l_orderkey;
    the kernel counts lines per order and emits the bucket's bounded
    (k → n_orders) histogram partial (TPC-H baskets are ≤ 7 lines)."""
    from ...stages.temporal import _with_bucket

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



def q_repurchase_rate(sf_dir: str):
    """Repurchase signal over the basket stream: of every distinct
    (customer, part) pair, the share bought in MORE than one order —
    the loyalty/consumable-vs-durable split. The customer key attaches
    to the fact scan by broadcast under the cap (hash join past it);
    ONE hash-bucket shuffle on the composite pair then reduces each
    pair to its distinct-order count, and only (n_pairs, n_repurchased)
    counters leave a bucket."""
    from ...stages.temporal import _with_bucket

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
    from ...functions.urls import md5_hash64_many

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
    from ...functions.text import json_int_field

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
    from ...functions.text import json_int_field

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
    from ...stages.temporal import _with_bucket

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



def q_last_touch_attribution(sf_dir: str):
    """Last-touch attribution: each purchase credits its value to the
    latest click by the same user at-or-before it and within 7 days —
    the marketing-credit join behind click_to_purchase's lag curve.
    Distributed as ONE user-hash bucket shuffle; inside each bucket a
    vectorized pd.merge_asof (by=user, tolerance=7d, backward) matches
    every purchase, and what leaves the bucket is the CALENDAR-bounded
    (day, n_purch, n_attr, attr_v3) partial — never the matches
    themselves. Daily totals close as exact integer sums."""
    from ...stages.temporal import _with_bucket

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
    from ...stages.temporal import _with_bucket

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



def q_bucket_label_purity(sf_dir: str):
    """Label purity of the sign-LSH buckets from rp_buckets: per-bucket
    majority-label mass over total — the one-number check of whether
    the ANN sharding respects class structure (purity ≈ top-1 accuracy
    of a bucket-vote classifier). Same deterministic md5 ±1 planes and
    1e-6 fixed-point projection as rp_buckets (exact integer bucket
    ids on both sides); the (bucket, label) combine is bounded by
    2⁸ × labels and purity closes as an exact ×1e6 floor."""
    from ...functions.urls import md5_hash64_many
    from ...stages.similarity import _emb_matrix

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



def q_purchase_growth(sf_dir: str):
    """Basket-growth screen: among users with ≥ 2 purchases, how many
    spent MORE on their second purchase than their first (ties split
    out) — the early-lifecycle expansion signal ltv_cohorts aggregates
    away. One user-bucket shuffle; the kernel lexsorts (user, ts, id),
    takes each user's first two purchases by position, and compares
    exact milli-unit values; 4-integer close."""
    from ...stages.temporal import _with_bucket

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
