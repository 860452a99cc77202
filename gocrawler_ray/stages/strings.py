"""Edit-distance (Levenshtein) string-similarity self-join.

The typo-/near-identical-title dedup modality, complementing the
set-similarity family in :mod:`.dedup` (minhash / simhash / exact
n-gram Jaccard all measure BAG overlap and are blind to character-level
edits that shift every shingle; a single substitution in a short title
moves k adjacent shingles but only ONE unit of edit distance).

No reference-engine counterpart (the Go crawler has no string-similarity
operator); this is one of the beyond-reference training-data operators.
Candidate generation follows the PassJoin partition scheme (Li, Deng,
Feng & Li, "PASS-JOIN: a partition-based method for similarity joins",
PVLDB 5(3), 2012 — public algorithm, re-derived here):

* every string of length L >= k+1 is evenly partitioned into k+1
  segments; if lev(a, b) <= k with len(a) <= len(b), at least one
  segment of ``a`` is untouched by the <= k edits and therefore occurs
  VERBATIM in ``b``, at a start position shifted by at most k (the net
  indel count before it);
* so each string emits **index keys** hash(len, seg_idx, segment) for
  its own segments, plus **probe keys** hash(L', seg_idx, substring)
  for every shorter-or-equal partner length L' in [L-k, L] and every
  in-window start — an exact-recall candidate universe closed by the
  same bucket-pair machinery as the LSH planes
  (:func:`.dedup._bucket_pairs`: capped driver gather at gate scale,
  sorted-block Dataset plane past ``pair_driver_cap``);
* strings with L <= 2k pair inside one SHORT bucket (the pigeonhole
  needs k+1 non-empty segments; any partner within distance k of a
  string of length <= k is itself <= 2k long).

Verification is a banded dynamic program vectorized ACROSS pairs
(numpy column sweeps over codepoint matrices — no per-pair Python): the
band |i-j| <= k is exact for all distances <= k, and out-of-band cells
saturate at k+1, so kept pairs carry their true distance. Under the
driver cap the candidate titles broadcast once (``ray.put``); past it
the pairs stay a Dataset and titles co-partition onto them by two hash
joins — the same 100 TB posture as :func:`.dedup._verify_pairs_ds`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup import _UNSET, _bucket_pairs, _fix_empty_blocks, _pair_cap

# distinct odd mixing constants for (partner_len, seg_idx) key salting;
# a cross-(len, seg) hash collision only adds a false candidate that
# the exact verify removes
_MIX_LEN = 0x9E3779B97F4A7C15
_MIX_SEG = 0xC2B2AE3D27D4EB4F
_SHORT_KEY = np.uint64(0x8BADF00D5EED5EED)


def _seg_bounds(length: int, k: int) -> list[tuple[int, int]]:
    """(start, seg_len) of the k+1 even segments of a length-``length``
    string: cut points floor(i*L/(k+1)) — every segment non-empty for
    L >= k+1."""
    cuts = [(i * length) // (k + 1) for i in range(k + 2)]
    return [(cuts[i], cuts[i + 1] - cuts[i]) for i in range(k + 1)]


def _seg_key(content: pd.Series, partner_len: int, seg_idx: int) -> np.ndarray:
    """Stable uint64 bucket key of (partner_len, seg_idx, content)."""
    salt = np.uint64(
        (partner_len * _MIX_LEN + (seg_idx + 1) * _MIX_SEG) % (1 << 64)
    )
    h = pd.util.hash_array(content.to_numpy(dtype=object)).astype(np.uint64)
    return h ^ salt


def _cand_records(t: pa.Table, col: str, id_col: str, k: int) -> pa.Table:
    """(band_key, doc_id) candidate rows for one batch — PassJoin index
    keys + probe keys, vectorized per distinct string length (pandas
    scalar-window ``str.slice`` per (partner_len, seg, shift) combo:
    O(k^3) slice kernels per length group, each over the whole group)."""
    id_ty = t.column(id_col).type
    titles = t.column(col).to_pandas().fillna("")
    ids = t.column(id_col).to_pandas().to_numpy(dtype=object)
    L = titles.str.len().to_numpy(np.int64)

    key_parts: list[np.ndarray] = []
    id_parts: list[np.ndarray] = []

    short = L <= 2 * k
    if short.any():
        n_short = int(short.sum())
        key_parts.append(np.full(n_short, _SHORT_KEY, np.uint64))
        id_parts.append(ids[short])

    for lg in np.unique(L[L >= k + 1]):
        lg = int(lg)
        m = L == lg
        sub = titles[m]
        sid = ids[m]
        # index keys: own segments at their exact positions
        for i, (p, ln) in enumerate(_seg_bounds(lg, k)):
            key_parts.append(_seg_key(sub.str.slice(p, p + ln), lg, i))
            id_parts.append(sid)
        # probe keys: segment specs of every shorter-or-equal partner
        # length, at starts within the +-k PassJoin window. (st == p at
        # equal length IS the index key — same content, same salt —
        # so it is skipped here and deduped anyway.)
        for l2 in range(max(k + 1, lg - k), lg + 1):
            for i, (p, ln) in enumerate(_seg_bounds(l2, k)):
                for st in range(max(0, p - k), min(lg - ln, p + k) + 1):
                    if l2 == lg and st == p:
                        continue
                    key_parts.append(
                        _seg_key(sub.str.slice(st, st + ln), l2, i)
                    )
                    id_parts.append(sid)

    if not key_parts:
        return pa.table(
            {"band_key": pa.array([], pa.uint64()),
             "doc_id": pa.array([], id_ty)}
        )
    df = pd.DataFrame(
        {"band_key": np.concatenate(key_parts),
         "doc_id": np.concatenate(id_parts)}
    ).drop_duplicates()
    return pa.table(
        {
            "band_key": pa.array(df["band_key"].to_numpy(np.uint64)),
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype=object), id_ty),
        }
    )


def _cp_matrix(strings: list[str], width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, NUL-padded (NUL never occurs
    in real titles; padding cells are only read as mismatches)."""
    joined = "".join(s[:width].ljust(width, "\0") for s in strings)
    return np.frombuffer(joined.encode("utf-32-le"), np.uint32).reshape(
        len(strings), width
    )


def lev_leq(a: list[str], b: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized banded Levenshtein over parallel string lists:
    returns (dist, keep) where keep = dist <= k and kept distances are
    exact (out-of-band / rejected entries saturate at k+1). The DP
    sweeps columns j in [i-k, i+k] only — any cell on a cost-<=k path
    satisfies |i-j| <= k, so the band is lossless for the predicate —
    and every numpy op spans all surviving pairs at once."""
    n = len(a)
    la = np.fromiter((len(x) for x in a), np.int64, n)
    lb = np.fromiter((len(x) for x in b), np.int64, n)
    dist = np.full(n, k + 1, np.int64)
    idx = np.flatnonzero(np.abs(la - lb) <= k)
    if idx.size == 0:
        return dist, dist <= k
    sa = [a[i] for i in idx]
    sb = [b[i] for i in idx]
    las, lbs = la[idx], lb[idx]
    la_max, lb_max = int(las.max()), int(lbs.max())
    kp = np.int32(k + 1)
    res = np.full(idx.size, kp, np.int32)
    if la_max == 0:
        res[:] = np.minimum(lbs, k + 1)  # all-empty vs short strings
    else:
        am = _cp_matrix(sa, la_max)
        bm = _cp_matrix(sb, max(lb_max, 1))
        dp = np.minimum(
            np.tile(np.arange(lb_max + 1, dtype=np.int32), (idx.size, 1)), kp
        )
        done0 = las == 0
        if done0.any():
            res[done0] = dp[done0, lbs[done0]]
        for i in range(1, la_max + 1):
            new = np.full_like(dp, kp)
            new[:, 0] = min(i, k + 1)
            cost = (bm != am[:, i - 1][:, None]).astype(np.int32)
            for j in range(max(1, i - k), min(lb_max, i + k) + 1):
                np.minimum(
                    np.minimum(dp[:, j] + 1, new[:, j - 1] + 1),
                    dp[:, j - 1] + cost[:, j - 1],
                    out=new[:, j],
                )
                np.minimum(new[:, j], kp, out=new[:, j])
            hit = las == i
            if hit.any():
                res[hit] = new[hit, lbs[hit]]
            dp = new
    dist[idx] = res
    return dist, dist <= k


def _verify_driver(
    ds: rd.Dataset, cand: pd.DataFrame, col: str, id_col: str, k: int
) -> pd.DataFrame:
    """Driver-side verify: candidate titles gathered once (bounded by
    the candidate-id universe — titles are tiny next to documents), the
    banded DP closes in one vectorized call."""
    import ray

    if not len(cand):
        return pd.DataFrame(
            {"a": [], "b": [], "dist": np.zeros(0, np.int64)}
        )
    ids_ref = ray.put(pa.array(sorted(set(cand["a"]) | set(cand["b"]))))

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column(id_col), ray.get(ids_ref).cast(t.column(id_col).type)
        )
        sub = t.filter(keep)
        return pa.table(
            {"doc_id": sub.column(id_col), "title": sub.column(col)}
        )

    rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    m = dict(zip(rows["doc_id"], rows["title"].fillna("")))
    ta = [m.get(x, "") for x in cand["a"]]
    tb = [m.get(x, "") for x in cand["b"]]
    dist, keep = lev_leq(ta, tb, k)
    out = pd.DataFrame(
        {"a": cand["a"].to_numpy(), "b": cand["b"].to_numpy(), "dist": dist}
    )[keep]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _verify_pairs_ds_titles(
    ds: rd.Dataset,
    pairs: rd.Dataset,
    col: str,
    id_col: str,
    k: int,
    num_partitions: int | None = None,
    id_broadcast_cap: int = 4_000_000,
) -> rd.Dataset:
    """DISTRIBUTED verify: titles co-partition onto the candidate-pair
    Dataset by two hash joins (onto ``a``, then ``b``) and the banded DP
    closes per batch — nothing pair- or title-shaped on the driver
    (mirror of :func:`.dedup._verify_pairs_ds`, string payloads instead
    of shingle blobs). The candidate-id universe broadcasts under
    ``id_broadcast_cap``; past it docs restrict by a distributed
    ``left_semi`` join."""
    import ray

    if num_partitions is None:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 8)) // 2
        )
    join_kw = dict(aggregator_ray_remote_args={"num_cpus": 0.25})

    def id_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.concat_arrays(
                [t.column("a").combine_chunks(),
                 t.column("b").combine_chunks()]
            )
        )
        return pa.table({"doc_id": u})

    idp = pairs.map_batches(id_partial, batch_format="pyarrow")
    parts: list | None = []
    total = 0
    id_ty: pa.DataType | None = None
    for blk in idp.iter_batches(batch_size=65536, batch_format="pyarrow"):
        id_ty = blk.column("doc_id").type
        parts.append(blk.column("doc_id").combine_chunks())
        total += len(parts[-1])
        if total > id_broadcast_cap:
            parts = None
            break

    def title_batch(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column(id_col),
                "title": pc.coalesce(t.column(col), pa.scalar("")),
            }
        )

    if parts is not None:
        if not total:
            return pairs.limit(0)
        ids = pc.unique(pa.concat_arrays(parts))
        ids_ref = ray.put(ids)

        def titles_bcast(t: pa.Table) -> pa.Table:
            sub = t.filter(
                pc.is_in(
                    t.column(id_col),
                    ray.get(ids_ref).cast(t.column(id_col).type),
                )
            )
            return title_batch(sub)

        titles_ds = ds.map_batches(titles_bcast, batch_format="pyarrow")
    else:  # pragma: no cover - id universe past the broadcast cap
        ids_ds = _fix_empty_blocks(
            idp.groupby("doc_id").count().materialize(),
            [("doc_id", id_ty), ("count()", pa.int64())],
        ).select_columns(["doc_id"])
        cand_docs = ds.select_columns([id_col, col]).join(
            ids_ds.map_batches(
                lambda t: pa.table({id_col: t.column("doc_id")}),
                batch_format="pyarrow",
            ),
            "left_semi", num_partitions, on=(id_col,), **join_kw,
        )
        titles_ds = cand_docs.map_batches(title_batch, batch_format="pyarrow")

    titles_ds = titles_ds.materialize()
    t_a = titles_ds.map_batches(
        lambda t: pa.table(
            {"a": t.column("doc_id"), "ti_a": t.column("title")}
        ),
        batch_format="pyarrow",
    )
    t_b = titles_ds.map_batches(
        lambda t: pa.table(
            {"b": t.column("doc_id"), "ti_b": t.column("title")}
        ),
        batch_format="pyarrow",
    )
    if id_ty is None:
        id_ty = pa.string()
    j1 = _fix_empty_blocks(
        pairs.select_columns(["a", "b"])
        .join(t_a, "inner", num_partitions, on=("a",), **join_kw)
        .materialize(),
        [("a", id_ty), ("b", id_ty), ("ti_a", pa.string())],
    )
    j2 = _fix_empty_blocks(
        j1.join(t_b, "inner", num_partitions, on=("b",), **join_kw)
        .materialize(),
        [("a", id_ty), ("b", id_ty), ("ti_a", pa.string()),
         ("ti_b", pa.string())],
    )

    def verify_batch(t: pa.Table) -> pa.Table:
        dist, keep = lev_leq(
            t.column("ti_a").to_pylist(), t.column("ti_b").to_pylist(), k
        )
        kept = t.select(["a", "b"]).append_column(
            "dist", pa.array(dist, pa.int64())
        )
        return kept.filter(pa.array(keep))

    return j2.map_batches(verify_batch, batch_format="pyarrow")


def edit_distance_join(
    ds: rd.Dataset,
    col: str = "title",
    id_col: str = "doc_id",
    k: int = 2,
    bucket_cap: int = 1 << 16,
    pair_driver_cap=_UNSET,
) -> pd.DataFrame:
    """Exact Levenshtein<=k self-join: PassJoin candidates →
    :func:`.dedup._bucket_pairs` (driver gather under the cap, Dataset
    plane past it) → banded-DP verify. Returns DataFrame(a, b, dist)
    with a < b and dist the exact edit distance.

    Exact recall holds while every candidate bucket fits ``bucket_cap``
    (segment-content buckets are near-singleton for natural titles;
    oversized ones star-reduce with the logged completeness warning
    shared with the LSH planes)."""
    records = ds.map_batches(
        lambda t: _cand_records(t, col, id_col, k), batch_format="pyarrow"
    )
    cand = _bucket_pairs(
        records, bucket_cap, driver_cap=_pair_cap(pair_driver_cap)
    )
    if isinstance(cand, rd.Dataset):
        cand = cand.materialize()
        n_capped = int(cand.sum("capped") or 0)
        if n_capped:  # pragma: no cover - oversized segment buckets
            import logging

            logging.getLogger(__name__).warning(
                "edit_distance_join: %d candidate edges star-reduced from "
                "oversized segment buckets (> %d strings share a segment) "
                "— pair list complete only for in-cap buckets",
                n_capped, bucket_cap,
            )
        vp = _verify_pairs_ds_titles(ds, cand, col, id_col, k).to_pandas()
        if not len(vp):
            return pd.DataFrame(
                {"a": [], "b": [], "dist": np.zeros(0, np.int64)}
            )
        return vp.sort_values(["a", "b"]).reset_index(drop=True)
    return _verify_driver(ds, cand, col, id_col, k)
