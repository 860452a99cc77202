"""Similarity search over embedding columns (``list<float>``).

- **Brute-force cosine top-k** (the exactness baseline): the query
  matrix is ``ray.put`` ONCE and read per actor; each batch does one
  numpy matmul and emits only its local top-k rows per query, so the
  final exact top-k reduce sees k × num_batches rows, not the corpus.
- **IVF top-k** (the scale path): deterministic k-means-lite centroids →
  every vector gets a cluster id (one broadcast matmul per batch) →
  queries probe only the ``nprobe`` nearest clusters; recall/latency
  trade tuned by (num_clusters, nprobe). At 100 TB the cluster
  assignment is a partition key: cluster-pruned reads replace the full
  scan.

Everything is float64 throughout so results are bit-comparable with a
DuckDB ``list_cosine_similarity`` oracle (driver correctness gate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _emb_matrix(t: pa.Table, emb_col: str) -> np.ndarray:
    col = t.column(emb_col)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(t.num_rows, -1)


class BruteForceTopK:
    """map_batches actor: per-batch local top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str,
                 round_to: int | None = 6):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q_ids = q["ids"]
        self.q = q["matrix"].astype(np.float64)  # (nq, dim)
        self.qn = np.linalg.norm(self.q, axis=1)
        self.k = k
        self.round_to = round_to
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 self.id_col: pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        emb = _emb_matrix(t, self.emb_col)
        ids = t.column(self.id_col).to_numpy()
        norms = np.linalg.norm(emb, axis=1)
        sims = (emb @ self.q.T) / np.outer(norms, self.qn)  # (n, nq)
        if self.round_to is not None:
            # round BEFORE selection so values that compare equal at the
            # oracle's precision tie-break identically here and in SQL
            sims = np.round(sims, self.round_to)
        k = min(self.k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            # exact top-k with (−cos, id) tie-break: take every row tied
            # with the kth value, lexsort just those, keep k
            kth = np.partition(-s, k - 1)[k - 1]
            sel = np.flatnonzero(-s <= kth)
            order = sel[np.lexsort((ids[sel], -s[sel]))][:k]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_id.append(ids[order])
            out_cos.append(s[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cos": pa.array(np.concatenate(out_cos)),
            }
        )


def brute_force_topk(
    ds: rd.Dataset,
    queries: dict,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact top-k: local top-k per batch → tiny global exact reduce.

    ``queries`` = {"ids": int array, "matrix": (nq, dim)}; tie-break on
    (−cos, id) so results are deterministic and SQL-comparable.
    """
    ref = ray.put(queries)
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(ref, k, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def kmeans_lite(
    ds: rd.Dataset, num_clusters: int, emb_col: str = "embedding",
    iters: int = 5, seed: int = 17, sample_limit: int = 4096,
) -> np.ndarray:
    """Deterministic centroids from a bounded head sample (numpy Lloyd)."""
    sample = ds.limit(sample_limit).to_pandas()
    X = np.vstack(sample[emb_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=num_clusters, replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(num_clusters):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(0)
    return cent


def ivf_topk(
    ds: rd.Dataset,
    queries: dict,
    k: int = 10,
    num_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 17,
) -> pd.DataFrame:
    """Approximate top-k probing only the nprobe nearest clusters."""
    cent = kmeans_lite(ds, num_clusters, emb_col, seed=seed)
    q = queries["matrix"].astype(np.float64)
    qd = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probe = set(np.argsort(qd, axis=1)[:, :nprobe].ravel().tolist())

    def in_probed(t: pa.Table) -> pa.Table:
        emb = _emb_matrix(t, emb_col)
        d = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        mask = np.isin(assign, list(probe))
        return t.filter(pa.array(mask))

    pruned = ds.map_batches(in_probed, batch_format="pyarrow")
    return brute_force_topk(pruned, queries, k, id_col, emb_col)
