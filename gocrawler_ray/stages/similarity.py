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
from ..functions.numeric import round_half_away


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
            sims = round_half_away(sims, self.round_to)
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

    # task stage: per-batch reconstruction is one node-local ray.get
    # plus normalizing a (nq, dim) matrix — negligible next to the
    # matmul, and tasks skip the actor-pool spin-up an actor stage pays
    def local_topk(t: pa.Table) -> pa.Table:
        return BruteForceTopK(ref, k, id_col, emb_col)(t)

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = (
        partials.sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit mix (seeded-sample hash)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def kmeans_lite(
    ds: rd.Dataset, num_clusters: int, emb_col: str = "embedding",
    iters: int = 5, seed: int = 17, sample_limit: int = 4096,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic centroids from a SEEDED UNIFORM sample (numpy Lloyd).

    The sample is hash-selected (splitmix64(id ^ seed) mod stride), not
    ``ds.limit`` — a head sample sees only the first blocks, which on
    sorted/clustered data yields biased centroids."""
    n = ds.count()
    stride = max(1, n // sample_limit)

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        keep = _splitmix64(ids.view(np.uint64) ^ np.uint64(seed)) % np.uint64(stride) == 0
        return t.filter(pa.array(keep))

    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    X = np.vstack(sample[emb_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(num_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(0)
    return cent


class IvfIndex:
    """Persisted IVF index: centroids + cluster-partitioned vector table.

    ``build`` runs k-means-lite on a seeded sample, assigns EVERY vector
    its nearest centroid in one map pass, and writes the vectors as
    parquet partitioned by ``cluster=<c>`` — so a probe is a PRUNED READ
    of ``nprobe`` partition directories, not a rescan+reassign of the
    corpus. At 100 TB the partition directories are the unit of both
    resumability (rebuild one cluster's shard) and query locality.
    """

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.index_dir = index_dir
        self.centroids = centroids
        self.id_col, self.emb_col = id_col, emb_col

    @classmethod
    def build(
        cls, ds: rd.Dataset, num_clusters: int, index_dir: str,
        id_col: str = "vec_id", emb_col: str = "embedding", seed: int = 17,
    ) -> "IvfIndex":
        import os

        cent = kmeans_lite(ds, num_clusters, emb_col, seed=seed, id_col=id_col)

        def assign(t: pa.Table) -> pa.Table:
            emb = _emb_matrix(t, emb_col)
            d = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            return t.append_column("cluster", pa.array(d.argmin(1).astype(np.int32)))

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "vectors"), partition_cols=["cluster"]
        )
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        return cls(index_dir, cent, id_col, emb_col)

    @classmethod
    def load(cls, index_dir: str, id_col: str = "vec_id",
             emb_col: str = "embedding") -> "IvfIndex":
        import os

        cent = np.load(os.path.join(index_dir, "centroids.npy"))
        return cls(index_dir, cent, id_col, emb_col)

    def probe(self, queries: dict, nprobe: int) -> rd.Dataset:
        """Pruned read of the ``nprobe`` nearest cluster partitions."""
        import os

        q = queries["matrix"].astype(np.float64)
        qd = ((q[:, None, :] - self.centroids[None, :, :]) ** 2).sum(-1)
        probe = sorted(set(np.argsort(qd, axis=1)[:, :nprobe].ravel().tolist()))
        import glob

        dirs = [
            os.path.join(self.index_dir, "vectors", f"cluster={c}") for c in probe
        ]
        files = [
            f
            for d in dirs
            if os.path.isdir(d)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        # the partitioned write leaves one small file per (block,
        # cluster); without coalescing, the pruned read schedules one
        # task per tiny file and scheduling dominates the matmul
        return rd.read_parquet(
            files, columns=[self.id_col, self.emb_col],
            override_num_blocks=max(1, min(len(files), 8)),
        )

    def topk(self, queries: dict, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        return brute_force_topk(
            self.probe(queries, nprobe), queries, k, self.id_col, self.emb_col
        )


def ivf_topk(
    ds: rd.Dataset,
    queries: dict,
    k: int = 10,
    num_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 17,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Approximate top-k probing only the nprobe nearest clusters.

    With ``index_dir`` the persisted :class:`IvfIndex` is built (or
    reused if present) and probed via pruned partition reads — the scale
    path. Without it, assignment happens inline on a full scan (fine for
    one-shot small runs; at scale always persist the index)."""
    if index_dir is not None:
        import os

        if os.path.exists(os.path.join(index_dir, "centroids.npy")):
            idx = IvfIndex.load(index_dir, id_col, emb_col)
        else:
            idx = IvfIndex.build(ds, num_clusters, index_dir, id_col, emb_col, seed)
        return idx.topk(queries, k, nprobe)

    cent = kmeans_lite(ds, num_clusters, emb_col, seed=seed, id_col=id_col)
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


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random-hyperplane signs + multi-probe)
# ---------------------------------------------------------------------------

def _lsh_code(emb: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket code per row: bit j = (v · r_j > 0)."""
    bits = emb @ planes > 0.0
    weights = (np.int64(1) << np.arange(planes.shape[1], dtype=np.int64))
    return (bits * weights).sum(axis=1).astype(np.int64)


def _probe_codes(code: int, n_planes: int, radius: int) -> np.ndarray:
    """All bucket codes within hamming ``radius`` of ``code``
    (multi-probe): Σ_{i≤r} C(n_planes, i) codes — 79 for 12 planes at
    r=2, independent of corpus size."""
    from itertools import combinations

    out = [code]
    for r in range(1, radius + 1):
        for flips in combinations(range(n_planes), r):
            m = 0
            for f in flips:
                m |= 1 << f
            out.append(code ^ m)
    return np.unique(np.array(out, dtype=np.int64))


def lsh_topk(
    ds: rd.Dataset,
    queries: dict,
    k: int = 10,
    n_planes: int = 12,
    probe_radius: int = 2,
    seed: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """ANN via random-hyperplane LSH with multi-probe — the
    second scale path next to IVF (`ivf_topk`): vectors bucket by the
    sign pattern of ``n_planes`` seeded projections; a query scans only
    rows whose code lies within hamming ``probe_radius`` of its own.

    Scale posture: the code is a partition key exactly like IVF's
    cluster id — at corpus scale vectors persist partitioned by code
    (``write_partitioned``) and a probe is a pruned READ of
    Σ C(planes, ≤r) directories; in-stream here the probe set prunes
    each batch with one vectorized ``isin`` before the matmul. Recall
    follows the hyperplane collision bound P[bit equal] = 1 − θ/π per
    plane; at full radius the filter passes everything and the result
    equals brute force by construction (pytest guards that identity)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    q = queries["matrix"].astype(np.float64)
    # probe set = union of every query row's hamming ball (a row that
    # collides with ANY query survives the filter; each query's top-k is
    # still scored independently by the inner brute-force kernel)
    probe = np.unique(np.concatenate([
        _probe_codes(int(c), n_planes, probe_radius)
        for c in _lsh_code(q, planes)
    ]))

    planes_ref = ray.put(planes)
    probe_ref = ray.put(probe)
    q_ref = ray.put(queries)

    # task stage, not an actor pool: per-batch state reconstruction is
    # two node-local zero-copy ray.gets plus normalizing the tiny query
    # matrix — the same measured trade as brute_force_topk (the (1, 4)
    # actor-pool variant paid ~2 s of spin-up and capped fan-out at 4)
    def probe_topk(t: pa.Table) -> pa.Table:
        inner = BruteForceTopK(q_ref, k, id_col, emb_col)
        if t.num_rows == 0:
            return inner(t)
        emb = _emb_matrix(t, emb_col)
        codes = _lsh_code(emb, ray.get(planes_ref))
        keep = np.isin(codes, ray.get(probe_ref))
        return inner(t.filter(pa.array(keep)))

    parts = ds.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["cos", id_col], ascending=[False, True])
        .groupby("query_id", as_index=False, group_keys=False)
        .head(k)
    )
    return out.reset_index(drop=True)
