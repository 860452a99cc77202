"""The wave-loop crawl driver (SURVEY §3.4) — the engine's flagship pipeline.

Re-expresses the reference's ``Visit…Wait`` push loop
(/root/reference/pkg/scraper/scraper.go:236-242) as bounded per-wave Ray
Datasets cycled through:

    frontier → CandidateFilter (M1-M4, zero-copy Arrow)
             → SeenFilter (cuckoo shard actors, J2/T1: admit = seen)
             → checkpoint frontier/wave=k          (atomic, resumable)
             → robots gate + politeness schedule (groupby host, T2/T3)
             → Fetcher actor pool (S2/J3)
             → checkpoint docs/wave=k + lineage/wave=k (S6)
             → extract_links (M5/M4) ⇒ next wave's frontier

Determinism: global crawl order is (depth, priority, host, url) — depth
is the wave number, priority 0 = product page (M3), ties broken by host
then url; ``seq`` is the contiguous rank in that order, computed without
any global enumerate via per-(priority,host) count offsets
(stages/politeness.py). The reference's order is racy goroutine BFS
(SURVEY §2.9); this is its deterministic strengthening, and the Python
oracle (pipelines/oracle.py) reproduces it exactly.

Scale notes: each wave streams; the only materialization barriers are
the checkpoint writes (which double as the resume points). The seen
anti-join moves only (url_hash, first-occurrence rows) to S shard
actors; the politeness groupby is the single per-wave shuffle keyed by
host; the fetch stage is an actor pool whose inputs were already
host-partitioned by that groupby (hot hosts span several blocks, so no
single fetcher serializes on one host).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import CrawlConfig, ShopProfile
from ..sources.tables import read_dataset, write_dataset
from ..state.checkpoint import CheckpointStore
from ..stages.candidates import CandidateFilter, FRONTIER_SCHEMA
from ..stages.extract import extract_links
from ..stages.fetcher import Fetcher, build_corpus_index
from ..stages.politeness import HostConfig, compute_seq_offsets, schedule_host_group
from ..stages.urlseen import SeenFilter, create_shards

LINEAGE_COLS = [
    "req_id",
    "url",
    "host",
    "depth",
    "priority",
    "seq",
    "callback",
    "status",
    "error",
    "sched_start_ms",
    "sched_end_ms",
]


@dataclass
class CrawlResult:
    waves: int = 0
    fetched: int = 0
    admitted: int = 0
    seconds: float = 0.0
    ckpt: CheckpointStore | None = None
    stats: list = field(default_factory=list)


class _RobotsFlag:
    """Adds the robots_denied column (admitted-but-never-fetched gate)."""

    def __init__(self, host_cfg: HostConfig):
        self.cfg = host_cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        denied = np.fromiter(
            (self.cfg.robots_denied(h, u) for h, u in zip(hosts, urls)),
            dtype=bool,
            count=len(urls),
        )
        return batch.append_column("robots_denied", pa.array(denied))


def run_crawl(
    corpus: pa.Table,
    hosts: pa.Table,
    seeds: pa.Table,
    profile: ShopProfile,
    cfg: CrawlConfig,
    ckpt_root: str,
    resume: bool = False,
) -> CrawlResult:
    """Run (or resume) a crawl; all state lands under ``ckpt_root``.

    ``corpus`` is the synthetic web (J3); in production the Fetcher is an
    HTTP client and this argument disappears.
    """
    t0 = time.time()
    ckpt = CheckpointStore(ckpt_root)
    host_cfg = HostConfig(hosts, default_delay_ms=cfg.default_crawl_delay_ms,
                          default_parallel=cfg.max_parallel_per_host)
    shards = create_shards(cfg.num_seen_shards, cfg.cuckoo_capacity)
    corpus_ref = ray.put(corpus)
    index_ref = ray.put(build_corpus_index(corpus))

    seq_counter = 0
    start_wave = 0
    frontier_in: rd.Dataset | None = None

    manifest = ckpt.load_manifest() if resume else None
    if manifest and manifest["committed_waves"]:
        last = max(manifest["committed_waves"])
        if not ckpt.restore_shards(shards):
            raise RuntimeError("manifest exists but shard snapshots are missing")
        seq_counter = manifest["seq_counter"]
        start_wave = last + 1
        frontier_in = _links_of_wave(ckpt, last, start_wave)
    else:
        frontier_in = rd.from_arrow(
            pa.Table.from_arrays(
                [
                    seeds.column("url"),
                    pa.array(
                        np.zeros(seeds.num_rows, dtype=np.int32), type=pa.int32()
                    ),
                    pa.array([""] * seeds.num_rows, type=pa.string()),
                ],
                names=["url", "depth", "discovered_from"],
            )
        )

    result = CrawlResult(ckpt=ckpt)
    wave = start_wave
    while True:
        if cfg.max_waves is not None and wave - start_wave >= cfg.max_waves:
            break
        admitted = _run_wave(
            frontier_in, wave, ckpt, profile, cfg, host_cfg, shards,
            corpus_ref, index_ref, seq_counter,
        )
        seq_counter += admitted["scheduled"]
        result.admitted += admitted["admitted"]
        result.fetched += admitted["scheduled"]
        result.stats.append({"wave": wave, **admitted})
        result.waves += 1
        ckpt.save_shards(shards)
        ckpt.commit_wave(wave, seq_counter)
        if admitted["admitted"] == 0:
            break
        frontier_in = _links_of_wave(ckpt, wave, wave + 1)
        wave += 1

    result.seconds = time.time() - t0
    for s in shards:
        ray.kill(s)
    return result


def _links_of_wave(ckpt: CheckpointStore, wave: int, next_depth: int) -> rd.Dataset:
    docs = ckpt.read_docs(wave)

    def to_links(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("status"), "ok"))
        links = extract_links(
            pa.table({"doc_id": t.column("url"), "spans": t.column("spans")})
        )
        return links.append_column(
            "depth",
            pa.array(np.full(links.num_rows, next_depth, dtype=np.int32)),
        )

    return docs.map_batches(to_links, batch_format="pyarrow")


def _run_wave(
    frontier_in: rd.Dataset,
    wave: int,
    ckpt: CheckpointStore,
    profile: ShopProfile,
    cfg: CrawlConfig,
    host_cfg: HostConfig,
    shards: list,
    corpus_ref,
    index_ref,
    seq_base: int,
) -> dict:
    # 1-3: filter → admit(seen) → robots flag, all streaming
    cand = frontier_in.map_batches(
        CandidateFilter(profile, cfg.num_seen_shards),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    unseen = cand.map_batches(
        SeenFilter(shards), batch_format="pyarrow", batch_size=cfg.batch_size
    )
    flagged = unseen.map_batches(_RobotsFlag(host_cfg), batch_format="pyarrow")
    # 4: checkpoint the admitted frontier (atomic materialization barrier)
    write_dataset(flagged, ckpt.frontier_uri(wave))
    admitted_ds = ckpt.read_frontier(wave)

    # 5: tiny per-(priority,host) counts → global seq offsets
    sched_only = admitted_ds.map_batches(
        lambda t: t.filter(pa.compute.invert(t.column("robots_denied"))),
        batch_format="pyarrow",
    )
    counts_df = sched_only.groupby(["priority", "host"]).count().to_pandas()
    counts = [
        (int(r["priority"]), str(r["host"]), int(r["count()"]))
        for _, r in counts_df.iterrows()
    ]
    n_sched = sum(c for _, _, c in counts)
    n_admitted = admitted_ds.count()
    if n_admitted == 0:
        # write schema-bearing empty tables directly (a Ray write of an
        # empty dataset drops the schema)
        from ..sources.tables import write_table

        write_table(
            FRONTIER_SCHEMA.append(pa.field("robots_denied", pa.bool_())).empty_table(),
            ckpt.frontier_uri(wave),
        )
        write_table(_empty_lineage(), ckpt.lineage_uri(wave))
        write_table(_empty_docs(), ckpt.docs_uri(wave))
        return {"admitted": 0, "scheduled": 0, "fetched_ok": 0}
    offsets = compute_seq_offsets(counts, seq_base)

    # 6: politeness shuffle + virtual-clock schedule
    scheduled = sched_only.groupby("host").map_groups(
        lambda g: schedule_host_group(g, host_cfg, offsets),
        batch_format="pandas",
    )

    # 7-8: fetch (actor pool) → checkpoint docs
    fetched = scheduled.map_batches(
        Fetcher,
        fn_constructor_args=(corpus_ref, index_ref),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.fetcher_concurrency,
        num_cpus=0.5,
    )
    write_dataset(fetched, ckpt.docs_uri(wave))

    # 9: lineage = fetched rows + robots_denied rows
    docs_ds = ckpt.read_docs(wave)
    fetch_lineage = docs_ds.map_batches(_lineage_of_fetch, batch_format="pyarrow")
    robots_rows = admitted_ds.map_batches(
        lambda t: _lineage_of_robots(t), batch_format="pyarrow"
    )
    write_dataset(fetch_lineage.union(robots_rows), ckpt.lineage_uri(wave))

    fetched_ok = docs_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("status"), "ok")),
        batch_format="pyarrow",
    ).count()
    return {"admitted": n_admitted, "scheduled": n_sched, "fetched_ok": fetched_ok}


def _lineage_of_fetch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    callback = pa.compute.if_else(
        pa.compute.equal(t.column("status"), "ok"),
        pa.scalar("OnResponse"),
        pa.scalar("OnError"),
    )
    cols = {
        "req_id": t.column("req_id"),
        "url": t.column("url"),
        "host": t.column("host"),
        "depth": t.column("depth"),
        "priority": t.column("priority"),
        "seq": t.column("seq"),
        "callback": callback,
        "status": t.column("status"),
        "error": t.column("error"),
        "sched_start_ms": t.column("sched_start_ms"),
        "sched_end_ms": t.column("sched_end_ms"),
    }
    return pa.table(cols)


def _lineage_of_robots(t: pa.Table) -> pa.Table:
    t = t.filter(t.column("robots_denied"))
    n = t.num_rows
    from ..functions.urls import md5_hex_many

    urls = t.column("url").to_pylist()
    return pa.table(
        {
            "req_id": pa.array(md5_hex_many(urls), type=pa.string()),
            "url": t.column("url"),
            "host": t.column("host"),
            "depth": t.column("depth"),
            "priority": t.column("priority"),
            "seq": pa.array(np.full(n, -1, dtype=np.int64)),
            "callback": pa.array(["RobotsDenied"] * n, type=pa.string()),
            "status": pa.array(["robots_denied"] * n, type=pa.string()),
            "error": pa.array(["robots.txt disallow"] * n, type=pa.string()),
            "sched_start_ms": pa.array(np.full(n, -1, dtype=np.int64)),
            "sched_end_ms": pa.array(np.full(n, -1, dtype=np.int64)),
        }
    )


def _empty_lineage() -> pa.Table:
    return pa.table(
        {
            "req_id": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "priority": pa.array([], pa.int32()),
            "seq": pa.array([], pa.int64()),
            "callback": pa.array([], pa.string()),
            "status": pa.array([], pa.string()),
            "error": pa.array([], pa.string()),
            "sched_start_ms": pa.array([], pa.int64()),
            "sched_end_ms": pa.array([], pa.int64()),
        }
    )


def _empty_docs() -> pa.Table:
    from ..stages.fetcher import FETCHED_SCHEMA

    return FETCHED_SCHEMA.empty_table()
