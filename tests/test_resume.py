"""Kill/resume: a crawl stopped mid-run and resumed from checkpoint must
fetch zero duplicates and end bit-identical to an uninterrupted run
(SURVEY §4.3; replaces the reference's lossy .env seed checkpoint,
/root/reference/pkg/scraper/scraper.go:283-304)."""

import os
import shutil

import pyarrow as pa

from gocrawler_ray.config import CrawlConfig
from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
from gocrawler_ray.pipelines.crawl import run_crawl
from gocrawler_ray.sources.tables import read_table

SPEC = CorpusSpec(n_docs=250, n_hosts=2)
CFG = CrawlConfig(num_seen_shards=4, fetcher_concurrency=2, batch_size=512)


def _read_all(root, sub):
    if sub == "lineage":
        from gocrawler_ray.state.checkpoint import CheckpointStore

        return CheckpointStore(root).read_all_lineage_table()
    base = os.path.join(root, sub)
    return pa.concat_tables(
        [read_table(os.path.join(base, d)) for d in sorted(os.listdir(base))]
    )


def test_kill_and_resume_no_duplicate_fetches():
    t = generate(SPEC)
    prof = profile_of(SPEC)

    full_root = "/tmp/gocrawler_test/resume_full"
    part_root = "/tmp/gocrawler_test/resume_part"
    shutil.rmtree(full_root, ignore_errors=True)
    shutil.rmtree(part_root, ignore_errors=True)

    run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, CFG, full_root)

    # "kill" after 2 waves, then resume
    cfg_cut = CrawlConfig(**{**CFG.__dict__, "max_waves": 2})
    run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg_cut, part_root)
    run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, CFG, part_root, resume=True)

    full_lineage = _read_all(full_root, "lineage")
    part_lineage = _read_all(part_root, "lineage")

    # zero duplicate fetches across the kill point
    urls = part_lineage.column("url").to_pylist()
    assert len(urls) == len(set(urls))

    # identical final outputs
    def key(t):
        return sorted(
            (r["seq"], r["url"], r["status"], r["sched_start_ms"]) for r in t.to_pylist()
        )

    assert key(full_lineage) == key(part_lineage)

    full_docs = _read_all(full_root, "docs")
    part_docs = _read_all(part_root, "docs")
    a = {r["url"]: r["spans"] for r in full_docs.to_pylist() if r["status"] == "ok"}
    b = {r["url"]: r["spans"] for r in part_docs.to_pylist() if r["status"] == "ok"}
    assert a == b

    fs = set(_read_all(full_root, "docs").column("url").to_pylist())
    ps = set(_read_all(part_root, "docs").column("url").to_pylist())
    assert fs == ps

    # resuming under a DIFFERENT shard count must fail loudly: url_hash%S
    # routing changes, so a silent partial restore would re-admit (and
    # re-fetch) previously-seen urls
    import pytest

    cfg_wrong = CrawlConfig(**{**CFG.__dict__, "num_seen_shards": 2})
    with pytest.raises(RuntimeError, match="num_seen_shards"):
        run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg_wrong,
                  part_root, resume=True)
