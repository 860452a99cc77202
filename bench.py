"""Benchmark harness (driver contract).

Default: run the headline pipelines at ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``
and print ONE JSON line::

    {"metric": "e2e_sec", "value": N, "unit": "sec",
     "queries": {...per-stage seconds..., "crawl_urls_per_sec": R},
     "sf": ..., "num_cpus": N}

``--scaling``: run the headline crawl twice in fresh processes
(num_cpus=8 then 32) on the SAME corpus and report throughput at both
plus scaling efficiency (the sandbox stand-in for the N vs 4N-node
criterion — see BASELINE.md).

The crawl corpus is the deterministic synthetic web (gocrawler_ray.corpus),
sized by sf, generated once and cached under /tmp/gocrawler_bench.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# crawl corpus size by sf of the testdata dir (sf0.1 → 200k pages,
# ~115k reachable — big enough that per-wave compute dominates fixed
# per-wave job latency, which is what the scaling criterion measures)
_SF_DOCS = {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 200_000}


def corpus_paths() -> dict:
    from gocrawler_ray.corpus import CorpusSpec, write

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    n_docs = _SF_DOCS.get(sf_name, 20000)
    spec = CorpusSpec(seed=42, n_docs=n_docs, n_hosts=8)
    return write(spec, f"/tmp/gocrawler_bench/{sf_name}"), spec


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl
    from gocrawler_ray.pipelines import queries as q

    timings: dict[str, float] = {}

    # warm the page cache so we measure compute+shuffle, not first-read IO
    for t in ("lineitem", "documents", "embeddings", "events"):
        pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))

    # --- headline: crawl ------------------------------------------------
    paths, spec = corpus_paths()
    corpus = pq.read_table(paths["corpus"])
    hosts = pq.read_table(paths["hosts"])
    seeds = pq.read_table(paths["seeds"])
    ckpt = f"/tmp/gocrawler_bench/ckpt_{NUM_CPUS}"
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = CrawlConfig(
        num_seen_shards=16,
        fetcher_concurrency=max(2, NUM_CPUS // 4),
        batch_size=8192,
    )
    t0 = time.time()
    res = run_crawl(corpus, hosts, seeds, profile_of(spec), cfg, ckpt)
    crawl_sec = time.time() - t0
    timings["crawl"] = round(crawl_sec, 3)
    timings["crawl_urls_per_sec"] = round(res.fetched / crawl_sec, 1)
    timings["crawl_fetched"] = res.fetched

    # --- operator suite over the testdata tables ------------------------
    def timed(name, fn):
        t0 = time.time()
        out = fn(SF_DIR)
        # consume lazily-built datasets
        import ray.data as rd

        if isinstance(out, rd.Dataset):
            out = out.to_pandas()
        timings[name] = round(time.time() - t0, 3)
        return out

    timed("q1_agg", q.q_q1_agg)
    timed("top_orders", q.q_top_orders)
    timed("cust_nation_orders", q.q_cust_nation_orders)
    timed("events_hourly", q.q_events_hourly)
    timed("text_quality", q.q_text_quality)
    timed("token_counts", q.q_token_counts)
    timed("exact_dedup", q.q_exact_dedup)
    timed("minhash_pairs", q.q_minhash_pairs)
    timed("embedding_topk", q.q_embedding_topk)
    timed("items_parse", q.q_items_parse)

    value = round(sum(v for k, v in timings.items() if not k.startswith("crawl_")), 3)
    return {
        "metric": "e2e_sec",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> dict:
    """Same crawl at 8 and 32 CPUs in fresh processes on the same input."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    r_lo = lo["queries"]["crawl_urls_per_sec"]
    r_hi = hi["queries"]["crawl_urls_per_sec"]
    eff = (r_hi / r_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "urls_per_sec_8": r_lo,
        "urls_per_sec_32": r_hi,
        "crawl_sec_8": lo["queries"]["crawl"],
        "crawl_sec_32": hi["queries"]["crawl"],
        "sf": SF_DIR,
    }


def run_headline_only() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl

    paths, spec = corpus_paths()
    corpus = pq.read_table(paths["corpus"])
    hosts = pq.read_table(paths["hosts"])
    seeds = pq.read_table(paths["seeds"])
    ckpt = f"/tmp/gocrawler_bench/ckpt_{NUM_CPUS}"
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = CrawlConfig(
        num_seen_shards=16,
        fetcher_concurrency=max(2, NUM_CPUS // 4),
        batch_size=8192,
    )
    t0 = time.time()
    res = run_crawl(corpus, hosts, seeds, profile_of(spec), cfg, ckpt)
    sec = time.time() - t0
    return {
        "metric": "crawl_sec",
        "value": round(sec, 3),
        "unit": "sec",
        "queries": {
            "crawl": round(sec, 3),
            "crawl_urls_per_sec": round(res.fetched / sec, 1),
            "crawl_fetched": res.fetched,
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    elif "--headline-only" in sys.argv:
        result = run_headline_only()
    else:
        result = run_bench()
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
