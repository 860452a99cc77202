"""Cluster job entrypoint — the north rule's ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \
        python tools/ray_job_entry.py --n-docs 1000000 \
        --ckpt-root s3://bucket/crawls/run1 [--resume]

``ray.init(address="auto")`` attaches to the submitting cluster (falls
back to a local session outside one — the sandbox/test mode). The
checkpoint root may be any fsspec URI: every commit is marker-seal
(sources/fsio), so S3/GCS work without rename atomicity, and a killed
job resubmitted with ``--resume`` continues from the last committed
wave with zero duplicate fetches. Prints one JSON line with the crawl
result (the job driver's output channel).

The corpus here is the deterministic synthetic web (the sandbox's
network stand-in); a real deployment passes ``--transport http`` to
fetch via HttpFetcher/UrllibClient with the reference's 30 s
dial/TLS/request discipline instead (stages/fetcher.py) — the engine
is transport-agnostic (pipelines/crawl.run_crawl(fetch_fn=...)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# workers must import gocrawler_ray too: under `ray job submit
# --working-dir .` the working dir ships to every node; in the local
# sandbox mode the env var does the same job
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-docs", type=int, default=10_000,
                   help="synthetic web size (pages)")
    p.add_argument("--n-hosts", type=int, default=8)
    p.add_argument("--ckpt-root", required=True,
                   help="checkpoint root (any fsspec URI, e.g. s3://…)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-seen-shards", type=int, default=16)
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--enforce-politeness", action="store_true")
    p.add_argument("--transport", choices=["corpus", "http"],
                   default="corpus")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        try:  # inside a cluster (ray job submit): attach
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR")
        except ConnectionError:  # sandbox/test mode: own local session
            ray.init(address="local", include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl

    spec = CorpusSpec(n_docs=args.n_docs, n_hosts=args.n_hosts)
    t = generate(spec)
    cfg = CrawlConfig(
        num_seen_shards=args.num_seen_shards,
        max_waves=args.max_waves,
        enforce_politeness=args.enforce_politeness,
    )
    fetch_fn = None
    if args.transport == "http":  # pragma: no cover - needs a network
        from gocrawler_ray.stages.fetcher import HttpFetcher, UrllibClient

        raise NotImplementedError(
            "http transport needs a span decoder for real pages; wire "
            "HttpFetcher(UrllibClient(), decode_spans) for your site "
            f"(client class: {UrllibClient.__name__})"
        )
    res = run_crawl(
        t["corpus"], t["hosts"], t["seeds"], profile_of(spec), cfg,
        args.ckpt_root, resume=args.resume, fetch_fn=fetch_fn,
    )
    print(json.dumps({
        "waves": res.waves,
        "fetched": res.fetched,
        "admitted": res.admitted,
        "seconds": round(res.seconds, 3),
        "ckpt_root": args.ckpt_root,
        "resume": args.resume,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
