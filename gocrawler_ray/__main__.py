"""Command-line entry — the engine counterpart of the reference's
driver binaries (``cmd/crawler/main.go:16-53``: env-configured seed
list → crawl → store + request-trace JSON; ``cmd/parser``: enrichment
over stored items). Re-expressed for the Ray engine:

    python -m gocrawler_ray gen    --docs 4000 --hosts 4 --out DIR
    python -m gocrawler_ray crawl  --corpus DIR --out CKPT [--resume]
    python -m gocrawler_ray query  NAME --sf-dir DIR [--out FILE.parquet]
    python -m gocrawler_ray list
    python -m gocrawler_ray extsort --input T.parquet --key C --out DIR
    python -m gocrawler_ray status  --ckpt CKPT [--verify]

``gen`` materializes a deterministic synthetic web (the sandbox's
stand-in for HTTP — see stages/fetcher.py for the actor seam a real
transport plugs into); ``crawl`` runs the full engine (candidate
filter → cuckoo-shard admission → robots → politeness → fetch →
checkpoint) and prints one JSON stats line; ``query`` runs any of the
catalog pipelines over a testdata-shaped directory and writes parquet
(or prints a head). The CLI owns its Ray session (guarded — the
driver/test harness may already hold one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cmd_gen(args: argparse.Namespace) -> int:
    from .corpus import CorpusSpec, write

    _ensure_ray(args.cpus)
    spec = CorpusSpec(seed=args.seed, n_docs=args.docs, n_hosts=args.hosts)
    paths = write(spec, args.out)
    print(json.dumps({"out": args.out, **paths}))
    return 0


def _cmd_crawl(args: argparse.Namespace) -> int:
    import pyarrow.parquet as pq

    from .config import CrawlConfig
    from .corpus import CorpusSpec, profile_of
    from .pipelines.crawl import run_crawl

    _ensure_ray(args.cpus)
    marker = os.path.join(args.corpus, "_SPEC")
    if not os.path.exists(marker):
        print(f"error: {args.corpus} is not a generated corpus dir "
              "(missing _SPEC; run `gen` first)", file=sys.stderr)
        return 2
    spec = eval(  # noqa: S307 - marker is written by our own `gen`
        open(marker).read().split("//")[0],
        {"__builtins__": {}, "CorpusSpec": CorpusSpec},
    )
    corpus_path = os.path.join(args.corpus, "corpus.parquet")
    if not os.path.exists(corpus_path):
        corpus_path = os.path.join(args.corpus, "corpus")
    corpus = pq.read_table(corpus_path)
    hosts = pq.read_table(os.path.join(args.corpus, "hosts.parquet"))
    seeds = pq.read_table(os.path.join(args.corpus, "seeds.parquet"))
    cfg = CrawlConfig(num_seen_shards=args.shards,
                      fetcher_concurrency=args.fetchers)
    res = run_crawl(corpus, hosts, seeds, profile_of(spec), cfg, args.out,
                    resume=args.resume)
    print(json.dumps({
        "checkpoint": args.out,
        "fetched": res.fetched,
        "waves": res.waves,
        "admitted": res.admitted,
        "elapsed_sec": round(res.seconds, 3),
        "urls_per_sec": round(res.fetched / max(res.seconds, 1e-9), 1),
    }))
    return 0


def _cmd_list(_args: argparse.Namespace) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    for name in sorted(entry.queries()):
        print(name)
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    catalog = entry.queries()
    if args.name not in catalog:
        print(f"error: unknown query {args.name!r} (see `list`)",
              file=sys.stderr)
        return 2
    _ensure_ray(args.cpus)
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = catalog[args.name](args.sf_dir)
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    if args.out:
        res.to_parquet(args.out, index=False)
        print(json.dumps({"query": args.name, "rows": len(res),
                          "out": args.out}))
    else:
        with pd.option_context("display.max_columns", None,
                               "display.width", 200):
            print(res.head(args.head).to_string(index=False))
        print(f"# {len(res)} rows")
    return 0


def _cmd_status(args: argparse.Namespace) -> int:
    """Inspect a crawl checkpoint (works on any fsspec URI): committed
    waves, per-wave counters, seq position — what a resume would see.
    Pure manifest/metadata reads; no Ray session, no data scans."""
    from .sources.tables import parquet_num_rows
    from .state.checkpoint import CheckpointStore

    ck = CheckpointStore(args.ckpt)
    m = ck.load_manifest()
    if m is None:
        print(json.dumps({"ckpt": args.ckpt, "committed_waves": [],
                          "resumable": False}))
        return 0
    waves = sorted(m.get("committed_waves", []))
    stats = m.get("wave_stats", {})
    out = {
        "ckpt": args.ckpt,
        "committed_waves": waves,
        "seq_counter": m.get("seq_counter"),
        "num_seen_shards": m.get("num_seen_shards"),
        "resumable": bool(waves),
        "waves": [
            {"wave": w, **stats.get(str(w), {})} for w in waves
        ],
        "admitted_total": sum(
            int(s.get("admitted", 0)) for s in stats.values()
        ),
        "scheduled_total": sum(
            int(s.get("scheduled", 0)) for s in stats.values()
        ),
    }
    if args.verify:  # footer-only row counts per committed wave
        for rec in out["waves"]:
            n = parquet_num_rows(ck.docs_uri(rec["wave"]), fs=ck.fs)
            rec["docs_rows"] = max(0, n)
            rec["docs_match"] = (
                n == rec.get("admitted") if "admitted" in rec else None
            )
    print(json.dumps(out))
    return 0


def _cmd_extsort(args: argparse.Namespace) -> int:
    """Durable total order of a parquet table by an int64 column —
    the external-sort plane as a user-facing command."""
    _ensure_ray(args.cpus)
    import pyarrow.compute as pc

    from .sources.tables import read_dataset
    from .stages.external_sort import external_sort_write

    cols = (
        None  # all columns
        if args.columns is None
        else [args.key] + [c for c in args.columns.split(",") if c]
    )
    ds = read_dataset(args.input, columns=cols)
    schema = ds.schema()
    if args.key not in schema.names:
        print(f"error: no column {args.key!r} in {args.input} "
              f"(columns: {schema.names})", file=sys.stderr)
        return 2
    kt = schema.types[schema.names.index(args.key)]
    if not str(kt).startswith("int"):
        print(f"error: sort key {args.key!r} must be an integer column "
              f"(got {kt}); encode a composite int64 key first",
              file=sys.stderr)
        return 2
    if args.key != "k":
        import pyarrow as pa

        ds = ds.map_batches(
            lambda t: t.append_column(
                "k", pc.cast(t.column(args.key), pa.int64())
            ),
            batch_format="pyarrow",
        )
    man = external_sort_write(
        ds, args.out, "k", n_ranges=args.ranges, resume=not args.no_resume
    )
    print(json.dumps({
        "out": args.out,
        "total_rows": man["total_rows"],
        "n_runs": len(man["runs"]),
        "monotonic": man["monotonic"],
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gocrawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="materialize a deterministic synthetic web")
    g.add_argument("--docs", type=int, default=4000)
    g.add_argument("--hosts", type=int, default=4)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)
    g.add_argument("--cpus", type=int, default=None)
    g.set_defaults(fn=_cmd_gen)

    c = sub.add_parser("crawl", help="run the full crawl engine")
    c.add_argument("--corpus", required=True, help="dir written by `gen`")
    c.add_argument("--out", required=True, help="checkpoint root")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--shards", type=int, default=4)
    c.add_argument("--fetchers", type=int, default=2)
    c.add_argument("--cpus", type=int, default=None)
    c.set_defaults(fn=_cmd_crawl)

    l = sub.add_parser("list", help="list catalog queries")
    l.set_defaults(fn=_cmd_list)

    q = sub.add_parser("query", help="run a catalog query over an sf dir")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="write parquet here")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--cpus", type=int, default=None)
    q.set_defaults(fn=_cmd_query)

    e = sub.add_parser(
        "extsort",
        help="durable external sort of a parquet table by an int64 key",
    )
    e.add_argument("--input", required=True, help="parquet file or dir")
    e.add_argument("--key", required=True, help="int64 sort-key column")
    e.add_argument("--columns", default=None,
                   help="comma-separated payload columns to carry")
    e.add_argument("--out", required=True,
                   help="run-tree root (any fsspec URI)")
    e.add_argument("--ranges", type=int, default=16)
    e.add_argument("--no-resume", action="store_true")
    e.add_argument("--cpus", type=int, default=None)
    e.set_defaults(fn=_cmd_extsort)

    s = sub.add_parser(
        "status", help="inspect a crawl checkpoint (manifest summary)"
    )
    s.add_argument("--ckpt", required=True,
                   help="checkpoint root (any fsspec URI)")
    s.add_argument("--verify", action="store_true",
                   help="also check docs row counts vs recorded counters")
    s.set_defaults(fn=_cmd_status)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
