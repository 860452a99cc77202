"""Checkpoint extras: manifest wave stats + request-trace JSON export."""

import json
import shutil

from gocrawler_ray.config import CrawlConfig
from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
from gocrawler_ray.pipelines.crawl import run_crawl
from gocrawler_ray.state.checkpoint import CheckpointStore, export_lineage_json

ROOT = "/tmp/gocrawler_test/ckpt_extras"


def test_manifest_stats_and_json_export():
    spec = CorpusSpec(n_docs=120, n_hosts=2, seed=6)
    t = generate(spec)
    shutil.rmtree(ROOT, ignore_errors=True)
    res = run_crawl(
        t["corpus"], t["hosts"], t["seeds"], profile_of(spec),
        CrawlConfig(num_seen_shards=2, fetcher_concurrency=2), ROOT,
    )
    ckpt = CheckpointStore(ROOT)

    # durable per-wave counters (A1-A5)
    m = ckpt.load_manifest()
    stats = m["wave_stats"]
    assert sum(v["admitted"] for v in stats.values()) == res.admitted
    assert sum(v["scheduled"] for v in stats.values()) == res.fetched

    # request-trace JSON export (S6 contract)
    out = f"{ROOT}/scraping_request.json"
    n = export_lineage_json(ckpt, out)
    data = json.load(open(out))
    assert n == len(data) == res.admitted
    row = data[0]
    assert set(row) == {
        "id", "absolute_url", "callback", "error_msg", "request",
        "response", "start_at", "end_at", "request_duration",
    }
    assert row["request"]["method"] == "GET"
    statuses = {d["response"]["status_code"] for d in data}
    assert 200 in statuses and 404 in statuses
    # M18 contract: start_at/end_at are RFC3339 (time.Time marshal) on
    # the fixed virtual epoch; duration is a durafmt string; the start
    # instant roundtripped through Go's UnixDate layout (second
    # resolution), so it never carries a fractional part
    import re

    rfc = re.compile(r"^2006-01-0\dT\d\d:\d\d:\d\d(\.\d+)?Z$")
    for d in data:
        assert rfc.match(d["start_at"]) and rfc.match(d["end_at"])
        assert "." not in d["start_at"]
        assert re.match(r"^(\d+ \w+ ?)+$", d["request_duration"])
    # fetched requests are sorted by virtual start time (RFC3339 on one
    # epoch sorts lexicographically; robots-denied rows sort last)
    starts = [
        d["start_at"] for d in data if d["response"]["status_code"] != 0
    ]
    assert starts == sorted(starts)


def test_audits_catch_corrupted_checkpoint(ray_session):
    """The crawl-core audits must BITE: corrupting a checkpoint copy
    (one req_id byte, one dropped quarantine row) moves the audit
    numbers — so a gate pass is evidence of integrity, not a tautology
    that compares the store to itself."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gocrawler_ray.functions.urls import md5_hex_arrow

    spec = CorpusSpec(n_docs=150, n_hosts=3, seed=9)
    t = generate(spec)
    root = "/tmp/gocrawler_test/ckpt_audit"
    shutil.rmtree(root, ignore_errors=True)
    run_crawl(
        t["corpus"], t["hosts"], t["seeds"], profile_of(spec),
        CrawlConfig(num_seen_shards=2, fetcher_concurrency=2), root,
    )

    def req_ok_count(ckpt_root: str) -> int:
        total = 0
        for f in glob.glob(os.path.join(ckpt_root, "docs", "**",
                                        "*.parquet"), recursive=True):
            tb = pq.read_table(f, columns=["url", "req_id"])
            want = np.asarray(md5_hex_arrow(tb.column("url")),
                              dtype=object)
            got = tb.column("req_id").to_numpy(zero_copy_only=False)
            total += int((want == got).sum())
        return total

    clean = req_ok_count(root)
    assert clean > 0

    # corrupt ONE req_id in a copy — the lineage audit count must drop
    dup = "/tmp/gocrawler_test/ckpt_audit_corrupt"
    shutil.rmtree(dup, ignore_errors=True)
    shutil.copytree(root, dup)
    victim = sorted(glob.glob(os.path.join(dup, "docs", "**",
                                           "*.parquet"),
                              recursive=True))[0]
    tb = pq.read_table(victim)
    req = tb.column("req_id").to_pylist()
    req[0] = "0" * 32
    tb = tb.set_column(tb.schema.get_field_index("req_id"), "req_id",
                       pa.array(req, pa.string()))
    pq.write_table(tb, victim)
    assert req_ok_count(dup) == clean - 1

    # drop one quarantine row — the per-wave census must shrink
    qfiles = sorted(glob.glob(os.path.join(dup, "quarantine", "**",
                                           "*.parquet"),
                              recursive=True))
    qfiles = [f for f in qfiles if pq.read_metadata(f).num_rows > 0]
    if qfiles:
        qt = pq.read_table(qfiles[0])
        pq.write_table(qt.slice(1), qfiles[0])
        n_q = sum(pq.read_metadata(f).num_rows for f in qfiles)
        n_q_clean = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(root, "quarantine", "**",
                                            "*.parquet"),
                               recursive=True))
        assert n_q == n_q_clean - 1
