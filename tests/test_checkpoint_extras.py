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
