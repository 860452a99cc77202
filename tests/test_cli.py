"""CLI surface (``python -m gocrawler_ray``) — the engine counterpart of
the reference's driver binaries (``cmd/crawler/main.go:16-53``). In-process
via ``main(argv)`` so the session Ray fixture is reused."""

import json
import os

import pytest

from gocrawler_ray.__main__ import main


def test_cli_gen_crawl_resume(tmp_path, capsys):
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    assert main(["gen", "--docs", "300", "--hosts", "2", "--out", corpus]) == 0
    gen_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(gen_out["corpus"])
    assert os.path.exists(os.path.join(corpus, "_SPEC"))

    assert main(["crawl", "--corpus", corpus, "--out", ckpt,
                 "--shards", "2", "--fetchers", "1"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["fetched"] > 0 and stats["waves"] > 0

    # resume over a finished checkpoint is a no-op crawl
    assert main(["crawl", "--corpus", corpus, "--out", ckpt, "--resume",
                 "--shards", "2", "--fetchers", "1"]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["fetched"] == 0


def test_cli_crawl_rejects_non_corpus_dir(tmp_path, capsys):
    assert main(["crawl", "--corpus", str(tmp_path), "--out",
                 str(tmp_path / "ckpt")]) == 2
    assert "_SPEC" in capsys.readouterr().err


def test_cli_list_and_query(tmp_path, capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_agg" in names and len(names) >= 80

    out = str(tmp_path / "q1.parquet")
    assert main(["query", "q1_agg", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["rows"] == 6 and os.path.exists(out)

    assert main(["query", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])


def test_ray_job_entry_run_and_resume(tmp_path):
    """The `ray job submit` entrypoint (tools/ray_job_entry.py) as the
    driver would run it: own Ray session per invocation, cut at 2 waves,
    resubmitted with --resume — completes with no duplicate fetches.
    Subprocess-based because the job script owns its session (the one
    legitimate ray.init outside bench/tests per the driver contract)."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "ray_job_entry.py")
    ckpt = str(tmp_path / "jobck")
    common = [sys.executable, script, "--n-docs", "250", "--n-hosts", "2",
              "--num-seen-shards", "4", "--ckpt-root", ckpt]
    out1 = subprocess.run(common + ["--max-waves", "2"], check=True,
                          capture_output=True, text=True, cwd=str(tmp_path))
    r1 = json.loads(out1.stdout.strip().splitlines()[-1])
    assert r1["waves"] == 2
    out2 = subprocess.run(common + ["--resume"], check=True,
                          capture_output=True, text=True, cwd=str(tmp_path))
    r2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert r2["resume"] and r2["waves"] >= 1

    from gocrawler_ray.state.checkpoint import CheckpointStore

    lin = CheckpointStore(ckpt).read_all_lineage_table()
    urls = lin.column("url").to_pylist()
    assert len(urls) == len(set(urls))  # zero duplicate fetches


def test_cli_extsort(tmp_path, capsys):
    """`extsort` runs the durable external sort over a parquet input and
    leaves a sealed, globally-ordered run tree."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "t.parquet")
    rng = np.random.RandomState(3)
    keys = rng.randint(-1000, 1000, size=2000).astype(np.int64)
    pq.write_table(pa.table({"c": keys, "v": np.arange(2000)}), src)
    out = str(tmp_path / "sorted_tree")
    assert main(["extsort", "--input", src, "--key", "c",
                 "--out", out, "--ranges", "4"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total_rows"] == 2000 and res["monotonic"]
    got = np.concatenate([
        pq.read_table(d, columns=["k"])["k"].to_numpy()
        for d in sorted(glob.glob(os.path.join(out, "sorted", "range=*")),
                        key=lambda p: int(p.split("=")[1]))
    ])
    np.testing.assert_array_equal(got, np.sort(keys))

    # non-integer key fails loudly
    assert main(["extsort", "--input", src, "--key", "missing",
                 "--out", out]) != 0


def test_cli_status(tmp_path, capsys):
    """`status` summarizes a checkpoint from the manifest (and --verify
    cross-checks docs row counts against the recorded counters)."""
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    assert main(["gen", "--docs", "250", "--hosts", "2", "--out", corpus]) == 0
    capsys.readouterr()
    assert main(["crawl", "--corpus", corpus, "--out", ckpt,
                 "--shards", "2", "--fetchers", "1"]) == 0
    crawl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["status", "--ckpt", ckpt, "--verify"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["resumable"] and st["committed_waves"] == sorted(
        st["committed_waves"])
    assert st["admitted_total"] == crawl["admitted"]
    assert st["scheduled_total"] == crawl["fetched"]
    assert all(w["docs_match"] for w in st["waves"])

    # empty/unknown checkpoint: not resumable, no crash
    assert main(["status", "--ckpt", str(tmp_path / "nope")]) == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not st2["resumable"]
