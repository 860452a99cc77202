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
