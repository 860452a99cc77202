"""Crawl checkpoint/resume (SURVEY §4.3) — replaces the reference's lossy
last-URL-to-.env checkpoint (/root/reference/pkg/scraper/scraper.go:283-304).

Layout under ``<root>/``:

- ``frontier/wave=<k>/``  — the ADMITTED (post-seen-filter) frontier of
  wave k, with schedule + seq columns;
- ``docs/wave=<k>/``      — fetched interleaved-span rows;
- ``lineage/wave=<k>/``   — requestTracker-contract rows
  (req_id, url, callback, status, error, timings — field contract:
  /root/reference/pkg/scraper/requestTracker.go:49-112);
- ``urlseen/shard=<s>.bin`` — serialized cuckoo shards;
- ``MANIFEST.json``       — committed waves + seq counter, written
  atomically LAST, so a kill between any two steps resumes cleanly.

Resume invariant: shard snapshots are taken AFTER a wave's frontier is
admitted (seen-before-fetch) and the manifest commits after docs+lineage
are durable — so re-running wave k+1 from the manifest re-fetches
nothing (the kill/resume test asserts zero duplicate fetches).
"""

from __future__ import annotations

import json
import os
import uuid

import ray

from ..sources.tables import read_dataset, read_table


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def frontier_uri(self, wave: int) -> str:
        return os.path.join(self.root, "frontier", f"wave={wave}")

    def docs_uri(self, wave: int) -> str:
        return os.path.join(self.root, "docs", f"wave={wave}")

    def lineage_uri(self, wave: int) -> str:
        return os.path.join(self.root, "lineage", f"wave={wave}")

    def _shard_path(self, s: int) -> str:
        return os.path.join(self.root, "urlseen", f"shard={s}.bin")

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    # -- manifest --------------------------------------------------------
    def load_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def commit_wave(self, wave: int, seq_counter: int, extra: dict | None = None):
        m = self.load_manifest() or {"committed_waves": [], "seq_counter": 0}
        if wave not in m["committed_waves"]:
            m["committed_waves"].append(wave)
        m["seq_counter"] = seq_counter
        m.update(extra or {})
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())

    # -- cuckoo shards ---------------------------------------------------
    def save_shards(self, shards: list) -> None:
        os.makedirs(os.path.join(self.root, "urlseen"), exist_ok=True)
        blobs = ray.get([s.snapshot.remote() for s in shards])
        for i, blob in enumerate(blobs):
            tmp = self._shard_path(i) + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, self._shard_path(i))

    def restore_shards(self, shards: list) -> bool:
        paths = [self._shard_path(i) for i in range(len(shards))]
        if not all(os.path.exists(p) for p in paths):
            return False
        ray.get(
            [
                s.restore.remote(open(p, "rb").read())
                for s, p in zip(shards, paths)
            ]
        )
        return True

    # -- datasets --------------------------------------------------------
    def read_frontier(self, wave: int):
        return read_dataset(self.frontier_uri(wave))

    def read_docs(self, wave: int):
        return read_dataset(self.docs_uri(wave))

    def read_all_docs_table(self):
        import pyarrow as pa

        tables = []
        docs_root = os.path.join(self.root, "docs")
        if os.path.isdir(docs_root):
            for d in sorted(os.listdir(docs_root)):
                tables.append(read_table(os.path.join(docs_root, d)))
        return pa.concat_tables(tables) if tables else None
