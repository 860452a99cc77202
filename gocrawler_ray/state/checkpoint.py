"""Crawl checkpoint/resume (SURVEY §4.3) — replaces the reference's lossy
last-URL-to-.env checkpoint (/root/reference/pkg/scraper/scraper.go:283-304).

Layout under ``<root>/``:

- ``docs/wave=<k>/``     — one row per ADMITTED url of wave k: fetched
  interleaved-span rows plus not_found / robots_denied rows (this table
  is simultaneously the admitted frontier, the fetched corpus slice, and
  the fetch lineage — requestTracker field contract:
  /root/reference/pkg/scraper/requestTracker.go:49-112);
- ``schedule/wave=<k>/`` — politeness sidecar (url, seq, virtual
  sched_start/end) — a pure function of the admitted set;
- ``urlseen/wave=<k>/shard=<s>.bin`` — per-wave versioned cuckoo shard
  snapshots (pruned as commits advance);
- ``MANIFEST.json``      — committed waves + seq counter + per-wave
  admitted/scheduled counters, written atomically LAST, so a kill
  between any two steps resumes cleanly.

Resume invariant: a wave's shard snapshot is taken AFTER its admissions
(seen-before-fetch) and the manifest commits only after docs + schedule
sidecar + snapshot are all durable — so re-running wave k+1 from the
manifest re-fetches nothing (the kill/resume test asserts zero
duplicate fetches).
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
    def docs_uri(self, wave: int) -> str:
        return os.path.join(self.root, "docs", f"wave={wave}")

    def schedule_uri(self, wave: int) -> str:
        return os.path.join(self.root, "schedule", f"wave={wave}")

    def quarantine_uri(self, wave: int) -> str:
        return os.path.join(self.root, "quarantine", f"wave={wave}")

    def _shard_path(self, wave: int, s: int) -> str:
        return os.path.join(self.root, "urlseen", f"wave={wave}", f"shard={s}.bin")

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.json")

    # -- manifest --------------------------------------------------------
    def load_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def commit_wave(
        self,
        wave: int,
        seq_counter: int,
        extra: dict | None = None,
        stats: dict | None = None,
    ):
        m = self.load_manifest() or {"committed_waves": [], "seq_counter": 0}
        if wave not in m["committed_waves"]:
            m["committed_waves"].append(wave)
        m["seq_counter"] = seq_counter
        if stats is not None:
            # durable per-wave counters (the reference's visit/scan
            # counters A1-A5, SURVEY §2.5), keyed by wave
            m.setdefault("wave_stats", {})[str(wave)] = stats
        m.update(extra or {})
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path())

    # -- cuckoo shards ---------------------------------------------------
    # Snapshots are VERSIONED per wave: the wave-k+1 job may run (and
    # mutate the shard actors) while wave k's politeness sidecar + commit
    # are still in flight on a background thread — an unversioned
    # snapshot overwritten by k+1 admissions would, after a crash, mark
    # uncommitted urls as seen and lose them forever on resume.
    def save_shards(self, shards: list, wave: int) -> None:
        d = os.path.join(self.root, "urlseen", f"wave={wave}")
        os.makedirs(d, exist_ok=True)
        blobs = ray.get([s.snapshot.remote() for s in shards])
        for i, blob in enumerate(blobs):
            tmp = self._shard_path(wave, i) + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, self._shard_path(wave, i))

    def restore_shards(self, shards: list, wave: int) -> bool:
        paths = [self._shard_path(wave, i) for i in range(len(shards))]
        if not all(os.path.exists(p) for p in paths):
            return False
        ray.get(
            [
                s.restore.remote(open(p, "rb").read())
                for s, p in zip(shards, paths)
            ]
        )
        return True

    def prune_shard_snapshots(self, keep_from_wave: int) -> None:
        import shutil

        base = os.path.join(self.root, "urlseen")
        if not os.path.isdir(base):
            return
        for d in os.listdir(base):
            if d.startswith("wave=") and int(d.split("=")[1]) < keep_from_wave:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    # -- datasets --------------------------------------------------------
    def read_docs(self, wave: int, **kwargs):
        return read_dataset(self.docs_uri(wave), **kwargs)

    def read_all_docs_table(self):
        import pyarrow as pa

        tables = []
        docs_root = os.path.join(self.root, "docs")
        if os.path.isdir(docs_root):
            for d in sorted(os.listdir(docs_root)):
                tables.append(read_table(os.path.join(docs_root, d)))
        return pa.concat_tables(tables) if tables else None

    def read_all_quarantine_table(self):
        """All captcha-quarantine rows (S8) across committed waves."""
        import pyarrow as pa

        from ..stages.extract import QUARANTINE_SCHEMA

        tables = []
        base = os.path.join(self.root, "quarantine")
        if os.path.isdir(base):
            for d in sorted(os.listdir(base)):
                tables.append(read_table(os.path.join(base, d)))
        return (
            pa.concat_tables(tables) if tables else QUARANTINE_SCHEMA.empty_table()
        )

    def read_lineage_table(self, wave: int):
        """Full lineage of a wave, derived: the docs table IS the fetch
        lineage (requestTracker contract,
        /root/reference/pkg/scraper/requestTracker.go:49-112) joined with
        the politeness schedule sidecar for seq + virtual timings.
        Robots-denied rows carry seq = sched = -1 (never dispatched)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        docs = read_table(self.docs_uri(wave)).select(
            ["req_id", "url", "host", "depth", "priority", "status", "error"]
        )
        sched = read_table(self.schedule_uri(wave))
        joined = docs.join(sched, keys="url", join_type="left outer")
        callback = pc.case_when(
            pc.make_struct(
                pc.equal(joined.column("status"), "ok"),
                pc.equal(joined.column("status"), "robots_denied"),
            ),
            pa.scalar("OnResponse"),
            pa.scalar("RobotsDenied"),
            pa.scalar("OnError"),
        )
        out = joined.append_column("callback", callback)
        for col in ("seq", "sched_start_ms", "sched_end_ms"):
            idx = out.schema.get_field_index(col)
            out = out.set_column(
                idx,
                col,
                pc.fill_null(out.column(col), pa.scalar(-1, pa.int64())),
            )
        return out

    def read_all_lineage_table(self):
        import pyarrow as pa

        root = os.path.join(self.root, "docs")
        waves = sorted(
            int(d.split("=")[1]) for d in os.listdir(root)
        ) if os.path.isdir(root) else []
        return pa.concat_tables([self.read_lineage_table(w) for w in waves])


def export_lineage_json(ckpt: "CheckpointStore", out_path: str) -> int:
    """Export the crawl lineage as the reference's request-trace JSON (S6).

    Field contract mirrors ``scrapingRequests.MarshalJSON``
    (/root/reference/pkg/scraper/requestTracker.go:49-112): id,
    absolute_url, callback, error_msg, request{url, depth, method},
    response{status_code}, start_at/end_at as RFC3339 (time.Time JSON
    marshal), request_duration as a durafmt string. M18 timestamp
    format/parse is exercised exactly like the reference: the start
    instant roundtrips through Go's ``time.UnixDate`` layout (ctx put at
    OnRequest, scraper.go:119; parse at OnResponse, scraper.go:126 —
    truncating to seconds), while the end instant keeps ms precision.
    The engine's politeness clock is virtual; it is pinned to the fixed
    ``VIRTUAL_EPOCH`` so the JSON is deterministic. Returns the number
    of rows written. Intended for small/debug crawls — at scale the
    parquet lineage tables are the system of record.
    """
    import json as _json

    import numpy as np

    from ..functions.times import (
        durafmt_ms,
        format_unixdate_many,
        parse_unixdate_many,
        to_rfc3339_many,
    )

    t = ckpt.read_all_lineage_table()
    recs = t.to_pylist()
    start_ms = np.array(
        [max(0, r["sched_start_ms"]) for r in recs], dtype=np.int64
    )
    end_ms = np.array([max(0, r["sched_end_ms"]) for r in recs], dtype=np.int64)
    # ctx roundtrip: format UnixDate at request time, parse it back at
    # response time (second resolution — Go's layout carries no ms)
    start_parsed = (
        parse_unixdate_many(format_unixdate_many(start_ms))
        if recs
        else start_ms
    )
    start_strs = to_rfc3339_many(start_parsed) if recs else []
    end_strs = to_rfc3339_many(end_ms) if recs else []
    rows = []
    for r, s_ms, s_str, e_ms, e_str in zip(
        recs, start_parsed, start_strs, end_ms, end_strs
    ):
        status = {"ok": 200, "not_found": 404, "robots_denied": 0}.get(
            r["status"], 0
        )
        rows.append(
            {
                "id": r["req_id"],
                "absolute_url": r["url"],
                "callback": r["callback"],
                "error_msg": r["error"] or "",
                "request": {
                    "url": r["url"],
                    "depth": r["depth"],
                    "method": "GET",
                },
                "response": {"status_code": status},
                "start_at": s_str,
                "end_at": e_str,
                "request_duration": durafmt_ms(max(0, int(e_ms) - int(s_ms))),
                "_start_ms": int(r["sched_start_ms"]),
            }
        )
    rows.sort(key=lambda x: (x["_start_ms"] if x["_start_ms"] >= 0 else 1 << 60, x["id"]))
    for x in rows:
        del x["_start_ms"]
    tmp = out_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        _json.dump(rows, f, indent="\t")
    os.replace(tmp, out_path)
    return len(rows)
