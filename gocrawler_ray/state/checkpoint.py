"""Crawl checkpoint/resume (SURVEY §4.3) — replaces the reference's lossy
last-URL-to-.env checkpoint (/root/reference/pkg/scraper/scraper.go:283-304).

Layout under ``<root>/`` (any fsspec URI — local path, ``s3://``,
``norename://`` in the rename-free proof tests):

- ``docs/wave=<k>/``     — one row per ADMITTED url of wave k: fetched
  interleaved-span rows plus not_found / robots_denied rows (this table
  is simultaneously the admitted frontier, the fetched corpus slice, and
  the fetch lineage — requestTracker field contract:
  /root/reference/pkg/scraper/requestTracker.go:49-112);
- ``schedule/wave=<k>/`` — politeness sidecar (url, seq, virtual
  sched_start/end) — a pure function of the admitted set;
- ``urlseen/wave=<k>/shard=<s>.bin`` — per-wave versioned cuckoo shard
  snapshots (pruned as commits advance);
- ``manifest/v<N>.json`` + ``v<N>.json.sealed`` — committed waves + seq
  counter + per-wave admitted/scheduled counters.

Commit protocol (round-4 verdict #1): MARKER-SEAL, never rename — object
stores have neither atomic nor cheap rename, so nothing here calls it.
Data directories (docs/schedule/quarantine via sources/tables, urlseen
snapshots here) are written in place and sealed with a marker file LAST;
the manifest is write-once VERSIONED: commit N writes the full JSON to
``manifest/v<N>.json`` and then creates ``v<N>.json.sealed``, and the
reader takes the highest sealed version that parses (a kill mid-write
leaves an unsealed or truncated v<N>, which recovery ignores in favor of
v<N-1>). Old versions are pruned two commits later.

Resume invariant: a wave's shard snapshot is taken AFTER its admissions
(seen-before-fetch) and the manifest commits only after docs + schedule
sidecar + snapshot are all durable — so re-running wave k+1 from the
manifest re-fetches nothing (the kill/resume tests assert zero
duplicate fetches, on the plain local store AND through the
rename-forbidding ``norename://`` shim).
"""

from __future__ import annotations

import json
import os
import posixpath
import re
import uuid

import ray

from ..sources.fsio import clear_dir, is_sealed, seal_dir, url_to_fs
from ..sources.tables import read_dataset, read_table


class CheckpointStore:
    def __init__(self, root: str, fs=None):
        self.root = root
        self.fs, self.path = url_to_fs(root, fs)
        self.fs.makedirs(self.path, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def docs_uri(self, wave: int) -> str:
        return posixpath.join(self.path, "docs", f"wave={wave}")

    def schedule_uri(self, wave: int) -> str:
        return posixpath.join(self.path, "schedule", f"wave={wave}")

    def quarantine_uri(self, wave: int) -> str:
        return posixpath.join(self.path, "quarantine", f"wave={wave}")

    def _shard_dir(self, wave: int) -> str:
        return posixpath.join(self.path, "urlseen", f"wave={wave}")

    def _shard_path(self, wave: int, s: int) -> str:
        return posixpath.join(self._shard_dir(wave), f"shard={s}.bin")

    def _manifest_dir(self) -> str:
        return posixpath.join(self.path, "manifest")

    # -- manifest --------------------------------------------------------
    def _manifest_versions(self) -> list[int]:
        d = self._manifest_dir()
        if not self.fs.exists(d):
            return []
        names = [posixpath.basename(p) for p in self.fs.ls(d)]
        sealed = {
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"v(\d+)\.json\.sealed", n))
        }
        return sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"v(\d+)\.json", n)) and int(m.group(1)) in sealed
        )

    def load_manifest(self) -> dict | None:
        # highest SEALED version that parses — a kill mid-commit leaves an
        # unsealed (or sealed-then-truncated-by-a-broken-store) candidate,
        # which recovery skips in favor of the previous commit
        for v in reversed(self._manifest_versions()):
            try:
                with self.fs.open(
                    posixpath.join(self._manifest_dir(), f"v{v:08d}.json")
                ) as f:
                    return json.load(f)
            except (ValueError, OSError):  # pragma: no cover - torn write
                continue
        # legacy single-file trees (pre marker-seal)
        p = posixpath.join(self.path, "MANIFEST.json")
        if self.fs.exists(p):
            with self.fs.open(p) as f:
                return json.load(f)
        return None

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
        d = self._manifest_dir()
        self.fs.makedirs(d, exist_ok=True)
        versions = self._manifest_versions()
        v = (versions[-1] if versions else 0) + 1
        name = posixpath.join(d, f"v{v:08d}.json")
        with self.fs.open(name, "w") as f:
            json.dump(m, f)
        with self.fs.open(name + ".sealed", "wb") as f:  # the commit point
            f.write(b"")
        for old in versions[:-1]:  # keep v-1 as the fallback commit
            for suffix in (".json.sealed", ".json"):  # unseal FIRST
                try:
                    self.fs.rm(posixpath.join(d, f"v{old:08d}{suffix}"))
                except OSError:  # pragma: no cover - concurrent prune
                    pass

    # -- cuckoo shards ---------------------------------------------------
    # Snapshots are VERSIONED per wave: the wave-k+1 job may run (and
    # mutate the shard actors) while wave k's politeness sidecar + commit
    # are still in flight on a background thread — an unversioned
    # snapshot overwritten by k+1 admissions would, after a crash, mark
    # uncommitted urls as seen and lose them forever on resume.
    def save_shards(self, shards: list, wave: int) -> None:
        d = self._shard_dir(wave)
        clear_dir(self.fs, d)  # a re-run of an uncommitted wave rebuilds
        self.fs.makedirs(d, exist_ok=True)
        blobs = ray.get([s.snapshot.remote() for s in shards])
        for i, blob in enumerate(blobs):
            with self.fs.open(self._shard_path(wave, i), "wb") as f:
                f.write(blob)
        seal_dir(self.fs, d)  # all shards durable -> commit the snapshot

    def restore_shards(self, shards: list, wave: int) -> bool:
        d = self._shard_dir(wave)
        paths = [self._shard_path(wave, i) for i in range(len(shards))]
        if not is_sealed(self.fs, d) or not all(
            self.fs.exists(p) for p in paths
        ):
            return False
        ray.get(
            [
                s.restore.remote(self.fs.open(p, "rb").read())
                for s, p in zip(shards, paths)
            ]
        )
        return True

    def prune_shard_snapshots(self, keep_from_wave: int) -> None:
        base = posixpath.join(self.path, "urlseen")
        if not self.fs.exists(base):
            return
        for p in self.fs.ls(base):
            d = posixpath.basename(p.rstrip("/"))
            if d.startswith("wave=") and int(d.split("=")[1]) < keep_from_wave:
                clear_dir(self.fs, posixpath.join(base, d))

    # -- datasets --------------------------------------------------------
    def _wave_dirs(self, sub: str) -> list[str]:
        base = posixpath.join(self.path, sub)
        if not self.fs.exists(base):
            return []
        waves = sorted(
            int(d.split("=")[1])
            for p in self.fs.ls(base)
            if (d := posixpath.basename(p.rstrip("/"))).startswith("wave=")
        )
        return [posixpath.join(base, f"wave={w}") for w in waves]

    def read_docs(self, wave: int, **kwargs):
        return read_dataset(self.docs_uri(wave), fs=self.fs, **kwargs)

    def read_all_docs_table(self):
        import pyarrow as pa

        tables = [read_table(d, fs=self.fs) for d in self._wave_dirs("docs")]
        return pa.concat_tables(tables) if tables else None

    def read_all_quarantine_table(self):
        """All captcha-quarantine rows (S8) across committed waves."""
        import pyarrow as pa

        from ..stages.extract import QUARANTINE_SCHEMA

        tables = [
            read_table(d, fs=self.fs) for d in self._wave_dirs("quarantine")
        ]
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

        docs = read_table(self.docs_uri(wave), fs=self.fs).select(
            ["req_id", "url", "host", "depth", "priority", "status", "error"]
        )
        sched = read_table(self.schedule_uri(wave), fs=self.fs)
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

        waves = [
            int(posixpath.basename(d).split("=")[1])
            for d in self._wave_dirs("docs")
        ]
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
    parquet lineage tables are the system of record. (Writes to a LOCAL
    debug path — not part of the store's commit protocol.)
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
