"""Table store: Lance when available, Parquet directories otherwise.

The north rule stores crawl state in Lance tables; this container has no
``lance`` wheel, so the store gates on an import-try and falls back to
Parquet with the SAME layout and schemas (a directory per table, part
files per partition/wave). Every write goes through an atomic
temp-dir-then-rename so a killed writer never leaves a half-visible
partition (the resume contract, SURVEY §4.3/§4.4).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not present in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

import ray.data as rd


def write_table(table: pa.Table, uri: str) -> None:
    """Atomically materialize an Arrow table at ``uri`` (a directory)."""
    tmp = f"{uri}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        if HAVE_LANCE:  # stub-exercised: tests/test_sinks.py::test_lance_branch_stub_backed
            lance.write_dataset(table, tmp)
        else:
            pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        if os.path.exists(uri):
            shutil.rmtree(uri)
        os.replace(tmp, uri)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def write_dataset(ds, uri: str) -> None:
    """Atomically write a Ray Dataset at ``uri`` (streams, no driver
    materialization)."""
    tmp = f"{uri}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        if HAVE_LANCE:  # stub-exercised (same test)
            ds.write_lance(tmp)
        else:
            ds.write_parquet(tmp)
        if os.path.exists(uri):
            shutil.rmtree(uri)
        os.replace(tmp, uri)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def write_partitioned(
    ds, root: str, partition_col: str, resume: bool = True
) -> list[str]:
    """Resumable hive-partitioned Parquet sink — the 100 TB output
    contract (SURVEY §4.3): one directory per partition value, each
    sealed with a ``_SUCCESS`` marker once complete, so a re-run after
    a crash (a) SKIPS every sealed partition without re-reading or
    re-shuffling its rows (they are filtered out map-only at the
    source), (b) rebuilds any half-written partition from scratch (its
    unsealed directory is discarded — the write itself is not atomic
    per file, the marker is the commit point), and (c) never writes one
    giant file. Returns the partition values sealed by THIS call.

    The skip-filter broadcasts only the sealed-value set (bounded by
    partition cardinality, never row count); everything else streams.
    """
    import pyarrow.compute as pc
    from urllib.parse import unquote

    os.makedirs(root, exist_ok=True)
    done: set[str] = set()
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if "=" not in d or not os.path.isdir(p):
            continue
        if resume and os.path.exists(os.path.join(p, "_SUCCESS")):
            # hive dirs carry URL-ENCODED values (space, '/', '=', '%'):
            # decode before comparing against raw column values, or an
            # encoded partition would be silently re-written on resume
            done.add(unquote(d.split("=", 1)[1]))
        else:  # half-written (or resume=False): rebuild from scratch
            shutil.rmtree(p)
    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            vals = pc.cast(t.column(partition_col), pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    ds.write_parquet(root, partition_cols=[partition_col])
    sealed = []
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d)
        if "=" in d and os.path.isdir(p) and not os.path.exists(
            os.path.join(p, "_SUCCESS")
        ):
            with open(os.path.join(p, "_SUCCESS"), "w"):
                pass
            sealed.append(unquote(d.split("=", 1)[1]))
    return sealed


def read_dataset(uri: str, columns=None, **kwargs):
    if HAVE_LANCE:  # stub-exercised (same test)
        return rd.read_lance(uri, columns=columns, **kwargs)
    if columns is not None:
        # Ray 2.49's read_parquet(columns=..., partitioning=None) crashes
        # (UnboundLocalError in _infer_data_and_partition_columns). The
        # default hive partitioning path works, and the explicit column
        # list already keeps layout dirs (wave=<k>) out of the schema.
        return rd.read_parquet(uri, columns=columns, **kwargs)
    # partitioning=None: our wave=<k> directory names are layout, not hive
    # partition columns — don't let the reader infer them into the schema
    return rd.read_parquet(uri, partitioning=None, **kwargs)


def read_table(uri: str, columns=None) -> pa.Table:
    if HAVE_LANCE:  # stub-exercised (same test)
        return lance.dataset(uri).to_table(columns=columns)
    return pq.read_table(uri, columns=columns)
