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
        if HAVE_LANCE:  # pragma: no cover
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
        if HAVE_LANCE:  # pragma: no cover
            ds.write_lance(tmp)
        else:
            ds.write_parquet(tmp)
        if os.path.exists(uri):
            shutil.rmtree(uri)
        os.replace(tmp, uri)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def read_dataset(uri: str, columns=None, **kwargs):
    if HAVE_LANCE:  # pragma: no cover
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
    if HAVE_LANCE:  # pragma: no cover
        return lance.dataset(uri).to_table(columns=columns)
    return pq.read_table(uri, columns=columns)
