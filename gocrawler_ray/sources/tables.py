"""Table store: Lance when available, Parquet directories otherwise.

The north rule stores crawl state in Lance tables; this container has no
``lance`` wheel, so the store gates on an import-try and falls back to
Parquet with the SAME layout and schemas (a directory per table, part
files per partition/wave).

Commit protocol (round-4 verdict #1): MARKER-SEAL, never rename. Every
``write_table`` / ``write_dataset`` target directory is written in place
and then sealed with a ``_SUCCESS`` marker whose creation is the commit
point — atomic on object stores (single small PUT) and on local disk
(create+close), where POSIX rename is not portable to S3/GCS. A killed
writer leaves an UNSEALED directory, which recovery (``CheckpointStore``
resume, ``write_partitioned``) discards and rebuilds; readers outside
recovery only ever see directories a sealed manifest points at. All
entry points take an optional fsspec filesystem / URI (``sources/fsio``),
so ``ckpt_root="s3://…"`` works unchanged; ``norename://`` proves the
protocol rename-free in tests.
"""

from __future__ import annotations

import posixpath

import pyarrow as pa
import pyarrow.parquet as pq

from .fsio import arrow_fs, clear_dir, seal_dir, url_to_fs

try:  # pragma: no cover - not present in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False

import ray.data as rd


def write_table(table: pa.Table, uri: str, fs=None) -> None:
    """Materialize an Arrow table at ``uri`` (a directory), marker-sealed."""
    fs, path = url_to_fs(uri, fs)
    clear_dir(fs, path)
    fs.makedirs(path, exist_ok=True)
    if HAVE_LANCE:  # stub-exercised: tests/test_sinks.py::test_lance_branch_stub_backed
        lance.write_dataset(table, path)
    else:
        pafs = arrow_fs(fs)
        where = posixpath.join(path, "part-0.parquet")
        if pafs is None:
            pq.write_table(table, where)
        else:
            pq.write_table(table, where, filesystem=pafs)
    seal_dir(fs, path)


def write_dataset(ds, uri: str, fs=None) -> None:
    """Write a Ray Dataset at ``uri``, marker-sealed (streams — workers
    write part files in parallel, the driver seals once the job ends; no
    driver materialization)."""
    fs, path = url_to_fs(uri, fs)
    clear_dir(fs, path)
    fs.makedirs(path, exist_ok=True)
    if HAVE_LANCE:  # stub-exercised (same test)
        ds.write_lance(path)
    else:
        pafs = arrow_fs(fs)
        if pafs is None:
            ds.write_parquet(path)
        else:
            ds.write_parquet(path, filesystem=pafs)
    seal_dir(fs, path)


def parquet_num_rows(uri: str, fs=None) -> int:
    """Row count of a parquet directory from footers only (cheap: no data
    pages). Returns -1 when the directory holds no part files (an empty
    Ray write) so callers can lay down an explicit empty table."""
    fs, path = url_to_fs(uri, fs)
    total, found = 0, False
    for p in sorted(fs.glob(posixpath.join(path, "*.parquet"))):
        found = True
        with fs.open(p, "rb") as f:
            total += pq.ParquetFile(f).metadata.num_rows
    return total if found else -1


def write_partitioned(
    ds, root: str, partition_col: str, resume: bool = True, fs=None
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
    ``root`` may be any fsspec URI (marker-seal, rename-free — the same
    commit primitive as the checkpoint store).

    The skip-filter broadcasts only the sealed-value set (bounded by
    partition cardinality, never row count); everything else streams.
    """
    import posixpath

    import pyarrow.compute as pc
    from urllib.parse import unquote

    from .fsio import SEAL, is_sealed, seal_dir

    fs, path = url_to_fs(root, fs)
    fs.makedirs(path, exist_ok=True)
    done: set[str] = set()
    for p in fs.ls(path):
        d = posixpath.basename(p.rstrip("/"))
        if "=" not in d or not fs.isdir(p):
            continue
        if resume and is_sealed(fs, p):
            # hive dirs carry URL-ENCODED values (space, '/', '=', '%'):
            # decode before comparing against raw column values, or an
            # encoded partition would be silently re-written on resume
            done.add(unquote(d.split("=", 1)[1]))
        else:  # half-written (or resume=False): rebuild from scratch
            fs.rm(p, recursive=True)
    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            vals = pc.cast(t.column(partition_col), pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    pafs = arrow_fs(fs)
    if pafs is None:
        ds.write_parquet(path, partition_cols=[partition_col])
    else:
        ds.write_parquet(path, partition_cols=[partition_col], filesystem=pafs)
    sealed = []
    for p in sorted(fs.ls(path)):
        d = posixpath.basename(p.rstrip("/"))
        if "=" in d and fs.isdir(p) and not fs.exists(
            posixpath.join(p, SEAL)
        ):
            seal_dir(fs, p)
            sealed.append(unquote(d.split("=", 1)[1]))
    return sealed


def read_dataset(uri: str, columns=None, fs=None, **kwargs):
    fs, path = url_to_fs(uri, fs)
    pafs = arrow_fs(fs)
    if pafs is not None:
        kwargs.setdefault("filesystem", pafs)
    if HAVE_LANCE:  # stub-exercised (same test)
        return rd.read_lance(path, columns=columns, **kwargs)
    if columns is not None:
        # Ray 2.49's read_parquet(columns=..., partitioning=None) crashes
        # (UnboundLocalError in _infer_data_and_partition_columns). The
        # default hive partitioning path works, and the explicit column
        # list already keeps layout dirs (wave=<k>) out of the schema.
        return rd.read_parquet(path, columns=columns, **kwargs)
    # partitioning=None: our wave=<k> directory names are layout, not hive
    # partition columns — don't let the reader infer them into the schema
    return rd.read_parquet(path, partitioning=None, **kwargs)


def read_table(uri: str, columns=None, fs=None) -> pa.Table:
    fs, path = url_to_fs(uri, fs)
    if HAVE_LANCE:  # stub-exercised (same test)
        return lance.dataset(path).to_table(columns=columns)
    pafs = arrow_fs(fs)
    if pafs is None:
        return pq.read_table(path, columns=columns)
    return pq.read_table(path, columns=columns, filesystem=pafs)
