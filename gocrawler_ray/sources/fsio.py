"""Filesystem seam for every store in this package (round-4 verdict #1).

The checkpoint / table stores previously got atomicity from POSIX
``os.replace`` temp-dir renames — correct on one box, wrong on the
cluster target: object stores (S3/GCS) have neither atomic nor cheap
rename. Every commit in this package is therefore MARKER-SEAL, never
rename:

1. write the directory's data files in place (workers may write in
   parallel — Ray's ``write_parquet`` with a pyarrow filesystem);
2. create a small ``_SUCCESS`` marker in the directory LAST — a single
   tiny PUT, which object stores make atomic and local filesystems make
   effectively atomic (create+close of a 0-byte file).

Readers that participate in crash recovery treat an unsealed directory
as absent and rebuild it from scratch; the marker is the commit point.
``NoRenameFileSystem`` (registered as ``norename://``) is the proof
shim: a local filesystem whose every rename/move entry point raises, so
the kill/resume suite demonstrates the whole crawl commit path is
rename-free (tests/test_fsio.py).

Scale note: the driver-side stores (manifest, cuckoo shard snapshots,
small sealed tables) work on ANY fsspec URI; Ray *dataset* writes
additionally need a store visible to every worker node (S3/GCS/NFS —
``memory://`` is single-process and driver-only by construction).
"""

from __future__ import annotations

import posixpath

import fsspec
from fsspec.implementations.local import LocalFileSystem

SEAL = "_SUCCESS"


def url_to_fs(uri: str, fs=None):
    """Resolve ``uri`` to an (fsspec filesystem, fs-native path) pair.

    ``fs`` short-circuits resolution: callers that already hold a
    filesystem (e.g. ``CheckpointStore``) pass it with an already-native
    path. Plain paths resolve to the local filesystem.
    """
    if fs is not None:
        return fs, uri
    return fsspec.core.url_to_fs(uri)


def is_plain_local(fs) -> bool:
    """Exactly the stock local filesystem — subclass shims (norename)
    deliberately do NOT qualify, so they exercise the generic path."""
    return type(fs) is LocalFileSystem


def arrow_fs(fs):
    """pyarrow filesystem wrapper for pq/Ray IO, or None for the plain
    local fast path (pyarrow's native local handling, zero wrapper)."""
    if is_plain_local(fs):
        return None
    from pyarrow.fs import FSSpecHandler, PyFileSystem

    return PyFileSystem(FSSpecHandler(fs))


def seal_dir(fs, path: str) -> None:
    """Commit ``path``: create the marker (the atomic commit point)."""
    with fs.open(posixpath.join(path, SEAL), "wb") as f:
        f.write(b"")


def is_sealed(fs, path: str) -> bool:
    return fs.exists(posixpath.join(path, SEAL))


def clear_dir(fs, path: str) -> None:
    """Discard a directory (sealed or half-written) before a rebuild."""
    if fs.exists(path):
        fs.rm(path, recursive=True)


class NoRenameFileSystem(LocalFileSystem):
    """Local filesystem with every rename entry point forbidden —
    the object-store stand-in that PROVES the commit protocol never
    relies on rename atomicity (S3/GCS semantics on local disk, so Ray
    workers in other processes still see the files)."""

    protocol = "norename"

    def __init__(self, *a, **kw):
        kw.setdefault("auto_mkdir", False)
        super().__init__(*a, **kw)

    def mv(self, *a, **kw):  # also covers .rename/.move aliases
        raise AssertionError("rename is forbidden on this store (object-store semantics)")

    def mv_file(self, *a, **kw):
        raise AssertionError("rename is forbidden on this store (object-store semantics)")

    @classmethod
    def _strip_protocol(cls, path):
        path = str(path)
        if path.startswith("norename://"):
            path = path[len("norename://"):]
        return LocalFileSystem._strip_protocol(path)


try:  # idempotent across repeated imports
    fsspec.register_implementation("norename", NoRenameFileSystem)
except ValueError:  # pragma: no cover - already registered
    pass
