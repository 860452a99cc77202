"""The fsspec-http shim (gocrawler_ray/_compat.py): Ray's per-write
filesystem probe must be race-free. Without the shim, concurrent
probes from two threads could observe a partially-initialized
fsspec.implementations.http and crash a crawl wave with an uncaught
ImportError (~3% flake in the golden suite)."""

import concurrent.futures
import sys

import gocrawler_ray  # noqa: F401  — installs the shim at import


def test_fsspec_http_module_is_stable():
    # the module imports cleanly (real or stub) and carries the symbol
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

    assert "fsspec.implementations.http" in sys.modules


def test_ray_http_probe_is_threadsafe_and_false():
    from pyarrow.fs import LocalFileSystem

    from ray.data.datasource.path_util import _is_http_filesystem

    fs = LocalFileSystem()

    def probe(_):
        # the pre-shim failure mode was an uncaught ImportError here
        return _is_http_filesystem(fs)

    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(probe, range(400)))
    assert results == [False] * 400
