"""Environment shims (this container only; every shim is a no-op when
the real dependency exists).

fsspec-http import race
-----------------------
``fsspec.implementations.http`` needs ``aiohttp``, which this container
does not ship. Ray Data probes that module on EVERY ``write_parquet`` /
``read_parquet`` path resolution (``ray/data/datasource/path_util.py::
_is_http_filesystem``) and catches only ``ModuleNotFoundError``. Because
a failed module import is removed from ``sys.modules``, every probe
re-executes the module body — and when two threads probe concurrently
(the crawl engine overlaps its politeness sidecar thread with the main
wave thread, both writing tables), CPython's import deadlock-avoidance
can hand one thread the partially-initialized module, turning the error
into a bare ``ImportError: cannot import name 'HTTPFileSystem'`` that
Ray does NOT catch — an ~3 % flake that killed whole crawl waves.

:func:`shim_fsspec_http` registers a tiny inert stand-in module ONCE at
package import: the probe then finds a stable module whose
``HTTPFileSystem`` is a sentinel class nothing is an instance of, so
Ray's ``isinstance`` check returns False exactly as the caught-error
path would — no per-call module execution, no race window. Anyone who
actually tries to CONSTRUCT the stub gets the original
``ModuleNotFoundError('aiohttp')``.
"""

from __future__ import annotations

import sys
import types


def shim_fsspec_http() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module imports fine — nothing to shim
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass  # partially-initialized casualty of the race: replace it too

    class HTTPFileSystem:  # sentinel: isinstance() is always False
        def __init__(self, *args, **kwargs):
            raise ModuleNotFoundError(
                "No module named 'aiohttp' (gocrawler_ray stub for "
                "fsspec.implementations.http — install aiohttp for real "
                "HTTP filesystem support)"
            )

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations as _fi

        _fi.http = mod
    except Exception:  # fsspec absent entirely: sys.modules entry suffices
        pass
