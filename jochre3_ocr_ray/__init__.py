"""jochre3_ocr_ray — Ray-Data-native layered extraction engine."""

from __future__ import annotations

import sys
import types


def _seed_fsspec_http_stub() -> None:
    """Make Ray's lazy fsspec-http probe thread-safe in this sandbox.

    ``fsspec.implementations.http`` needs aiohttp, which is absent
    here, so the import fails — and a FAILED import is retried on every
    call, letting two concurrent Dataset executions race on the
    partially-initialized module ("cannot import name HTTPFileSystem").
    Seeding a stable stub module (with a sentinel class no filesystem
    will ever be an instance of) makes Ray's
    ``path_util._is_http_filesystem`` probe deterministic and
    thread-safe without touching site-packages.
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module works; nothing to do
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: isinstance() is always False
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


_seed_fsspec_http_stub()
