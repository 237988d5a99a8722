"""Input discovery — the getFilesFromDir analog.

Reference: ``core/Jochre.scala:109-119`` — directory listing filtered
by an extension regex, truncated to ``maxImages``. Here: parquet file
listing filtered by a filename regex, with optional row limit applied
lazily (``ds.limit``) and column pruning pushed to the read.
"""

from __future__ import annotations

import re
from pathlib import Path

import ray.data


def read_transcripts(
    input_dir: str | Path,
    *,
    pattern: str = r".*\.parquet$",
    columns: list[str] | None = None,
    limit: int | None = None,
) -> "ray.data.Dataset":
    """List + filter + read transcript parquet files as one Dataset."""
    rx = re.compile(pattern)
    files = sorted(
        str(p) for p in Path(input_dir).iterdir() if rx.match(p.name)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {pattern!r} under {input_dir}")
    ds = ray.data.read_parquet(files, columns=columns)
    if limit is not None:
        ds = ds.limit(limit)
    return ds
