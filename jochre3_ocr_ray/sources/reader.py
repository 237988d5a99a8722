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


def clean_parquet_schema(path: str, columns: "list[str] | None" = None):
    """Footer-only schema read with ALL metadata stripped.

    Parquet written by pandas carries a ``b'pandas'`` schema-metadata
    blob; a ``pa.Schema`` with metadata is unhashable, which silently
    disables Ray Data's schema deduplication in every downstream
    batcher/concat ("Failed to hash the schemas" warning) and forces
    the expensive unify path on every block combine. Passing the
    stripped schema to ``read_parquet`` makes all read blocks
    metadata-free (measured: warning gone, schema dedup active)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = pq.read_schema(path)
    names = columns if columns is not None else fs.names
    return pa.schema([pa.field(n, fs.field(n).type) for n in names])


def read_parquet_clean(
    paths: "str | list[str]",
    *,
    columns: "list[str] | None" = None,
    **kwargs,
) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with a metadata-stripped schema (see
    ``clean_parquet_schema``). ``paths`` may be one file or a list of
    same-schema files (schema taken from the first).

    When the caller does not pass ``override_num_blocks``, SMALL
    inputs (< 256 MiB on disk) are capped at ``max(8, cpus // 4)``
    blocks: Ray's CPU-based default would split a few-MiB file into
    ~2×cpus tiny blocks whose per-task scheduling overhead dominates
    the read (measured 3.2 s -> 0.4 s on a 2 MiB filtered read at 32
    cpus). Large inputs keep Ray's native sizing — at real block
    sizes its parallelism heuristic is the right one."""
    import os

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    schema = clean_parquet_schema(str(first), columns)
    if "override_num_blocks" not in kwargs:
        plist = paths if isinstance(paths, (list, tuple)) else [paths]

        def _size(p: str) -> int:
            # a directory's getsize is its inode size (~4 KiB), which
            # would misclassify a large multi-file dataset dir as
            # "small" — sum the contained parquet files instead
            if os.path.isdir(p):
                return sum(
                    os.path.getsize(os.path.join(p, f))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
            return os.path.getsize(p)

        try:
            total = sum(_size(str(p)) for p in plist)
        except OSError:
            total = None
        if total is not None and total < 256 * 1024 * 1024:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:  # noqa: BLE001
                cpus = 8
            kwargs["override_num_blocks"] = max(8, cpus // 4)
    return ray.data.read_parquet(
        paths, columns=columns, schema=schema, **kwargs
    )


def read_transcripts(
    input_dir: str | Path,
    *,
    pattern: str = r".*\.parquet$",
    columns: list[str] | None = None,
    limit: int | None = None,
    start_turn: int | None = None,
    end_turn: int | None = None,
) -> "ray.data.Dataset":
    """List + filter + read transcript parquet files as one Dataset.

    ``start_turn`` / ``end_turn`` slice every conversation to the
    inclusive ``turn_idx`` range — the ``PDFToImageConverter``
    startPage/endPage analog (``core/pdf/PDFToImageConverter.scala
    :18-75``: convert only pages [startPage, endPage]). The range is a
    parquet-level predicate (``read_parquet(filter=...)``), so pruning
    happens at the row-group scan, before any turn leaves storage."""
    import pyarrow.compute as pc

    rx = re.compile(pattern)
    files = sorted(
        str(p) for p in Path(input_dir).iterdir() if rx.match(p.name)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {pattern!r} under {input_dir}")
    flt = None
    if start_turn is not None:
        flt = pc.field("turn_idx") >= start_turn
    if end_turn is not None:
        hi = pc.field("turn_idx") <= end_turn
        flt = hi if flt is None else flt & hi
    kwargs = {"filter": flt} if flt is not None else {}
    ds = read_parquet_clean(files, columns=columns, **kwargs)
    if limit is not None:
        ds = ds.limit(limit)
    return ds


def read_transcripts_jsonl(
    input_dir: str | Path,
    *,
    pattern: str = r".*\.jsonl$",
) -> "ray.data.Dataset":
    """Alternate source format: JSON-lines transcripts.

    Coerces to the canonical TRANSCRIPT_SCHEMA (missing ``tool`` ->
    ""; ``ts`` parsed from ISO-8601 strings; ``turn_idx`` -> int32) so
    downstream stages see one schema regardless of the source format —
    the multiple-input-format surface of the reference
    (``getFilesFromDir``'s pdf|jpg|png filter, ``Jochre.scala:109-119``).
    """
    import pyarrow as pa

    rx = re.compile(pattern)
    files = sorted(
        str(p) for p in Path(input_dir).iterdir() if rx.match(p.name)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {pattern!r} under {input_dir}")
    ds = ray.data.read_json(files)

    def coerce(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        names = set(batch.column_names)
        tool = (
            pc.fill_null(batch["tool"], "")
            if "tool" in names
            else pa.array([""] * n, type=pa.string())
        )
        ts = batch["ts"]
        if pa.types.is_string(ts.type):
            # Arrow's ISO-8601 cast: accepts fractional seconds and
            # date-only strings directly. A trailing 'Z' or a numeric
            # offset makes the cast demand a tz-aware target, so fall
            # back to parsing as UTC and dropping to naive wall time
            # (all sources are normalized to UTC by contract).
            stripped = pc.replace_substring_regex(ts, r"Z$", "")
            try:
                ts = pc.cast(stripped, pa.timestamp("us"))
            except pa.ArrowInvalid:
                # The tz-aware parse normalizes any offset to a UTC
                # instant; the plain cast back to a naive timestamp
                # keeps that UTC wall time (pc.local_timestamp would
                # shift it to the machine's local zone).
                ts = pc.cast(
                    pc.cast(stripped, pa.timestamp("us", tz="UTC")),
                    pa.timestamp("us"),
                )
        return pa.table(
            {
                "conv_id": pc.cast(batch["conv_id"], pa.string()),
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                "role": pc.cast(batch["role"], pa.string()),
                "text": pc.fill_null(pc.cast(batch["text"], pa.string()), ""),
                "tool": pc.cast(tool, pa.string()),
                "ts": pc.cast(ts, pa.timestamp("us")),
            }
        )

    return ds.map_batches(coerce, batch_format="pyarrow")


def read_transcripts_csv(
    input_dir: str | Path,
    *,
    pattern: str = r".*\.csv$",
) -> "ray.data.Dataset":
    """Third source format: CSV transcripts, coerced to the canonical
    TRANSCRIPT_SCHEMA exactly like the JSONL reader (missing ``tool``
    -> ""; ``ts`` parsed from ISO-8601; ``turn_idx`` -> int32) — one
    schema downstream regardless of the wire format."""
    import pyarrow as pa
    import pyarrow.compute as pc

    rx = re.compile(pattern)
    files = sorted(
        str(p) for p in Path(input_dir).iterdir() if rx.match(p.name)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {pattern!r} under {input_dir}")
    ds = ray.data.read_csv(files)

    def coerce(batch: pa.Table) -> pa.Table:
        n = len(batch)
        names = set(batch.column_names)
        tool = (
            pc.fill_null(pc.cast(batch["tool"], pa.string()), "")
            if "tool" in names
            else pa.array([""] * n, type=pa.string())
        )
        ts = batch["ts"]
        if pa.types.is_string(ts.type):
            stripped = pc.replace_substring_regex(ts, r"Z$", "")
            try:
                ts = pc.cast(stripped, pa.timestamp("us"))
            except pa.ArrowInvalid:
                # The tz-aware parse normalizes any offset to a UTC
                # instant; the plain cast back to a naive timestamp
                # keeps that UTC wall time (pc.local_timestamp would
                # shift it to the machine's local zone).
                ts = pc.cast(
                    pc.cast(stripped, pa.timestamp("us", tz="UTC")),
                    pa.timestamp("us"),
                )
        return pa.table(
            {
                "conv_id": pc.cast(batch["conv_id"], pa.string()),
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                "role": pc.cast(batch["role"], pa.string()),
                "text": pc.fill_null(pc.cast(batch["text"], pa.string()), ""),
                "tool": pc.cast(tool, pa.string()),
                "ts": pc.cast(ts, pa.timestamp("us")),
            }
        )

    return ds.map_batches(coerce, batch_format="pyarrow")
