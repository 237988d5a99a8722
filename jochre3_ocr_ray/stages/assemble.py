"""Conversation assembly — the one required shuffle.

Analog of the reference's page-ordering invariant (pages collected in
document order, ``Jochre.scala:154-158``; ``Alto.content`` = pages
joined, ``Alto.scala:12-13``): Ray Data gives no row-order guarantee,
so stable turn ordering is data-driven — ``groupby(conv_id)`` with an
in-group sort on ``turn_idx`` (SURVEY.md §4 "Ordering").

Skew: conversation sizes are Zipf-ish; a hot conv_id with millions of
turns would concentrate one group on one worker. Assembly therefore
runs in TWO phases (salted pre-aggregation before the wide shuffle):

1. group by ``(conv_id, salt)`` where ``salt = turn_idx // chunk`` —
   partial in-order segments, bounding any single group to ``chunk``
   turns;
2. group by ``conv_id`` over the ~chunk×-smaller partials, ordered by
   ``salt``, concatenated into the final conversation document.

Both phases use the hash-PARTITIONED apply pattern (one Python call
per partition, vectorized pandas groupby inside) rather than
``map_groups``'s one-call-per-group — at 10^12 turns the per-group
Python overhead, not the shuffle, is the bottleneck.

``assemble_conversations_sorted`` is the alternative shuffle shape:
one global range-sort, then batch-contiguous pre-combine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

DEFAULT_CHUNK = 1024
NUM_PARTS = 64

_PROJECT_COLS = [
    "conv_id", "turn_idx", "extracted_text", "processed_text",
    "n_words", "confidence",
]


def _with_salt_and_logconf(extracted: "ray.data.Dataset", chunk: int):
    projected = extracted.select_columns(_PROJECT_COLS)

    def prep(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hashing import hash_partition

        salt = pc.cast(pc.divide(batch["turn_idx"], chunk), pa.int32())
        # carry confidence in log space weighted by word count so the
        # final geometric mean is exact across partial merges
        log_conf = pc.multiply(
            pc.cast(batch["n_words"], pa.float64()),
            pc.ln(pc.max_element_wise(batch["confidence"], 1e-300)),
        )
        part = pa.array(
            hash_partition(
                [batch["conv_id"].to_pylist(), salt.to_numpy()], NUM_PARTS
            )
        )
        batch = batch.append_column("salt", salt)
        batch = batch.append_column("_log_conf", log_conf)
        return batch.append_column("_part", part)

    return projected.map_batches(prep, batch_format="pyarrow")


def _phase1(part: pd.DataFrame) -> pd.DataFrame:
    part = part.sort_values(["conv_id", "salt", "turn_idx"], kind="mergesort")
    g = part.groupby(["conv_id", "salt"], sort=False)
    out = g.agg(
        n_turns=("turn_idx", "size"),
        n_words=("n_words", "sum"),
        text_part=("extracted_text", "\n\n".join),
        processed_part=("processed_text", "\n\n".join),
        log_conf=("_log_conf", "sum"),
    ).reset_index()
    out["n_words"] = out["n_words"].astype("int64")
    return out


def _phase2(part: pd.DataFrame) -> pd.DataFrame:
    part = part.sort_values(["conv_id", "salt"], kind="mergesort")
    g = part.groupby("conv_id", sort=False)
    out = g.agg(
        n_turns=("n_turns", "sum"),
        n_words=("n_words", "sum"),
        conversation_text=("text_part", "\n\n".join),
        processed_conversation_text=("processed_part", "\n\n".join),
        log_conf=("log_conf", "sum"),
    ).reset_index()
    n_words = out["n_words"].to_numpy(dtype=np.float64)
    out["confidence"] = np.where(
        n_words > 0, np.exp(out["log_conf"].to_numpy() / np.maximum(n_words, 1)), 1.0
    )
    out["n_turns"] = out["n_turns"].astype("int64")
    out["n_words"] = out["n_words"].astype("int64")
    return out.drop(columns=["log_conf"])


def assemble_bucket_table(table: "pd.DataFrame") -> pd.DataFrame:
    """Assemble one conv-hash bucket's turns (all convs complete in the
    bucket) into conversation documents. Pure pandas, one pass."""
    df = table.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    log_conf = df["n_words"].to_numpy(dtype=np.float64) * np.log(
        np.clip(df["confidence"].to_numpy(dtype=np.float64), 1e-300, None)
    )
    df = df.assign(_log_conf=log_conf)
    g = df.groupby("conv_id", sort=False)
    out = g.agg(
        n_turns=("turn_idx", "size"),
        n_words=("n_words", "sum"),
        conversation_text=("extracted_text", "\n\n".join),
        processed_conversation_text=("processed_text", "\n\n".join),
        log_conf=("_log_conf", "sum"),
    ).reset_index()
    n_words = out["n_words"].to_numpy(dtype=np.float64)
    out["confidence"] = np.where(
        n_words > 0,
        np.exp(out["log_conf"].to_numpy() / np.maximum(n_words, 1.0)),
        1.0,
    )
    out["n_turns"] = out["n_turns"].astype("int64")
    out["n_words"] = out["n_words"].astype("int64")
    return out.drop(columns=["log_conf"])


def assemble_buckets(
    buckets: dict[int, list[str]], out_dir: str, max_in_flight: int = 64
) -> int:
    """Bucket-parallel assembly over the extraction output's conv-hash
    bucket layout (the shuffle already happened at WRITE time via
    ``write_parquet(partition_cols=["bucket"])``) — one raw Ray task
    per bucket reads only that bucket's files, assembles in pandas, and
    writes one output file. No Ray sort/groupby machinery at all; this
    is the (c)-tier raw-task fallback the Dataset API can't express as
    cheaply. Partitioning assumption: bucket = crc32(conv_id) %
    ASSEMBLY_BUCKETS — every conversation is complete within one
    bucket. Returns total conversations written."""
    import ray

    @ray.remote(num_cpus=1)
    def one_bucket(bucket_id: int, files: list[str], out_path: str) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = ["conv_id", "turn_idx", "extracted_text", "processed_text",
                "n_words", "confidence"]
        table = pa.concat_tables(
            [pq.read_table(f, columns=cols) for f in files]
        )
        out = assemble_bucket_table(table.to_pandas())
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            f"{out_path}/conversations_{bucket_id:05d}.parquet",
        )
        return len(out)

    # bounded submission: throttle on PENDING refs only (finished refs
    # accumulate in done) — ray.wait on a list containing finished refs
    # returns immediately and would make the throttle a no-op at the
    # tens-of-thousands-of-buckets scale this targets
    done: list = []
    pending: list = []
    for bucket_id, files in sorted(buckets.items()):
        pending.append(one_bucket.remote(bucket_id, files, out_dir))
        if len(pending) >= max_in_flight:
            ready, pending = ray.wait(pending, num_returns=1)
            done.extend(ready)
    return sum(ray.get(done + pending))


def assemble_conversations(
    extracted: "ray.data.Dataset", chunk: int = DEFAULT_CHUNK
) -> "ray.data.Dataset":
    """Per-turn extraction output -> one row per conversation."""
    from ..functions.hashing import crc_bucket

    prepped = _with_salt_and_logconf(extracted, chunk)
    partials = prepped.groupby("_part").map_groups(
        lambda g: _phase1(g.drop(columns=["_part"])), batch_format="pandas"
    )

    def repart(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = crc_bucket(batch["conv_id"].to_numpy(), NUM_PARTS)
        return batch

    partials2 = partials.map_batches(repart, batch_format="pandas")
    return partials2.groupby("_part").map_groups(
        lambda g: _phase2(g.drop(columns=["_part"])), batch_format="pandas"
    )


def assemble_conversations_sorted(
    extracted: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Sort-based assembly: global ``sort(conv_id, turn_idx)`` (range
    shuffle), then a VECTORIZED per-batch pre-combine — each sorted
    batch covers contiguous (conv_id, turn_idx) ranges, so its per-conv
    segments are contiguous; segments carry their ``min turn_idx`` and
    the final small grouped phase concatenates segments in min-turn
    order. Output identical to ``assemble_conversations``."""
    from ..functions.hashing import crc_bucket

    projected = extracted.select_columns(_PROJECT_COLS)
    ordered = projected.sort(["conv_id", "turn_idx"])

    def combine_batch(batch: pd.DataFrame) -> pd.DataFrame:
        log_conf = batch["n_words"].to_numpy() * np.log(
            batch["confidence"].clip(lower=1e-300).to_numpy()
        )
        batch = batch.assign(_log_conf=log_conf)
        g = batch.groupby("conv_id", sort=False)
        out = g.agg(
            salt=("turn_idx", "min"),
            n_turns=("turn_idx", "size"),
            n_words=("n_words", "sum"),
            text_part=("extracted_text", "\n\n".join),
            processed_part=("processed_text", "\n\n".join),
            log_conf=("_log_conf", "sum"),
        ).reset_index()
        out["_part"] = crc_bucket(out["conv_id"].to_numpy(), NUM_PARTS)
        out["n_words"] = out["n_words"].astype("int64")
        return out

    partials = ordered.map_batches(
        combine_batch, batch_format="pandas", batch_size=8192
    )
    return partials.groupby("_part").map_groups(
        lambda g: _phase2(g.drop(columns=["_part"])), batch_format="pandas"
    )


def assemble_conversations_exchange(
    extracted: "ray.data.Dataset", num_parts: int | None = None
) -> "pd.DataFrame":
    """Raw-task-exchange assembly: ONE all-to-all over conv-hash
    partitions (``ops.dedup._exchange`` — hash-split each Arrow block,
    one combiner task per partition), each partition assembled with
    the same vectorized ``assemble_bucket_table`` the bucketed
    strategy uses. Identical output to ``assemble_conversations`` /
    ``assemble_conversations_sorted`` (equality test-pinned); skips
    the Dataset groupby's multi-second sort cost twice over — the
    right tier when assembly runs in-memory rather than folded into a
    partitioned write. Returns the assembled table (pandas)."""
    import pyarrow as pa

    import ray

    from ..functions.hashing import crc_bucket
    from ..ops.dedup import _exchange

    if num_parts is None:
        try:
            num_parts = max(8, min(64, int(ray.cluster_resources().get("CPU", 8))))
        except Exception:  # noqa: BLE001
            num_parts = 8

    projected = extracted.select_columns(_PROJECT_COLS)

    def add_key(batch: "pa.Table") -> "pa.Table":
        return batch.append_column(
            "_k",
            pa.array(
                crc_bucket(batch["conv_id"].to_pylist(), 1 << 30).astype("int64")
            ),
        )

    keyed = projected.map_batches(add_key, batch_format="pyarrow")

    def combine(t: "pa.Table") -> "pa.Table":
        df = t.drop_columns(["_k"]).to_pandas()
        if df.empty:
            return pa.table(
                {
                    "conv_id": pa.array([], type=pa.string()),
                    "n_turns": pa.array([], type=pa.int64()),
                    "n_words": pa.array([], type=pa.int64()),
                    "conversation_text": pa.array([], type=pa.string()),
                    "processed_conversation_text": pa.array([], type=pa.string()),
                    "confidence": pa.array([], type=pa.float64()),
                }
            )
        out = assemble_bucket_table(df)
        return pa.Table.from_pandas(out, preserve_index=False)

    refs = keyed.materialize().to_arrow_refs()
    # more partitions than input blocks only multiplies split/combine
    # task count (blocks x parts objects) without adding parallelism
    num_parts = max(1, min(num_parts, len(refs)))
    parts = _exchange(refs, "_k", num_parts, combine)
    tables = [t for t in ray.get(parts) if t.num_rows]
    if not tables:
        return pa.table({}).to_pandas()
    return pa.concat_tables(tables, promote_options="default").to_pandas()
