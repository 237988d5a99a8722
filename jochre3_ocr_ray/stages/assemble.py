"""Conversation assembly — the one required shuffle.

Analog of the reference's page-ordering invariant (pages collected in
document order, ``Jochre.scala:154-158``; ``Alto.content`` = pages
joined, ``Alto.scala:12-13``): Ray Data gives no row-order guarantee,
so stable turn ordering is data-driven — ``groupby(conv_id)`` with an
in-group sort on ``turn_idx`` (SURVEY.md §4 "Ordering").

Skew: conversation sizes are Zipf-ish; a hot conv_id with millions of
turns would concentrate one group on one worker. Assembly therefore
runs in TWO phases (salted pre-aggregation before the wide shuffle):

1. ``groupby(conv_id, salt)`` where ``salt = turn_idx // chunk`` —
   partial in-order segments, bounding any single group to ``chunk``
   turns;
2. ``groupby(conv_id)`` over the ~chunk×-smaller partials, ordered by
   ``salt``, concatenated into the final conversation document.

Both phases are pandas ``map_groups`` (per-group sort + join — the
vectorizable part is the string join, which pandas does in C).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

DEFAULT_CHUNK = 1024


def _assemble_partial(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx", kind="mergesort")
    n_words = int(group["n_words"].sum())
    # carry confidence in log space so the final geometric mean is exact
    log_conf = float(
        (group["n_words"] * np.log(group["confidence"].clip(lower=1e-300))).sum()
    )
    return pd.DataFrame(
        {
            "conv_id": [group["conv_id"].iloc[0]],
            "salt": [int(group["salt"].iloc[0])],
            "n_turns": [len(group)],
            "n_words": [n_words],
            "text_part": ["\n\n".join(group["extracted_text"])],
            "processed_part": ["\n\n".join(group["processed_text"])],
            "log_conf": [log_conf],
        }
    )


def _assemble_final(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("salt", kind="mergesort")
    n_words = int(group["n_words"].sum())
    log_conf = float(group["log_conf"].sum())
    confidence = float(np.exp(log_conf / n_words)) if n_words else 1.0
    return pd.DataFrame(
        {
            "conv_id": [group["conv_id"].iloc[0]],
            "n_turns": [int(group["n_turns"].sum())],
            "n_words": [n_words],
            "conversation_text": ["\n\n".join(group["text_part"])],
            "processed_conversation_text": ["\n\n".join(group["processed_part"])],
            "confidence": [confidence],
        }
    )


def assemble_conversations_sorted(
    extracted: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Sort-based assembly: global ``sort(conv_id, turn_idx)`` (range
    shuffle), then a VECTORIZED per-batch pre-combine — each sorted
    batch covers contiguous (conv_id, turn_idx) ranges, so its per-conv
    segments are contiguous; segments carry their ``min turn_idx`` and
    the final small ``groupby(conv_id)`` concatenates segments in
    min-turn order. Equivalent output to ``assemble_conversations``
    but phase 1 runs one pandas groupby per BATCH instead of one
    Python call per conversation — the per-group overhead of
    ``map_groups`` is the bottleneck when conversations are small."""
    projected = extracted.select_columns(
        ["conv_id", "turn_idx", "extracted_text", "processed_text",
         "n_words", "confidence"]
    )
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
        return out

    partials = ordered.map_batches(
        combine_batch, batch_format="pandas", batch_size=8192
    )
    return partials.groupby("conv_id").map_groups(
        _assemble_final, batch_format="pandas"
    )


def assemble_conversations(
    extracted: "ray.data.Dataset", chunk: int = DEFAULT_CHUNK
) -> "ray.data.Dataset":
    """Per-turn extraction output -> one row per conversation."""
    projected = extracted.select_columns(
        ["conv_id", "turn_idx", "extracted_text", "processed_text",
         "n_words", "confidence"]
    )

    def add_salt(batch):
        import pyarrow.compute as pc
        import pyarrow as pa

        salt = pc.divide(batch["turn_idx"], chunk)
        return batch.append_column("salt", pc.cast(salt, pa.int32()))

    salted = projected.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby(["conv_id", "salt"]).map_groups(
        _assemble_partial, batch_format="pandas"
    )
    return partials.groupby("conv_id").map_groups(
        _assemble_final, batch_format="pandas"
    )
