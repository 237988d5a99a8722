"""Train/validation splitting — the corpus-sampling analog.

Reference: ``core/corpus/TextLineExtractor.scala:40-49`` — every Nth
example goes to validation. Here: a deterministic modulo filter on a
stable row key (no random state, reproducible across runs and
parallelism levels), expressed as two filtered views of one Dataset.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def train_val_split(
    ds: "ray.data.Dataset", key_col: str, every_nth: int = 10
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(train, val): rows whose stable key-hash % every_nth == 0 go to
    validation — deterministic, order-independent."""

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        marks = pa.array(
            [zlib.crc32(str(k).encode()) % every_nth == 0 for k in keys],
            type=pa.bool_(),
        )
        return batch.append_column("_is_val", marks)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def keep(val: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = batch["_is_val"] if val else pc.invert(batch["_is_val"])
            return batch.filter(mask).drop_columns(["_is_val"])

        return fn

    return (
        tagged.map_batches(keep(False), batch_format="pyarrow"),
        tagged.map_batches(keep(True), batch_format="pyarrow"),
    )
