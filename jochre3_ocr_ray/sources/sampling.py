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


def _stable_hash(values) -> "pa.Array":
    """Deterministic vectorized uint64 hash of a column (pandas
    siphash with the fixed default key — stable across runs,
    processes and partitionings)."""
    import numpy as np
    import pandas as pd

    vals = values.to_numpy(zero_copy_only=False)
    if vals.dtype.kind in ("O", "U", "S"):
        # pandas hash_array understands OBJECT string arrays, not
        # numpy fixed-width unicode ('<U') — normalize to object
        vals = np.asarray([str(v) for v in vals], dtype=object)
    h = pd.util.hash_array(vals, categorize=False)
    return pa.array(h.astype(np.uint64), type=pa.uint64())


def _md5_hash64(values, salt: str = "") -> "np.ndarray":
    """SQL-replicable 64-bit key hash: the first 16 hex chars of
    ``md5(salt + str(v))`` — DuckDB recomputes it bit-for-bit as
    ``('0x' || substr(md5(salt || CAST(v AS VARCHAR)), 1, 16))::UBIGINT``,
    so sampling/shuffle membership built on it is oracle-checkable.
    Slower than the siphash default (one C md5 per row) — the q_/test
    layer opts in; scale callers keep siphash."""
    import hashlib

    import numpy as np

    md5 = hashlib.md5
    pre = salt.encode()
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(v).encode()).digest()[:8], "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _key_hash(values, hash_fn: str, salt: str = "") -> "pa.Array":
    """Dispatch: ``"siphash"`` (vectorized default) or ``"md5"``
    (SQL-replicable). ``values`` is an Arrow array or numpy/iterable."""
    if hash_fn == "md5":
        vals = (
            values.to_pylist() if hasattr(values, "to_pylist") else list(values)
        )
        return pa.array(_md5_hash64(vals, salt), type=pa.uint64())
    if salt:
        keys = pa.array(
            [salt + str(v) for v in values.to_pylist()], type=pa.string()
        )
        return _stable_hash(keys)
    return _stable_hash(values)


def bottom_k_sample(
    ds: "ray.data.Dataset", n: int, key_col: str
) -> "ray.data.Dataset":
    """Fixed-SIZE uniform sample without replacement — the
    reservoir-sampling analog, done as a DETERMINISTIC bottom-k
    sketch: keep the ``n`` rows whose stable key-hash is smallest.
    Unlike a true reservoir (whose output depends on encounter
    order), this commutes with repartitioning and resume, and two
    runs over the same corpus agree row-for-row.

    Shape at scale: each batch keeps its LOCAL bottom-n (vectorized
    hash + argpartition, no sort of the batch), so at most
    O(blocks x n) candidate rows move to the final top-level
    reduction — never the corpus."""
    import numpy as np

    def local_bottom(batch: pa.Table) -> pa.Table:
        h = _stable_hash(batch[key_col])
        batch = batch.append_column("_bk_hash", h)
        if batch.num_rows <= n:
            return batch
        hv = h.to_numpy(zero_copy_only=False)
        idx = np.argpartition(hv, n - 1)[:n]
        return batch.take(pa.array(np.sort(idx)))

    cand = ds.map_batches(local_bottom, batch_format="pyarrow")
    # global bottom-n over the (blocks x n)-row candidate set: tiny by
    # construction, one sort + limit
    return (
        cand.sort("_bk_hash")
        .limit(n)
        .map_batches(
            lambda b: b.drop_columns(["_bk_hash"]), batch_format="pyarrow"
        )
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    n_per_group: int,
    group_col: str,
    key_col: str,
    hash_fn: str = "siphash",
) -> "ray.data.Dataset":
    """Deterministic bottom-k sample WITHIN each group — per-class
    balancing for training mixes (n examples per language / source /
    label). Same hash sketch as :func:`bottom_k_sample`; the per-batch
    partial keeps at most ``n_per_group`` rows per group it sees, so
    the groupby exchange moves O(blocks x groups x n) candidates, not
    the corpus. ``hash_fn="md5"`` swaps in the SQL-replicable key hash
    (:func:`_md5_hash64`) so membership is oracle-checkable; ties
    break on the key itself either way."""
    import numpy as np
    import pandas as pd

    def local_bottom(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[key_col].to_numpy()
        if hash_fn == "md5":
            h = _md5_hash64(vals)
        else:
            if vals.dtype.kind in ("O", "U", "S"):
                vals = np.asarray([str(v) for v in vals], dtype=object)
            h = pd.util.hash_array(vals, categorize=False)
        batch = batch.assign(_bk_hash=h)
        return (
            batch.sort_values(["_bk_hash", key_col], kind="mergesort")
            .groupby(group_col, sort=False)
            .head(n_per_group)
        )

    def group_bottom(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(["_bk_hash", key_col], kind="mergesort")
            .head(n_per_group)
            .drop(columns=["_bk_hash"])
        )

    return (
        ds.map_batches(local_bottom, batch_format="pandas")
        .groupby(group_col)
        .map_groups(group_bottom, batch_format="pandas")
    )


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    key_col: str,
    salt: str = "",
    hash_fn: str = "siphash",
) -> "ray.data.Dataset":
    """Reproducible global shuffle — the training-tape randomizer:
    order rows by the stable hash of (salt + key). Unlike
    ``Dataset.random_shuffle`` (whose layout depends on execution
    nondeterminism), two runs — or a resume — produce the identical
    tape, and ``salt`` gives a fresh epoch permutation. One
    distributed sort on a uint64 column; no driver state.
    ``hash_fn="md5"`` makes the permutation SQL-replicable (see
    :func:`_md5_hash64`)."""

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_shuf", _key_hash(batch[key_col], hash_fn, salt)
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .sort("_shuf")
        .map_batches(
            lambda b: b.drop_columns(["_shuf"]), batch_format="pyarrow"
        )
    )
