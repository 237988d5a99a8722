"""Persistent content-hash index for INCREMENTAL exact dedup.

The 100 TB ingestion loop: new shards arrive continuously and must be
deduplicated against EVERYTHING already ingested without re-reading
the historical corpus. The index is hash-bucketed parquet
(``index_dir/part=<p>/run_<id>.parquet``, ``p = hash64 % buckets``) so
a new batch only touches the buckets its hashes land in, each bucket
read happens INSIDE the worker partition that owns it (the index never
passes through the driver or a broadcast), and every ingestion run
appends one immutable file per bucket + commits a run manifest last —
re-running an interrupted ingestion is idempotent (the same lineage
pattern as ``state/lineage.py``).

Reference anchor: the engine-side exact dedup family
(``ops/dedup.py::q_dedup_exact``) covers one static corpus; this is
its cross-run sibling (beyond the reference, per the build brief's
training-data-pipeline scope).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# Bucket-count sizing: a bucket's committed hash set is loaded whole
# inside its worker partition, so size buckets such that
# corpus_rows/buckets x 8 bytes fits worker memory with headroom —
# ~64 is right for test scale; at 10^12 rows use ~2^17 buckets
# (~60 MB/bucket). The count is FIXED at index creation (hash % B);
# pick it for the target corpus, not the first shard.
DEFAULT_BUCKETS = 64


def _content_hash64(texts: list[str]) -> np.ndarray:
    """Stable TRUE-64-bit content hashes (blake2b, 8-byte digest).

    NOT the two-crc32-seeds construction: ``crc32(t, s1)`` and
    ``crc32(t, s2)`` are affinely related (CRC is linear over GF(2) —
    the seed only contributes a length-dependent constant), so that
    pair carries ~32 effective bits and MEASURABLY collides at 200k
    docs (2 observed in a 200k random corpus — the birthday rate for
    32 bits), silently dropping distinct documents from an exact
    dedup. blake2b costs ~1us/doc — irrelevant next to the pipeline."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    t.encode("utf-8"), digest_size=8
                ).digest(),
                "big",
            )
            for t in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    ).astype(np.int64)


class HashIndex:
    """Bucketed on-disk hash set with run manifests."""

    def __init__(self, index_dir: str | Path, buckets: int = DEFAULT_BUCKETS):
        self.root = Path(index_dir)
        self.buckets = buckets
        (self.root / "_runs").mkdir(parents=True, exist_ok=True)

    def _bucket_dir(self, bucket: int) -> Path:
        return self.root / f"part={bucket:05d}"

    def bucket_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) % np.uint64(self.buckets)).astype(
            np.int64
        )

    def committed_runs(self) -> set[str]:
        return {p.stem for p in (self.root / "_runs").glob("*.json")}

    def load_bucket(
        self, bucket: int, runs: "set[str] | None" = None
    ) -> np.ndarray:
        """Hashes of one bucket from COMMITTED runs only (worker-side
        read) — files from an interrupted, uncommitted run must not
        count as 'seen' or a retry would drop its own rows."""
        import pyarrow.parquet as pq

        if runs is None:
            runs = self.committed_runs()
        d = self._bucket_dir(bucket)
        if not d.exists():
            return np.empty(0, dtype=np.int64)
        parts = [
            pq.read_table(f, columns=["hash"])["hash"].to_numpy()
            for f in sorted(d.glob("run_*.parquet"))
            if f.stem[len("run_"):] in runs
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def run_committed(self, run_id: str) -> bool:
        return (self.root / "_runs" / f"{run_id}.json").exists()

    def commit_run(self, run_id: str, stats: dict) -> None:
        manifest = self.root / "_runs" / f"{run_id}.json"
        tmp = manifest.with_suffix(".tmp")
        tmp.write_text(
            json.dumps(
                {
                    "run_id": run_id,
                    "committed_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                    **stats,
                }
            )
        )
        tmp.rename(manifest)

    def append_bucket(self, bucket: int, hashes: np.ndarray, run_id: str) -> None:
        """One immutable file per (bucket, run) — atomic via rename;
        an uncommitted run's files are superseded by the rewrite on
        retry (same file name)."""
        import pyarrow.parquet as pq

        d = self._bucket_dir(bucket)
        d.mkdir(parents=True, exist_ok=True)
        target = d / f"run_{run_id}.parquet"
        tmp = d / f".run_{run_id}.tmp.parquet"
        pq.write_table(
            pa.table({"hash": pa.array(np.unique(hashes), type=pa.int64())}),
            tmp,
        )
        tmp.rename(target)


def dedup_incremental(
    new_ds: "ray.data.Dataset",
    index_dir: str | Path,
    run_id: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    out_dir: "str | Path | None" = None,
) -> dict:
    """Deduplicate a new batch against the index AND within itself,
    then register the survivors — all hash-partitioned, index reads
    and writes worker-side:

    1. per-batch: content hash + bucket columns (vectorized);
    2. ``partitioned_apply`` on bucket: per bucket, load the committed
       hash set, drop rows whose hash is already indexed, keep the
       min-id row per surviving new hash (within-run dedup), append
       the surviving hashes as this run's bucket file;
    3. commit the run manifest LAST — a crash before it leaves the
       index readable (old runs only; this run's partial files are
       overwritten on retry) and the whole ingestion idempotent: a
       committed ``run_id`` returns immediately.

    With ``out_dir`` set, each partition writes its surviving rows as
    parquet WORKER-SIDE (``out_dir/run_<id>/part_<p>.parquet``) and
    only counts come back to the driver — the shape for shards too
    large to materialize; otherwise survivors return as one Arrow
    table. Returns {survivors, new_rows, kept_rows, already_ingested}.
    """
    from ..ops.relational import _to_table, partitioned_apply

    index = HashIndex(index_dir, buckets)
    if index.run_committed(run_id):
        return {
            "survivors": None,
            "already_ingested": True,
            "run_id": run_id,
        }
    out_run: "Path | None" = None
    if out_dir is not None:
        out_run = Path(out_dir) / f"run_{run_id}"
        out_run.mkdir(parents=True, exist_ok=True)

    def add_hash(batch: pa.Table) -> pa.Table:
        # Arrow-native: append two columns to the zero-copy batch
        # instead of a full pandas round trip per batch on the wide
        # text column
        h = _content_hash64([str(v) for v in batch[text_col].to_pylist()])
        batch = batch.append_column("_hash", pa.array(h))
        return batch.append_column("_bucket", pa.array(index.bucket_of(h)))

    hashed = new_ds.map_batches(add_hash, batch_format="pyarrow")

    root = str(index.root)

    def per_bucket(part: pd.DataFrame) -> pd.DataFrame:
        idx = HashIndex(root, buckets)
        committed = idx.committed_runs()
        out = []
        for bucket, g in part.groupby("_bucket", sort=False):
            seen = idx.load_bucket(int(bucket), committed)
            fresh = g[~g["_hash"].isin(seen)]
            # within-run dedup: min id per hash
            fresh = fresh.sort_values(id_col).drop_duplicates("_hash")
            if len(fresh):
                idx.append_bucket(
                    int(bucket), fresh["_hash"].to_numpy(), run_id
                )
            out.append(fresh)
        res = (
            pd.concat(out).drop(columns=["_bucket", "_hash"])
            if out
            else part.iloc[0:0].drop(columns=["_bucket", "_hash"])
        )
        if out_run is None:
            return res
        # worker-side survivor write: one atomic file per partition
        import pyarrow.parquet as pq

        if len(res):
            p = int(part["_bucket"].iloc[0]) if len(part) else 0
            tmp = out_run / f".part_{p:05d}.tmp.parquet"
            tmp_t = pa.Table.from_pandas(res, preserve_index=False)
            pq.write_table(tmp_t, tmp)
            tmp.rename(out_run / f"part_{p:05d}.parquet")
        return pd.DataFrame({"kept": [len(res)]})

    survivors = _to_table(partitioned_apply(hashed, ["_bucket"], per_bucket))
    if out_run is not None:
        kept = (
            int(pa.compute.sum(survivors["kept"]).as_py() or 0)
            if "kept" in survivors.column_names
            else 0
        )
        result_table = None
    else:
        kept = survivors.num_rows
        result_table = survivors
    n_new = new_ds.count()
    index.commit_run(run_id, {"new_rows": int(n_new), "kept_rows": kept})
    return {
        "survivors": result_table,
        "out_dir": str(out_run) if out_run is not None else None,
        "new_rows": int(n_new),
        "kept_rows": kept,
        "already_ingested": False,
        "run_id": run_id,
    }
