"""Incremental exact dedup against the persistent bucketed hash index
(state/hash_index.py): cross-run dedup, within-run dedup, idempotent
re-ingestion, and uncommitted-run retry safety."""

from __future__ import annotations

import pandas as pd
import pytest


def _ds(rows):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


class TestIncrementalDedup:
    def test_cross_run_and_within_run(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.hash_index import dedup_incremental

        idx = tmp_path / "index"
        a = _ds([(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1
        r1 = dedup_incremental(a, idx, "run1")
        assert not r1["already_ingested"]
        kept1 = sorted(r1["survivors"]["doc_id"].to_pylist())
        assert kept1 == [1, 2]  # within-run dup dropped, min id kept
        assert r1["kept_rows"] == 2 and r1["new_rows"] == 3

        # run 2: one historical dup, one new, one internal dup pair
        b = _ds([(10, "beta"), (11, "gamma"), (12, "delta"), (13, "delta")])
        r2 = dedup_incremental(b, idx, "run2")
        kept2 = sorted(r2["survivors"]["doc_id"].to_pylist())
        assert kept2 == [11, 12]  # beta seen in run1; delta deduped to 12

        # run 3: everything already known
        c = _ds([(20, "alpha"), (21, "gamma"), (22, "delta")])
        r3 = dedup_incremental(c, idx, "run3")
        assert r3["kept_rows"] == 0

    def test_idempotent_reingestion(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.hash_index import dedup_incremental

        idx = tmp_path / "index"
        a = _ds([(1, "x"), (2, "y")])
        r1 = dedup_incremental(a, idx, "runA")
        assert r1["kept_rows"] == 2
        again = dedup_incremental(a, idx, "runA")
        assert again["already_ingested"]

    def test_uncommitted_run_does_not_poison_retry(self, ray_session, tmp_path):
        """A crash between bucket writes and the manifest commit must
        not make a retry treat its own rows as already seen."""
        from jochre3_ocr_ray.state.hash_index import (
            HashIndex,
            _content_hash64,
            dedup_incremental,
        )

        idx_dir = tmp_path / "index"
        index = HashIndex(idx_dir)
        # simulate the failed attempt: bucket files written, NO manifest
        h = _content_hash64(["orphan"])
        index.append_bucket(int(index.bucket_of(h)[0]), h, "runZ")
        assert not index.run_committed("runZ")
        # retry ingests the same content under the same run id
        r = dedup_incremental(_ds([(5, "orphan")]), idx_dir, "runZ")
        assert r["kept_rows"] == 1
        assert sorted(r["survivors"]["doc_id"].to_pylist()) == [5]
        # and is now committed: the next run sees 'orphan' as known
        r2 = dedup_incremental(_ds([(9, "orphan")]), idx_dir, "runY")
        assert r2["kept_rows"] == 0

    def test_bucket_layout_touches_only_needed_buckets(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.hash_index import (
            HashIndex,
            dedup_incremental,
        )

        idx_dir = tmp_path / "index"
        dedup_incremental(_ds([(1, "one doc")]), idx_dir, "r1")
        index = HashIndex(idx_dir)
        parts = sorted(p.name for p in index.root.glob("part=*"))
        assert len(parts) == 1  # one hash -> exactly one bucket dir


class TestNearDedupIncremental:
    def _corpus(self, seed, n, vocab_n=400, words=30):
        import numpy as np

        rng = np.random.RandomState(seed)
        vocab = [f"w{i}" for i in range(vocab_n)]
        return [" ".join(rng.choice(vocab, words)) for _ in range(n)]

    def test_cross_run_near_dups_flagged(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.minhash_index import near_dedup_incremental

        idx = tmp_path / "mindex"
        base = self._corpus(1, 30)
        r1 = near_dedup_incremental(
            _ds(list(enumerate(base))), idx, "run1"
        )
        assert r1["kept_rows"] == 30  # random docs: no near-dups

        # run 2: near-dup of doc 0 (one word changed), one exact dup of
        # doc 1, and two genuinely new docs
        near = base[0].split()
        near[5] = "CHANGED"
        newdocs = [
            (100, " ".join(near)),
            (101, base[1]),
            (102, self._corpus(7, 1)[0]),
            (103, self._corpus(8, 1)[0]),
        ]
        r2 = near_dedup_incremental(_ds(newdocs), idx, "run2")
        kept = sorted(r2["survivors"]["doc_id"].to_pylist())
        assert kept == [102, 103]
        assert r2["flagged"] == 2

    def test_within_run_min_id_survives(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.minhash_index import near_dedup_incremental

        idx = tmp_path / "mindex"
        doc = self._corpus(3, 1)[0]
        rows = [(5, doc), (9, doc), (2, self._corpus(4, 1)[0])]
        r = near_dedup_incremental(_ds(rows), idx, "runA")
        kept = sorted(r["survivors"]["doc_id"].to_pylist())
        assert kept == [2, 5]  # 9 deduped against lower-id 5

    def test_idempotent_and_dropped_not_indexed(self, ray_session, tmp_path):
        from jochre3_ocr_ray.state.minhash_index import (
            MinhashBandIndex,
            near_dedup_incremental,
        )

        idx = tmp_path / "mindex"
        doc = self._corpus(5, 1)[0]
        r1 = near_dedup_incremental(_ds([(1, doc), (2, doc)]), idx, "r1")
        assert r1["kept_rows"] == 1
        # only the survivor's band rows were registered
        index = MinhashBandIndex(idx)
        ids = set()
        for part in index.root.glob("band_part=*"):
            import pyarrow.parquet as pq

            for f in part.glob("run_*.parquet"):
                ids.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        assert ids == {1}
        assert near_dedup_incremental(
            _ds([(1, doc)]), idx, "r1"
        )["already_ingested"]


class TestIncrementalStreamingOut:
    def test_worker_side_survivor_write(self, ray_session, tmp_path):
        """With out_dir set, survivors stream to parquet inside the
        partitions (no driver materialization) and counts agree."""
        import pyarrow.parquet as pq

        from jochre3_ocr_ray.state.hash_index import dedup_incremental

        idx = tmp_path / "index"
        out = tmp_path / "kept"
        rows = [(i, f"doc {i % 7}") for i in range(50)]  # 7 distinct
        r = dedup_incremental(_ds(rows), idx, "s1", out_dir=out)
        assert r["survivors"] is None
        assert r["kept_rows"] == 7
        files = sorted((out / "run_s1").glob("part_*.parquet"))
        assert files
        total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        assert total == 7
        ids = sorted(
            i
            for f in files
            for i in pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        )
        assert ids == list(range(7))  # min id per distinct text
