"""Round-5 driver-surface tests: the three new oracle-checked entries
(dedup_semantic, dedup_exact_substring, balanced_mix), the three
tagged-union consolidations (dedup_ngram_simhash, approx_accuracy,
curate_documents), and the SQL-replicable md5 key hash they ride on.

Each new entry is pinned against its DuckDB oracle the same way the
driver's correctness gate compares them (row count + column set +
order-insensitive value equality).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _con(sf=SF, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _assert_oracle_equal(got: pd.DataFrame, want: pd.DataFrame, keys):
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    got = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(keys).reset_index(drop=True)[sorted(want.columns)]
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=0, atol=1e-9, err_msg=c
            )
        else:
            assert (g.astype(str) == w.astype(str)).all(), c


class TestSemanticDedupEntry:
    def test_matches_oracle_sf0001(self, ray_session):
        from jochre3_ocr_ray.ops.dedup import (
            Q_DEDUP_SEMANTIC_SQL,
            _LSH_PLANT_COUNT,
            q_dedup_semantic,
        )

        got = q_dedup_semantic(SF).to_pandas()
        want = _con().execute(Q_DEDUP_SEMANTIC_SQL).df()
        _assert_oracle_equal(got, want, ["id"])
        # non-vacuous: every planted twin is dropped, its base kept
        assert int((~got["keep"]).sum()) == _LSH_PLANT_COUNT
        dropped = got.loc[~got["keep"]]
        assert (dropped["rep_id"] == dropped["id"] % 1_000_000).all()
        assert (dropped["dup_sim"] == 1.0).all()


class TestExactSubstringEntry:
    def test_matches_oracle_sf0001(self, ray_session):
        from jochre3_ocr_ray.ops.dedup import (
            Q_DEDUP_EXACT_SUBSTRING_SQL,
            q_dedup_exact_substring,
        )

        got = q_dedup_exact_substring(SF).to_pandas()
        want = _con().execute(Q_DEDUP_EXACT_SUBSTRING_SQL).df()
        _assert_oracle_equal(got, want, ["doc_id"])
        # non-vacuous: the corpus's planted exact/near dups share
        # >= 8-token spans, so clipping must fire somewhere
        assert int((got["n_tokens_removed"] > 0).sum()) > 0

    def test_planted_span_synthetic(self, ray_session, tmp_path):
        """A 10-token span duplicated across two docs is removed from
        BOTH (every-occurrence semantics), case preserved elsewhere."""
        from jochre3_ocr_ray.ops.dedup import (
            _exact_substring_sql,
            q_dedup_exact_substring,
        )

        span = "the quick brown fox jumps over the lazy dog tonight"
        texts = [
            f"Alpha beta {span} gamma delta epsilon zeta eta theta",
            f"One two three four five six seven eight {span} End",
            "completely unrelated text with enough tokens to not matter",
            "",
        ]
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            sf / "documents.parquet",
        )
        got = (
            q_dedup_exact_substring(str(sf), window=8)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # the shared 10-token span is gone from both docs, the
        # surrounding original-case tokens survive
        assert "quick brown fox" not in got.loc[0, "text"]
        assert "quick brown fox" not in got.loc[1, "text"]
        assert got.loc[0, "text"].startswith("Alpha beta")
        assert got.loc[1, "text"].endswith("End")
        assert got.loc[0, "n_tokens_removed"] == 10
        assert got.loc[1, "n_tokens_removed"] == 10
        assert got.loc[2, "n_tokens_removed"] == 0
        assert got.loc[3, "text"] == ""
        # and the SQL oracle agrees bit-for-bit
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(_exact_substring_sql(window=8)).df()
        _assert_oracle_equal(got.reset_index(), want, ["doc_id"])


class TestBalancedMixEntry:
    def test_matches_oracle_sf0001(self, ray_session):
        from jochre3_ocr_ray.pipelines.curate import (
            BALANCED_N_PER_STRATUM,
            Q_BALANCED_MIX_SQL,
            q_balanced_mix,
        )

        got = q_balanced_mix(SF).to_pandas()
        want = _con().execute(Q_BALANCED_MIX_SQL).df()
        _assert_oracle_equal(got, want, ["doc_id"])
        # invariants: bounded per stratum; tape_pos is a permutation
        per = got.groupby(["lang", "source"]).size()
        assert (per <= BALANCED_N_PER_STRATUM).all()
        assert sorted(got["tape_pos"]) == list(range(len(got)))


class TestMd5KeyHash:
    def test_md5_hash_matches_duckdb(self):
        from jochre3_ocr_ray.sources.sampling import _md5_hash64

        vals = [0, 1, 42, 999_999_999_999]
        mine = _md5_hash64(vals, salt="s:")
        con = duckdb.connect()
        for v, h in zip(vals, mine):
            (w,) = con.execute(
                "SELECT ('0x' || substr(md5('s:' || CAST(? AS VARCHAR)), 1, 16))"
                "::UBIGINT",
                [v],
            ).fetchone()
            assert int(w) == int(h)

    def test_deterministic_shuffle_md5_order(self, ray_session):
        """hash_fn='md5' tape order == DuckDB ORDER BY the same hash."""
        import ray.data

        from jochre3_ocr_ray.sources.sampling import deterministic_shuffle

        ds = ray.data.from_items([{"k": i} for i in range(200)])
        got = [
            r["k"]
            for r in deterministic_shuffle(
                ds, "k", salt="ep1:", hash_fn="md5"
            ).take_all()
        ]
        con = duckdb.connect()
        want = [
            r[0]
            for r in con.execute(
                "SELECT k FROM (SELECT UNNEST(range(200)) AS k) "
                "ORDER BY ('0x' || substr(md5('ep1:' || CAST(k AS VARCHAR)), 1, 16))"
                "::UBIGINT"
            ).fetchall()
        ]
        assert got == want
        assert got != list(range(200))  # actually permuted


class TestNgramSf01Regression:
    def test_ngram_equals_minhash_at_sf01(self, ray_session):
        """The sf0.1 blind spot that hid the counted-kernel max_df bug:
        the driver gate runs at sf0.01, where no shingle bucket crosses
        the auto cap — at sf0.1 every planted pair's shingles are hot
        and max_df='auto' silently returned 0/256 pairs (J undercounted
        by the dropped buckets). Pin the exact config against the
        independent MinHash+verify path at sf0.1 (both exact on this
        corpus; no O(N^2) SQL needed)."""
        from jochre3_ocr_ray.ops.dedup import q_dedup_minhash, q_dedup_ngram

        sf = "/root/testdata/sf0.1"
        ng = q_dedup_ngram(sf).to_pandas()
        mh = q_dedup_minhash(sf).to_pandas()
        ng_pairs = {(int(a), int(b)) for a, b in zip(ng.id_a, ng.id_b)}
        mh_pairs = {(int(a), int(b)) for a, b in zip(mh.id_a, mh.id_b)}
        assert len(ng_pairs) > 0
        assert ng_pairs == mh_pairs


class TestConsolidatedEntries:
    def test_ngram_simhash_union(self, ray_session):
        from jochre3_ocr_ray.ops.dedup import (
            Q_DEDUP_NGRAM_SIMHASH_SQL,
            q_dedup_ngram,
            q_dedup_ngram_simhash,
            q_dedup_simhash,
        )

        got = q_dedup_ngram_simhash(SF).to_pandas()
        want = _con().execute(Q_DEDUP_NGRAM_SIMHASH_SQL).df()
        _assert_oracle_equal(got, want, ["mode", "id_a", "id_b"])
        # the union is exactly the two kernels, tagged
        assert (got["mode"] == "ngram").sum() == len(q_dedup_ngram(SF))
        assert (got["mode"] == "simhash").sum() == len(q_dedup_simhash(SF))

    def test_approx_accuracy_union(self, ray_session):
        from jochre3_ocr_ray.ops.similarity import (
            Q_APPROX_ACCURACY_SQL,
            q_approx_accuracy,
        )

        got = q_approx_accuracy(SF).to_pandas()
        want = _con().execute(Q_APPROX_ACCURACY_SQL).df()
        _assert_oracle_equal(got, want, ["component", "key_id"])
        assert got["ok"].all()

    def test_curate_documents_union(self, ray_session):
        from jochre3_ocr_ray.pipelines.curate import (
            Q_CURATE_DOCUMENTS_ALL_SQL,
            q_curate_documents,
            q_curate_documents_all,
            q_curate_documents_near_dup,
        )

        got = q_curate_documents_all(SF).to_pandas()
        want = _con().execute(Q_CURATE_DOCUMENTS_ALL_SQL).df()
        _assert_oracle_equal(got, want, ["mode", "doc_id"])
        # near-dup pruning can only shrink the exact-dedup keep set
        n_ex = (got["mode"] == "exact").sum()
        n_nd = (got["mode"] == "near_dup").sum()
        assert 0 < n_nd <= n_ex
        # the one-stream fusion equals the two standalone variants
        ex = q_curate_documents(SF).to_pandas()
        nd = q_curate_documents_near_dup(SF).to_pandas()
        assert set(got.loc[got["mode"] == "exact", "doc_id"]) == set(
            ex["doc_id"]
        )
        assert set(got.loc[got["mode"] == "near_dup", "doc_id"]) == set(
            nd["doc_id"]
        )


class TestDegenerateCorpora:
    """Typed-empty schemas survive corpora where every map stage sees
    only empty blocks (Ray passes them through schema-less)."""

    @staticmethod
    def _write_docs(path, texts):
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["en"] * n, type=pa.string()),
                    "source": pa.array(["s0"] * n, type=pa.string()),
                }
            ),
            f"{path}/documents.parquet",
        )

    def test_exact_substring_empty_and_ws(self, ray_session, tmp_path):
        from jochre3_ocr_ray.ops.dedup import q_dedup_exact_substring

        empty = tmp_path / "empty"
        empty.mkdir()
        self._write_docs(empty, [])
        t = q_dedup_exact_substring(str(empty))
        assert t.num_rows == 0
        assert t.column_names == ["doc_id", "text", "n_tokens_removed"]

        ws = tmp_path / "ws"
        ws.mkdir()
        self._write_docs(ws, ["   ", "", "\t\n"])
        t = q_dedup_exact_substring(str(ws)).to_pandas()
        assert (t["text"] == "").all()
        assert (t["n_tokens_removed"] == 0).all()

    def test_balanced_mix_all_filtered(self, ray_session, tmp_path):
        from jochre3_ocr_ray.pipelines.curate import q_balanced_mix

        sf = tmp_path / "sf"
        sf.mkdir()
        # every doc under MIN_TOKENS -> sample is empty but typed
        self._write_docs(sf, ["too short", "also short", ""])
        t = q_balanced_mix(str(sf))
        assert t.num_rows == 0
        assert t.column_names == [
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "tape_pos",
        ]

    def test_semantic_empty_embeddings(self, ray_session, tmp_path):
        from jochre3_ocr_ray.ops.dedup import q_dedup_semantic

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                }
            ),
            sf / "embeddings.parquet",
        )
        t = q_dedup_semantic(str(sf))
        assert t.num_rows == 0
        assert t.column_names == ["id", "cid", "keep", "rep_id", "dup_sim"]


class TestDriverSurface:
    def test_fifty_entries_all_oracled(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry_mod

        qs = entry_mod.queries()
        sqls = entry_mod.oracle_sql()
        assert len(qs) == 50, len(qs)
        assert set(qs) == set(sqls)
