"""Stage-variant equivalence: the actor-pool and stateless-task forms
of the extraction stage must produce identical output, and the
alternatives-enabled path must survive the Arrow/parquet round trip."""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def turns_ds(ray_session, small_corpus):
    import ray.data as rd

    from jochre3_ocr_ray.sources.reader import read_transcripts

    # no limit: ds.limit picks whichever blocks finish first, so a
    # limited dataset is a DIFFERENT row subset on each execution
    return read_transcripts(small_corpus)


class TestActorVsTask:
    def test_identical_output(self, turns_ds):
        from jochre3_ocr_ray.pipelines.extract import build_extraction

        tasks = (
            build_extraction(turns_ds, use_actors=False)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        actors = (
            build_extraction(turns_ds, use_actors=True, concurrency=2)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(tasks) == len(actors)
        for col in ["extracted_text", "processed_text", "n_words", "lang"]:
            assert (tasks[col] == actors[col]).all(), col


class TestAlternativesPath:
    def test_alternatives_roundtrip(self, turns_ds, tmp_path):
        import ray.data as rd

        from jochre3_ocr_ray.pipelines.extract import build_extraction

        out = build_extraction(
            turns_ds, include_alternatives=True, concurrency=2
        )
        out.write_parquet(str(tmp_path / "alts"))
        back = rd.read_parquet(
            [str(p) for p in sorted((tmp_path / "alts").glob("*.parquet"))]
        ).to_pandas()
        n_alts = 0
        for _, row in back.iterrows():
            for block in row["blocks"]:
                for line in block["lines"]:
                    for w in line["words"]:
                        for alt in w["alternatives"]:
                            assert alt["purpose"] in ("LOWER", "ROMAN")
                            assert alt["content"]
                            n_alts += 1
        assert n_alts > 0  # corpus has capitalized/RTL words


class TestExchangeAssemblyEquality:
    def test_exchange_matches_salted(self, ray_session, small_corpus):
        """The raw-exchange assembly tier produces IDENTICAL
        conversations to the salted two-phase Dataset strategy."""
        import pandas as pd

        import ray.data

        from jochre3_ocr_ray.pipelines.extract import build_extraction
        from jochre3_ocr_ray.sources.reader import read_transcripts
        from jochre3_ocr_ray.stages.assemble import (
            assemble_conversations,
            assemble_conversations_exchange,
        )

        extracted = build_extraction(
            read_transcripts(small_corpus), include_blocks=False
        )
        cols = ["conv_id", "n_turns", "n_words", "conversation_text",
                "processed_conversation_text", "confidence"]
        salted = (
            assemble_conversations(extracted)
            .to_pandas()[cols]
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        exchange = (
            assemble_conversations_exchange(extracted)[cols]
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            salted.astype({"n_turns": "int64"}), exchange, check_dtype=False
        )


class TestHotConversationSkew:
    def test_dominating_conversation_all_strategies_agree(
        self, ray_session, tmp_path
    ):
        """One conversation holds 90% of all turns (the hot-key case
        the salted two-phase exists for): every assembly strategy must
        produce identical, correctly-ordered output, and the hot
        conversation's text must be the full in-order turn sequence."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from jochre3_ocr_ray.pipelines.extract import build_extraction
        from jochre3_ocr_ray.stages.assemble import (
            assemble_conversations,
            assemble_conversations_exchange,
            assemble_conversations_sorted,
        )

        rows = []
        # hot conversation: 9000 turns; 20 cold ones with 50 each
        for t in range(9000):
            rows.append(("hot", t, f"turn {t} text"))
        for c in range(20):
            for t in range(50):
                rows.append((f"cold{c:02d}", t, f"cold {c} turn {t}"))
        rng = np.random.RandomState(4)
        order = rng.permutation(len(rows))  # shuffled on-disk order
        base = np.datetime64("2026-01-01T00:00:00", "us")
        table = pa.table(
            {
                "conv_id": pa.array([rows[i][0] for i in order]),
                "turn_idx": pa.array(
                    [rows[i][1] for i in order], type=pa.int32()
                ),
                "role": pa.array(["user"] * len(rows)),
                "text": pa.array([rows[i][2] for i in order]),
                "tool": pa.array([""] * len(rows)),
                "ts": pa.array([base] * len(rows)),
            }
        )
        turns = rd.from_arrow(table).repartition(16)
        extracted = build_extraction(turns, include_blocks=False)
        cols = ["conv_id", "n_turns", "conversation_text"]
        salted = (
            assemble_conversations(extracted, chunk=256)
            .to_pandas()[cols]
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        exchange = (
            assemble_conversations_exchange(extracted)[cols]
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        srt = (
            assemble_conversations_sorted(extracted)
            .to_pandas()[cols]
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            salted.astype({"n_turns": "int64"}),
            exchange.astype({"n_turns": "int64"}),
            check_dtype=False,
        )
        pd.testing.assert_frame_equal(
            salted.astype({"n_turns": "int64"}),
            srt.astype({"n_turns": "int64"}),
            check_dtype=False,
        )
        hot = salted[salted.conv_id == "hot"].iloc[0]
        assert hot["n_turns"] == 9000
        expect = "\n\n".join(f"turn {t} text" for t in range(9000))
        assert hot["conversation_text"] == expect
