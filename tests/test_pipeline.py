"""Pipeline-tier tests (SURVEY.md §5 tier b/c): the Ray Data pipeline
on a deterministic synthetic Parquet corpus, joined row-for-row to the
pure-Python oracle on (conv_id, turn_idx) — per-turn text equality
under stable turn ordering, plus resume/lineage semantics."""

from __future__ import annotations

import glob
import json
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from jochre3_ocr_ray.functions.extract import extract_turn
from jochre3_ocr_ray.pipelines.extract import (
    read_extraction,
    run_assembly,
    run_extraction,
    run_pipeline,
)


@pytest.fixture(scope="module")
def pipeline_run(ray_session, small_corpus, tmp_path_factory):
    work = tmp_path_factory.mktemp("pipeline")
    metrics = run_pipeline(small_corpus, work, num_shards=2, concurrency=2)
    return work, metrics


def _input_df(corpus_dir):
    return pq.read_table(sorted(glob.glob(f"{corpus_dir}/*.parquet"))).to_pandas()


class TestPerTurnEquality:
    def test_every_turn_matches_oracle(self, pipeline_run, small_corpus, lexicon):
        work, _ = pipeline_run
        out = read_extraction(work / "turns").to_pandas()
        inp = _input_df(small_corpus)
        joined = inp.merge(
            out, on=["conv_id", "turn_idx"], suffixes=("", "_out"), validate="1:1"
        )
        assert len(joined) == len(inp) == len(out)
        for _, row in joined.iterrows():
            exp = extract_turn(row["text"], row["turn_idx"], lexicon)
            assert exp["extracted_text"] == row["extracted_text"], row["conv_id"]
            assert exp["processed_text"] == row["processed_text"], row["conv_id"]
            assert exp["n_words"] == row["n_words"]
            assert exp["confidence"] == pytest.approx(row["confidence"])

    def test_span_offsets_roundtrip_arrow(self, pipeline_run):
        """Nested blocks survive Arrow/parquet; spans index extracted_text."""
        work, _ = pipeline_run
        out = read_extraction(work / "turns").to_pandas()
        checked = 0
        for _, row in out.iterrows():
            text = row["extracted_text"]
            for block in row["blocks"]:
                for line in block["lines"]:
                    for w in line["words"]:
                        s = w["span"]
                        assert text[s["start"] : s["end"]] == w["text"]
                        checked += 1
        assert checked > 100

    def test_output_schema_stable(self, pipeline_run):
        work, _ = pipeline_run
        schema = read_extraction(work / "turns").schema()
        assert set(schema.names) >= {
            "conv_id", "turn_idx", "role", "tool", "ts",
            "extracted_text", "processed_text", "blocks", "confidence",
            "n_blocks", "n_lines", "n_words", "pipeline_version",
        }


class TestConversationAssembly:
    def test_stable_turn_ordering(self, pipeline_run, small_corpus, ray_session):
        """Rows were written shuffled; conversation_text must be in
        turn_idx order regardless (the groupby + in-group sort)."""
        import ray.data as rd

        work, _ = pipeline_run
        convs = rd.read_parquet(str(work / "conversations")).to_pandas()
        turns = read_extraction(work / "turns").to_pandas()
        for conv_id in convs["conv_id"].sample(5, random_state=0):
            g = turns[turns.conv_id == conv_id].sort_values("turn_idx")
            expected = "\n\n".join(g["extracted_text"])
            got = convs[convs.conv_id == conv_id]["conversation_text"].iloc[0]
            assert got == expected, conv_id
        assert convs["n_turns"].sum() == len(turns)

    def test_salted_two_phase_equals_direct(self, pipeline_run, ray_session):
        """chunk=2 forces multi-partial assembly; result identical."""
        import ray.data as rd

        from jochre3_ocr_ray.stages.assemble import assemble_conversations

        work, _ = pipeline_run
        extracted = read_extraction(work / "turns")
        small_chunk = assemble_conversations(extracted, chunk=2).to_pandas()
        default = rd.read_parquet(str(work / "conversations")).to_pandas()
        merged = small_chunk.merge(default, on="conv_id", suffixes=("_a", "_b"))
        assert len(merged) == len(default)
        assert (merged["conversation_text_a"] == merged["conversation_text_b"]).all()
        assert (merged["n_words_a"] == merged["n_words_b"]).all()

    def test_bucketed_assembly_complete(self, pipeline_run, ray_session):
        """Default bucketed assembly covers every conversation exactly
        once (bucket = crc32(conv_id) % B partitioning assumption)."""
        import ray.data as rd

        work, _ = pipeline_run
        convs = rd.read_parquet(str(work / "conversations")).to_pandas()
        turns = read_extraction(work / "turns").to_pandas()
        assert sorted(convs["conv_id"]) == sorted(turns["conv_id"].unique())
        assert convs["conv_id"].is_unique
        assert convs["n_turns"].sum() == len(turns)

    def test_sorted_strategy_equals_salted(self, pipeline_run, ray_session):
        """The sort-based assembly produces identical conversations."""
        import ray.data as rd

        from jochre3_ocr_ray.stages.assemble import assemble_conversations_sorted

        work, _ = pipeline_run
        extracted = read_extraction(work / "turns")
        sorted_out = assemble_conversations_sorted(extracted).to_pandas()
        default = rd.read_parquet(str(work / "conversations")).to_pandas()
        merged = sorted_out.merge(default, on="conv_id", suffixes=("_a", "_b"))
        assert len(merged) == len(default) == len(sorted_out)
        assert (merged["conversation_text_a"] == merged["conversation_text_b"]).all()
        assert (
            merged["processed_conversation_text_a"]
            == merged["processed_conversation_text_b"]
        ).all()
        assert (merged["n_turns_a"] == merged["n_turns_b"]).all()
        assert np.allclose(merged["confidence_a"], merged["confidence_b"])


class TestServeCLI:
    def test_single_payload_three_formats(self, tmp_path, capsys):
        """The serve subcommand (AnalysisApp analog): one payload in,
        text / processed / ALTO out, consistent with extract_turn."""
        import json

        from jochre3_ocr_ray.__main__ import main
        from jochre3_ocr_ray.functions.render_alto import parse_alto

        payload = tmp_path / "req.txt"
        payload.write_text("Hello <b>world</b> test-\ning one two")
        assert main(["serve", str(payload)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["text"] == "Hello world test-\ning one two"
        assert out["processed_text"] == "Hello world testing one two"
        parsed = parse_alto(out["alto_xml"])  # round-trips
        assert 0 < out["confidence"] <= 1
        # single-format request narrows the response
        assert main(["serve", str(payload), "--format", "text"]) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "alto_xml" not in out2 and out2["text"] == out["text"]

    def test_zip_sink(self, tmp_path, capsys):
        """--out-zip writes the zipped OutputLocation analog."""
        import json
        import zipfile

        from jochre3_ocr_ray.__main__ import main

        payload = tmp_path / "req.txt"
        payload.write_text("zip me up now")
        zip_path = tmp_path / "out.zip"
        assert main(["serve", str(payload), "--out-zip", str(zip_path)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        with zipfile.ZipFile(zip_path) as zf:
            names = set(zf.namelist())
            assert names == {
                "payload_0.txt", "payload_0_processed.txt",
                "payload_0_alto4.xml",
            }
            assert zf.read("payload_0.txt").decode() == out["text"]

    def test_lexicon_endpoint(self, capsys):
        """--words mirrors GET /word-in-lexicon: frequency classes
        (>0 known, 0 unknown, <0 impossible)."""
        import json

        from jochre3_ocr_ray.__main__ import main

        assert main(["serve", "--words", "the,zzzzqqq,abc123"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        got = {f["word"]: f["frequency"] for f in out["frequencies"]}
        assert got["the"] > 0
        assert got["zzzzqqq"] == 0
        assert got["abc123"] < 0

    def test_standardize_endpoint(self, capsys):
        import json

        from jochre3_ocr_ray.__main__ import main
        from jochre3_ocr_ray.functions.transliterate import Transliterator

        assert main(["serve", "--standardize", "the,cat"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        tr = Transliterator()
        assert out["standardized"] == [tr.transliterate("the"),
                                       tr.transliterate("cat")]

    def test_dehyphenate_endpoint(self, tmp_path, capsys):
        """--dehyphenate mirrors POST /dehyphenate: line breaks become
        spaces, paragraph ends a single newline, trailing-hyphen pairs
        merged by the lexicon rule."""
        from jochre3_ocr_ray.__main__ import main

        payload = tmp_path / "req.txt"
        payload.write_text(
            "known un-\nknown words here\nlast line\n\nnew para"
        )
        assert main(["serve", str(payload), "--dehyphenate"]) == 0
        got = capsys.readouterr().out
        assert got == "known unknown words here last line\nnew para"


class TestDehyphenateText:
    def test_line_and_paragraph_semantics(self):
        from jochre3_ocr_ray.functions.extract import dehyphenate_text
        from jochre3_ocr_ray.functions.lexicon import Lexicon

        lex = Lexicon({"alpha", "beta", "alphabeta", "gamma", "delta"})
        # joined form known -> hyphen dropped, lines merged
        assert dehyphenate_text("alpha-\nbeta end", lex) == (
            "alphabeta end"
        )
        # both parts known, joined unknown -> hyphen kept, no space
        assert dehyphenate_text("gamma-\ndelta end", lex) == (
            "gamma-delta end"
        )
        # single line passes through untouched
        assert dehyphenate_text("no breaks", lex) == "no breaks"
        # punct-aware word boundaries: only the final word merges
        assert dehyphenate_text("x, alpha-\nbeta, y", lex) == (
            "x, alphabeta, y"
        )
        # trailing-newline state of the input is preserved: one stays
        # one (not doubled), none stays none
        assert dehyphenate_text("alpha-\nbeta end\n", lex) == (
            "alphabeta end\n"
        )
        assert dehyphenate_text("a\nb", lex) == "a b"
        assert dehyphenate_text("a\nb\n", lex) == "a b\n"


class TestResume:
    def test_resume_skips_completed_shards(self, ray_session, small_corpus, tmp_path):
        out = tmp_path / "turns"
        m1 = run_extraction(small_corpus, out, num_shards=2, concurrency=2)
        assert m1["skipped_shards"] == 0 and m1["shards"] == 2
        m2 = run_extraction(small_corpus, out, num_shards=2, concurrency=2)
        assert m2["skipped_shards"] == 2 and m2["rows"] == 0

    def test_partial_failure_recovery_identical_output(
        self, ray_session, small_corpus, tmp_path
    ):
        out = tmp_path / "turns"
        run_extraction(small_corpus, out, num_shards=2, concurrency=2)
        full = read_extraction(out).to_pandas().sort_values(
            ["conv_id", "turn_idx"]
        ).reset_index(drop=True)
        # simulate a crash: wipe shard 1's output + manifest
        shutil.rmtree(out / "shard=00001")
        (out / "_lineage" / "00001.json").unlink()
        m = run_extraction(small_corpus, out, num_shards=2, concurrency=2)
        assert m["skipped_shards"] == 1
        redone = read_extraction(out).to_pandas().sort_values(
            ["conv_id", "turn_idx"]
        ).reset_index(drop=True)
        assert (full["extracted_text"] == redone["extracted_text"]).all()
        assert len(full) == len(redone)

    def test_metrics_accumulator_dedupes_replayed_batches(self, ray_session):
        """Ray can replay a block on retry/reconstruction; the metrics
        actor must count each deterministic batch key once (ADVICE r2)."""
        from jochre3_ocr_ray.pipelines.extract import _MetricsAccumulator

        acc = _MetricsAccumulator.remote()
        import ray as _ray

        _ray.get(acc.add.remote(("c1", 0), 10, 50, 1))
        _ray.get(acc.add.remote(("c1", 0), 10, 50, 1))  # replayed batch
        _ray.get(acc.add.remote(("c2", 5), 4, 8, 0))
        rows, n_words, n_empty = _ray.get(acc.totals.remote())
        _ray.kill(acc)
        assert (rows, n_words, n_empty) == (14, 58, 1)

    def test_lineage_manifest_contents(self, pipeline_run):
        work, _ = pipeline_run
        manifests = sorted((work / "turns" / "_lineage").glob("*.json"))
        assert len(manifests) == 2
        m = json.loads(manifests[0].read_text())
        assert m["status"] == "complete"
        assert m["rows_out"] > 0
        assert m["inputs"]
        assert m["pipeline_version"].startswith("jochre3-ocr-ray/")
        assert m["metrics"]["n_words"] > 0
        assert m["metrics"]["empty_turns"] >= 0
