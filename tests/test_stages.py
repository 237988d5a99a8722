"""Tests for auxiliary stages: payload decode, ALTO rendering stage,
input reader."""

from __future__ import annotations

import base64

import pyarrow as pa
import pytest

from jochre3_ocr_ray.functions.render_alto import parse_alto, render_alto
from jochre3_ocr_ray.stages.decode import decode_payloads, render_alto_column


def _turn_batch(rows):
    from datetime import datetime

    return pa.table(
        {
            "conv_id": pa.array([r.get("conv_id", "c") for r in rows]),
            "turn_idx": pa.array(
                [r.get("turn_idx", i) for i, r in enumerate(rows)], type=pa.int32()
            ),
            "role": pa.array([r.get("role", "user") for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "tool": pa.array([r.get("tool", "") for r in rows]),
            "ts": pa.array(
                [datetime(2026, 1, 1)] * len(rows), type=pa.timestamp("us")
            ),
        }
    )


class TestDecodePayloads:
    def test_base64_unwrapped(self):
        encoded = "base64:" + base64.b64encode(b"hello world").decode()
        out = decode_payloads(_turn_batch([{"text": encoded}]))
        assert out["text"][0].as_py() == "hello world"

    def test_invalid_base64_passthrough(self):
        out = decode_payloads(_turn_batch([{"text": "base64:!!notb64!!"}]))
        assert out["text"][0].as_py() == "base64:!!notb64!!"

    def test_tool_json_envelope(self):
        out = decode_payloads(
            _turn_batch(
                [{"text": '{"output": "result text", "status": 0}', "role": "tool"}]
            )
        )
        assert out["text"][0].as_py() == "result text"

    def test_non_tool_json_untouched(self):
        payload = '{"output": "x"}'
        out = decode_payloads(_turn_batch([{"text": payload, "role": "user"}]))
        assert out["text"][0].as_py() == payload

    def test_plain_passthrough(self):
        out = decode_payloads(_turn_batch([{"text": "plain"}]))
        assert out["text"][0].as_py() == "plain"


class TestAltoRoundTrip:
    def test_full_round_trip(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn

        r = extract_turn('Jimi Hend-\nrix "Experience" & more\n\nblock 2!', 7, lexicon)
        xml = render_alto("c_7", r["blocks"], r["confidence"])
        back = parse_alto(xml)
        assert back["id"] == "c_7"
        assert back["confidence"] == pytest.approx(r["confidence"], abs=1e-6)
        assert len(back["blocks"]) == len(r["blocks"])
        for b1, b2 in zip(back["blocks"], r["blocks"]):
            assert (b1["id"], b1["span"]) == (b2["id"], b2["span"])
            for l1, l2 in zip(b1["lines"], b2["lines"]):
                assert l1["span"] == l2["span"]
                for w1, w2 in zip(l1["words"], l2["words"]):
                    assert w1["text"] == w2["text"]
                    assert w1["span"] == w2["span"]
                    assert w1["subs_type"] == w2["subs_type"]
                    assert w1["subs_content"] == w2["subs_content"]

    def test_styles_and_tags_round_trip(self, lexicon):
        """<Styles>/<Tags> sections of the ALTO-4 output contract
        (Alto.scala:9-10,27-28; TextStyle.scala, LayoutTag.scala,
        StructureTag.scala): render with non-empty styles + both tag
        kinds and parse back losslessly; absent optional attributes
        come back None (TextStyle.fromXML semantics)."""
        from jochre3_ocr_ray.functions.extract import extract_turn

        styles = [
            {
                "id": "TS1",
                "font_family": "Serif",
                "font_type": "italic",
                "font_width": "proportional",
                "font_size": 12.0,
            },
            {
                "id": "TS2",
                "font_family": None,
                "font_type": None,
                "font_width": None,
                "font_size": None,
            },
        ]
        tags = [
            {"kind": "layout", "id": "LT1", "label": "column"},
            {"kind": "structure", "id": "ST1", "label": "caption"},
        ]
        r = extract_turn("some words here", 3, lexicon)
        xml = render_alto(
            "c_3", r["blocks"], r["confidence"], text_styles=styles, tags=tags
        )
        assert "<Styles>" in xml and "<Tags>" in xml
        back = parse_alto(xml)
        assert back["text_styles"] == styles
        assert back["tags"] == tags
        # omitting them keeps the old output shape (no empty sections)
        xml_plain = render_alto("c_3", r["blocks"], r["confidence"])
        assert "<Styles>" not in xml_plain and "<Tags>" not in xml_plain
        plain = parse_alto(xml_plain)
        assert plain["text_styles"] == [] and plain["tags"] == []

    def test_alto_column_stage(self, ray_session, lexicon):
        import ray.data as rd

        from jochre3_ocr_ray.pipelines.extract import build_extraction

        ds = rd.from_arrow(
            _turn_batch([{"text": "some plain text"}, {"text": ""}])
        )
        extracted = build_extraction(ds)
        with_xml = extracted.map_batches(
            render_alto_column, batch_format="pyarrow"
        ).to_pandas()
        assert with_xml["alto_xml"].str.startswith("<alto").all()
        parsed = parse_alto(with_xml["alto_xml"].iloc[0])
        assert parsed["blocks"]


class TestReader:
    def test_pattern_and_limit(self, ray_session, small_corpus):
        from jochre3_ocr_ray.sources.reader import read_transcripts

        ds = read_transcripts(small_corpus, limit=10)
        assert ds.count() == 10
        with pytest.raises(FileNotFoundError):
            read_transcripts(small_corpus, pattern=r"nope-.*")

    def test_turn_range_slice(self, ray_session, small_corpus):
        """start_turn/end_turn — the PDFToImageConverter startPage/
        endPage analog (PDFToImageConverter.scala:18-75): every
        conversation sliced to the inclusive turn_idx range, pruned at
        the parquet scan."""
        from jochre3_ocr_ray.sources.reader import read_transcripts

        full = read_transcripts(small_corpus).to_pandas()
        got = read_transcripts(
            small_corpus, start_turn=1, end_turn=2
        ).to_pandas()
        want = full[(full["turn_idx"] >= 1) & (full["turn_idx"] <= 2)]
        assert len(got) == len(want) > 0
        assert set(got["turn_idx"]) <= {1, 2}
        # open-ended slices
        lo = read_transcripts(small_corpus, start_turn=2).to_pandas()
        assert (lo["turn_idx"] >= 2).all()
        assert len(lo) == (full["turn_idx"] >= 2).sum()
        hi = read_transcripts(small_corpus, end_turn=0).to_pandas()
        assert set(hi["turn_idx"]) == {0}


class TestJsonlSource:
    def test_jsonl_coerced_and_extractable(self, ray_session, tmp_path, lexicon):
        import json as _json

        from jochre3_ocr_ray.pipelines.extract import build_extraction
        from jochre3_ocr_ray.sources.reader import read_transcripts_jsonl

        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "Jimi Hend-\nrix Experience", "ts": "2026-01-01T00:00:00"},
            {"conv_id": "c1", "turn_idx": 1, "role": "tool",
             "text": "plain reply", "tool": "search",
             "ts": "2026-01-01T00:01:00"},
        ]
        path = tmp_path / "t.jsonl"
        path.write_text("\n".join(_json.dumps(r) for r in rows))
        ds = read_transcripts_jsonl(tmp_path)
        out = build_extraction(ds).to_pandas().sort_values("turn_idx")
        assert list(out["processed_text"]) == [
            "Jimi Hendrix Experience", "plain reply",
        ]
        assert str(out.dtypes["ts"]).startswith("datetime64")

    def test_jsonl_ts_iso_variants(self, ray_session, tmp_path):
        """Fractional seconds, trailing Z, and numeric offsets must all
        parse (ADVICE r1: strptime was pinned to one exact shape)."""
        import json as _json

        from jochre3_ocr_ray.sources.reader import read_transcripts_jsonl

        stamps = [
            ("2026-01-01T00:00:00", "2026-01-01 00:00:00"),
            ("2026-01-01T00:00:00.250", "2026-01-01 00:00:00.250000"),
            ("2026-01-01T00:00:00Z", "2026-01-01 00:00:00"),
            ("2026-01-01T02:00:00+02:00", "2026-01-01 00:00:00"),
        ]
        rows = [
            {"conv_id": "c1", "turn_idx": i, "role": "user",
             "text": "x", "ts": raw}
            for i, (raw, _) in enumerate(stamps)
        ]
        (tmp_path / "t.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        out = read_transcripts_jsonl(tmp_path).to_pandas().sort_values("turn_idx")
        got = [str(t) for t in out["ts"]]
        assert got == [want for _, want in stamps], got


class TestCsvSource:
    def test_csv_coerces_to_canonical_schema(self, ray_session, tmp_path):
        """CSV transcripts land on TRANSCRIPT_SCHEMA and extract
        identically to the same rows via parquet."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from jochre3_ocr_ray.pipelines.extract import build_extraction
        from jochre3_ocr_ray.sources.reader import (
            read_transcripts,
            read_transcripts_csv,
        )

        rows = [
            ("c1", 0, "user", "hello world", "", "2026-01-01T00:00:00"),
            ("c1", 1, "assistant", "reply <b>bold</b>", "", "2026-01-01T00:00:05Z"),
            ("c2", 0, "user", "second conv", "grep", "2026-01-02T10:30:00"),
        ]
        csv_path = tmp_path / "t.csv"
        csv_path.write_text(
            "conv_id,turn_idx,role,text,tool,ts\n"
            + "\n".join(
                f'{c},{i},{r},"{t}",{tool},{ts}'
                for c, i, r, t, tool, ts in rows
            )
            + "\n"
        )
        ds = read_transcripts_csv(str(tmp_path))
        got = ds.to_pandas().sort_values(["conv_id", "turn_idx"])
        assert list(got.columns) == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]
        assert str(got["turn_idx"].dtype) == "int32"
        assert got["ts"].iloc[1].isoformat().startswith("2026-01-01T00:00:05")

        # parquet twin extracts identically
        import numpy as np

        pq_dir = tmp_path / "pq"
        pq_dir.mkdir()
        pq.write_table(
            pa.table(
                {
                    "conv_id": pa.array([r[0] for r in rows]),
                    "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
                    "role": pa.array([r[2] for r in rows]),
                    "text": pa.array([r[3] for r in rows]),
                    "tool": pa.array([r[4] for r in rows]),
                    "ts": pa.array(
                        [np.datetime64(r[5].rstrip("Z"), "us") for r in rows]
                    ),
                }
            ),
            pq_dir / "t.parquet",
        )
        a = (
            build_extraction(ds, include_blocks=False)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        b = (
            build_extraction(
                read_transcripts(str(pq_dir)), include_blocks=False
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert (a["extracted_text"] == b["extracted_text"]).all()
        assert (a["processed_text"] == b["processed_text"]).all()
