"""Corpus-prep pipelines (TextLineExtractor / WordExtractor /
GlyphDataset / YoloAnnotator analogs) on the markup-bearing generated
corpus — multi-line pages, so the every-Nth splits and per-line
geometry are exercised for real (the sf driver corpus is single-line
per page)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def extracted(ray_session, small_corpus):
    from jochre3_ocr_ray.pipelines.extract import build_extraction
    from jochre3_ocr_ray.sources.reader import read_transcripts

    turns = read_transcripts(str(small_corpus))
    return build_extraction(turns, include_blocks=True, include_glyphs=True)


@pytest.fixture(scope="module")
def pages(ray_session, extracted):
    from jochre3_ocr_ray.ops.relational import _to_table

    return _to_table(
        extracted.select_columns(
            ["conv_id", "turn_idx", "extracted_text", "blocks"]
        )
    ).to_pylist()


class TestLineExamples:
    def test_spans_content_and_split(self, ray_session, extracted, pages):
        from jochre3_ocr_ray.functions.normalize import simplify
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import line_examples

        out = _to_table(
            line_examples(extracted, validation_one_every=3)
        ).to_pandas()
        assert len(out) > 0
        by_page = {(p["conv_id"], p["turn_idx"]): p for p in pages}
        n_lines_total = sum(
            len(l["lines"]) for p in pages for l in (p["blocks"] or [])
        )
        assert len(out) == n_lines_total
        # multi-line pages exist in the markup corpus
        assert out.groupby(["conv_id", "turn_idx"]).size().max() > 1
        for row in out.sample(50, random_state=7).itertuples():
            page = by_page[(row.conv_id, row.turn_idx)]
            assert row.content == simplify(
                page["extracted_text"][row.span_start:row.span_end]
            )
            assert row.split == (
                "val" if (row.line_idx + 1) % 3 == 0 else "train"
            )
            assert row.example_id == (
                f"{row.conv_id}_{row.turn_idx:05d}_{row.line_idx:03d}"
            )
        # real val rows exist
        assert (out["split"] == "val").sum() > 0

    def test_line_idx_contiguous_per_page(self, ray_session, extracted):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import line_examples

        out = _to_table(line_examples(extracted)).to_pandas()
        for _, grp in out.groupby(["conv_id", "turn_idx"]):
            idx = sorted(grp["line_idx"])
            assert idx == list(range(len(idx)))


class TestWordExamples:
    def test_combined_words_are_space_runs(self, ray_session, extracted, pages):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import word_examples

        out = _to_table(
            word_examples(extracted, validation_one_every=10)
        ).to_pandas()
        by_page = {(p["conv_id"], p["turn_idx"]): p for p in pages}
        for row in out.sample(80, random_state=3).itertuples():
            page = by_page[(row.conv_id, row.turn_idx)]
            text = page["extracted_text"]
            # span slices the content and is a maximal non-space run
            # within its line (combinedWords semantics)
            piece = text[row.span_start:row.span_end]
            assert " " not in piece
            assert row.content == piece or row.content  # simplified view
            if row.span_start > 0:
                assert text[row.span_start - 1] in (" ", "\n")
            if row.span_end < len(text):
                assert text[row.span_end] in (" ", "\n")
            assert row.split == (
                "val" if (row.word_idx + 1) % 10 == 0 else "train"
            )
        assert (out["split"] == "val").sum() > 0


class TestCorpusAlphabet:
    def test_matches_char_inventory(self, ray_session, extracted, pages):
        from jochre3_ocr_ray.functions.normalize import simplify
        from jochre3_ocr_ray.pipelines.corpus_prep import corpus_alphabet

        table = corpus_alphabet(extracted)
        glyphs = table["glyph"].to_pylist()
        idxs = table["class_idx"].to_pylist()
        # unknown class "" comes last with index == alphabet size
        assert glyphs[-1] == ""
        assert idxs[-1] == len(glyphs) - 1
        assert idxs == list(range(len(glyphs)))
        assert glyphs[:-1] == sorted(glyphs[:-1])
        expected = set()
        for p in pages:
            for ch in p["extracted_text"]:
                if ch not in (" ", "\n"):
                    expected.add(simplify(ch))
        assert set(glyphs[:-1]) == expected


class TestGlyphExamples:
    def test_class_lookup_and_crops(self, ray_session, extracted, pages):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            corpus_alphabet,
            glyph_examples,
        )

        alphabet = corpus_alphabet(extracted)
        idx = {g: i for i, g in enumerate(alphabet["glyph"].to_pylist())}
        out = _to_table(glyph_examples(extracted, alphabet)).to_pandas()
        assert len(out) > 0
        by_page = {(p["conv_id"], p["turn_idx"]): p for p in pages}
        for row in out.sample(50, random_state=5).itertuples():
            assert row.class_idx == idx[row.label]
            page = by_page[(row.conv_id, row.turn_idx)]
            assert 0 <= row.crop_start <= row.crop_end
            assert row.crop_end <= len(page["extracted_text"])


class TestYoloAnnotations:
    def test_boxes_normalized_multiline(self, ray_session, extracted):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import yolo_annotations

        out = _to_table(
            yolo_annotations(extracted, validation_one_every=4,
                             page_index_fn=lambda p: p["turn_idx"])
        ).to_pandas()
        assert ((out["cx"] >= 0) & (out["cx"] <= 1)).all()
        assert ((out["cy"] >= 0) & (out["cy"] <= 1)).all()
        assert ((out["w"] > 0) & (out["w"] <= 1)).all()
        assert ((out["h"] > 0) & (out["h"] <= 1)).all()
        # a multi-line page yields textline rows at distinct cy values
        lines = out[out["class_name"] == "textline"]
        multi = lines.groupby(["conv_id", "turn_idx"])["cy"].nunique()
        assert multi.max() > 1
        # split follows the page index rule
        val_pages = out.loc[out["split"] == "val", "turn_idx"].unique()
        assert all((t + 1) % 4 == 0 for t in val_pages)
        assert len(val_pages) > 0

    def test_word_rows_match_word_examples(self, ray_session, extracted):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            word_examples,
            yolo_annotations,
        )

        yolo = _to_table(yolo_annotations(extracted)).to_pandas()
        words = _to_table(word_examples(extracted)).to_pandas()
        assert (yolo["class_name"] == "word").sum() == len(words)


class TestPrepareTrainingCorpus:
    def test_writes_split_partitions(self, ray_session, small_corpus, tmp_path):
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            prepare_training_corpus,
        )

        out = tmp_path / "prep"
        res = prepare_training_corpus(
            str(small_corpus), str(out), kind="lines", validation_one_every=3
        )
        assert res["rows"] > 0
        parts = {p.name for p in out.iterdir() if p.is_dir()}
        assert parts == {"split=train", "split=val"}


class TestGlyphTrainer:
    """GlyphTrainer/ModelBuilder analog: distributed NB fit over the
    prepared glyph examples, served back through the beam hook."""

    @pytest.fixture(scope="class")
    def trained(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from jochre3_ocr_ray.functions.learning import train_glyph_classifier
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            corpus_alphabet,
            glyph_examples,
        )
        from jochre3_ocr_ray.pipelines.extract import build_extraction

        # 'o' only ever between letters; '0' only between digits
        texts = (
            ["continue the london force holt now"] * 30
            + ["codes 102 305 800 901 count on gold"] * 30
        )
        import numpy as np

        turns = rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([f"c{i//4}" for i in range(len(texts))]),
                    "turn_idx": pa.array(
                        [i % 4 for i in range(len(texts))], type=pa.int32()
                    ),
                    "role": pa.array(["user"] * len(texts)),
                    "text": pa.array(texts),
                    "tool": pa.array([""] * len(texts)),
                    "ts": pa.array(
                        [np.datetime64("2026-01-01", "us")] * len(texts)
                    ),
                }
            )
        )
        extracted = build_extraction(
            turns, include_blocks=True, include_glyphs=True
        )
        alphabet = corpus_alphabet(extracted)
        examples = glyph_examples(extracted, alphabet)
        model = train_glyph_classifier(examples, alphabet)
        return model

    def test_clean_top1_recovers_center(self, trained):
        for word, i, want in [("continue", 1, "o"), ("305", 1, "0"),
                              ("force", 1, "o"), ("now", 1, "o")]:
            top = trained.predict(word, i, top_k=3)
            assert top[0][0] == want, (word, i, top)

    def test_context_outvotes_corrupted_center(self, trained):
        # '0' between letters was never seen in training: the letter
        # context pushes 'o' to the top despite the corrupted center
        top = trained.predict("c0ntinue", 1, top_k=3)
        assert top[0][0] == "o", top

    def test_e2e_beam_recovers_word(self, trained, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn

        out = extract_turn(
            "c0ntinue now", 0, lexicon,
            glyph_candidates_fn=trained.as_candidates_fn(),
        )
        assert out["extracted_text"].startswith("continue")

    def test_model_json_round_trip(self, trained):
        from jochre3_ocr_ray.functions.learning import GlyphClassifier

        again = GlyphClassifier.from_json(trained.to_json())
        for word, i in [("continue", 1), ("305", 1), ("c0ntinue", 1)]:
            assert again.predict(word, i) == trained.predict(word, i)


class TestGlyphEvaluator:
    """GlyphEvaluator analog: per-class accuracy/confusion over a
    holdout example table (core/learning/GlyphEvaluator.scala:29-55)."""

    def _examples(self, rows):
        """rows = [(label, crop_text, crop_start, span_start)]"""
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "label": pa.array([r[0] for r in rows]),
                    "crop_text": pa.array([r[1] for r in rows]),
                    "crop_start": pa.array(
                        [r[2] for r in rows], type=pa.int64()
                    ),
                    "span_start": pa.array(
                        [r[3] for r in rows], type=pa.int64()
                    ),
                }
            )
        )

    def test_per_class_rows_and_mean(self, ray_session):
        from jochre3_ocr_ray.functions.learning import (
            evaluate_glyph_classifier,
            train_glyph_classifier,
        )

        # train 'a' flanked by spaces, 'b' flanked by 'x'
        train = self._examples(
            [("a", " a ", 0, 1)] * 20 + [("b", "xbx", 0, 1)] * 20
        )
        model = train_glyph_classifier(train)
        # holdout: clean 'a's, clean 'b's, and two 'b's whose crop
        # context looks exactly like an 'a' (guaranteed misclassified:
        # center+both neighbours vote 'a')
        hold = self._examples(
            [("a", " a ", 0, 1)] * 10
            + [("b", "xbx", 0, 1)] * 8
            + [("b", " a ", 0, 1)] * 2
        )
        out = evaluate_glyph_classifier(hold, model).to_pandas()
        by = out.set_index("label")
        assert by.loc["a", "n_examples"] == 10
        assert by.loc["a", "n_correct"] == 10
        assert by.loc["a", "accuracy"] == 1.0
        assert by.loc["b", "n_examples"] == 10
        assert by.loc["b", "n_correct"] == 8
        assert abs(by.loc["b", "accuracy"] - 0.8) < 1e-12
        assert by.loc["Mean", "n_examples"] == 20
        assert by.loc["Mean", "n_correct"] == 18
        assert abs(by.loc["Mean", "accuracy"] - 0.9) < 1e-12
        # confusion pins WHERE the misses went
        from jochre3_ocr_ray.functions.learning import glyph_confusion

        conf = glyph_confusion(hold, model)
        conf = {
            (r.label, r.predicted): r.n for r in conf.itertuples()
        }
        assert conf[("b", "a")] == 2
        assert conf[("b", "b")] == 8

    def test_q_glyph_eval_split_and_floor(self, ray_session, tmp_path):
        """The driver query over a tiny synthesized documents table:
        holdout pages are exactly turn_idx % 5 == 0 and the clean
        corpus clears the accuracy floor."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from jochre3_ocr_ray.ops.transcripts import N_CONVS
        from jochre3_ocr_ray.pipelines.corpus_prep import q_glyph_eval

        texts = ["abc abd bca"] * (3 * N_CONVS)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(len(texts)), type=pa.int64()
                    ),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = q_glyph_eval(str(tmp_path)).to_pandas()
        by = out.set_index("label")
        # holdout = turn_idx 0 pages = N_CONVS pages, 9 glyphs each
        # ('abc abd bca': 3 a, 3 b, 2 c, 1 d)
        assert by.loc["Mean", "n_examples"] == 9 * N_CONVS
        for g, k in [("a", 3), ("b", 3), ("c", 2), ("d", 1)]:
            assert by.loc[g, "n_examples"] == k * N_CONVS
        assert out["accuracy_ok"].all()


class TestGlyphMergeRules:
    """YiddishCorpusTransformer's adjacent-glyph ligature fold."""

    def _word(self, chars):
        pos = 0
        glyphs = []
        for c in chars:
            glyphs.append(
                {"text": c, "span": {"start": pos, "end": pos + 1},
                 "confidence": 0.9}
            )
            pos += 1
        return glyphs

    def test_tsvey_yudn_merge_and_span_union(self):
        from jochre3_ocr_ray.functions.glyph_merge import (
            merge_word_glyphs,
            yiddish_merge_rules,
        )

        glyphs = self._word(["א", "י", "י", "ב"])
        out, changed = merge_word_glyphs(glyphs, yiddish_merge_rules())
        assert changed
        assert [g["text"] for g in out] == ["א", "ײ", "ב"]
        lig = out[1]
        assert lig["span"] == {"start": 1, "end": 3}
        assert lig["confidence"] == 1.0

    def test_rule_precedence_pasekh_before_tsvey(self):
        from jochre3_ocr_ray.functions.glyph_merge import (
            merge_word_glyphs,
            yiddish_merge_rules,
        )

        # yud + pasekh-yud matches BOTH rules; pasekh-tsvey-yudn is
        # configured first and must win (reference if/elif order)
        glyphs = self._word(["י", "יַ"])
        out, _ = merge_word_glyphs(glyphs, yiddish_merge_rules())
        assert [g["text"] for g in out] == ["ײַ"]
        # with pasekh disabled, tsvey-yudn catches the same pair
        out2, _ = merge_word_glyphs(
            glyphs, yiddish_merge_rules(pasekh_tsvey_yudn=False)
        )
        assert [g["text"] for g in out2] == ["ײ"]

    def test_disabled_rules_leave_glyphs(self):
        from jochre3_ocr_ray.functions.glyph_merge import (
            merge_word_glyphs,
            yiddish_merge_rules,
        )

        glyphs = self._word(["ו", "ו"])
        out, changed = merge_word_glyphs(
            glyphs, yiddish_merge_rules(tsvey_vovn=False)
        )
        assert not changed
        assert [g["text"] for g in out] == ["ו", "ו"]

    def test_fold_continues_over_merge(self):
        from jochre3_ocr_ray.functions.glyph_merge import (
            merge_word_glyphs,
            yiddish_merge_rules,
        )

        # vov vov vov: first pair merges to װ; the third vov does NOT
        # merge with the ligature (prev is now װ, not ו) — exactly the
        # reference fold's behavior
        glyphs = self._word(["ו", "ו", "ו"])
        out, _ = merge_word_glyphs(glyphs, yiddish_merge_rules())
        assert [g["text"] for g in out] == ["װ", "ו"]

    def test_dataset_stage_rewrites_blocks(self, ray_session, lexicon):
        import ray.data as rd

        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.glyph_merge import apply_glyph_merge
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.schema import BLOCKS_TYPE

        import pyarrow as pa

        row = extract_turn("שלום ייד", 0, lexicon, include_glyphs=True)
        ds = rd.from_arrow(
            pa.table({"blocks": pa.array([row["blocks"]], type=BLOCKS_TYPE)})
        )
        out = _to_table(apply_glyph_merge(ds)).to_pylist()[0]["blocks"]
        word_glyphs = [
            [g["text"] for g in w["glyphs"]]
            for b in out for l in b["lines"] for w in l["words"]
        ]
        assert ["ײ", "ד"] in word_glyphs  # yud-yud merged


class TestAltoToText:
    def test_round_trip_corpus(self, ray_session, lexicon, tmp_path):
        """extract -> render ALTO files -> alto_to_text recovers the
        extracted text (+ simplified twin) per file."""
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.render_alto import render_alto
        from jochre3_ocr_ray.pipelines.corpus_prep import alto_to_text

        corpus = tmp_path / "alto"
        (corpus / "sub").mkdir(parents=True)
        texts = {
            "a": "hello world one\n\nsecond block here",
            "b": "another page text",
        }
        rows = {}
        for name, raw in texts.items():
            row = extract_turn(raw, 0, lexicon)
            rows[name] = row
            xml = render_alto(name, row["blocks"], row["confidence"])
            target = corpus / ("sub" if name == "b" else "") / f"{name}.xml"
            target.write_text(xml)
        out = tmp_path / "txt"
        res = alto_to_text(str(corpus), str(out), keep_structure=True)
        assert res["files"] == 2
        assert (out / "a.txt").read_text() == rows["a"]["extracted_text"]
        assert (out / "sub" / "b.txt").read_text() == rows["b"]["extracted_text"]
        assert (out / "a_simplified.txt").exists()


class TestEmptyCorpusTypedResults:
    def test_all_empty_docs_yield_typed_empty_tables(self, ray_session, tmp_path):
        """A corpus of only empty/whitespace docs must return EMPTY
        tables with the full column schema (zero-column empties would
        schema-mismatch the driver compare)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from jochre3_ocr_ray.pipelines.corpus_prep import (
            q_training_line_examples,
            q_training_word_examples,
            q_yolo_annotations,
        )

        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.table(
                {"doc_id": pa.array([0, 1], type=pa.int64()),
                 "text": pa.array(["", "   "])}
            ),
            sf / "documents.parquet",
        )
        lines = q_training_line_examples(str(sf))
        words = q_training_word_examples(str(sf))
        yolo = q_yolo_annotations(str(sf))
        assert lines.num_rows == words.num_rows == yolo.num_rows == 0
        assert "example_id" in lines.column_names
        assert "example_id" in words.column_names
        assert {"cx", "cy", "w", "h"} <= set(yolo.column_names)


class TestFastDerivationEqualsStructural:
    """The q_ wrappers' extracted_text derivation must equal the
    structural (blocks-walking) operators row for row — on the markup
    corpus where pages are multi-line and multi-block."""

    def _structural(self, fn, extracted, **kw):
        from jochre3_ocr_ray.ops.relational import _to_table

        return _to_table(fn(extracted, **kw)).to_pandas()

    def test_line_examples(self, ray_session, extracted, small_corpus):
        import pandas as pd

        from jochre3_ocr_ray.pipelines.corpus_prep import line_examples
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            _text_line_spans,
        )
        from jochre3_ocr_ray.ops.relational import _to_table

        structural = (
            self._structural(line_examples, extracted,
                             validation_one_every=10)
            .sort_values(["conv_id", "turn_idx", "line_idx"])
            .reset_index(drop=True)
        )
        # fast derivation from the same pages
        pages = _to_table(
            extracted.select_columns(
                ["conv_id", "turn_idx", "extracted_text"]
            )
        ).to_pylist()
        rows = []
        for p in pages:
            text = p["extracted_text"]
            for i, (s, e) in enumerate(_text_line_spans(text)):
                rows.append(
                    (p["conv_id"], p["turn_idx"], i, s, e, text[s:e])
                )
        fast = pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "line_idx", "span_start",
                     "span_end", "content"],
        ).sort_values(["conv_id", "turn_idx", "line_idx"]).reset_index(
            drop=True
        )
        assert len(fast) == len(structural)
        for col in ["conv_id", "line_idx", "span_start", "span_end",
                    "content"]:
            assert (
                fast[col].astype(str).tolist()
                == structural[col].astype(str).tolist()
            ), col

    def test_word_runs_equal_combined_spans(self, ray_session, extracted):
        import re

        import pandas as pd

        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            _text_line_spans,
            word_examples,
        )

        structural = (
            self._structural(word_examples, extracted,
                             validation_one_every=10)
            .sort_values(["conv_id", "turn_idx", "word_idx"])
            .reset_index(drop=True)
        )
        pages = _to_table(
            extracted.select_columns(
                ["conv_id", "turn_idx", "extracted_text"]
            )
        ).to_pylist()
        runs = []
        word_run = re.compile(r"\S+")
        for p in pages:
            text = p["extracted_text"]
            i = 0
            for ls, le in _text_line_spans(text):
                for m in word_run.finditer(text, ls, le):
                    runs.append(
                        (p["conv_id"], p["turn_idx"], i, m.start(), m.end())
                    )
                    i += 1
        fast = pd.DataFrame(
            runs,
            columns=["conv_id", "turn_idx", "word_idx", "span_start",
                     "span_end"],
        ).sort_values(["conv_id", "turn_idx", "word_idx"]).reset_index(
            drop=True
        )
        assert len(fast) == len(structural)
        for col in ["conv_id", "word_idx", "span_start", "span_end"]:
            assert (
                fast[col].astype(str).tolist()
                == structural[col].astype(str).tolist()
            ), col

    def test_alphabet_fast_equals_structural(self, ray_session, extracted):
        from jochre3_ocr_ray.functions.normalize import simplify
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import corpus_alphabet

        structural = corpus_alphabet(extracted)["glyph"].to_pylist()
        pages = _to_table(
            extracted.select_columns(["extracted_text"])
        ).to_pylist()
        seen = set()
        for p in pages:
            seen.update(p["extracted_text"])
        seen -= {" ", "\n"}
        fast = sorted({simplify(c) for c in seen}) + [""]
        assert fast == structural


class TestDocClassifier:
    def test_trained_langid_on_marked_corpus(self, ray_session):
        """The doc-level NB learns planted per-language markers and
        generalizes to a held-out set; JSON round trip predicts
        identically. (The driver corpus's lang labels are near-noise —
        measured trained ceiling ~0.22 on 5 classes — so the trained
        model is exercised here on a corpus with real signal instead
        of a driver accuracy row.)"""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from jochre3_ocr_ray.functions.learning import (
            DocClassifier,
            train_doc_classifier,
        )

        rng = np.random.RandomState(2)
        noise = [f"n{i}" for i in range(300)]
        markers = {"en": ["the", "and"], "fr": ["le", "et"],
                   "de": ["der", "und"]}
        rows = []
        for i in range(300):
            lang = ["en", "fr", "de"][i % 3]
            toks = list(rng.choice(noise, 20)) + list(
                rng.choice(markers[lang], 4)
            )
            rng.shuffle(toks)
            rows.append((i, " ".join(toks), lang))
        train = [r for r in rows if r[0] % 5 != 0]
        hold = [r for r in rows if r[0] % 5 == 0]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in train], type=pa.int64()),
                    "text": pa.array([r[1] for r in train]),
                    "lang": pa.array([r[2] for r in train]),
                }
            )
        )
        model = train_doc_classifier(ds)
        acc = np.mean([model.predict(t) == l for _, t, l in hold])
        assert acc >= 0.9, acc
        again = DocClassifier.from_json(model.to_json())
        assert all(
            again.predict(t) == model.predict(t) for _, t, _ in hold[:20]
        )

    def test_feature_buckets_cap_model_state(self, ray_session):
        """The hashing-trick guard: with n_feature_buckets set, the
        driver combine and serialized model are bounded by the bucket
        count however large the vocabulary — and the model still
        separates classes whose markers don't collide."""
        import pyarrow as pa
        import ray.data as rd

        from jochre3_ocr_ray.functions.learning import (
            DocClassifier,
            train_doc_classifier,
        )

        # vocabulary of 5000 distinct tokens >> 64 buckets
        rows = []
        for i in range(200):
            lang = ["aa", "bb"][i % 2]
            toks = [f"w{(i * 25 + j) % 5000}" for j in range(25)]
            toks += [f"marker_{lang}"] * 6
            rows.append((" ".join(toks), lang))
        ds = rd.from_arrow(
            pa.table(
                {
                    "text": pa.array([r[0] for r in rows]),
                    "lang": pa.array([r[1] for r in rows]),
                }
            )
        )
        model = train_doc_classifier(ds, n_feature_buckets=64)
        assert len(model.feature_counts) <= 64
        # round trip keeps the bucket mapping
        again = DocClassifier.from_json(model.to_json())
        assert again.n_feature_buckets == 64
        acc = sum(
            model.predict(t) == l for t, l in rows
        ) / len(rows)
        assert acc >= 0.9, acc


class TestWordToGlyphAnnotations:
    def test_boxes_normalized_to_word_crop(self, ray_session, extracted):
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            word_to_glyph_annotations,
        )

        out = _to_table(word_to_glyph_annotations(extracted)).to_pandas()
        assert len(out) > 0
        assert (out["class_name"] == "glyph").all()
        assert (out["class_idx"] == 0).all()
        assert ((out["cx"] >= 0) & (out["cx"] <= 1)).all()
        assert (out["cy"] == 0.5).all()
        assert ((out["w"] > 0) & (out["w"] <= 1)).all()
        assert (out["h"] == 1.0).all()
        # glyph_idx is dense per (page, word)
        for _, grp in out.groupby(["conv_id", "turn_idx", "word_idx"]):
            assert sorted(grp["glyph_idx"]) == list(range(len(grp)))

    def test_fast_equals_structural(self, ray_session, extracted):
        import pandas as pd

        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import (
            _WORD_RUN,
            _text_line_spans,
            word_to_glyph_annotations,
        )

        key = ["conv_id", "turn_idx", "word_idx", "glyph_idx"]
        structural = (
            _to_table(word_to_glyph_annotations(extracted))
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        pages = _to_table(
            extracted.select_columns(["conv_id", "turn_idx", "extracted_text"])
        ).to_pylist()
        rows = []
        for p in pages:
            text = p["extracted_text"]
            w_i = 0
            for ls, le in _text_line_spans(text):
                for m in _WORD_RUN.finditer(text, ls, le):
                    ww = m.end() - m.start()
                    for gi in range(ww):
                        rows.append(
                            (p["conv_id"], p["turn_idx"], w_i, gi,
                             (gi + 0.5) / ww, 1.0 / ww)
                        )
                    w_i += 1
        fast = (
            pd.DataFrame(rows, columns=key + ["cx", "w"])
            .sort_values(key)
            .reset_index(drop=True)
        )
        assert len(fast) == len(structural)
        for col in ("cx", "w"):
            assert structural[col].tolist() == pytest.approx(
                fast[col].tolist()
            )


class TestRotationAnnotations:
    def test_labels_match_kernel_and_reference_rules(self, ray_session):
        import ray.data as rd

        from jochre3_ocr_ray.functions.normalize import estimate_indent_skew
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import rotation_annotations

        texts = [
            "  indented line one\n   line two\n  line three",  # skew ~2.33
            "flat\nflat again",                                # skew 0
            "a\nb\nc\nd",                                      # tall page: h>w
            "   \n  ",                                         # blank -> dropped
        ]
        turns = rd.from_items(
            [
                {"conv_id": f"conv{i:06d}", "turn_idx": 0, "text": t}
                for i, t in enumerate(texts)
            ]
        )
        out = (
            _to_table(rotation_annotations(turns, validation_one_every=2))
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert len(out) == 3  # blank page dropped
        for row in out.itertuples():
            src = texts[int(row.conv_id[4:])]
            want = estimate_indent_skew(src)
            assert row.rotation == pytest.approx(want)
            assert row.label == f"{want:.2f}"
        # reference scaling rule: long edge pinned to image_size
        tall = out[out["conv_id"] == "conv000002"].iloc[0]
        assert tall["scaled_height"] == 1280
        assert tall["scaled_width"] == int(1 / 4 * 1280)
        wide = out[out["conv_id"] == "conv000000"].iloc[0]
        assert wide["scaled_width"] == 1280
        # split by enumeration index with validation_one_every=2
        assert set(out["split"]) == {"train", "val"}

    def test_raw_corpus_not_deskewed(self, ray_session, small_corpus):
        """The annotator must see the RAW page (initialTransforms
        empty) — over the markup corpus the emitted rotation equals
        the kernel on the stored raw text, turn for turn."""
        import ray.data as rd

        from jochre3_ocr_ray.functions.normalize import estimate_indent_skew
        from jochre3_ocr_ray.ops.relational import _to_table
        from jochre3_ocr_ray.pipelines.corpus_prep import rotation_annotations

        turns = rd.read_parquet(str(small_corpus))
        out = _to_table(rotation_annotations(turns)).to_pandas()
        raw = turns.select_columns(["conv_id", "turn_idx", "text"]).take_all()
        by_key = {(r["conv_id"], r["turn_idx"]): r["text"] for r in raw}
        assert len(out) > 0
        for row in out.sample(min(50, len(out)), random_state=7).itertuples():
            src = by_key[(row.conv_id, row.turn_idx)]
            assert row.rotation == pytest.approx(estimate_indent_skew(src))
