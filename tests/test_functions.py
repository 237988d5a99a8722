"""Unit tests for the pure operator functions (SURVEY.md §5 tier a:
tiny inline payloads, exact assertions — the reference's dominant
test pattern, e.g. YiddishAltoTransformerTest / AltoTest)."""

from __future__ import annotations

import pytest

from jochre3_ocr_ray.functions.extract import extract_turn
from jochre3_ocr_ray.functions.geometry import (
    Rectangle,
    remove_overlaps_unordered,
    sort_reading_order,
)
from jochre3_ocr_ray.functions.lexicon import (
    FREQ_IMPOSSIBLE,
    FREQ_KNOWN,
    FREQ_UNKNOWN,
    Lexicon,
)
from jochre3_ocr_ray.functions.normalize import collapse_inline_whitespace, simplify
from jochre3_ocr_ray.functions.rules import (
    is_rtl_line,
    reverse_digit_runs,
    split_punctuation,
)
from jochre3_ocr_ray.functions.segmenter import segment


# ---------------------------------------------------------------- normalize
class TestNormalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("“hi”", '"hi"'),
            (",,x''", '"x"'),
            ("a—b – c", "a-b - c"),
            ("dots…", "dots..."),
            ("a b", "a b"),
            ("z​w", "zw"),
            ("a\r\nb\rc", "a\nb\nc"),
            ("", ""),
        ],
    )
    def test_table(self, raw, expected):
        assert simplify(raw) == expected

    def test_nfc(self):
        assert simplify("é") == "é"  # decomposed é -> composed

    def test_collapse(self):
        assert collapse_inline_whitespace("  a \t\t b ") == "a b"


# ------------------------------------------------------------------ lexicon
class TestLexicon:
    def test_classes(self, lexicon):
        assert lexicon.get_frequency("the") == FREQ_KNOWN
        assert lexicon.get_frequency("zzzqqq") == FREQ_UNKNOWN
        assert lexicon.get_frequency("abc123") == FREQ_IMPOSSIBLE

    def test_numbers_and_punct_known(self, lexicon):
        assert lexicon.get_frequency("1234") == FREQ_KNOWN
        assert lexicon.get_frequency("3.14") == FREQ_KNOWN
        assert lexicon.get_frequency("!!!") == FREQ_KNOWN

    def test_external_punct_ignored(self, lexicon):
        assert lexicon.get_frequency("(the)") == FREQ_KNOWN
        assert lexicon.get_frequency('"the."') == FREQ_KNOWN

    def test_hyphen_min_rule(self, lexicon):
        # known-known -> known; known-unknown -> unknown; any-impossible -> impossible
        assert lexicon.get_frequency("data-base") == FREQ_KNOWN
        assert lexicon.get_frequency("data-zzzqqq") == FREQ_UNKNOWN
        assert lexicon.get_frequency("data-abc123") == FREQ_IMPOSSIBLE

    def test_confidence_mapping(self, lexicon):
        assert lexicon.confidence("the") == 1.0
        assert lexicon.confidence("zzzqqq") == 0.5
        assert lexicon.confidence("abc123") == 0.01


# -------------------------------------------------------------------- rules
class TestPunctuationSplit:
    @pytest.mark.parametrize(
        "token,expected",
        [
            ("word", ["word"]),
            ("end.", ["end", "."]),
            ("(hi)", ["(", "hi", ")"]),
            ("w'w", ["w'w"]),            # abbreviation guard
            ("1.5", ["1.5"]),            # decimal guard
            ("well-known", ["well-known"]),
            ("Hend-", ["Hend-"]),        # trailing hyphen stays (hyphenation)
            ("a...b", ["a", "...", "b"]),
            ('"x"', ['"', "x", '"']),
            ("!!!", ["!!!"]),
            ("-lead", ["-", "lead"]),
        ],
    )
    def test_cases(self, token, expected):
        assert split_punctuation(token) == expected


class TestBidi:
    def test_rtl_detection(self):
        assert is_rtl_line("שלום עולם 24")
        assert not is_rtl_line("hello world 24")
        assert not is_rtl_line("24 42")

    def test_digit_run_reversal(self):
        assert reverse_digit_runs("24") == "42"
        assert reverse_digit_runs("3.14") == "41.3"
        assert reverse_digit_runs("שלום24") == "שלום42"
        assert reverse_digit_runs("no digits") == "no digits"


# ----------------------------------------------------------------- geometry
class TestGeometry:
    def test_rectangle_ops(self):
        a = Rectangle(0, 0, 10, 10)
        b = Rectangle(5, 5, 10, 10)
        assert a.intersection(b) == Rectangle(5, 5, 5, 5)
        assert a.union(b) == Rectangle(0, 0, 15, 15)
        assert a.percentage_intersection(b) == 0.25
        assert a.intersection(Rectangle(20, 20, 5, 5)) is None

    def test_reading_order_topdown(self):
        blocks = [Rectangle(0, 100, 100, 20), Rectangle(0, 0, 100, 20)]
        out = sort_reading_order(blocks, rect_of=lambda r: r)
        assert [r.top for r in out] == [0, 100]

    def test_reading_order_columns(self):
        # two side-by-side columns, no horizontal overlap, vertical overlap
        left = Rectangle(0, 0, 40, 100)
        right = Rectangle(60, 0, 40, 100)
        assert sort_reading_order([right, left], rect_of=lambda r: r) == [left, right]
        assert sort_reading_order([left, right], rect_of=lambda r: r, rtl=True) == [
            right,
            left,
        ]

    def test_overlap_removal_drop(self):
        items = [
            (Rectangle(0, 0, 100, 20), 0.9, "keep"),
            (Rectangle(5, 5, 100, 20), 0.3, "drop"),
        ]
        out = remove_overlaps_unordered(items)
        assert [p for _, _, p in out] == ["keep"]

    def test_overlap_removal_merge(self):
        items = [
            (Rectangle(0, 0, 100, 20), 0.9, "a"),
            (Rectangle(5, 5, 100, 20), 0.8, "b"),
        ]
        out = remove_overlaps_unordered(items, merge_payload=lambda a, b: a + b)
        assert len(out) == 1
        rect, conf, payload = out[0]
        assert payload == "ab"
        assert rect == Rectangle(0, 0, 105, 25)
        assert conf == pytest.approx((0.9 * 0.8) ** 0.5)

    def test_overlap_tie_first_wins(self):
        items = [
            (Rectangle(0, 0, 100, 20), 0.3, "first"),
            (Rectangle(5, 5, 100, 20), 0.3, "second"),
        ]
        out = remove_overlaps_unordered(items)
        assert [p for _, _, p in out] == ["first"]


# ---------------------------------------------------------------- segmenter
class TestSegmenter:
    def test_plain_blocks_lines(self):
        blocks = segment("l1\nl2\n\nl3")
        assert [b.lines for b in blocks] == [["l1", "l2"], ["l3"]]

    def test_boilerplate_containers_dropped(self):
        html = (
            "<html><nav><a href='/'>Home</a></nav><header>H</header>"
            "<div>Body text.</div><footer>F</footer><aside>A</aside></html>"
        )
        blocks = segment(html)
        assert [b.lines for b in blocks] == [["Body text."]]

    def test_script_style_comments_removed(self):
        html = "<script>var x=1;</script><style>.a{}</style><!-- c --><p>keep me</p>"
        assert [b.lines for b in segment(html)] == [["keep me"]]

    def test_link_ratio_pruning(self):
        html = (
            '<div><a href="1">only links</a> <a href="2">more links</a></div>'
            "<p>real content body</p>"
        )
        assert [b.lines for b in segment(html)] == [["real content body"]]

    def test_br_is_line_break(self):
        assert [b.lines for b in segment("<p>a<br>b</p>")] == [["a", "b"]]

    def test_entities(self):
        assert segment("<p>a &amp; b &lt;tag&gt;</p>")[0].lines == ["a & b <tag>"]

    def test_empty_inputs(self):
        assert segment("") == []
        assert segment("   \n\n  ") == []
        assert segment("<div></div>") == []


# ------------------------------------------------------------ extract_turn
class TestExtractTurn:
    def test_jimi_hendrix_dehyphenation(self, lexicon):
        # the reference's AltoTest.scala:15-33 processedContent case
        r = extract_turn("Jimi Hend-\nrix Experience", 0, lexicon)
        assert r["extracted_text"] == "Jimi Hend-\nrix Experience"
        assert r["processed_text"] == "Jimi Hendrix Experience"
        w1 = r["blocks"][0]["lines"][0]["words"][-1]
        w2 = r["blocks"][0]["lines"][1]["words"][0]
        assert (w1["subs_type"], w1["subs_content"]) == ("HypPart1", "Hendrix")
        assert (w2["subs_type"], w2["subs_content"]) == ("HypPart2", "Hendrix")

    def test_hyphen_compound_kept(self, lexicon):
        r = extract_turn("a small-\nbatch job", 1, lexicon)
        assert r["processed_text"] == "a small-batch job"

    def test_hyphen_unknown_joined(self, lexicon):
        r = extract_turn("zz flur-\nbix yy", 2, lexicon)
        assert "flurbix" in r["processed_text"]

    def test_span_invariant(self, lexicon):
        r = extract_turn("para one.\n\npara two!\nline", 3, lexicon)
        for b in r["blocks"]:
            text = r["extracted_text"]
            assert text[b["span"]["start"] : b["span"]["end"]].strip()
            for l in b["lines"]:
                for w in l["words"]:
                    s = w["span"]
                    assert text[s["start"] : s["end"]] == w["text"]

    def test_processed_punctuation_attachment(self, lexicon):
        r = extract_turn("the data-\nbase. next", 4, lexicon)
        assert r["processed_text"] == "the database. next"

    def test_deterministic_ids(self, lexicon):
        r = extract_turn("a\n\nb", 7, lexicon)
        assert [b["id"] for b in r["blocks"]] == ["TB_00007_000_000", "TB_00007_001_000"]

    def test_confidence_geomean(self, lexicon):
        r = extract_turn("the zzzqqq", 5, lexicon)
        assert r["confidence"] == pytest.approx((1.0 * 0.5) ** 0.5)

    def test_empty_turn(self, lexicon):
        r = extract_turn("", 6, lexicon)
        assert r["extracted_text"] == "" and r["n_blocks"] == 0
        assert r["confidence"] == 1.0

    def test_rtl_numbers_in_output(self, lexicon):
        r = extract_turn("שלום 24 עולם", 8, lexicon)
        assert "42" in r["extracted_text"]
        # span invariant still holds after reversal
        for b in r["blocks"]:
            for l in b["lines"]:
                for w in l["words"]:
                    s = w["span"]
                    assert r["extracted_text"][s["start"] : s["end"]] == w["text"]

    def test_positioned_blocks_reading_order(self, lexicon):
        payload = (
            '<div style="top:40px;left:0px;width:200px;height:20px">second</div>'
            '<div style="top:0px;left:0px;width:200px;height:20px">first</div>'
        )
        r = extract_turn(payload, 9, lexicon)
        assert r["extracted_text"] == "first\n\nsecond"


class TestBoilerplateNesting:
    def test_nested_containers_fully_removed(self):
        from jochre3_ocr_ray.functions.segmenter import segment

        html = "<nav>outer<nav>inner</nav>tail</nav><p>real content</p>"
        assert [b.lines for b in segment(html)] == [["real content"]]

    def test_unclosed_container_drops_to_end(self):
        from jochre3_ocr_ray.functions.segmenter import segment

        html = "<p>body first</p><footer>chrome without close"
        assert [b.lines for b in segment(html)] == [["body first"]]

    def test_stray_close_tag_harmless(self):
        from jochre3_ocr_ray.functions.segmenter import segment

        html = "<p>content here</p></nav>"
        assert [b.lines for b in segment(html)] == [["content here"]]


class TestTransformChain:
    """Annotated transform fold + inverse-metadata carry
    (Jochre.scala:318-327 forward, :388 inverse)."""

    def test_matches_extraction_normalize_path(self):
        from jochre3_ocr_ray.functions.normalize import deskew, simplify
        from jochre3_ocr_ray.functions.transform_chain import TransformChain

        text = "   indented line one\n   line two here\n    line three x"
        chain = TransformChain()
        out, metas = chain.apply(text)
        expect, skew = deskew(simplify(text))
        assert out == expect
        assert chain.skew(metas) == skew

    def test_offsets_invert_to_raw(self):
        import re

        from jochre3_ocr_ray.functions.transform_chain import TransformChain

        raw = "   alpha beta\n   gamma delta\n      epsilon zeta"
        chain = TransformChain()
        out, metas = chain.apply(raw)
        assert out != raw
        # every word span in the TRANSFORMED text maps back to the
        # identical substring of the RAW text
        for m in re.finditer(r"\w+", out):
            s, e = chain.invert_span(m.start(), m.end(), metas)
            assert raw[s:e] == m.group(0), (m.group(0), raw[s:e])

    def test_spans_to_raw_on_extraction_row(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.transform_chain import (
            TransformChain,
            spans_to_raw,
        )

        # systematic 3-char indent, single spaces: deskew removes the
        # full indent and the segmentation render is identity on the
        # chain output, so extraction spans index the chain output
        raw = "   alpha beta\n   gamma delta\n   epsilon zeta"
        chain = TransformChain()
        out, metas = chain.apply(raw)
        row = extract_turn(raw, 0, lexicon)
        assert row["extracted_text"] == out
        raw_blocks = spans_to_raw(row["blocks"], metas, chain)
        for block in raw_blocks:
            for line in block["lines"]:
                for word in line["words"]:
                    s, e = word["span"]["start"], word["span"]["end"]
                    assert raw[s:e] == word["text"]
                    for g in word.get("glyphs") or []:
                        gs, ge = g["span"]["start"], g["span"]["end"]
                        assert raw[gs:ge] == g["text"]
        # originals untouched
        assert row["blocks"][0]["lines"][0]["words"][0]["span"]["start"] == 0

    def test_identity_when_no_skew(self):
        from jochre3_ocr_ray.functions.transform_chain import TransformChain

        raw = "plain line\nanother line"
        chain = TransformChain()
        out, metas = chain.apply(raw)
        assert out == raw
        assert chain.invert_offset(5, metas) == 5


class TestSegmenterVariants:
    """NonSegmenter / BlockOnlySegmenter analogs (the pluggable
    segmentation services of SURVEY §2.10)."""

    def test_non_segmenter_empty_page(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.segmenter import non_segment

        out = extract_turn("some text here", 0, lexicon,
                           segmenter=non_segment)
        assert out["n_blocks"] == 0
        assert out["extracted_text"] == ""
        assert out["blocks"] == []

    def test_block_only_collapses_lines(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.segmenter import block_only_segment

        text = "para one line a<br>line b\n\npara two"
        full = extract_turn(text, 0, lexicon)
        assert full["n_lines"] == 3  # <br> splits within block one
        block_only = extract_turn(text, 0, lexicon,
                                  segmenter=block_only_segment)
        assert block_only["n_blocks"] == full["n_blocks"] == 2
        assert block_only["n_lines"] == 2  # one line per block
        assert "line a line b" in block_only["extracted_text"]

    def test_block_text_guesser_hook(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.segmenter import block_only_segment

        # the BlockTextGuesser hook re-lines each block (external
        # service analog): split on the word 'and'
        def guesser(block_text):
            return [p.strip() for p in block_text.split(" and ")]

        def seg(text):
            return block_only_segment(text, block_text_fn=guesser)

        out = extract_turn("alpha and beta", 0, lexicon, segmenter=seg)
        assert out["n_lines"] == 2
        assert out["extracted_text"] == "alpha\nbeta"

    def test_unsegmented_page_guesser(self, lexicon):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.segmenter import (
            unsegmented_page_segmenter,
        )

        # whole-page service call: uppercase every line
        seg = unsegmented_page_segmenter(
            lambda t: [l.upper() for l in t.split("\n") if l.strip()]
        )
        out = extract_turn("one two\nthree", 0, lexicon, segmenter=seg)
        assert out["n_blocks"] == 1
        assert out["extracted_text"] == "ONE TWO\nTHREE"
        # identity default reproduces the page's own lines, one block
        out2 = extract_turn(
            "a b\n\nc", 0, lexicon,
            segmenter=unsegmented_page_segmenter(),
        )
        assert out2["n_blocks"] == 1 and out2["n_lines"] == 2
