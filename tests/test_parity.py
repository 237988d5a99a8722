"""Reference-parity kernels added in round 2: word merge
(TextLine.combinedWords), hyphen as a distinct element, glyph level +
beam-guesser wiring, and the indent-skew estimate (Deskewer analog)."""

from __future__ import annotations

import math

import pytest

from jochre3_ocr_ray.functions.extract import (
    _Word,
    combine_unspaced_words,
    extract_turn,
)
from jochre3_ocr_ray.functions.lexicon import Lexicon
from jochre3_ocr_ray.functions.normalize import deskew, estimate_indent_skew
from jochre3_ocr_ray.functions.render_alto import parse_alto, render_alto


@pytest.fixture(scope="module")
def lex():
    return Lexicon.load()


class TestCombineUnspacedWords:
    def test_merges_adjacent_unspaced(self):
        words = [
            _Word("foo", sep=False, confidence=0.9),
            _Word(",", sep=False, confidence=0.4),
            _Word("bar", sep=True, confidence=1.0),
        ]
        out = combine_unspaced_words(words)
        assert [w.text for w in out] == ["foo,", "bar"]
        # Word.combineWith confidence: sqrt(c1 * c2) (Word.scala:51-57)
        assert out[0].confidence == pytest.approx(math.sqrt(0.9 * 0.4))

    def test_three_way_fold_order(self):
        """A 3-way merge folds pairwise left: sqrt(sqrt(c1*c2)*c3)."""
        words = [
            _Word("a", sep=False, confidence=0.9),
            _Word("b", sep=False, confidence=0.5),
            _Word("c", sep=False, confidence=0.8),
        ]
        out = combine_unspaced_words(words)
        assert len(out) == 1 and out[0].text == "abc"
        assert out[0].confidence == pytest.approx(
            math.sqrt(math.sqrt(0.9 * 0.5) * 0.8)
        )

    def test_spaced_words_untouched(self):
        words = [_Word("a", sep=False), _Word("b", sep=True), _Word("c", sep=True)]
        out = combine_unspaced_words(words)
        assert [w.text for w in out] == ["a", "b", "c"]

    def test_extract_turn_option_preserves_text(self, lex):
        """Merging never changes the rendered text — only the word
        granularity (content chars are identical, separators data-driven)."""
        text = "hello, world (test)"
        plain = extract_turn(text, 0, lex)
        merged = extract_turn(text, 0, lex, combine_unspaced=True)
        assert merged["extracted_text"] == plain["extracted_text"]
        assert merged["n_words"] < plain["n_words"]


class TestHyphenElement:
    def test_hyphen_split_and_spans(self, lex):
        text = "inter-\nnational affairs"
        out = extract_turn(text, 0, lex, emit_hyphen_element=True)
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        hyphens = [w for w in words if w["kind"] == "hyphen"]
        assert len(hyphens) == 1
        h = hyphens[0]
        assert h["text"] == "-"
        # prorated span: the hyphen owns exactly the trailing char
        assert out["extracted_text"][h["span"]["start"] : h["span"]["end"]] == "-"
        # the preceding word entry lost the hyphen but kept subs fields
        prev = words[words.index(h) - 1]
        assert prev["text"] == "inter"
        assert prev["subs_type"] == "HypPart1"
        # span invariant still holds for the word body
        assert (
            out["extracted_text"][prev["span"]["start"] : prev["span"]["end"]]
            == "inter"
        )
        # hyphen glyph scored 0.5 (Word.combineWith(hyphen), Word.scala:59-63)
        assert h["glyphs"][0]["confidence"] == pytest.approx(0.5)

    def test_alto_roundtrip_with_hyphen_and_glyphs(self, lex):
        text = "inter-\nnational affairs"
        out = extract_turn(text, 0, lex, emit_hyphen_element=True)
        xml = render_alto("t0", out["blocks"], out["confidence"])
        assert "<HYP " in xml and "<Glyph " in xml
        parsed = parse_alto(xml)
        words = [
            w for b in parsed["blocks"] for l in b["lines"] for w in l["words"]
        ]
        orig = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        assert [w["text"] for w in words] == [w["text"] for w in orig]
        assert [w["kind"] for w in words] == [w["kind"] for w in orig]
        assert [
            [g["text"] for g in w["glyphs"]] for w in words
        ] == [[g["text"] for g in w["glyphs"]] for w in orig]


class TestGlyphLevel:
    def test_glyph_spans_tile_word_spans(self, lex):
        out = extract_turn("hello world\nsecond line", 0, lex)
        for b in out["blocks"]:
            for l in b["lines"]:
                for w in l["words"]:
                    gs = w["glyphs"]
                    assert len(gs) >= 1
                    # glyphs tile the word span contiguously
                    assert gs[0]["span"]["start"] == w["span"]["start"]
                    assert gs[-1]["span"]["end"] == w["span"]["end"]
                    for g1, g2 in zip(gs, gs[1:]):
                        assert g1["span"]["end"] == g2["span"]["start"]
                    # and each glyph's span indexes extracted_text
                    for g in gs:
                        assert (
                            out["extracted_text"][
                                g["span"]["start"] : g["span"]["end"]
                            ]
                            == g["text"]
                        )

    def test_combining_marks_stay_attached(self, lex):
        # x + combining acute has no NFC precomposition, so the mark
        # survives normalization as a separate codepoint - one glyph
        out = extract_turn("ax\u0301b time", 0, lex)
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        glyphs = words[0]["glyphs"]
        assert [g["text"] for g in glyphs] == ["a", "x\u0301", "b"]
        # spans still index extracted_text exactly (2-char cluster)
        for g in glyphs:
            assert (
                out["extracted_text"][g["span"]["start"] : g["span"]["end"]]
                == g["text"]
            )

    def test_glyphs_can_be_disabled(self, lex):
        out = extract_turn("hello", 0, lex, include_glyphs=False)
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        assert all(w["glyphs"] == [] for w in words)


class TestBeamWiring:
    def test_identity_candidates_equal_direct_scoring(self, lex):
        """The FullSegmentationGuesser path with a certain classifier
        must reproduce the direct lexicon scoring exactly — this is
        what licenses the fast path skipping the beam by default."""
        identity = lambda text: [[(c, 1.0)] for c in text]  # noqa: E731
        text = "the quick brxwn fox !!"
        direct = extract_turn(text, 0, lex)
        beamed = extract_turn(text, 0, lex, glyph_candidates_fn=identity)
        assert beamed["extracted_text"] == direct["extracted_text"]
        assert beamed["confidence"] == pytest.approx(direct["confidence"])

    def test_ambiguous_candidates_resolved_by_lexicon(self, lex):
        """An ambiguous glyph (o vs 0) resolves to the lexicon word:
        beam score favors '0' but lexicon rescoring (unknown x0.5)
        flips the winner — the content-assignment-under-ambiguity job."""

        def classifier(text):
            cands = []
            for c in text:
                if c == "o":
                    cands.append([("0", 0.55), ("o", 0.45)])
                else:
                    cands.append([(c, 1.0)])
            return cands

        out = extract_turn("continue now", 0, lex, glyph_candidates_fn=classifier)
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        # 'continue' is in the lexicon: beam's raw winner 'c0ntinue'
        # scores 0.55^2(geomean-ish) * 0.5 unknown, while 'continue'
        # scores lower on glyphs but x1.0 known -> lexicon wins
        assert words[0]["text"] == "continue"
        assert out["extracted_text"].startswith("continue")

    def test_guessed_confidence_is_rescored_score(self, lex):
        def classifier(text):
            return [[(c, 0.8)] for c in text]

        out = extract_turn("zzzqqq", 0, lex, glyph_candidates_fn=classifier)
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        # geometric mean of glyph confidences (0.8) x unknown factor 0.5
        assert words[0]["confidence"] == pytest.approx(0.8 * 0.5)


class TestOtherAlphabetReGuess:
    def _hebrew_guesser(self, language="yi", conf=0.8):
        import re

        from jochre3_ocr_ray.functions.guesser import (
            GlyphGuesserForAnotherAlphabet,
        )

        table = {"א": "a", "ב": "b", "ג": "g"}

        def classifier(text):
            return [[(table.get(c, c), conf)] for c in text]

        return GlyphGuesserForAnotherAlphabet(
            language=language,
            pattern=re.compile(r"[֐-׿]+"),
            glyph_candidates_fn=classifier,
        )

    def test_secondary_guesser_changes_winner(self, lex):
        """A Hebrew-script word in a mixed-script turn is re-guessed by
        the secondary alphabet's classifier — the main result changes
        (GlyphGuesserForAnotherAlphabet.scala:10-18 dispatch applied
        as FullSegmentationGuesser.scala:588-614)."""
        g = self._hebrew_guesser()
        text = "hello אבג world"
        base = extract_turn(text, 0, lex)
        assert "אבג" in base["extracted_text"]
        out = extract_turn(text, 0, lex, other_alphabet_guessers=[g])
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        texts = [w["text"] for w in words]
        # yi is RTL and the word renders RTL: no direction flip
        assert "abg" in texts
        hit = words[texts.index("abg")]
        # no-beam confidence: geometric mean of glyph confidences,
        # NO lexicon rescore (secondary alphabet is outside the lexicon)
        assert hit["confidence"] == pytest.approx(0.8)
        # latin words untouched
        assert "hello" in texts and "world" in texts

    def test_direction_flip_reverses_glyph_order(self, lex):
        """When the secondary language's direction differs from the
        word's rendering direction, glyphs re-sort (text reverses)
        before the re-guess (FullSegmentationGuesser.scala:604-609)."""
        from jochre3_ocr_ray.functions.guesser import (
            guess_with_other_alphabets,
        )

        g_ltr = self._hebrew_guesser(language="en")  # LTR secondary
        hit = guess_with_other_alphabets("אבג", False, [g_ltr])
        assert hit is not None
        assert hit[0] == "gba"  # reversed before classification
        g_rtl = self._hebrew_guesser(language="yi")
        hit = guess_with_other_alphabets("אבג", False, [g_rtl])
        assert hit[0] == "abg"  # same direction: no flip

    def test_first_matching_guesser_wins(self, lex):
        from jochre3_ocr_ray.functions.guesser import (
            guess_with_other_alphabets,
        )

        first = self._hebrew_guesser(language="yi", conf=0.9)
        second = self._hebrew_guesser(language="he", conf=0.1)
        hit = guess_with_other_alphabets("א", False, [first, second])
        assert hit[1] == pytest.approx(0.9)
        assert hit[2] == "yi"

    def test_no_match_returns_none(self, lex):
        from jochre3_ocr_ray.functions.guesser import (
            guess_with_other_alphabets,
        )

        g = self._hebrew_guesser()
        assert guess_with_other_alphabets("latin", True, [g]) is None


class TestSkewEstimate:
    def test_no_indent_is_zero(self):
        assert estimate_indent_skew("plain line\nanother line") == 0.0

    def test_planted_systematic_indent(self):
        """Median + ±1 inlier mean (Deskewer.scala:183-216): a page
        with a systematic 3-char indent and one outlier line."""
        text = "   line one\n   line two\n    line three\n          outlier"
        est = estimate_indent_skew(text)
        # samples [3,3,4,10]; median=3 (index 2 of sorted... [3,3,4,10]
        # -> median sample = 4); inliers within ±1 of 4: [3,3,4] -> 10/3
        assert est == pytest.approx((3 + 3 + 4) / 3)
        corrected, skew = deskew(text)
        assert skew == est
        assert corrected.split("\n")[0] == "line one"
        assert corrected.split("\n")[3] == "       outlier"

    def test_extract_turn_records_skew(self, lex):
        out = extract_turn("  a b\n  c d\n  e f", 0, lex)
        assert out["skew"] == pytest.approx(2.0)
        # correction happens before segmentation; rendered text is
        # indent-free either way (collapse), so text is unchanged
        assert out["extracted_text"] == "a b\nc d\ne f"
        plain = extract_turn("a b\nc d\ne f", 0, lex)
        assert plain["skew"] == 0.0
        assert plain["extracted_text"] == out["extracted_text"]

class TestGeometricNodeOps:
    def test_rectangle_translate_rescale(self):
        from jochre3_ocr_ray.functions.geometry import Rectangle

        r = Rectangle(10, 20, 30, 40)
        assert r.translate(5, -5) == Rectangle(15, 15, 30, 40)
        # rescale truncates toward zero per the reference (.toInt)
        assert r.rescale(0.5) == Rectangle(5, 10, 15, 20)
        assert r.rescale(1.5) == Rectangle(15, 30, 45, 60)

    def test_rectangle_rotate_180(self):
        from jochre3_ocr_ray.functions.geometry import Rectangle

        r = Rectangle(10, 20, 30, 40)
        rr = r.rotate_180(100, 200)
        assert rr == Rectangle(100 - 40, 200 - 60, 30, 40)
        # involution: rotating twice restores the original
        assert rr.rotate_180(100, 200) == r

    def test_rectangle_tile(self):
        from jochre3_ocr_ray.functions.geometry import Rectangle

        r = Rectangle(0, 0, 100, 60)
        tiles = r.tile(2, 3, margin_percentage=0.25)
        assert len(tiles) == 6
        # all tiles clipped inside the parent
        for t in tiles:
            assert t.left >= r.left and t.right <= r.right
            assert t.top >= r.top and t.bottom <= r.bottom
        # interior tiles carry the overlap margin (50/3 -> margin>0)
        widths = sorted({t.width for t in tiles})
        assert widths[-1] > 100 // 2  # expanded beyond the bare segment
        # tiles jointly cover the parent
        assert min(t.left for t in tiles) == 0
        assert max(t.right for t in tiles) >= r.right - 1

    def test_translate_blocks_tree(self, lex):
        from jochre3_ocr_ray.functions.geometry import translate_blocks

        out = extract_turn("hello world\nnext line", 0, lex)
        shifted = translate_blocks(out["blocks"], 100)
        orig_words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        new_words = [
            w for b in shifted for l in b["lines"] for w in l["words"]
        ]
        for ow, nw in zip(orig_words, new_words):
            assert nw["span"]["start"] == ow["span"]["start"] + 100
            for og, ng in zip(ow["glyphs"], nw["glyphs"]):
                assert ng["span"]["start"] == og["span"]["start"] + 100
        # originals untouched (pure op)
        assert orig_words[0]["span"]["start"] == 0


class TestTokenRuleChain:
    def test_default_chain_is_identity_of_legacy_behavior(self, lex):
        from jochre3_ocr_ray.functions.extract import DEFAULT_TOKEN_RULES

        text = "it's 12.5 units (w'w) in ab-\ncd form"
        a = extract_turn(text, 0, lex)
        b = extract_turn(text, 0, lex, token_rules=list(DEFAULT_TOKEN_RULES))
        assert a == b

    def test_custom_rule_appended(self, lex):
        """A user rule slots into the ordered chain — the
        AltoTransformer rule-registration surface."""
        from jochre3_ocr_ray.functions.extract import DEFAULT_TOKEN_RULES

        def censor_rule(piece, rtl):
            return ["***"] if piece.lower() == "secret" else [piece]

        out = extract_turn(
            "the secret word",
            0,
            lex,
            token_rules=list(DEFAULT_TOKEN_RULES) + [censor_rule],
        )
        assert out["extracted_text"] == "the *** word"
        # spans still index the REWRITTEN text exactly
        words = [
            w for b in out["blocks"] for l in b["lines"] for w in l["words"]
        ]
        for w in words:
            assert (
                out["extracted_text"][w["span"]["start"] : w["span"]["end"]]
                == w["text"]
            )

    def test_rule_can_split_and_drop(self, lex):
        def dash_split_rule(piece, rtl):
            return [p for p in piece.split("/") if p]

        out = extract_turn(
            "either/or neither//nor", 0, lex, token_rules=[dash_split_rule]
        )
        assert out["n_words"] == 4
        assert out["extracted_text"] == "eitheror neithernor"
