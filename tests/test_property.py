"""Property-based tests (hypothesis): the extraction invariants must
hold for ARBITRARY payloads, not just fixture families.

Invariants:
1. never crashes; output schema keys stable
2. every word span indexes ``extracted_text`` exactly
3. ``simplify`` is idempotent
4. extraction is deterministic
5. re-extracting the extracted text is a fixed point for plain text
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jochre3_ocr_ray.functions.extract import extract_turn
from jochre3_ocr_ray.functions.lexicon import Lexicon
from jochre3_ocr_ray.functions.normalize import simplify

_LEX = Lexicon.load()

# arbitrary-ish text: printable unicode incl. markup chars, newlines
payloads = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
    ),
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_never_crashes_and_spans_index_text(text):
    r = extract_turn(text, 0, _LEX)
    assert set(r) >= {
        "extracted_text", "processed_text", "blocks", "confidence",
        "lang", "n_blocks", "n_lines", "n_words",
    }
    out = r["extracted_text"]
    for block in r["blocks"]:
        b = block["span"]
        assert 0 <= b["start"] <= b["end"] <= len(out)
        for line in block["lines"]:
            for w in line["words"]:
                s = w["span"]
                assert out[s["start"] : s["end"]] == w["text"]
    assert 0.0 < r["confidence"] <= 1.0 or r["n_words"] == 0


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_simplify_idempotent(text):
    once = simplify(text)
    assert simplify(once) == once


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_deterministic(text):
    assert extract_turn(text, 3, _LEX) == extract_turn(text, 3, _LEX)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("abcdefg "), min_size=1, max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_plain_text_fixed_point(lines):
    """For plain (non-markup, non-hyphen) payloads, extracting the
    extracted text again yields the same extracted text."""
    text = "\n".join(lines)
    first = extract_turn(text, 0, _LEX)["extracted_text"]
    second = extract_turn(first, 0, _LEX)["extracted_text"]
    assert second == first


class TestExtractTurnFuzz:
    """Property fuzz over the full extraction kernel: the span/count
    invariants must hold for ARBITRARY payloads (markup-ish, unicode,
    whitespace soup) — the contract every downstream stage relies on."""

    @given(
        st.text(
            alphabet=st.sampled_from(
                list("abcXYZ019 .,-'\n\t<>/\"=pdivbr") + ["א", "é", "​"]
            ),
            max_size=400,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_invariants_hold_for_any_payload(self, text):
        from jochre3_ocr_ray.functions.extract import extract_turn
        from jochre3_ocr_ray.functions.lexicon import Lexicon

        lex = Lexicon.load()
        out = extract_turn(text, 7, lex)
        et = out["extracted_text"]
        n_words = n_lines = n_glyphs = 0
        for block in out["blocks"]:
            b_span = block["span"]
            assert 0 <= b_span["start"] <= b_span["end"] <= len(et)
            for line in block["lines"]:
                n_lines += 1
                l_span = line["span"]
                assert b_span["start"] <= l_span["start"] <= l_span["end"] <= b_span["end"]
                for w in line["words"]:
                    n_words += 1
                    s = w["span"]
                    # THE span contract: every span indexes extracted_text
                    assert et[s["start"] : s["end"]] == w["text"], (text, w)
                    assert 0.0 < w["confidence"] <= 1.0
                    for g in w["glyphs"]:
                        n_glyphs += len(g["text"]) and 1
                        gs = g["span"]
                        assert et[gs["start"] : gs["end"]] == g["text"]
        assert n_words == out["n_words"]
        assert n_lines == out["n_lines"]
        assert out["n_blocks"] == len(out["blocks"])
        assert 0.0 < out["confidence"] <= 1.0
        assert out["skew"] >= 0.0
        # processed text never contains the line-break artifacts
        assert "\r" not in out["processed_text"]


# ---- transform-chain inversion (round 3)
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # indent
            st.text(
                alphabet=st.characters(
                    codec="utf-8",
                    exclude_categories=("Cs", "Zl", "Zp", "Cc"),
                ),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_transform_chain_offsets_invert_exactly(lines):
    """For ANY indented multi-line payload: every offset of the
    deskew-transformed text maps back to a raw offset holding the SAME
    character (deskew only deletes, never reorders)."""
    from jochre3_ocr_ray.functions.transform_chain import DeskewTransform

    raw = "\n".join(" " * ind + body for ind, body in lines)
    t = DeskewTransform()
    out, meta = t.transform(raw)
    for off in range(len(out)):
        back = t.invert_offset(off, meta)
        assert 0 <= back < len(raw)
        assert raw[back] == out[off], (off, back)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=200,
    ),
    st.sampled_from([0.1, 0.5, 0.9, 0.99]),
)
def test_histogram_quantile_kernel_matches_numpy(values, q):
    """The histogram-refine bin/rank arithmetic must agree with
    np.quantile for arbitrary value distributions (driver-side kernel
    check — the distributed plumbing is pinned in test_ops)."""
    import numpy as np

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import pandas as pd
    import ray.data as rd

    from jochre3_ocr_ray.ops.relational import grouped_quantiles_histogram

    df = pd.DataFrame({"g": "x", "v": values})
    got = grouped_quantiles_histogram(rd.from_pandas(df), "g", "v", [q])
    want = float(np.quantile(np.array(values, dtype=np.float64), q))
    assert got[("x", q)] == pytest.approx(want, rel=0, abs=max(1e-9, abs(want) * 1e-12))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 200), min_size=0, max_size=40).map(sorted),
    st.integers(1, 300),  # token count
    st.integers(1, 30),   # window
)
def test_clip_dup_spans_accounting(raw_starts, n_tokens, window):
    """_clip_dup_spans: removed count equals the interval-cover size,
    output tokens are exactly the uncovered input tokens in order."""
    import numpy as np

    from jochre3_ocr_ray.ops.dedup import _clip_dup_spans

    tokens = [f"t{i}" for i in range(n_tokens)]
    starts = np.unique(
        np.asarray([s for s in raw_starts if s < n_tokens], dtype=np.int64)
    )
    out, n_rm = _clip_dup_spans(" ".join(tokens), starts, window)
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + window, n_tokens)))
    want = [t for i, t in enumerate(tokens) if i not in covered]
    assert out.split() == want
    assert n_rm == len(covered)
    assert n_rm + len(out.split()) == n_tokens


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(0, (1 << 61) - 1), min_size=1, max_size=500, unique=True
    ),
    st.lists(
        st.integers(0, (1 << 61) - 1), min_size=0, max_size=500, unique=True
    ),
)
def test_bloom_no_false_negatives(inserted, probed):
    """Bloom filter: every inserted value tests positive for ANY value
    distribution (adversarial low-entropy ints included)."""
    import numpy as np

    from jochre3_ocr_ray.ops.dedup import _bloom_build, _bloom_contains

    ins = np.asarray(inserted, dtype=np.int64)
    words, m, k = _bloom_build(ins)
    assert _bloom_contains(words, m, k, ins).all()
    absent = np.asarray(
        [p for p in probed if p not in set(inserted)], dtype=np.int64
    )
    if absent.size:
        # no correctness claim on FPs, only the documented direction:
        # bloom hits are a superset of true membership
        res = _bloom_contains(words, m, k, absent)
        assert res.dtype == bool
