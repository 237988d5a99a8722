"""Text normalization — the TextSimplifier analog.

Reference semantics: jochre3-ocr's ``TextSimplifier`` /
``YiddishTextSimpifier.simplify`` (reference
``modules/yiddish/src/main/scala/.../YiddishTextSimpifier.scala:41-74``)
applies Unicode normalization plus a fixed table of regex
canonicalizations (quote/dash normalization, ligature joins, nikud
stripping). Ours is the language-neutral analog: a fixed, ordered,
deterministic table applied identically in fixture generation, in the
oracle, and in the pipeline — per-turn text equality depends on all
three sharing this exact function.

The table is applied AFTER ``unicodedata.normalize("NFC", text)``.
Order matters and is part of the spec.
"""

from __future__ import annotations

import functools
import re
import unicodedata

# Ordered normalization table. Each entry: (compiled regex, replacement).
# Kept as module-level compiled patterns so stateless map_batches tasks
# pay compilation once per worker process, not per batch.
_TABLE: list[tuple[re.Pattern[str], str]] = [
    # line endings
    (re.compile("\r\n?"), "\n"),
    # zero-width characters removed outright (ZWSP, ZWNJ, ZWJ, BOM)
    (re.compile("[\u200b\u200c\u200d\ufeff]"), ""),
    # double-quote variants -> ASCII '"'  (incl. ,,x'' style quoting)
    (re.compile("[\u201c\u201d\u201e\u00ab\u00bb]"), '"'),
    (re.compile(",,"), '"'),
    (re.compile("''"), '"'),
    # single-quote variants -> ASCII "'"
    (re.compile("[\u2018\u2019\u201a\u2032]"), "'"),
    # dash variants and Hebrew maqaf -> ASCII '-'
    (re.compile("[\u2012\u2013\u2014\u2015\u05be]"), "-"),
    # ellipsis -> three dots
    (re.compile("\u2026"), "..."),
    # exotic spaces -> ASCII space (NBSP, en..hair spaces, narrow NBSP,
    # ideographic space)
    (re.compile("[\u00a0\u2000-\u200a\u202f\u3000]"), " "),
]


def simplify(text: str) -> str:
    """Canonicalize one payload string. Pure & deterministic."""
    if not text:
        return ""
    out = unicodedata.normalize("NFC", text)
    for pattern, repl in _TABLE:
        out = pattern.sub(repl, out)
    return out


# Memoized variant for the per-TOKEN / per-CHAR hot loops (corpus-prep
# explodes, glyph labels): the token vocabulary repeats heavily, so a
# bounded cache turns the dominant per-token regex cost into a dict
# hit. Do NOT use for full-document texts — those are unique and would
# only churn the cache. (Defined as its own decorated function so the
# wrapper pickles by reference into Ray tasks.)
@functools.lru_cache(maxsize=1 << 16)
def simplify_cached(text: str) -> str:
    return simplify(text)


_WS_RUN = re.compile("[ \t\f\v]+")
_LEADING_WS = re.compile("^[ \t]*")


def estimate_indent_skew(text: str) -> float:
    """Systematic layout-noise estimate — the ``Deskewer`` analog
    (reference ``core/transform/Deskewer.scala:183-216``): per-line
    skew samples (leading-indent width in chars, standing in for the
    per-contour rotation angle), take the MEDIAN sample, keep inliers
    within ±1 of it, return the inlier MEAN. 0.0 for empty input."""
    samples = sorted(
        len(_LEADING_WS.match(line).group(0))
        for line in text.split("\n")
        if line.strip()
    )
    if not samples:
        return 0.0
    median = samples[len(samples) // 2]
    inliers = [s for s in samples if median - 1.0 <= s <= median + 1.0]
    return sum(inliers) / len(inliers)


def deskew(text: str) -> tuple[str, float]:
    """Estimate the systematic indent and subtract it from every line
    (clamped to each line's own indent) — correction applied BEFORE
    segmentation, estimate recorded per turn (the deskewed-image +
    logged-angle behavior of ``Deskewer.deskew``)."""
    skew = estimate_indent_skew(text)
    shift = int(skew)
    if shift <= 0:
        return text, skew
    corrected = "\n".join(
        line[min(shift, len(_LEADING_WS.match(line).group(0))) :]
        for line in text.split("\n")
    )
    return corrected, skew


def collapse_inline_whitespace(line: str) -> str:
    """Collapse horizontal whitespace runs to single spaces and strip ends.

    Applied per line during segmentation (the rendered line is the
    canonical form that word spans index into).
    """
    return _WS_RUN.sub(" ", line).strip()
