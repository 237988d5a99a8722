"""Word-level rewrite rules.

Transcript analogs of jochre3-ocr's ALTO rewrite rules
(``modules/yiddish/src/main/scala/.../YiddishAltoTransformer.scala``):

* ``split_punctuation`` — the ``punctuationSplitRule``
  (``YiddishAltoTransformer.scala:127-189``): a token is split into
  words at punctuation boundaries, EXCEPT a single punctuation mark
  flanked by word characters on both sides stays attached (protects
  abbreviations like ``w'w`` and decimals like ``1.5`` — the
  reference's triplet lookahead), and a single trailing ``-`` after a
  word character stays attached (it is hyphenation material for the
  cross-line rule).
* ``reverse_digit_runs`` — the ``reverseNumberRule``
  (``YiddishAltoTransformer.scala:233-248``): inside RTL text, each
  maximal digit run (incl. ``.``/``,`` separators, e.g. ``3.14``) is
  stored reversed; applied per word when the containing line is RTL.
* ``is_rtl_line`` — direction detection, the analog of
  ``StringUtils.isLeftToRight`` (language-driven in the reference;
  script-driven here: Hebrew/Arabic codepoints outnumber Latin).

Pure, deterministic, shared by oracle and pipeline.
"""

from __future__ import annotations

import re

_WORD_CHAR = re.compile(r"\w", re.UNICODE)
_RTL_CHARS = re.compile("[\u0590-\u05ff\u0600-\u06ff\u0700-\u074f\ufb1d-\ufb4f]")
_LATIN_CHARS = re.compile(r"[A-Za-z]")
_DIGIT_RUN = re.compile(r"\d+(?:[.,]\d+)*")


_SIMPLE_TOKEN = re.compile(r"\w+", re.UNICODE)


def split_punctuation(token: str) -> list[str]:
    """Split one whitespace-delimited token into word/punct pieces."""
    if not token:
        return []
    if len(token) == 1 or _SIMPLE_TOKEN.fullmatch(token):
        return [token]
    # runs of word chars vs non-word chars
    runs: list[tuple[bool, str]] = []
    for m in re.finditer(r"\w+|[^\w]+", token, re.UNICODE):
        runs.append((_WORD_CHAR.match(m.group(0)) is not None, m.group(0)))
    # decide which punct runs stay attached
    pieces: list[str] = []
    current = ""
    for idx, (is_word, run) in enumerate(runs):
        if is_word:
            current += run
            continue
        prev_is_word = idx > 0 and runs[idx - 1][0]
        next_is_word = idx + 1 < len(runs) and runs[idx + 1][0]
        attached = len(run) == 1 and prev_is_word and next_is_word
        trailing_hyphen = (
            run == "-" and prev_is_word and idx == len(runs) - 1
        )
        if attached or trailing_hyphen:
            current += run
        else:
            if current:
                pieces.append(current)
                current = ""
            pieces.append(run)
    if current:
        pieces.append(current)
    return pieces


def is_rtl_line(line: str) -> bool:
    """A line is RTL when RTL-script codepoints outnumber Latin ones."""
    if line.isascii():  # fast path: no RTL codepoints possible
        return False
    return len(_RTL_CHARS.findall(line)) > len(_LATIN_CHARS.findall(line))


def reverse_digit_runs(word: str) -> str:
    """Reverse each maximal digit run (with ./, separators) in a word."""
    return _DIGIT_RUN.sub(lambda m: m.group(0)[::-1], word)


def string_to_chars(text: str) -> list[str]:
    """Split into user-perceived characters, keeping combining marks
    attached to their base char — the ``stringToChars`` analog
    (reference ``core/utils/StringUtils.scala``). The glyph-level
    splitter: one output element per glyph."""
    import unicodedata

    out: list[str] = []
    for ch in text:
        if out and unicodedata.combining(ch):
            out[-1] += ch
        else:
            out.append(ch)
    return out
