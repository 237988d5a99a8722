"""Lexicon — word-frequency classes for confidence rescoring.

Reference semantics: jochre3-ocr ``Lexicon`` / ``TextFileLexicon`` /
``YivoLexicon`` (reference ``modules/core/src/main/scala/.../lexicon/
Lexicon.scala:5-29``, ``TextFileLexicon.scala:16-57``,
``modules/yiddish/.../lexicon/YivoLexicon.scala:33-176``):

* ``get_frequency(word)`` returns ``1`` (known), ``0`` (unknown) or
  ``-1`` (impossible — matches an impossible-word regex).
* Frequency of a multi-part word is the **min over its
  punctuation-split parts** (``TextFileLexicon.scala:21-38``); external
  punctuation is ignored; hyphenated words take the min over the
  hyphen-separated parts.
* Pure-punctuation tokens and pure-number tokens are always "known".

The lexicon is a plain in-memory ``set`` loaded once per actor (the
reference holds it as a per-process singleton built by the ZLayer DI
graph). Our "impossible word" rule, language-neutral: a part mixing
digits and letters (e.g. ``abc123``) is impossible.
"""

from __future__ import annotations

import re
from pathlib import Path

_DEFAULT_PATH = Path(__file__).resolve().parent.parent / "resources" / "lexicon.txt"

# a part is "impossible" when it mixes digits and letters
_IMPOSSIBLE = re.compile(r"(?=.*\d)(?=.*[^\W\d_])", re.UNICODE)
_PURE_DIGITS = re.compile(r"\d+([.,]\d+)*$")
_EXTERNAL_PUNCT = re.compile(r"^[^\w]+|[^\w]+$", re.UNICODE)
_HAS_WORD_CHAR = re.compile(r"\w", re.UNICODE)

FREQ_KNOWN = 1
FREQ_UNKNOWN = 0
FREQ_IMPOSSIBLE = -1


class Lexicon:
    """Set-backed lexicon with jochre-style frequency classes."""

    def __init__(self, words: set[str]):
        self.words = words
        # per-instance memo (the reference's memoized lookup cache,
        # YivoLexicon.scala:37,63-75); tokens repeat heavily in corpora
        self._freq_memo: dict[str, int] = {}

    @classmethod
    def load(cls, path: str | Path | None = None) -> "Lexicon":
        p = Path(path) if path is not None else _DEFAULT_PATH
        words = {
            line.strip().lower()
            for line in p.read_text(encoding="utf-8").splitlines()
            if line.strip()
        }
        return cls(words)

    def _part_frequency(self, part: str) -> int:
        if not part:
            return FREQ_KNOWN
        if _PURE_DIGITS.fullmatch(part):
            return FREQ_KNOWN
        if _IMPOSSIBLE.match(part):
            return FREQ_IMPOSSIBLE
        if part.lower() in self.words:
            return FREQ_KNOWN
        return FREQ_UNKNOWN

    def get_frequency(self, word: str) -> int:
        """Frequency class of a full word token.

        External punctuation stripped; min over hyphen-split parts
        (``YivoLexiconTest.scala:12-38`` hyphenated min-rule).
        Punctuation-only tokens are known.
        """
        cached = self._freq_memo.get(word)
        if cached is not None:
            return cached
        freq = self._frequency_uncached(word)
        if len(self._freq_memo) < 262144:  # bound actor memory
            self._freq_memo[word] = freq
        return freq

    def _frequency_uncached(self, word: str) -> int:
        core = _EXTERNAL_PUNCT.sub("", word)
        if not core or not _HAS_WORD_CHAR.search(core):
            return FREQ_KNOWN
        parts = [p for p in core.split("-") if p]
        if not parts:
            return FREQ_KNOWN
        return min(self._part_frequency(p) for p in parts)

    def contains(self, word: str) -> bool:
        return word.lower() in self.words

    # confidence mapping used by the guesser (FullSegmentationGuesser
    # rescoring: unknown x0.5, impossible x0.01 — reference
    # FullSegmentationGuesser.scala:208-220 + reference.conf:73)
    def confidence(self, word: str) -> float:
        freq = self.get_frequency(word)
        if freq >= FREQ_KNOWN:
            return 1.0
        if freq == FREQ_UNKNOWN:
            return 0.5
        return 0.01
