"""Per-word spelling alternatives — the addStringAlternatives analog.

Reference: ``core/alto/AltoTransformer.scala:62-67`` (set-dedup, sorted
by (purpose, content)) + ``YiddishAltoTransformer.scala:27-95`` (YIVO
standardized + romanized transliteration purposes).

Purposes here: ``LOWER`` (case-folded form, when distinct) and
``ROMAN`` (transliteration, for words containing Hebrew script).
"""

from __future__ import annotations

import re

from .transliterate import Transliterator

_HAS_WORD = re.compile(r"\w", re.UNICODE)


def build_alternatives(word: str, translit: Transliterator) -> list[dict[str, str]]:
    """Deduped, (purpose, content)-sorted alternatives for one word."""
    if not _HAS_WORD.search(word):
        return []
    alts: set[tuple[str, str]] = set()
    lower = word.lower()
    if lower != word:
        alts.add(("LOWER", lower))
    if translit.has_script(word):
        alts.add(("ROMAN", translit.transliterate(word)))
    return [
        {"purpose": p, "content": c} for p, c in sorted(alts)
    ]
