"""Beam-search content guesser — the FullSegmentationGuesser kernel.

Reference: ``core/text/FullSegmentationGuesser.scala``: per-word beam
(width 5, priority queue) over per-glyph top-k classifier predictions
(``:562-586``), scored by the **geometric mean** of glyph confidences
(``Guess.score``, ``:106-109``), then lexicon-rescored — unknown words
×0.5, impossible words ×0.01 (``:208-220`` + ``reference.conf:73``).

Here the "glyph classifier" is any source of per-position candidate
(char, confidence) lists; the beam composes word guesses and the
lexicon rescoring picks the winner. Deterministic: ties broken by
insertion order (argMaxFirst, ``MathUtils.scala:28-34``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .lexicon import FREQ_IMPOSSIBLE, FREQ_UNKNOWN, Lexicon

DEFAULT_BEAM_WIDTH = 5
UNKNOWN_FACTOR = 0.5
IMPOSSIBLE_FACTOR = 0.01


@dataclass(frozen=True)
class Guess:
    text: str
    log_score_sum: float
    length: int

    @property
    def score(self) -> float:
        """Geometric mean of per-position confidences (Guess.score)."""
        if self.length == 0:
            return 1.0
        return math.exp(self.log_score_sum / self.length)


def beam_search(
    candidates: list[list[tuple[str, float]]],
    width: int = DEFAULT_BEAM_WIDTH,
) -> list[Guess]:
    """Compose per-position top-k candidates into word guesses.

    ``candidates[i]`` = [(char, confidence), ...] for position i.
    Returns up to ``width`` guesses sorted by score desc (stable)."""
    beam: list[Guess] = [Guess("", 0.0, 0)]
    for position in candidates:
        nxt: list[Guess] = []
        for guess in beam:
            for char, conf in position:
                nxt.append(
                    Guess(
                        guess.text + char,
                        guess.log_score_sum + math.log(max(conf, 1e-300)),
                        guess.length + 1,
                    )
                )
        # stable sort: equal scores keep insertion order (first wins)
        nxt.sort(key=lambda g: -g.log_score_sum / max(g.length, 1))
        beam = nxt[:width]
    return beam


def rescore(guess: Guess, lex: Lexicon) -> float:
    """Lexicon rescoring: unknown x0.5, impossible x0.01."""
    freq = lex.get_frequency(guess.text)
    factor = 1.0
    if freq == FREQ_UNKNOWN:
        factor = UNKNOWN_FACTOR
    elif freq == FREQ_IMPOSSIBLE:
        factor = IMPOSSIBLE_FACTOR
    return guess.score * factor


def best_guess(
    candidates: list[list[tuple[str, float]]],
    lex: Lexicon,
    width: int = DEFAULT_BEAM_WIDTH,
) -> tuple[str, float]:
    """Beam + lexicon rescoring; returns (text, rescored_score).
    First-wins on ties (argMaxFirst)."""
    beam = beam_search(candidates, width)
    best: tuple[str, float] | None = None
    for guess in beam:
        score = rescore(guess, lex)
        if best is None or score > best[1]:
            best = (guess.text, score)
    return best if best is not None else ("", 1.0)


# ---------------------------------------------- other-alphabet re-guess
# reference StringUtils.scala:18-40 — language-code direction table
RTL_LANGUAGES = frozenset(
    {"ar", "dv", "fa", "ha", "he", "iw", "ji", "ps", "sd", "ug", "ur", "yi"}
)


def is_left_to_right_language(language: str) -> bool:
    """``StringUtils.isLeftToRight`` (``StringUtils.scala:37-39``)."""
    return language not in RTL_LANGUAGES


@dataclass(frozen=True)
class GlyphGuesserForAnotherAlphabet:
    """A secondary guesser dispatched to words the MAIN guesser marked
    as another script (reference
    ``GlyphGuesserForAnotherAlphabet.scala:10-18``): ``regex`` selects
    the marked words, ``glyph_candidates_fn`` is that alphabet's
    classifier hook."""

    language: str
    pattern: "object"  # compiled regex; fullmatch like Scala Regex.matches
    glyph_candidates_fn: "object"


def guess_word_without_beam(
    candidates: list[list[tuple[str, float]]],
) -> tuple[str, float]:
    """Top-1 per glyph, geometric-mean confidence — the no-beam word
    guess (``FullSegmentationGuesser.scala:407-433``). No lexicon
    rescoring: the secondary alphabet is outside the main lexicon."""
    if not candidates:
        return "", 1.0
    text = "".join(pos[0][0] for pos in candidates if pos)
    logs = [math.log(max(pos[0][1], 1e-300)) for pos in candidates if pos]
    score = math.exp(sum(logs) / len(logs)) if logs else 1.0
    return text, score


def guess_with_other_alphabets(
    word_text: str,
    word_is_ltr: bool,
    guessers: "list[GlyphGuesserForAnotherAlphabet]",
) -> "tuple[str, float, str] | None":
    """Apply the FIRST matching secondary guesser
    (``FullSegmentationGuesser.guessWithOtherAlphabets``,
    ``FullSegmentationGuesser.scala:588-614``): when the secondary
    language's direction differs from the word's, the glyphs are
    re-sorted for the new direction (text analog: the character
    sequence reverses) before the no-beam re-guess. Returns
    (new_text, confidence, language) or None when no regex matches."""
    for g in guessers:
        if g.pattern.fullmatch(word_text) is None:
            continue
        ltr = is_left_to_right_language(g.language)
        text = word_text if word_is_ltr == ltr else word_text[::-1]
        new_text, score = guess_word_without_beam(
            g.glyph_candidates_fn(text)
        )
        if new_text:
            return new_text, score, g.language
        return None
    return None
