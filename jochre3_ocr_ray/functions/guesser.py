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
