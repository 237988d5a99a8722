"""Per-turn extraction: the full layered pipeline as one pure function.

Composes the stage chain that jochre3-ocr runs per page
(``modules/core/src/main/scala/.../Jochre.scala:303-420``,
``processMatInternal``): normalize -> segment -> tokenize + rewrite
rules -> lexicon-scored confidence -> cross-line hyphenation ->
render raw + processed text. ``extract_turn`` is both the test oracle
and the kernel the Ray actor stage applies per batch — per-turn text
equality holds by construction and the pytest suite verifies the
Ray plumbing preserves it row-for-row.

Output contract (FIXTURES.md §2):

* ``extracted_text`` — raw content: blocks joined ``"\\n\\n"``, lines
  joined ``"\\n"`` (``Page.scala:156-160``; ``OutputFormat.Text``).
* ``processed_text`` — dehyphenated: per block, line breaks become
  spaces and HypPart1/HypPart2 pairs are replaced by
  ``subs_content`` with the next line's first word consumed; blocks
  joined ``"\\n"`` (``TextBlock.scala:94-124`` fold;
  ``Page.scala:162-166``).
* ``blocks`` — nested block/line/word structure; every span indexes
  into ``extracted_text`` and satisfies
  ``extracted_text[start:end] == word.text``.
* word ``confidence`` — lexicon rescoring classes (known 1.0,
  unknown 0.5, impossible 0.01; ``FullSegmentationGuesser.scala:
  208-220``); hyphen-pair words are scored jointly on their merged
  form (``FullSegmentationGuesser.scala:468-555``). Turn confidence
  = geometric mean of word confidences (``Guess.score`` analog,
  ``FullSegmentationGuesser.scala:106-109``).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from .lexicon import FREQ_KNOWN, Lexicon
from .normalize import deskew, simplify
from .rules import is_rtl_line, reverse_digit_runs, split_punctuation, string_to_chars
from .segmenter import segment

HYP_PART1 = "HypPart1"
HYP_PART2 = "HypPart2"

_TRAILING_HYPHEN = re.compile(r"\w-$", re.UNICODE)
_SIMPLE_WORD_TOKEN = re.compile(r"\w+", re.UNICODE)
_LEADING_WORD_CHAR = re.compile(r"^\w", re.UNICODE)
_PUNCT_ONLY = re.compile(r"[^\w]+$", re.UNICODE)


@dataclass
class _Word:
    text: str
    sep: bool  # preceded by a space within its line
    confidence: float = 1.0
    subs_type: str = ""
    subs_content: str = ""
    start: int = 0
    end: int = 0
    kind: str = "word"
    guessed: float | None = None  # beam-guesser rescored score, if guessed
    language: str | None = None   # set by a secondary-alphabet re-guess


@dataclass
class _Line:
    words: list[_Word] = field(default_factory=list)
    start: int = 0
    end: int = 0


# --- pluggable token-rule chain (the reference's ordered rule list:
# YiddishAltoTransformer applies PartialFunction rules in sequence —
# punctuationSplitRule, reverseNumberRule, ... — over tree nodes; here
# each rule maps (token_piece, rtl) -> pieces and the chain folds left)
def punctuation_split_rule(piece: str, rtl: bool) -> list[str]:
    return split_punctuation(piece)


def reverse_number_rule(piece: str, rtl: bool) -> list[str]:
    return [reverse_digit_runs(piece)] if rtl else [piece]


DEFAULT_TOKEN_RULES = (punctuation_split_rule, reverse_number_rule)


def _tokenize_line(line_text: str, token_rules=None) -> list[_Word]:
    rules = DEFAULT_TOKEN_RULES if token_rules is None else token_rules
    rtl = is_rtl_line(line_text)
    words: list[_Word] = []
    # fast path for the DEFAULT chain on LTR lines: a pure word-char
    # token passes punctuation_split (its own fullmatch fast path)
    # and reverse_number (LTR no-op) unchanged — skip the rule fold
    # (provably identical output; ~18% of the kernel on the bench
    # corpus). Custom rule chains always take the general fold.
    fast = rules is DEFAULT_TOKEN_RULES and not rtl
    simple = _SIMPLE_WORD_TOKEN.fullmatch
    for token in line_text.split(" "):
        if not token:
            continue
        if fast and simple(token):
            words.append(_Word(text=token, sep=bool(words)))
            continue
        pieces = [token]
        for rule in rules:
            pieces = [p2 for p in pieces for p2 in rule(p, rtl) if p2]
        for k, piece in enumerate(pieces):
            words.append(_Word(text=piece, sep=(k == 0 and bool(words))))
    return words


def combine_unspaced_words(words: list[_Word]) -> list[_Word]:
    """Merge adjacent words not separated by a space — the
    ``TextLine.combinedWords`` analog (reference
    ``core/model/TextLine.scala:38-57``): a left fold where each
    unspaced follower is merged into the accumulated word via
    ``Word.combineWith`` semantics (``core/model/Word.scala:51-57``):
    contents concatenate, spans union, and confidence becomes
    ``sqrt(c1 * c2)`` pairwise (so a 3-way merge is
    ``sqrt(sqrt(c1*c2)*c3)``, matching the reference's fold order).
    subs/alternative fields keep the LEFT word's values (``this.copy``
    in the reference)."""
    out: list[_Word] = []
    for w in words:
        if out and not w.sep:
            left = out[-1]
            left.text = left.text + w.text
            left.confidence = math.sqrt(left.confidence * w.confidence)
        else:
            out.append(w)
    return out


def default_dehyphenation(w1: str, w2: str, lex: Lexicon) -> str:
    """Decide the merged form of a cross-line hyphen pair — the
    pluggable ``Dehyphenator`` strategy (reference
    ``core/text/Dehyphenator.scala:3-5``; lexicon-driven keep/drop
    ``YiddishDehyphenator.scala:60-118``). Returns ``subs_content``."""
    joined = w1 + w2
    if lex.get_frequency(joined) >= FREQ_KNOWN:
        return joined  # merged form is a real word: drop hyphen
    if lex.get_frequency(w1) >= FREQ_KNOWN and lex.get_frequency(w2) >= FREQ_KNOWN:
        return w1 + "-" + w2  # compound of two known words: keep hyphen
    return joined  # default: drop the line-break hyphen


_DEHYPH_SEP = re.compile(r"[\W_]", re.UNICODE)


def dehyphenate_text(text: str, lex: Lexicon, dehyphenator=None) -> str:
    """Whole-text dehyphenation — the ``/dehyphenate`` endpoint kernel
    (``YiddishDehyphenator.scala:25-140``): given OCR'd text split on
    physical line breaks (single ``\\n``) and paragraphs (blank
    lines), remove the physical breaks (replaced by spaces), mark
    paragraph ends with a single ``\\n``, and merge trailing-hyphen
    line pairs. The keep/drop decision delegates to the same pluggable
    word-level strategy the extraction pipeline uses
    (``default_dehyphenation``); the word boundaries mirror the
    reference's punct-or-space scan (last separator before the hyphen
    / first separator of the next line)."""
    lines = text.split("\n")
    if len(lines) <= 1:
        return text
    decide = dehyphenator or default_dehyphenation
    out: list[str] = []
    for i, line in enumerate(lines):
        is_last = i + 1 >= len(lines)
        nxt = lines[i + 1] if not is_last else ""
        if is_last:
            # Preserve the input's trailing-newline state: an input
            # ending in '\n' surfaces here as a final "" element (which
            # appends nothing), and an input without one must not gain
            # a newline — parity with the reference /dehyphenate
            # text/plain response.
            out.append(line)
        elif line.endswith("-"):
            body = line[:-1]
            seps = list(_DEHYPH_SEP.finditer(body))
            last_word = body[seps[-1].end() :] if seps else body
            m = _DEHYPH_SEP.search(nxt)
            first_word = nxt[: m.start()] if m else nxt
            merged = decide(last_word, first_word, lex)
            keep = merged == f"{last_word}-{first_word}"
            if not keep:
                out.append(body)
            elif not nxt:
                out.append(line + "\n")
            else:
                out.append(line)
        elif not nxt:
            out.append(line + "\n")
        elif not line:
            out.append(line)
        else:
            out.append(line + " ")
    return "".join(out)


def _resolve_hyphenation(
    lines: list[_Line], lex: Lexicon, dehyphenator=None
) -> None:
    """Cross-line hyphen pairs: decide merged form, set subs fields."""
    decide = dehyphenator or default_dehyphenation
    for i in range(len(lines) - 1):
        cur, nxt = lines[i], lines[i + 1]
        if not cur.words or not nxt.words:
            continue
        last, first = cur.words[-1], nxt.words[0]
        if not _TRAILING_HYPHEN.search(last.text):
            continue
        if not _LEADING_WORD_CHAR.search(first.text):
            continue
        subs = decide(last.text[:-1], first.text, lex)
        last.subs_type, last.subs_content = HYP_PART1, subs
        first.subs_type, first.subs_content = HYP_PART2, subs


def _guess_words(lines: list[_Line], lex: Lexicon, glyph_candidates_fn,
                 other_alphabet_guessers=None) -> None:
    """Beam-guesser content assignment — the FullSegmentationGuesser
    serving path (``core/text/FullSegmentationGuesser.scala:375-396``):
    per-word beam over per-glyph candidate lists, geometric-mean
    scored, lexicon-rescored; the winning guess REPLACES the word's
    content and carries its rescored score. ``glyph_candidates_fn(text)
    -> [[(char, conf), ...] per glyph]`` is the classifier hook; with
    the identity classifier (every glyph certain) the winner is the
    original text and the rescored score equals the direct lexicon
    confidence — pinned by tests, so the default fast path skips the
    beam without changing results.

    After the primary guess, a word matching a secondary-alphabet
    regex is RE-guessed without beam by that alphabet's classifier,
    with a direction-flip re-sort when the scripts disagree
    (``guessWithOtherAlphabets``,
    ``FullSegmentationGuesser.scala:588-614``, applied post-primary
    exactly as ``:398-405`` does); the winner carries its language."""
    from .guesser import best_guess, guess_with_other_alphabets

    for line in lines:
        for w in line.words:
            if _PUNCT_ONLY.fullmatch(w.text):
                continue
            if glyph_candidates_fn is not None:
                candidates = glyph_candidates_fn(w.text)
                if candidates:
                    text, score = best_guess(candidates, lex)
                    if text:
                        w.text = text
                        w.guessed = score
            if other_alphabet_guessers:
                hit = guess_with_other_alphabets(
                    w.text, not is_rtl_line(w.text), other_alphabet_guessers
                )
                if hit is not None:
                    w.text, w.guessed, w.language = hit


def _score_words(lines: list[_Line], lex: Lexicon) -> None:
    for line in lines:
        for w in line.words:
            if _PUNCT_ONLY.fullmatch(w.text):
                w.confidence = 1.0
            elif w.subs_type:
                # hyphen pair scored jointly on the merged form
                w.confidence = lex.confidence(w.subs_content)
            elif w.guessed is not None:
                # beam-rescored score (identity-classifier case equals
                # lex.confidence(text) exactly — see _guess_words)
                w.confidence = w.guessed
            else:
                w.confidence = lex.confidence(w.text)


def _render_block_raw(lines: list[_Line], offset: int) -> tuple[str, int]:
    """Assign spans and return (block_text, new_offset).

    ``offset`` is the char position of the block start within
    ``extracted_text``.
    """
    line_texts = []
    pos = offset
    for li, line in enumerate(lines):
        if li > 0:
            pos += 1  # "\n"
        line.start = pos
        parts = []
        for w in line.words:
            if w.sep:
                pos += 1
                parts.append(" ")
            w.start = pos
            pos += len(w.text)
            w.end = pos
            parts.append(w.text)
        line.end = pos
        line_texts.append("".join(parts))
    return "\n".join(line_texts), pos


def _render_block_processed(lines: list[_Line]) -> str:
    units: list[tuple[str, bool]] = []
    skip_first = False
    for li, line in enumerate(lines):
        ws = [(w.text, w.sep) for w in line.words]
        if ws and li > 0:
            ws[0] = (ws[0][0], True)  # line break -> joining space
        if skip_first and ws:
            ws = ws[1:]  # HypPart2 consumed (+ its following space)
            skip_first = False
        if (
            line.words
            and li < len(lines) - 1
            and line.words[-1].subs_type == HYP_PART1
        ):
            ws[-1] = (line.words[-1].subs_content, ws[-1][1])
            skip_first = True
        units.extend(ws)
    out = []
    for k, (text, sep) in enumerate(units):
        if sep and k > 0:
            out.append(" ")
        out.append(text)
    return "".join(out)


def _glyph_entries(text: str, start: int, confidence: float) -> list[dict]:
    """Glyph tiling within a word span — the text-exact analog of
    ``FullYoloSegmenter.scala:148-182`` (inter-glyph borders are
    character-cluster boundaries; combining marks stay attached via
    ``string_to_chars``). Glyph confidence inherits the word's score
    (the per-glyph classifier confidence analog)."""
    out = []
    pos = start
    for cluster in string_to_chars(text):
        nxt = pos + len(cluster)
        out.append(
            {
                "text": cluster,
                "span": {"start": pos, "end": nxt},
                "confidence": confidence,
            }
        )
        pos = nxt
    return out


_HYPHEN_SPLIT = re.compile(r"^(.+)([-־])$")


def _word_entries(
    w: _Word,
    *,
    include_glyphs: bool,
    emit_hyphen_element: bool,
    alternatives_fn,
) -> list[dict]:
    """One word -> its output entry, or (word, hyphen) pair when the
    hyphen-element option is on and the word carries a trailing hyphen
    (``YiddishAltoTransformer.addHyphenRule``: content loses the
    hyphen, a distinct Hyphen element takes it with a prorated span;
    the hyphen GLYPH is scored 0.5 as in ``Word.combineWith(hyphen)``,
    ``Word.scala:59-63``)."""
    m = _HYPHEN_SPLIT.match(w.text) if emit_hyphen_element else None
    if m is not None:
        body, hyph = m.group(1), m.group(2)
        word_entry = {
            "text": body,
            "kind": "word",
            "span": {"start": w.start, "end": w.end - 1},
            "confidence": w.confidence,
            "subs_type": w.subs_type,
            "subs_content": w.subs_content,
            "alternatives": (
                alternatives_fn(body) if alternatives_fn is not None else []
            ),
            "glyphs": (
                _glyph_entries(body, w.start, w.confidence)
                if include_glyphs
                else []
            ),
        }
        hyphen_entry = {
            "text": hyph,
            "kind": "hyphen",
            "span": {"start": w.end - 1, "end": w.end},
            "confidence": w.confidence,
            "subs_type": "",
            "subs_content": "",
            "alternatives": [],
            "glyphs": (
                [
                    {
                        "text": hyph,
                        "span": {"start": w.end - 1, "end": w.end},
                        "confidence": 0.5,
                    }
                ]
                if include_glyphs
                else []
            ),
        }
        return [word_entry, hyphen_entry]
    return [
        {
            "text": w.text,
            "kind": w.kind,
            "span": {"start": w.start, "end": w.end},
            "confidence": w.confidence,
            "subs_type": w.subs_type,
            "subs_content": w.subs_content,
            "alternatives": (
                alternatives_fn(w.text) if alternatives_fn is not None else []
            ),
            "glyphs": (
                _glyph_entries(w.text, w.start, w.confidence)
                if include_glyphs
                else []
            ),
        }
    ]


def dominant_language(lines: list["_Line"]) -> str:
    """Majority-vote script over words — the per-line/block/page
    language majority-vote fixup analog
    (``FullSegmentationGuesser.scala:277-360``). Votes: ``rtl`` (word
    would render RTL), ``latin``, else abstain; ties go to the first
    to reach the max (argMaxFirst, ``MathUtils.scala:28-34``)."""
    counts: dict[str, int] = {}
    order: list[str] = []
    for line in lines:
        for w in line.words:
            text = w.text
            if text.isascii():
                if any(c.isalpha() for c in text):
                    vote = "latin"
                else:
                    continue
            elif is_rtl_line(text):
                vote = "rtl"
            elif any(c.isalpha() and c.isascii() for c in text):
                vote = "latin"
            else:
                continue
            if vote not in counts:
                counts[vote] = 0
                order.append(vote)
            counts[vote] += 1
    if not counts:
        return ""
    best = max(counts.values())
    for vote in order:  # first-to-reach-max wins
        if counts[vote] == best:
            return vote
    return ""


def extract_turn(
    text: str,
    turn_idx: int,
    lex: Lexicon,
    alternatives_fn=None,
    *,
    simplifier=None,
    segmenter=None,
    dehyphenator=None,
    glyph_candidates_fn=None,
    other_alphabet_guessers=None,
    token_rules=None,
    include_glyphs: bool = True,
    combine_unspaced: bool = False,
    emit_hyphen_element: bool = False,
) -> dict:
    """Run the full extraction chain on one turn payload.

    Extension hooks (the reference's pluggable-service surface,
    SURVEY.md §2.10 — ``TextSimplifier`` / ``Segmenter`` /
    ``AltoTransformer.getAlternatives``):

    * ``alternatives_fn(word_text) -> list[{"purpose","content"}]`` —
      addStringAlternatives hook (``AltoTransformer.scala:62-67``).
    * ``simplifier(text) -> str`` — normalization override
      (``TextSimplifier.scala:3-9``); default ``normalize.simplify``.
    * ``segmenter(text) -> list[SegmentedBlock]`` — segmentation
      override (``Segmenter.scala:9-26``); default DOM-heuristic
      ``segmenter.segment``.
    * ``glyph_candidates_fn(word_text) -> [[(char, conf), ...]]`` —
      per-glyph classifier hook routing content through the beam
      guesser (``FullSegmentationGuesser.scala:375-396``); None (the
      default) is the identity classifier, whose beam outcome equals
      the direct lexicon scoring exactly (tests pin it), so the fast
      path skips the beam.
    * ``token_rules`` — ORDERED rewrite-rule chain applied to every
      whitespace token (each rule ``(piece, rtl) -> pieces``, folded
      left) — the AltoTransformer PartialFunction rule-list analog
      (``YiddishAltoTransformer.scala`` rule registration); default
      ``DEFAULT_TOKEN_RULES`` = (punctuation split, bidi digit
      reversal).
    * ``include_glyphs`` — emit the 5th granularity (``Glyph.scala:9``)
      under each word; ``combine_unspaced`` — merge unspaced adjacent
      words (``TextLine.combinedWords``); ``emit_hyphen_element`` —
      a trailing hyphen becomes its own ``kind="hyphen"`` element with
      a prorated span (``YiddishAltoTransformer.scala:250-352``).
    """
    # skew estimate + correction BEFORE segmentation (Deskewer order:
    # Jochre.scala preprocessing), recorded as the per-turn ``skew``
    normalized, skew = deskew((simplifier or simplify)(text or ""))
    seg_blocks = (segmenter or segment)(normalized)

    blocks_out = []
    raw_parts: list[str] = []
    processed_parts: list[str] = []
    all_lines: list[_Line] = []
    offset = 0
    log_conf_sum = 0.0
    n_words = 0
    n_lines = 0

    for bi, sblock in enumerate(seg_blocks):
        lines = [
            _Line(words=_tokenize_line(lt, token_rules)) for lt in sblock.lines
        ]
        if combine_unspaced:
            for l in lines:
                l.words = combine_unspaced_words(l.words)
        lines = [l for l in lines if l.words]
        if not lines:
            continue
        if glyph_candidates_fn is not None or other_alphabet_guessers:
            _guess_words(lines, lex, glyph_candidates_fn,
                         other_alphabet_guessers)
        _resolve_hyphenation(lines, lex, dehyphenator)
        _score_words(lines, lex)
        all_lines.extend(lines)
        if raw_parts:
            offset += 2  # "\n\n" between blocks
        block_start = offset
        block_text, offset = _render_block_raw(lines, offset)
        raw_parts.append(block_text)
        processed_parts.append(_render_block_processed(lines))

        block_id = f"TB_{turn_idx % 100000:05d}_{bi:03d}_000"
        blocks_out.append(
            {
                "id": block_id,
                "kind": sblock.kind,
                "span": {"start": block_start, "end": offset},
                "lines": [
                    {
                        "span": {"start": l.start, "end": l.end},
                        "words": [
                            entry
                            for w in l.words
                            for entry in _word_entries(
                                w,
                                include_glyphs=include_glyphs,
                                emit_hyphen_element=emit_hyphen_element,
                                alternatives_fn=alternatives_fn,
                            )
                        ],
                    }
                    for l in lines
                ],
            }
        )
        for l in lines:
            n_lines += 1
            for w in l.words:
                n_words += 1
                log_conf_sum += math.log(w.confidence)

    confidence = math.exp(log_conf_sum / n_words) if n_words else 1.0
    return {
        "extracted_text": "\n\n".join(raw_parts),
        "processed_text": "\n".join(processed_parts),
        "blocks": blocks_out,
        "confidence": confidence,
        "lang": dominant_language(all_lines),
        "skew": skew,
        "n_blocks": len(blocks_out),
        "n_lines": n_lines,
        "n_words": n_words,
    }
