"""Deterministic synthetic transcript corpus (FIXTURES.md families).

The sandbox testdata has no transcript-shaped table, so tests and
benchmarks synthesize one — seeded, self-contained, no external data
(BASELINE.json ``input_hint`` schema: conv_id, turn_idx, role, text,
tool, ts). Rows are written **shuffled** on disk to exercise the
``groupby(conv_id)`` + in-group ``turn_idx`` sort (the stable-turn-
ordering invariant), and conversation sizes are Zipf-skewed with a hot
head conversation to exercise skew handling.

Payload families mirror the reference's fixture corpus (SURVEY.md §5 /
FIXTURES.md §3): plain paragraphs, boilerplate-wrapped markup,
hyphenated line breaks, punctuation-glued tokens, RTL runs with
numbers, denormalized unicode, positioned/overlapping blocks, empties.
The family vocabulary is drawn from the same lexicon artifact the
pipeline loads, so known/unknown-word confidence classes are exercised.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.lexicon import Lexicon
from ..schema import TRANSCRIPT_SCHEMA

CORPUS_VERSION = 2  # bump when payload families change (cache key)

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "browser", "python", "calculator"]
_UNKNOWN_WORDS = ["flurbix", "zanthor", "quibblet", "morpholk", "traxide"]
_RTL_WORDS = ["שלום", "עולם", "ספר", "בית", "מים"]
_BASE_TS = datetime(2026, 1, 1)


def _sentence(rng: random.Random, vocab: list[str], n: int) -> str:
    return " ".join(rng.choice(vocab) for _ in range(n))


def _payload(rng: random.Random, vocab: list[str]) -> str:
    family = rng.random()
    if family < 0.40:  # plain: 1-4 paragraphs of 1-3 lines
        paras = []
        for _ in range(rng.randint(1, 4)):
            lines = [
                _sentence(rng, vocab, rng.randint(3, 10)) + rng.choice([".", "!", "?", ""])
                for _ in range(rng.randint(1, 3))
            ]
            paras.append("\n".join(lines))
        return "\n\n".join(paras)
    if family < 0.55:  # boilerplate-wrapped markup
        body = _sentence(rng, vocab, rng.randint(6, 20)) + "."
        links = " ".join(
            f'<a href="/{w}">{w}</a>' for w in rng.sample(vocab, rng.randint(2, 4))
        )
        return (
            f"<html><nav>{links}</nav><header><h1>{rng.choice(vocab)}</h1></header>"
            f"<div>{body}</div>"
            f'<div>{links} {rng.choice(vocab)}</div>'
            f"<footer>contact {rng.choice(vocab)}</footer></html>"
        )
    if family < 0.65:  # hyphenated line break
        w1, w2 = rng.choice(["data base", "note book", "super market", "over lap",
                             "bench mark", "small batch", "fast join"]).split()
        pre = _sentence(rng, vocab, rng.randint(2, 5))
        post = _sentence(rng, vocab, rng.randint(2, 5))
        return f"{pre} {w1}-\n{w2} {post}"
    if family < 0.73:  # punctuation-glued tokens (guards incl.)
        return (
            f"{_sentence(rng, vocab, 3)}, ({rng.choice(vocab)}) costs 1.5 "
            f"w'w {rng.choice(vocab)}!!! end."
        )
    if family < 0.78:  # RTL with digit runs
        words = [rng.choice(_RTL_WORDS) for _ in range(rng.randint(3, 6))]
        words.insert(rng.randint(0, len(words)), str(rng.randint(10, 9999)))
        words.insert(rng.randint(0, len(words)), "3.14")
        return " ".join(words)
    if family < 0.85:  # denormalized unicode
        return (
            f"“{_sentence(rng, vocab, 3)}” — {rng.choice(vocab)}… "
            f",,{rng.choice(vocab)}''   {rng.choice(vocab)}"
        )
    if family < 0.88:  # empties / edge cases
        return rng.choice(["", "   ", "\n\n", "x", "<div></div>", "word"])
    if family < 0.90:  # positioned blocks (geometry path, shuffled order)
        texts = [_sentence(rng, vocab, 3) for _ in range(3)]
        tops = [0, 40, 80]
        rng.shuffle(tops)
        parts = [
            f'<div style="top:{t}px;left:0px;width:200px;height:20px">{txt}</div>'
            for t, txt in zip(tops, texts)
        ]
        return "".join(parts)
    if family < 0.92:  # two-column layout: reading order != document order
        # (the BlockSorter vertical-overlap case: columns side by side)
        left = [_sentence(rng, vocab, 3) for _ in range(2)]
        right = [_sentence(rng, vocab, 3) for _ in range(2)]
        parts = []
        # emit right column first on "disk"; reading order must put the
        # left column first (LTR)
        for i, txt in enumerate(right):
            parts.append(
                f'<div style="top:{i*120}px;left:300px;width:200px;height:100px">{txt}</div>'
            )
        for i, txt in enumerate(left):
            parts.append(
                f'<div style="top:{i*120}px;left:0px;width:200px;height:100px">{txt}</div>'
            )
        return "".join(parts)
    # mixed known/unknown words (confidence classes)
    mixed = [rng.choice(vocab), rng.choice(_UNKNOWN_WORDS), "abc123", rng.choice(vocab)]
    rng.shuffle(mixed)
    return " ".join(mixed)


def _conv_sizes(n_turns: int, rng: random.Random) -> list[int]:
    """Zipf-skewed conversation sizes summing to n_turns (hot head conv)."""
    sizes: list[int] = []
    remaining = n_turns
    rank = 1
    while remaining > 0:
        size = max(1, min(remaining, int(n_turns * 0.05 / rank) + rng.randint(1, 8)))
        sizes.append(size)
        remaining -= size
        rank += 1
    return sizes


def generate_transcripts(
    n_turns: int,
    out_dir: str | Path,
    seed: int = 42,
    num_files: int = 8,
) -> Path:
    """Write a shuffled transcript corpus as ``num_files`` parquet files.

    Deterministic in (n_turns, seed, num_files). Returns ``out_dir``.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(seed)
    vocab = sorted(Lexicon.load().words)

    sizes = _conv_sizes(n_turns, rng)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[datetime] = []
    for c, size in enumerate(sizes):
        cid = f"conv{c:06d}"
        for t in range(size):
            trng = random.Random((seed, c, t).__hash__())
            role = _ROLES[t % len(_ROLES)] if size > 3 else trng.choice(_ROLES)
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(_payload(trng, vocab))
            tools.append(trng.choice(_TOOLS) if role == "tool" else "")
            tss.append(_BASE_TS + timedelta(minutes=c, seconds=t))

    # global deterministic shuffle so on-disk order != turn order
    perm = np.random.RandomState(seed).permutation(len(conv_ids))
    table = pa.table(
        {
            "conv_id": np.array(conv_ids, dtype=object)[perm],
            "turn_idx": np.array(turn_idxs, dtype=np.int32)[perm],
            "role": np.array(roles, dtype=object)[perm],
            "text": np.array(texts, dtype=object)[perm],
            "tool": np.array(tools, dtype=object)[perm],
            "ts": np.array([tss[i] for i in perm], dtype="datetime64[us]"),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    rows_per_file = (len(conv_ids) + num_files - 1) // num_files
    for f in range(num_files):
        chunk = table.slice(f * rows_per_file, rows_per_file)
        if chunk.num_rows:
            pq.write_table(chunk, out / f"transcripts_{f:04d}.parquet")
    return out


def cached_corpus(n_turns: int, seed: int = 42, root: str = "/tmp/jochre3_corpus") -> Path:
    """Generate-once cache keyed by (n_turns, seed, corpus version)."""
    out = Path(root) / f"n{n_turns}_s{seed}_v{CORPUS_VERSION}"
    marker = out / "_COMPLETE"
    if not marker.exists():
        generate_transcripts(n_turns, out, seed=seed)
        marker.write_text("ok")
    return out
