"""Ray Data extraction stage — the actor-pool ``map_batches`` kernel.

The analog of jochre3-ocr's per-page model stack (``YoloPredictor`` +
``GlyphGuesser`` + ``Lexicon`` singletons built once by the ZLayer DI
graph, reference ``modules/yiddish/.../JochreYiddishFull.scala:34-99``):
state (lexicon set, compiled regex tables) is constructed ONCE per
actor in ``__init__``; ``__call__`` processes one zero-copy Arrow
batch of turns and emits the nested extraction schema.

Usage::

    ds.map_batches(ExtractTurns, batch_format="pyarrow",
                   batch_size=512, concurrency=(2, 8), num_cpus=1)

``extract_turns_batch`` is the stateless-task variant (process-global
lexicon): same semantics, no actor-pool startup cost — appropriate
because this particular stage's state is a wordlist, not a model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import crc_bucket

# Number of conv-hash output buckets. Sizing rule at scale: buckets ≈
# corpus_size / target_partition_size (a few GB per bucket) and at
# least a few × total cores — at 100 TB that is tens of thousands;
# here sized for a 32-CPU node. A single conversation larger than a
# bucket's memory budget needs the salted Dataset assembly instead
# (stages/assemble.py::assemble_conversations).
ASSEMBLY_BUCKETS = int(__import__("os").environ.get("GRAFT_ASSEMBLY_BUCKETS", "32"))

from ..functions.extract import extract_turn
from ..functions.lexicon import Lexicon
from ..schema import BLOCKS_TYPE, PIPELINE_VERSION


def _apply(
    batch: pa.Table,
    lexicon: Lexicon,
    include_blocks: bool,
    alternatives_fn=None,
    include_glyphs: bool = False,
    glyph_candidates_fn=None,
    token_rules=None,
) -> pa.Table:
    texts = batch.column("text").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    results = [
        extract_turn(
            text,
            idx,
            lexicon,
            alternatives_fn,
            include_glyphs=include_blocks and include_glyphs,
            glyph_candidates_fn=glyph_candidates_fn,
            token_rules=token_rules,
        )
        for text, idx in zip(texts, turn_idxs)
    ]

    columns: dict[str, pa.Array] = {
        "conv_id": batch.column("conv_id"),
        "turn_idx": batch.column("turn_idx"),
        "role": batch.column("role"),
        "tool": batch.column("tool"),
        "ts": batch.column("ts"),
        "extracted_text": pa.array(
            [r["extracted_text"] for r in results], type=pa.string()
        ),
        "processed_text": pa.array(
            [r["processed_text"] for r in results], type=pa.string()
        ),
    }
    if include_blocks:
        columns["blocks"] = pa.array([r["blocks"] for r in results], type=BLOCKS_TYPE)
    columns["confidence"] = pa.array(
        np.array([r["confidence"] for r in results], dtype=np.float64)
    )
    columns["lang"] = pa.array([r["lang"] for r in results], type=pa.string())
    columns["skew"] = pa.array(
        np.array([r["skew"] for r in results], dtype=np.float64)
    )
    for key in ("n_blocks", "n_lines", "n_words"):
        columns[key] = pa.array(np.array([r[key] for r in results], dtype=np.int32))
    columns["pipeline_version"] = pa.array(
        [PIPELINE_VERSION] * len(results), type=pa.string()
    )
    # conv-hash bucket: the conversation-assembly "shuffle" is folded
    # into the extraction WRITE (write_parquet partition_cols=["bucket"])
    # so assembly reads co-located buckets with no Ray sort at all.
    # crc_bucket = crc32(conv_id) % B with one hash per DISTINCT conv
    # (bit-identical to the historic per-row loop — persisted layouts
    # stay valid)
    columns["bucket"] = pa.array(
        crc_bucket(batch.column("conv_id").to_pylist(), ASSEMBLY_BUCKETS)
    )
    return pa.table(columns)


class ExtractTurns:
    """Callable-class stage: layered extraction over a turn batch."""

    def __init__(
        self,
        lexicon_path: str | None = None,
        include_blocks: bool = True,
        include_alternatives: bool = False,
        include_glyphs: bool = False,
        glyph_candidates_fn=None,
        token_rules=None,
    ):
        # once per actor: lexicon load + (module-level) regex compilation
        # + transliteration tables (the GlyphGuesser/Lexicon singleton
        # pattern)
        self.lexicon = Lexicon.load(lexicon_path)
        self.include_blocks = include_blocks
        self.include_glyphs = include_glyphs
        self.glyph_candidates_fn = glyph_candidates_fn
        self.token_rules = token_rules
        if include_alternatives:
            from ..functions.alternatives import build_alternatives
            from ..functions.transliterate import Transliterator

            translit = Transliterator()
            self.alternatives_fn = lambda w: build_alternatives(w, translit)
        else:
            self.alternatives_fn = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _apply(
            batch,
            self.lexicon,
            self.include_blocks,
            self.alternatives_fn,
            include_glyphs=self.include_glyphs,
            glyph_candidates_fn=self.glyph_candidates_fn,
            token_rules=self.token_rules,
        )


_PROCESS_LEXICON: Lexicon | None = None


def _process_lexicon() -> Lexicon:
    global _PROCESS_LEXICON
    if _PROCESS_LEXICON is None:
        _PROCESS_LEXICON = Lexicon.load()
    return _PROCESS_LEXICON


def extract_turns_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant (same semantics as ``ExtractTurns``)."""
    return _apply(batch, _process_lexicon(), True)


def extract_turns_batch_no_blocks(batch: pa.Table) -> pa.Table:
    """Stateless-task variant with the nested column projected out
    (the glyphRemover analog, ``AltoTransformer.scala:80-82``)."""
    return _apply(batch, _process_lexicon(), False)
