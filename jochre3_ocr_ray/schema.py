"""Arrow schemas — declared once, validated/emitted by every stage.

The reference's fixed case-class schema (``Alto``/``Page``/``TextBlock``
tree, ``modules/core/src/main/scala/.../model/*.scala``) maps to
explicit ``pyarrow`` types: one input row per transcript turn, one
output row per extracted turn with the block/line/word hierarchy as
nested list<struct> columns (never Python object dtype — nested
columns stay in ``batch_format="pyarrow"`` end to end).
"""

from __future__ import annotations

import pyarrow as pa

# ---- input: one row = one transcript turn (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ---- nested extraction structure (FIXTURES.md §2; ALTO-tree analog)
SPAN_TYPE = pa.struct([pa.field("start", pa.int64()), pa.field("end", pa.int64())])

ALTERNATIVE_TYPE = pa.struct(
    [pa.field("purpose", pa.string()), pa.field("content", pa.string())]
)

# the 5th granularity (Glyph.scala:9): one entry per user-perceived
# character; span subdivides the word span (the text-exact analog of
# FullYoloSegmenter.scala:148-182 glyph tiling — inter-glyph borders
# are character boundaries)
GLYPH_TYPE = pa.struct(
    [
        pa.field("text", pa.string()),
        pa.field("span", SPAN_TYPE),
        pa.field("confidence", pa.float32()),
    ]
)

WORD_TYPE = pa.struct(
    [
        pa.field("text", pa.string()),
        # "word" | "hyphen" — Hyphen is a distinct ALTO element in the
        # reference (YiddishAltoTransformer.scala:250-352)
        pa.field("kind", pa.string()),
        pa.field("span", SPAN_TYPE),
        pa.field("confidence", pa.float32()),
        pa.field("subs_type", pa.string()),
        pa.field("subs_content", pa.string()),
        pa.field("alternatives", pa.list_(ALTERNATIVE_TYPE)),
        pa.field("glyphs", pa.list_(GLYPH_TYPE)),
    ]
)

LINE_TYPE = pa.struct(
    [
        pa.field("span", SPAN_TYPE),
        pa.field("words", pa.list_(WORD_TYPE)),
    ]
)

BLOCK_TYPE = pa.struct(
    [
        pa.field("id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("span", SPAN_TYPE),
        pa.field("lines", pa.list_(LINE_TYPE)),
    ]
)

BLOCKS_TYPE = pa.list_(BLOCK_TYPE)

# ---- output: one row per extracted turn
EXTRACTION_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("extracted_text", pa.string()),
        pa.field("processed_text", pa.string()),
        pa.field("blocks", BLOCKS_TYPE),
        pa.field("confidence", pa.float64()),
        pa.field("lang", pa.string()),
        pa.field("skew", pa.float64()),
        pa.field("n_blocks", pa.int32()),
        pa.field("n_lines", pa.int32()),
        pa.field("n_words", pa.int32()),
        pa.field("pipeline_version", pa.string()),
    ]
)

# ---- per-conversation assembled document (Alto.content analog)
CONVERSATION_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int32()),
        pa.field("n_words", pa.int64()),
        pa.field("conversation_text", pa.string()),
        pa.field("processed_conversation_text", pa.string()),
        pa.field("confidence", pa.float64()),
    ]
)

# Bump on ANY output-schema or extraction-semantics change: lineage
# resume (state/lineage.py) skips shards only when the committed
# manifest's version AND schema fingerprint both match, so a stale
# bump would let a resumed run mix old- and new-schema shards.
# 0.2.0: added top-level `skew` column; WORD_TYPE gained `kind` and
# `glyphs` (round-2 additions that shipped without a bump — ADVICE r2).
PIPELINE_VERSION = "jochre3-ocr-ray/0.2.0"


def schema_fingerprint(schema: pa.Schema = EXTRACTION_SCHEMA) -> str:
    """Stable content hash of an output schema — belt-and-braces next
    to PIPELINE_VERSION in shard manifests, so a forgotten version bump
    cannot silently accept old-schema shards on resume."""
    import hashlib

    return hashlib.md5(str(schema).encode("utf-8")).hexdigest()[:16]
