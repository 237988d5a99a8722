"""Flagship extraction + assembly queries over driver testdata.

The driver's sf dirs have no transcript-shaped table, so one is
**derived deterministically** from ``documents`` (pure arithmetic on
``doc_id`` — reproducible in ANSI SQL, so the extraction and the
conversation-assembly shuffle get REAL DuckDB oracles):

    conv_id  = 'conv' || lpad(doc_id % 100, 6, '0')
    turn_idx = doc_id // 100
    role     = cycle(user/assistant/tool/system) by doc_id % 4
    text     = documents.text

On this corpus (plain single-line ASCII payloads) the reference
extraction semantics reduce to whitespace collapse, which the oracle
expresses exactly; the full semantics (markup, hyphenation, RTL,
geometry) are pinned by the pytest oracle suite on the synthetic
fixture corpus instead (tests/test_pipeline.py).
"""

from __future__ import annotations

import pyarrow as pa


import ray.data

from ..pipelines.extract import build_extraction
from ..stages.assemble import assemble_conversations

N_CONVS = 100

_BASE_TS = "2026-01-01T00:00:00"
_ROLES = ["user", "assistant", "tool", "system"]


def derive_transcripts(sf_dir: str) -> "ray.data.Dataset":
    """documents -> transcript-shaped Dataset (input_hint schema).

    ``override_num_blocks``: a single parquet file otherwise becomes
    ONE block and every downstream ``map_batches`` runs as ONE task —
    ``batch_size`` splits compute batches, not scheduling units
    (measured: serial extraction at sf0.1 cost ~14 s vs ~3 s split)."""
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    # measured at sf0.1/32cpu: 1 block 5.1s, 8 blocks 3.5s, 32 blocks
    # 3.8s (per-task overhead) — grow with cluster size but modestly
    from ..sources.reader import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=max(8, cpus // 4),
    )

    def to_turns(batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_id = batch["doc_id"].to_numpy()
        conv_num = doc_id % N_CONVS
        conv_id = pa.array([f"conv{c:06d}" for c in conv_num], type=pa.string())
        turn_idx = pa.array((doc_id // N_CONVS).astype(np.int32))
        roles = pa.array(
            [_ROLES[i] for i in doc_id % len(_ROLES)], type=pa.string()
        )
        base = np.datetime64(_BASE_TS, "us")
        ts = pa.array(base + doc_id.astype("timedelta64[s]").astype("timedelta64[us]"))
        return pa.table(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": roles,
                "text": batch["text"],
                "tool": pa.array([""] * len(batch), type=pa.string()),
                "ts": ts,
            }
        )

    # batch_size=None: whole blocks. A row-count batch_size here makes
    # the fused downstream chain BUNDLE input blocks until it is met —
    # at test scale 65536 swallowed all 8 read blocks into ONE task and
    # serialized the entire extraction (measured 1 task vs 8).
    return docs.map_batches(to_turns, batch_format="pyarrow", batch_size=None)


def q_extract_turns(sf_dir: str) -> pa.Table:
    """Per-turn extraction over the derived transcripts."""
    turns = derive_transcripts(sf_dir)
    extracted = build_extraction(turns, include_blocks=False)
    out = extracted.select_columns(
        ["conv_id", "turn_idx", "extracted_text", "processed_text",
         "n_blocks", "n_lines", "n_words"]
    )
    return out


_DERIVE_SQL = f"""
  SELECT 'conv' || LPAD(CAST(doc_id % {N_CONVS} AS VARCHAR), 6, '0') AS conv_id,
         CAST(doc_id // {N_CONVS} AS INT) AS turn_idx,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN ''
              ELSE REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g') END AS extracted_text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END
              AS n_words
  FROM documents
"""

Q_EXTRACT_TURNS_SQL = f"""
WITH t AS ({_DERIVE_SQL})
SELECT conv_id, turn_idx, extracted_text,
       extracted_text AS processed_text,
       CASE WHEN n_words = 0 THEN 0 ELSE 1 END AS n_blocks,
       CASE WHEN n_words = 0 THEN 0 ELSE 1 END AS n_lines,
       n_words
FROM t
"""


def q_assemble_conversations(sf_dir: str) -> pa.Table:
    """Conversation documents: the groupby(conv_id) + turn_idx-sort
    shuffle, oracle-checked via STRING_AGG(... ORDER BY turn_idx).

    Runs on the raw-task EXCHANGE assembly tier (one all-to-all over
    conv-hash partitions, vectorized per-partition assembly) — the
    salted two-phase and global-sort Dataset strategies produce
    identical output (equality test-pinned) but each pay multi-second
    Dataset-shuffle fixed costs."""
    from ..stages.assemble import assemble_conversations_exchange

    turns = derive_transcripts(sf_dir)
    extracted = build_extraction(turns, include_blocks=False)
    convs = assemble_conversations_exchange(extracted)
    return pa.Table.from_pandas(
        convs[
            ["conv_id", "n_turns", "n_words", "conversation_text",
             "processed_conversation_text"]
        ],
        preserve_index=False,
    )


def q_glyph_stats(sf_dir: str) -> pa.Table:
    """Glyph-level extraction end-to-end: run the FULL pipeline with
    blocks+glyphs (the 5-level hierarchy, ``Glyph.scala:9`` +
    ``FullYoloSegmenter.scala:148-182`` tiling), then count glyphs by
    walking the nested block/line/word/glyph structure. On this ASCII
    corpus every glyph is one non-whitespace character of
    ``extracted_text`` — which is exactly what the SQL oracle counts,
    so the nested structure itself is hash-checked."""
    turns = derive_transcripts(sf_dir)
    extracted = build_extraction(turns, include_blocks=True, include_glyphs=True)

    def stats(batch: pa.Table) -> pa.Table:
        n_glyphs = []
        for blocks in batch["blocks"].to_pylist():
            total = 0
            for block in blocks or []:
                for line in block["lines"]:
                    for word in line["words"]:
                        total += len(word["glyphs"])
            n_glyphs.append(total)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "n_words": pa.compute.cast(batch["n_words"], pa.int32()),
                "n_glyphs": pa.array(n_glyphs, type=pa.int64()),
            }
        )

    return extracted.map_batches(stats, batch_format="pyarrow")


Q_GLYPH_STATS_SQL = f"""
WITH t AS ({_DERIVE_SQL})
SELECT conv_id, turn_idx, n_words,
       CAST(LENGTH(REGEXP_REPLACE(extracted_text, '\\s', '', 'g')) AS BIGINT)
         AS n_glyphs
FROM t
"""


Q_ASSEMBLE_CONVERSATIONS_SQL = f"""
WITH t AS ({_DERIVE_SQL})
SELECT conv_id,
       COUNT(*)                        AS n_turns,
       CAST(SUM(n_words) AS BIGINT)    AS n_words,
       STRING_AGG(extracted_text, chr(10) || chr(10) ORDER BY turn_idx)
         AS conversation_text,
       STRING_AGG(extracted_text, chr(10) || chr(10) ORDER BY turn_idx)
         AS processed_conversation_text
FROM t
GROUP BY conv_id
"""
