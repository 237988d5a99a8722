"""Payload decoding pre-stage — the PDFToImageConverter analog.

Reference: ``core/pdf/PDFToImageConverter.scala:18-75`` turns the raw
input artifact (PDF) into the unit the pipeline processes (page
images), with start/end-page slicing. For transcripts the raw payload
may arrive wrapped: base64-encoded text (``base64:`` prefix) or a tool
turn whose ``text`` is a JSON envelope carrying the real output under
an ``output`` key. This stateless ``map_batches`` stage unwraps those
deterministically so the extraction stage always sees plain payloads.

Also provides ``render_alto_column`` — the OutputFormat.Alto4 sink
stage (adds an ``alto_xml`` column from the nested blocks).
"""

from __future__ import annotations

import base64
import binascii
import json

import pyarrow as pa


def _decode_one(text: str, role: str) -> str:
    if text.startswith("base64:"):
        try:
            return base64.b64decode(text[7:], validate=True).decode(
                "utf-8", errors="replace"
            )
        except (binascii.Error, ValueError):
            return text  # not actually base64: pass through untouched
    if role == "tool" and text.startswith("{"):
        try:
            payload = json.loads(text)
        except json.JSONDecodeError:
            return text
        if isinstance(payload, dict) and isinstance(payload.get("output"), str):
            return payload["output"]
    return text


def decode_payloads(batch: pa.Table) -> pa.Table:
    """Unwrap encoded payloads; all other columns pass through."""
    texts = batch["text"].to_pylist()
    roles = batch["role"].to_pylist()
    decoded = [_decode_one(t or "", r) for t, r in zip(texts, roles)]
    idx = batch.schema.get_field_index("text")
    return batch.set_column(idx, "text", pa.array(decoded, type=pa.string()))


def render_alto_column(batch: pa.Table) -> pa.Table:
    """Append an ``alto_xml`` column rendered from the nested blocks
    (the OutputFormat.Alto4 renderer as a stage)."""
    from ..functions.render_alto import render_alto

    conv_ids = batch["conv_id"].to_pylist()
    turn_idxs = batch["turn_idx"].to_pylist()
    blocks_col = batch["blocks"].to_pylist()
    confs = batch["confidence"].to_pylist()
    xmls = [
        render_alto(f"{cid}_{tid}", blocks or [], conf)
        for cid, tid, blocks, conf in zip(conv_ids, turn_idxs, blocks_col, confs)
    ]
    return batch.append_column("alto_xml", pa.array(xmls, type=pa.string()))
