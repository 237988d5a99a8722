"""Adjacent-glyph merge rules — the YiddishCorpusTransformer analog.

Reference: ``yiddish/corpus/YiddishCorpusTransformer.scala:41-84`` —
an ALTO-tree transform folding each word's glyphs left, merging an
adjacent pair into one ligature glyph when a configured rule matches
(pasekh-tsvey-yudn, tsvey-yudn, yud-khirik-yud, tsvey-vovn): the
merged glyph takes the LIGATURE content, the UNION of both
rectangles, and confidence 1.0. Rules apply in configuration order,
first match wins; the fold continues over the merged result, so runs
like vov-vov-vov collapse pairwise left-to-right exactly as the
reference fold does.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


@dataclass(frozen=True)
class GlyphMergeRule:
    """Merge ``prev`` + (current in ``current``) -> ``merged``."""

    name: str
    prev: str
    current: frozenset
    merged: str


def yiddish_merge_rules(
    *,
    pasekh_tsvey_yudn: bool = True,
    tsvey_yudn: bool = True,
    yud_khirik_yud: bool = True,
    tsvey_vovn: bool = True,
) -> list[GlyphMergeRule]:
    """The four configurable rules of
    ``YiddishCorpusTransformer.scala:26-84`` in their reference
    precedence order."""
    rules = []
    if pasekh_tsvey_yudn:
        rules.append(
            GlyphMergeRule("pasekh-tsvey-yudn", "י", frozenset({"יַ"}), "ײַ")
        )
    if tsvey_yudn:
        rules.append(
            GlyphMergeRule(
                "tsvey-yudn", "י",
                frozenset({"י", "יָ", "יַ", "יֵ", "יֶ"}), "ײ",
            )
        )
    if yud_khirik_yud:
        rules.append(
            GlyphMergeRule("yud-khirik-yud", "י", frozenset({"יִ"}), "ייִ")
        )
    if tsvey_vovn:
        rules.append(
            GlyphMergeRule(
                "tsvey-vovn", "ו",
                frozenset({"ו", "וִ", "וַ", "וָ", "וֶ", "וֵ", "וְ"}), "װ",
            )
        )
    return rules


def merge_word_glyphs(
    glyphs: list[dict], rules: list[GlyphMergeRule]
) -> tuple[list[dict], bool]:
    """Left fold over one word's glyphs; returns (new_glyphs,
    something_changed) — the ``foldLeft`` of
    ``YiddishCorpusTransformer.scala:41-84``. Spans union (the
    ``rectangle.union`` analog); merged confidence is 1.0."""
    out: list[dict] = []
    changed = False
    for g in glyphs:
        rule = None
        if out:
            last = out[-1]
            for r in rules:
                if last["text"] == r.prev and g["text"] in r.current:
                    rule = r
                    break
        if rule is None:
            out.append(dict(g))
            continue
        last = out[-1]
        out[-1] = {
            "text": rule.merged,
            "span": {
                "start": min(last["span"]["start"], g["span"]["start"]),
                "end": max(last["span"]["end"], g["span"]["end"]),
            },
            "confidence": 1.0,
        }
        changed = True
    return out, changed


def transform_blocks(
    blocks: list[dict], rules: list[GlyphMergeRule]
) -> tuple[list[dict], bool]:
    """Apply the merge fold to every word of a page's nested structure
    (the ``alto.transform { case word: Word => ... }`` walk). Returns
    a new structure; input is not mutated."""
    changed_any = False
    out = []
    for block in blocks or []:
        nb = dict(block)
        nb["lines"] = []
        for line in block["lines"]:
            nl = dict(line)
            nl["words"] = []
            for word in line["words"]:
                nw = dict(word)
                if word.get("glyphs"):
                    merged, changed = merge_word_glyphs(word["glyphs"], rules)
                    nw["glyphs"] = merged
                    if changed:
                        # The reference rewrites the word content from the
                        # merged glyphs (YiddishCorpusTransformer.scala:83-85:
                        # word.content = newGlyphs.map(_.content).mkString) so
                        # ALTO rendering stays consistent with the glyph row.
                        nw["text"] = "".join(g["text"] for g in merged)
                    changed_any = changed_any or changed
                nl["words"].append(nw)
            nb["lines"].append(nl)
        out.append(nb)
    return out, changed_any


def apply_glyph_merge(
    extracted: "object", rules: list[GlyphMergeRule] | None = None
):
    """Dataset stage: rewrite the ``blocks`` column through the merge
    rules (typed back to ``BLOCKS_TYPE`` so downstream stages keep the
    Arrow schema)."""
    from ..schema import BLOCKS_TYPE

    if rules is None:
        rules = yiddish_merge_rules()

    def run(batch: pa.Table) -> pa.Table:
        new_blocks = [
            transform_blocks(blocks, rules)[0]
            for blocks in batch["blocks"].to_pylist()
        ]
        idx = batch.schema.get_field_index("blocks")
        return batch.set_column(
            idx, "blocks", pa.array(new_blocks, type=BLOCKS_TYPE)
        )

    return extracted.map_batches(run, batch_format="pyarrow")
