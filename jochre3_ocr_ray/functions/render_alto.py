"""ALTO-style XML rendering + parsing — the OutputFormat round trip.

Reference: ``core/output/OutputFormat.scala:14-42`` (Alto4 / Text /
ProcessedText renderers) and ``Alto.fromXML`` / ``Page.fromXML``
(``core/model/Alto.scala:42-72``, ``Page.scala:244-291``) — every node
serializes to XML and parses back.

Here one *turn* plays the page: its block/line/word hierarchy renders
to an ALTO-4-shaped XML string (``TextBlock`` / ``TextLine`` /
``String`` elements with char-offset spans standing in for pixel
rectangles: HPOS=start, WIDTH=end-start), and ``parse_alto`` recovers
the structure — round-trip tested. Rendering runs as a stateless
``map_batches`` column producer; the parser is the re-ingestion path
(read old outputs back into the engine).
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr


def _render_styles(text_styles: list[dict]) -> str:
    """<Styles> section — the ``TextStyle`` model
    (``core/model/TextStyle.scala``; ``Alto.scala:27`` emits the
    section): ID required, FONTFAMILY / FONTTYPE / FONTWIDTH optional
    strings, FONTSIZE optional double rendered ``%.1f``."""
    parts = ["<Styles>"]
    for s in text_styles:
        attrs = [f"ID={quoteattr(s['id'])}"]
        for key, attr in (
            ("font_family", "FONTFAMILY"),
            ("font_type", "FONTTYPE"),
            ("font_width", "FONTWIDTH"),
        ):
            if s.get(key):
                attrs.append(f"{attr}={quoteattr(s[key])}")
        if s.get("font_size") is not None:
            attrs.append(f"FONTSIZE={quoteattr('%.1f' % s['font_size'])}")
        parts.append(f"<TextStyle {' '.join(attrs)}/>")
    parts.append("</Styles>")
    return "".join(parts)


def _render_tags(tags: list[dict]) -> str:
    """<Tags> section — ``LayoutTag`` / ``StructureTag``
    (``core/model/LayoutTag.scala``, ``StructureTag.scala``): each is
    (kind, ID, LABEL)."""
    parts = ["<Tags>"]
    for t in tags:
        elem = "LayoutTag" if t["kind"] == "layout" else "StructureTag"
        parts.append(
            f"<{elem} ID={quoteattr(t['id'])} LABEL={quoteattr(t['label'])}/>"
        )
    parts.append("</Tags>")
    return "".join(parts)


def render_alto(
    turn_id: str,
    blocks: list[dict],
    confidence: float,
    text_styles: list[dict] | None = None,
    tags: list[dict] | None = None,
) -> str:
    """Serialize one turn's extraction tree to ALTO-shaped XML.
    ``text_styles`` / ``tags`` add the declared ALTO-4 <Styles> and
    <Tags> sections (``Alto.scala:9-10,27-28``) when non-empty."""
    parts = [
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v4#">',
        f"<Page ID={quoteattr(turn_id)} PC={quoteattr(f'{confidence:.6f}')}>",
        "<PrintSpace>",
    ]
    for block in blocks:
        parts.append(
            f"<TextBlock ID={quoteattr(block['id'])} "
            f"HPOS={quoteattr(str(block['span']['start']))} "
            f"WIDTH={quoteattr(str(block['span']['end'] - block['span']['start']))}>"
        )
        for line in block["lines"]:
            parts.append(
                f"<TextLine HPOS={quoteattr(str(line['span']['start']))} "
                f"WIDTH={quoteattr(str(line['span']['end'] - line['span']['start']))}>"
            )
            for w in line["words"]:
                wc = "%.4f" % w["confidence"]
                if w.get("kind") == "hyphen":
                    # distinct Hyphen element (Hyphen.scala / ALTO HYP)
                    parts.append(
                        f"<HYP CONTENT={quoteattr(w['text'])} "
                        f"HPOS={quoteattr(str(w['span']['start']))} "
                        f"WIDTH={quoteattr(str(w['span']['end'] - w['span']['start']))}/>"
                    )
                    continue
                attrs = [
                    f"CONTENT={quoteattr(w['text'])}",
                    f"HPOS={quoteattr(str(w['span']['start']))}",
                    f"WIDTH={quoteattr(str(w['span']['end'] - w['span']['start']))}",
                    f"WC={quoteattr(wc)}",
                ]
                if w.get("subs_type"):
                    attrs.append(f"SUBS_TYPE={quoteattr(w['subs_type'])}")
                    attrs.append(f"SUBS_CONTENT={quoteattr(w['subs_content'])}")
                glyphs = w.get("glyphs") or []
                if glyphs:
                    inner = "".join(
                        f"<Glyph CONTENT={quoteattr(g['text'])} "
                        f"HPOS={quoteattr(str(g['span']['start']))} "
                        f"WIDTH={quoteattr(str(g['span']['end'] - g['span']['start']))} "
                        f"GC={quoteattr('%.2f' % g['confidence'])}/>"
                        for g in glyphs
                    )
                    parts.append(f"<String {' '.join(attrs)}>{inner}</String>")
                else:
                    parts.append(f"<String {' '.join(attrs)}/>")
            parts.append("</TextLine>")
        parts.append("</TextBlock>")
    parts.append("</PrintSpace></Page>")
    if text_styles:
        parts.append(_render_styles(text_styles))
    if tags:
        parts.append(_render_tags(tags))
    parts.append("</alto>")
    return "".join(parts)


def parse_alto(xml: str) -> dict:
    """Parse ALTO-shaped XML back to {id, confidence, blocks} (the
    ``Alto.fromXML`` analog). Uses stdlib ElementTree."""
    import xml.etree.ElementTree as ET

    ns = {"a": "http://www.loc.gov/standards/alto/ns-v4#"}
    root = ET.fromstring(xml)
    page = root.find("a:Page", ns)
    blocks = []
    for tb in page.iter("{http://www.loc.gov/standards/alto/ns-v4#}TextBlock"):
        start = int(tb.get("HPOS"))
        block = {
            "id": tb.get("ID"),
            "kind": "text",
            "span": {"start": start, "end": start + int(tb.get("WIDTH"))},
            "lines": [],
        }
        for tl in tb.iter("{http://www.loc.gov/standards/alto/ns-v4#}TextLine"):
            lstart = int(tl.get("HPOS"))
            line = {
                "span": {"start": lstart, "end": lstart + int(tl.get("WIDTH"))},
                "words": [],
            }
            for st in tl:
                tag = st.tag.split("}", 1)[-1]
                wstart = int(st.get("HPOS"))
                if tag == "HYP":
                    hspan = {"start": wstart, "end": wstart + int(st.get("WIDTH"))}
                    line["words"].append(
                        {
                            "text": st.get("CONTENT"),
                            "kind": "hyphen",
                            "span": hspan,
                            "confidence": 1.0,
                            "subs_type": "",
                            "subs_content": "",
                            # the hyphen glyph is definitionally scored
                            # 0.5 (Word.combineWith(hyphen)) — ALTO HYP
                            # carries no children, so reconstruct it
                            "glyphs": [
                                {
                                    "text": st.get("CONTENT"),
                                    "span": dict(hspan),
                                    "confidence": 0.5,
                                }
                            ],
                        }
                    )
                    continue
                if tag != "String":
                    continue
                glyphs = []
                for g in st.iter(
                    "{http://www.loc.gov/standards/alto/ns-v4#}Glyph"
                ):
                    gstart = int(g.get("HPOS"))
                    glyphs.append(
                        {
                            "text": g.get("CONTENT"),
                            "span": {
                                "start": gstart,
                                "end": gstart + int(g.get("WIDTH")),
                            },
                            "confidence": float(g.get("GC")),
                        }
                    )
                line["words"].append(
                    {
                        "text": st.get("CONTENT"),
                        "kind": "word",
                        "span": {
                            "start": wstart,
                            "end": wstart + int(st.get("WIDTH")),
                        },
                        "confidence": float(st.get("WC")),
                        "subs_type": st.get("SUBS_TYPE") or "",
                        "subs_content": st.get("SUBS_CONTENT") or "",
                        "glyphs": glyphs,
                    }
                )
            block["lines"].append(line)
        blocks.append(block)
    # <Styles>/<Tags> round trip (TextStyle.fromXML semantics: absent
    # attributes -> None, FONTSIZE parsed as double)
    text_styles = []
    for ts in root.iter("{http://www.loc.gov/standards/alto/ns-v4#}TextStyle"):
        size = ts.get("FONTSIZE")
        text_styles.append(
            {
                "id": ts.get("ID"),
                "font_family": ts.get("FONTFAMILY") or None,
                "font_type": ts.get("FONTTYPE") or None,
                "font_width": ts.get("FONTWIDTH") or None,
                "font_size": float(size) if size else None,
            }
        )
    tags = []
    for elem, kind in (("LayoutTag", "layout"), ("StructureTag", "structure")):
        for tg in root.iter(
            "{http://www.loc.gov/standards/alto/ns-v4#}" + elem
        ):
            tags.append(
                {"kind": kind, "id": tg.get("ID"), "label": tg.get("LABEL")}
            )
    return {
        "id": page.get("ID"),
        "confidence": float(page.get("PC")),
        "blocks": blocks,
        "text_styles": text_styles,
        "tags": tags,
    }


def blocks_to_text(blocks: list[dict]) -> str:
    """Reconstruct the page content from the nested structure — the
    ``Alto.content`` analog (``Page.scala:156-160``: blocks joined by
    blank lines, lines by newlines, words laid out by their spans).
    Exact inverse of the span contract: gaps between word spans are
    spaces."""
    parts = []
    for block in blocks or []:
        line_texts = []
        for line in block["lines"]:
            cursor = line["span"]["start"]
            buf = []
            for w in line["words"]:
                s, e = w["span"]["start"], w["span"]["end"]
                if s > cursor:
                    buf.append(" " * (s - cursor))
                buf.append(w["text"])
                cursor = e
            line_texts.append("".join(buf))
        parts.append("\n".join(line_texts))
    return "\n\n".join(parts)
