"""Layered segmentation of one turn payload into blocks and lines.

This is the transcript analog of jochre3-ocr's segmentation stage
(reference ``modules/core/src/main/scala/.../segmentation/
FullYoloSegmenter.scala:61-579``): where Jochre's YOLO models predict
block/line rectangles on a page image, we segment a (possibly
markup-bearing) text payload into content blocks via DOM heuristics:

1. **Boilerplate strip** — script/style/comments removed; ``nav`` /
   ``header`` / ``footer`` / ``aside`` containers dropped outright
   (the analog of Jochre classifying regions as non-text /
   illustration, ``FullYoloSegmenter.scala:86-93``).
2. **Block segmentation** — block-level tags and blank lines delimit
   candidate blocks; ``<br>`` delimits lines inside a block.
3. **Link-ratio pruning** — a candidate whose visible characters are
   majority inside ``<a>`` elements is chrome, dropped (threshold
   0.5), mirroring Jochre's min-confidence block filter.
4. **Positioned blocks** — when block tags carry explicit geometry
   (``style="top:..px; left:..px"``), blocks get ``Rectangle``s, go
   through ``remove_overlaps_unordered`` (merge/remove, reference
   ``FullYoloSegmenter.scala:1030-1276``) and reading-order
   ``sort_reading_order`` (``BlockSorter.scala:37-139``); optional
   ``data-conf`` attributes model prediction confidences.
5. Inline whitespace is collapsed per line; empty lines/blocks drop
   (``textLines.nonEmpty`` filter, ``FullYoloSegmenter.scala:552-555``).

Input must already be normalized by ``normalize.simplify``. Pure and
deterministic; the same function is the test oracle and the pipeline
kernel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .geometry import Rectangle, remove_overlaps_unordered, sort_reading_order
from .normalize import collapse_inline_whitespace

_MARKUP = re.compile(r"<[a-zA-Z!/][^>]*>")
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_BOILERPLATE_TAG = re.compile(r"<(/?)(?:nav|header|footer|aside)\b[^>]*>", re.IGNORECASE)


def _strip_boilerplate(text: str) -> str:
    """Remove nav/header/footer/aside ELEMENTS, handling nesting and
    unclosed containers (a non-greedy regex mis-scopes nested
    same-name tags; this is a depth-counting scan). Content inside an
    unclosed container is dropped to end-of-document (conservative:
    chrome containers rarely wrap the main content)."""
    out: list[str] = []
    depth = 0
    pos = 0
    for m in _BOILERPLATE_TAG.finditer(text):
        closing = bool(m.group(1))
        if closing:
            if depth > 0:
                depth -= 1
                if depth == 0:
                    pos = m.end()
            # stray close tag at depth 0: leave it (generic tag strip
            # removes it later)
        else:
            if depth == 0:
                out.append(text[pos : m.start()])
            depth += 1
    if depth == 0:
        out.append(text[pos:])
    return " ".join(out)
_BR = re.compile(r"<br\s*/?>", re.IGNORECASE)
_BLOCK_TAGS = r"p|div|h[1-6]|li|ul|ol|tr|td|th|table|section|article|main|blockquote|pre|form|figure"
_BLOCK_TAG = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_ANY_TAG = re.compile(r"<[^>]+>")
_BLANK_LINE_SPLIT = re.compile(r"\n\s*\n")
_NON_WS = re.compile(r"\S")
_WORD_CHAR = re.compile(r"\w", re.UNICODE)

_POSITIONED_OPEN = re.compile(
    rf"<(?:{_BLOCK_TAGS})\b[^>]*style\s*=\s*\"[^\"]*top\s*:\s*-?\d+px[^\"]*\"[^>]*>",
    re.IGNORECASE,
)
_POSITIONED_ELEMENT = re.compile(
    rf"<(?P<tag>{_BLOCK_TAGS})\b(?P<attrs>[^>]*style\s*=\s*\"[^\"]*top\s*:\s*-?\d+px[^\"]*\"[^>]*)>"
    r"(?P<body>.*?)</(?P=tag)\s*>",
    re.DOTALL | re.IGNORECASE,
)
_STYLE_PROP = re.compile(r"(top|left|width|height)\s*:\s*(-?\d+)px", re.IGNORECASE)
_DATA_CONF = re.compile(r"data-conf\s*=\s*\"([0-9.]+)\"", re.IGNORECASE)

_ENTITIES = [
    (re.compile(r"&nbsp;"), " "),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&#39;|&apos;"), "'"),
    (re.compile(r"&amp;"), "&"),  # last, so &amp;lt; -> &lt; literally
]

LINK_RATIO_THRESHOLD = 0.5


@dataclass
class SegmentedBlock:
    """One content block: ordered lines of collapsed text."""

    lines: list[str] = field(default_factory=list)
    kind: str = "text"


def _unescape(text: str) -> str:
    for pattern, repl in _ENTITIES:
        text = pattern.sub(repl, text)
    return text


def _visible_len(segment_no_tags: str) -> int:
    return len(_NON_WS.findall(segment_no_tags))


def _link_ratio(segment: str) -> float:
    anchor_chars = sum(_visible_len(_ANY_TAG.sub("", m)) for m in _ANCHOR.findall(segment))
    visible = _visible_len(_ANY_TAG.sub("", segment))
    if visible == 0:
        return 1.0
    return anchor_chars / visible


def _segment_to_lines(segment: str) -> list[str]:
    """Strip remaining tags, unescape, split/collapse lines."""
    text = _ANY_TAG.sub("", segment)
    text = _unescape(text)
    lines = [collapse_inline_whitespace(l) for l in text.split("\n")]
    return [l for l in lines if l]


def _plain_blocks(text: str) -> list[SegmentedBlock]:
    blocks = []
    for chunk in _BLANK_LINE_SPLIT.split(text):
        lines = [collapse_inline_whitespace(l) for l in chunk.split("\n")]
        lines = [l for l in lines if l]
        if lines:
            blocks.append(SegmentedBlock(lines=lines))
    return blocks


def _markup_blocks(text: str) -> list[SegmentedBlock]:
    text = _COMMENT.sub(" ", text)
    text = _SCRIPT_STYLE.sub(" ", text)
    text = _strip_boilerplate(text)
    if _POSITIONED_OPEN.search(text):
        return _positioned_blocks(text)
    text = _BR.sub("\n", text)
    text = _BLOCK_TAG.sub("\n\n", text)
    blocks = []
    for segment in _BLANK_LINE_SPLIT.split(text):
        if _link_ratio(segment) > LINK_RATIO_THRESHOLD:
            continue  # link-heavy chrome
        lines = _segment_to_lines(segment)
        lines = [l for l in lines if _WORD_CHAR.search(l)]
        if lines:
            blocks.append(SegmentedBlock(lines=lines))
    return blocks


def _positioned_blocks(text: str) -> list[SegmentedBlock]:
    """Geometry path: explicit rectangles -> overlap resolution ->
    reading-order sort (BlockSorter + removeOverlapsUnordered analog)."""
    candidates: list[tuple[Rectangle, float, str]] = []
    for m in _POSITIONED_ELEMENT.finditer(text):
        attrs, body = m.group("attrs"), m.group("body")
        props = {k.lower(): int(v) for k, v in _STYLE_PROP.findall(attrs)}
        rect = Rectangle(
            left=props.get("left", 0),
            top=props.get("top", 0),
            width=props.get("width", 100),
            height=props.get("height", 20),
        )
        conf_m = _DATA_CONF.search(attrs)
        conf = float(conf_m.group(1)) if conf_m else 1.0
        body = _BR.sub("\n", body)
        body = _BLOCK_TAG.sub("\n", body)
        lines = _segment_to_lines(body)
        if not lines or _link_ratio(m.group(0)) > LINK_RATIO_THRESHOLD:
            continue
        candidates.append((rect, conf, "\n".join(lines)))
    resolved = remove_overlaps_unordered(
        candidates, merge_payload=lambda a, b: a + "\n" + b
    )
    ordered = sort_reading_order(resolved, rect_of=lambda it: it[0])
    blocks = []
    for _rect, _conf, payload in ordered:
        lines = [l for l in payload.split("\n") if l]
        if lines:
            blocks.append(SegmentedBlock(lines=lines))
    return blocks


def segment(normalized_text: str) -> list[SegmentedBlock]:
    """Segment one normalized payload into ordered content blocks."""
    if not normalized_text or not normalized_text.strip():
        return []
    if _MARKUP.search(normalized_text):
        return _markup_blocks(normalized_text)
    return _plain_blocks(normalized_text)


def non_segment(normalized_text: str) -> list[SegmentedBlock]:
    """The ``NonSegmenter`` analog (``segmentation/NonSegmenter.scala:
    22-45``): produce an EMPTY page — no blocks at all. Paired in the
    reference with ``UnsegmentedPageTextGuesser``, which assigns the
    whole page's content in one go; here the empty segmentation flows
    through ``extract_turn`` as a zero-block, empty-text turn exactly
    as the reference's empty ``Page(blocks = [])`` renders no text."""
    return []


def block_only_segment(
    normalized_text: str, block_text_fn=None
) -> list[SegmentedBlock]:
    """The ``BlockOnlySegmenter`` analog (``segmentation/
    BlockOnlySegmenter.scala:26-70``): top-level blocks WITHOUT line
    segmentation — in the reference each predicted block arrives as
    ``TextBlock(rect, Seq.empty)`` and a ``BlockTextGuesser`` fills
    its text. Here each full-pipeline block keeps its content as ONE
    unsplit line (no ``<br>``/line subdivision), and ``block_text_fn
    (block_text) -> [line texts]`` is the BlockTextGuesser hook that
    re-lines it (an external OCR/LLM service in the reference)."""
    blocks = segment(normalized_text)
    out = []
    for b in blocks:
        joined = " ".join(b.lines)
        lines = (
            [l for l in block_text_fn(joined) if l]
            if block_text_fn is not None
            else [joined]
        )
        out.append(SegmentedBlock(lines=lines, kind=b.kind))
    return out


def unsegmented_page_segmenter(page_text_fn=None):
    """The ``UnsegmentedPageTextGuesser`` pairing (reference
    ``core/text/UnsegmentedPageTextGuesser.scala``: NonSegmenter's
    empty page + a guesser that assigns the WHOLE page's content in
    one service call). Returns a segmenter producing one block whose
    lines come from ``page_text_fn(normalized_text) -> [line texts]``
    (default: the page's own non-empty lines — identity guess)."""

    def seg(normalized_text: str) -> list[SegmentedBlock]:
        if not normalized_text or not normalized_text.strip():
            return []
        lines = (
            page_text_fn(normalized_text)
            if page_text_fn is not None
            else [
                collapse_inline_whitespace(l)
                for l in normalized_text.split("\n")
            ]
        )
        lines = [l for l in lines if l]
        return [SegmentedBlock(lines=lines)] if lines else []

    return seg
