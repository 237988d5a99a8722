"""Geometry: rectangles, reading-order sort, overlap resolution.

Ports the *semantics* (not the code) of jochre3-ocr's geometric core:

* ``Rectangle`` — reference ``modules/core/src/main/scala/.../graphics/
  Rectangle.scala:8-57`` (left/top/width/height, intersection/union/
  percentage-intersection).
* ``BlockSorter`` reading-order comparator — reference
  ``graphics/BlockSorter.scala:37-139``: top-down when the blocks
  horizontally overlap or are separated by a vertical break;
  direction-aware (RTL right-to-left) when they only vertically
  overlap; top-down otherwise. The reference comparator is
  non-transitive and falls back to ``failSafeCompare`` when the JDK
  sort throws (``Rectangle.scala:114-120``); Python's sort never
  throws, so we detect an inconsistent result explicitly and apply the
  same failsafe (top, left) key — deterministic either way.
* Overlap removal — reference ``FullYoloSegmenter.scala:993-1028``
  (ordered NMS, >25% mutual overlap keeps the higher-confidence,
  first-wins on ties via argMaxFirst ``MathUtils.scala:28-34``) and
  ``removeOverlapsUnordered`` (``FullYoloSegmenter.scala:1030-1276``):
  pairs overlapping >20% are **merged** (union rectangle,
  geometric-mean confidence) when both confidences >= 0.5, else the
  lower-confidence member is removed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cmp_to_key


@dataclass(frozen=True)
class Rectangle:
    left: int
    top: int
    width: int
    height: int

    @property
    def right(self) -> int:
        return self.left + self.width

    @property
    def bottom(self) -> int:
        return self.top + self.height

    @property
    def area(self) -> int:
        return self.width * self.height

    def intersection(self, other: "Rectangle") -> "Rectangle | None":
        left = max(self.left, other.left)
        top = max(self.top, other.top)
        right = min(self.right, other.right)
        bottom = min(self.bottom, other.bottom)
        if right <= left or bottom <= top:
            return None
        return Rectangle(left, top, right - left, bottom - top)

    def union(self, other: "Rectangle") -> "Rectangle":
        left = min(self.left, other.left)
        top = min(self.top, other.top)
        right = max(self.right, other.right)
        bottom = max(self.bottom, other.bottom)
        return Rectangle(left, top, right - left, bottom - top)

    def percentage_intersection(self, other: "Rectangle") -> float:
        """Intersection area as a fraction of **this** rectangle's area."""
        inter = self.intersection(other)
        if inter is None or self.area == 0:
            return 0.0
        return inter.area / self.area

    def horizontal_overlap(self, other: "Rectangle") -> int:
        return max(0, min(self.right, other.right) - max(self.left, other.left))

    def vertical_overlap(self, other: "Rectangle") -> int:
        return max(0, min(self.bottom, other.bottom) - max(self.top, other.top))

    # -- geometric node ops (reference Rectangle.scala:161-176 and the
    # tree-wide PageElement.translate/rotate/rescale, package.scala:35-45)
    def translate(self, x_diff: int, y_diff: int) -> "Rectangle":
        return Rectangle(self.left + x_diff, self.top + y_diff, self.width, self.height)

    def rescale(self, scale: float) -> "Rectangle":
        return Rectangle(
            int(self.left * scale),
            int(self.top * scale),
            int(self.width * scale),
            int(self.height * scale),
        )

    def rotate_180(self, image_width: int, image_height: int) -> "Rectangle":
        """Rotate within an image frame (the ``rotate(imageInfo)``
        analog, Rectangle.scala:172-176: corners map through the image
        rotation, then re-normalize). 180° is the only rotation that
        keeps axis-aligned rectangles axis-aligned without the OpenCV
        rotation matrix, and is the case the reference exercises for
        upside-down scans."""
        x1, y1 = image_width - self.right, image_height - self.bottom
        return Rectangle(x1, y1, self.width, self.height)

    def tile(
        self,
        horizontal_tiles: int,
        vertical_tiles: int,
        margin_percentage: float = 0.25,
    ) -> list["Rectangle"]:
        """Overlapping tile grid clipped to this rectangle — the glyph/
        region tiling helper (reference Rectangle.scala:184-202): each
        tile is width/h × height/v expanded by ``margin_percentage`` of
        a segment on every side, intersected back with the parent."""
        height_seg = self.height // vertical_tiles
        v_margin = int(height_seg * margin_percentage)
        width_seg = self.width // horizontal_tiles
        h_margin = int(width_seg * margin_percentage)
        out = []
        for i in range(horizontal_tiles):
            for j in range(vertical_tiles):
                tile = Rectangle(
                    self.left + i * width_seg - h_margin,
                    self.top + j * height_seg - v_margin,
                    width_seg + 2 * h_margin,
                    height_seg + 2 * v_margin,
                )
                inter = tile.intersection(self)
                if inter is not None:
                    out.append(inter)
        return out


def translate_blocks(blocks: list[dict], offset: int) -> list[dict]:
    """Shift every span in a block/line/word/glyph tree by ``offset``
    chars — the 1-D analog of the tree-wide ``PageElement.translate``
    (reference ``core/model/package.scala:35-45``), used when
    concatenating per-turn trees into a conversation-level document
    (pages folded into ``Alto.content``, Alto.scala:12-13)."""

    def shift(span: dict) -> dict:
        return {"start": span["start"] + offset, "end": span["end"] + offset}

    out = []
    for block in blocks:
        out.append(
            {
                **block,
                "span": shift(block["span"]),
                "lines": [
                    {
                        **line,
                        "span": shift(line["span"]),
                        "words": [
                            {
                                **w,
                                "span": shift(w["span"]),
                                "glyphs": [
                                    {**g, "span": shift(g["span"])}
                                    for g in w.get("glyphs") or []
                                ],
                            }
                            for w in line["words"]
                        ],
                    }
                    for line in block["lines"]
                ],
            }
        )
    return out


def _reading_order_cmp(a: Rectangle, b: Rectangle, rtl: bool) -> int:
    h_overlap = a.horizontal_overlap(b)
    min_width = max(1, min(a.width, b.width))
    v_gap = a.bottom <= b.top or b.bottom <= a.top
    if h_overlap / min_width >= 0.2 or v_gap:
        # top-down
        if a.top != b.top:
            return a.top - b.top
        return a.left - b.left
    if a.vertical_overlap(b) > 0:
        # same band: read in text direction
        if a.left != b.left:
            return (b.left - a.left) if rtl else (a.left - b.left)
        return a.top - b.top
    if a.top != b.top:
        return a.top - b.top
    return a.left - b.left


def sort_reading_order(items: list, rect_of, rtl: bool = False) -> list:
    """Sort ``items`` into reading order by their rectangles.

    ``rect_of(item) -> Rectangle``. Applies the failsafe (top, left)
    key when the comparator produced an inconsistent adjacent pair
    (the analog of the reference's caught ``IllegalArgumentException``).
    """
    key = cmp_to_key(lambda x, y: _reading_order_cmp(rect_of(x), rect_of(y), rtl))
    out = sorted(items, key=key)
    for prev, cur in zip(out, out[1:]):
        if _reading_order_cmp(rect_of(prev), rect_of(cur), rtl) > 0:
            return sorted(
                items,
                key=lambda it: (rect_of(it).top, rect_of(it).left,
                                rect_of(it).width, rect_of(it).height),
            )
    return out


def place_in_containers(
    children: list,
    containers: list,
    rect_of,
    container_rect_of,
    threshold: float = 0.5,
) -> dict[int, list]:
    """Assign each child rectangle to the container it most overlaps.

    The geometric containment join at the heart of the reference's
    segmentation (``placeRectanglesInTextBlocks``,
    ``FullYoloSegmenter.scala:581-709``). Candidate selection is the
    reference's FOUR sorted indexes intersected by binary search
    (``getIntersectingBlocks``/``findLimit``,
    ``FullYoloSegmenter.scala:711-798``): containers sorted by
    top/bottom/left/right; each axis contributes the prefix/suffix
    whose interval can still intersect the child, short-circuiting as
    soon as one axis narrows the set to <=1 (as the reference does).
    The winner is the container with max percentage-intersection of
    the child, if above ``threshold``. Unassigned children are dropped
    (the reference collects them as orphans). Returns
    ``{container_index: [child, …]}`` with children in input order.
    """
    import bisect

    n = len(containers)
    rects = [container_rect_of(c) for c in containers]
    by_top = sorted(range(n), key=lambda i: rects[i].top)
    tops = [rects[i].top for i in by_top]
    by_bottom = sorted(range(n), key=lambda i: rects[i].bottom)
    bottoms = [rects[i].bottom for i in by_bottom]
    by_left = sorted(range(n), key=lambda i: rects[i].left)
    lefts = [rects[i].left for i in by_left]
    by_right = sorted(range(n), key=lambda i: rects[i].right)
    rights = [rects[i].right for i in by_right]

    def candidate_set(crect) -> set[int]:
        # axis 1: container.top < child.bottom (prefix of by_top)
        cands = set(by_top[: bisect.bisect_left(tops, crect.bottom)])
        if len(cands) <= 1:
            return cands
        # axis 2: container.bottom > child.top (suffix of by_bottom)
        cands &= set(by_bottom[bisect.bisect_right(bottoms, crect.top) :])
        if len(cands) <= 1:
            return cands
        # axis 3: container.left < child.right (prefix of by_left)
        cands &= set(by_left[: bisect.bisect_left(lefts, crect.right)])
        if len(cands) <= 1:
            return cands
        # axis 4: container.right > child.left (suffix of by_right)
        cands &= set(by_right[bisect.bisect_right(rights, crect.left) :])
        return cands

    assigned: dict[int, list] = {}
    for child in children:
        crect = rect_of(child)
        best_idx, best_pct = -1, threshold
        for oi in sorted(candidate_set(crect)):
            pct = crect.percentage_intersection(rects[oi])
            if pct > best_pct:
                best_idx, best_pct = oi, pct
        if best_idx >= 0:
            assigned.setdefault(best_idx, []).append(child)
    return assigned


def remove_overlaps_unordered(
    blocks: list[tuple[Rectangle, float, object]],
    overlap_threshold: float = 0.2,
    retain_threshold: float = 0.5,
    merge_payload=lambda a, b: (a, b),
) -> list[tuple[Rectangle, float, object]]:
    """Resolve overlapping candidate blocks.

    Input/output: ``(rect, confidence, payload)`` triples in document
    order. Overlap > ``overlap_threshold`` (fraction of the smaller
    rect): merge into the union rect with geometric-mean confidence
    when BOTH confidences >= ``retain_threshold`` (payloads joined in
    document order), else drop the lower-confidence member
    (first-wins on ties).
    """
    items = list(blocks)
    changed = True
    while changed:
        changed = False
        n = len(items)
        for i in range(n):
            for j in range(i + 1, n):
                ri, ci, pi = items[i]
                rj, cj, pj = items[j]
                smaller = ri if ri.area <= rj.area else rj
                other = rj if smaller is ri else ri
                if smaller.percentage_intersection(other) <= overlap_threshold:
                    continue
                if ci >= retain_threshold and cj >= retain_threshold:
                    merged = (ri.union(rj), math.sqrt(ci * cj), merge_payload(pi, pj))
                    items = items[:i] + [merged] + items[i + 1:j] + items[j + 1:]
                else:
                    drop = j if cj < ci or (cj == ci and j > i) else i
                    items = items[:drop] + items[drop + 1:]
                changed = True
                break
            if changed:
                break
    return items
