"""Training-side corpus preparation — the reference's corpus/learning
data-prep jobs re-expressed as Ray Data pipelines.

Reference semantics ported here (NOT the DJL/OpenCV mechanics):

* ``CorpusAnnotator`` (``core/corpus/CorpusAnnotator.scala:17-86``) —
  the trait that walks an annotated corpus and emits training
  artifacts per page. Here: :func:`annotate_corpus`, a flat_map-shaped
  ``map_batches`` over the extraction Dataset applying a pluggable
  per-page annotator.
* ``TextLineExtractor`` (``core/corpus/TextLineExtractor.scala:29-77``)
  — one training example per text line: cropped line image + simplified
  content, every-Nth line to validation. Here: line-span examples over
  ``extracted_text`` (:func:`line_examples`).
* ``WordExtractor`` (``core/corpus/WordExtractor.scala:32-85``) — one
  example per ``page.combinedWords`` entry (span-adjacent word pieces
  merged back, ``core/model/TextLine.scala:38-57``), every-Nth word to
  validation, alphabet accumulated as a side product.
* ``GlyphDataset`` (``core/learning/GlyphDataset.scala:41-48``) — the
  corpus alphabet: sorted distinct simplified glyph contents, class
  index per glyph, trailing "" unknown class
  (``classes = alphabet :+ ""``, ``GlyphDataset.scala:48``).
* ``GlyphExtractor`` / ``GlyphDataset.get`` — one training example per
  glyph with its class number
  (``alphabetToIndex.getOrElse(content, alphabet.size)``,
  ``GlyphDataset.scala:110-113``) and the margin-padded crop window
  (``GlyphDataset.scala:79-92``).
* ``YoloAnnotator`` (``core/corpus/YoloAnnotator.scala:78-170``) —
  normalized ``class x_center y_center width height`` label rows
  (``%.6f``), every-Nth page to validation.

Scale notes: every job is a streaming explode over extraction blocks
(no shuffle at all except the tiny alphabet distinct, which collapses
to per-batch partials before one driver combine); outputs are written
as split-partitioned parquet so a resumed run can skip finished
partitions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.normalize import simplify, simplify_cached
from ..ops.relational import _read, _round, _to_table
from ..ops.transcripts import _DERIVE_SQL, N_CONVS, derive_transcripts


# ------------------------------------------------- CorpusAnnotator trait
def annotate_corpus(
    extracted: "ray.data.Dataset",
    annotator,
    *,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Apply a per-page annotator over the extraction Dataset — the
    ``CorpusAnnotator.annotate`` loop (``CorpusAnnotator.scala:31-75``)
    as a streaming flat_map: ``annotator(page_row) -> list[dict]``
    rows, collected per batch into one Arrow table. The reference's
    ``initialTransforms`` fold (rotation) has already run inside the
    extraction stage (normalize/deskew), so annotators see the
    transformed page exactly as ``annotateOneFile`` does."""

    def run(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for page in batch.to_pylist():
            rows.extend(annotator(page))
        if not rows:
            return pa.table({})
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        return pa.table(cols)

    return extracted.map_batches(run, batch_format="pyarrow", batch_size=batch_size)


def _page_lines(page: dict):
    """(line_index_within_page, line_dict) — reading order, the
    ``page.textLinesWithRectangles.zipWithIndex`` analog."""
    i = 0
    for block in page.get("blocks") or []:
        for line in block["lines"]:
            yield i, line
            i += 1


def _combined_spans(line: dict) -> list[tuple[int, int]]:
    """Combined-word spans: span-adjacent pieces merged — the
    ``TextLine.combinedWords`` fold (``core/model/TextLine.scala:38-57``)
    expressed on the stored structure, where "not separated by a
    space" is exactly ``piece.start == previous.end``."""
    out: list[list[int]] = []
    for w in line["words"]:
        s, e = w["span"]["start"], w["span"]["end"]
        if out and s == out[-1][1]:
            out[-1][1] = e
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def _split_for(index: int, validation_one_every: int | None) -> str:
    """'val' for every Nth example (1-based), else 'train' —
    ``TextLineExtractor.scala:42-49``."""
    if validation_one_every and (index + 1) % validation_one_every == 0:
        return "val"
    return "train"


# ------------------------------------------------------ TextLineExtractor
def line_examples(
    extracted: "ray.data.Dataset",
    *,
    validation_one_every: int | None = 10,
) -> "ray.data.Dataset":
    """One training example per text line (TextLineExtractor): the
    line's span in ``extracted_text`` is the crop rectangle analog,
    the simplified content is the label, ``example_id`` mirrors
    ``baseName_%03d`` and every Nth line of a page goes to 'val'."""

    def annotator(page: dict) -> list[dict]:
        text = page["extracted_text"]
        rows = []
        for i, line in _page_lines(page):
            s, e = line["span"]["start"], line["span"]["end"]
            rows.append(
                {
                    "conv_id": page["conv_id"],
                    "turn_idx": page["turn_idx"],
                    "line_idx": i,
                    "example_id": f"{page['conv_id']}_{page['turn_idx']:05d}_{i:03d}",
                    "content": simplify(text[s:e]),
                    "span_start": s,
                    "span_end": e,
                    "split": _split_for(i, validation_one_every),
                }
            )
        return rows

    return annotate_corpus(extracted, annotator)


def q_training_line_examples(sf_dir: str) -> pa.Table:
    extracted = _fast_extraction(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in _LINE_EXAMPLES_SCHEMA.names}
        for conv_id, turn_idx, text in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            for i, (ls, le) in enumerate(_text_line_spans(text)):
                rows["conv_id"].append(conv_id)
                rows["turn_idx"].append(turn_idx)
                rows["line_idx"].append(i)
                rows["example_id"].append(f"{conv_id}_{turn_idx:05d}_{i:03d}")
                rows["content"].append(simplify(text[ls:le]))
                rows["span_start"].append(ls)
                rows["span_end"].append(le)
                rows["split"].append(_split_for(i, 10))
        return pa.Table.from_pydict(rows, schema=_LINE_EXAMPLES_SCHEMA)

    return _to_table(extracted.map_batches(explode, batch_format="pyarrow"))


Q_TRAINING_LINE_EXAMPLES_SQL = f"""
WITH t AS ({_DERIVE_SQL})
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(0 AS BIGINT) AS line_idx,
       conv_id || '_' || LPAD(CAST(turn_idx AS VARCHAR), 5, '0') || '_000'
         AS example_id,
       extracted_text AS content,
       CAST(0 AS BIGINT) AS span_start,
       CAST(LENGTH(extracted_text) AS BIGINT) AS span_end,
       'train' AS split
FROM t
WHERE extracted_text <> ''
"""


# ---------------------------------------------------------- WordExtractor
def word_examples(
    extracted: "ray.data.Dataset",
    *,
    validation_one_every: int | None = 10,
) -> "ray.data.Dataset":
    """One training example per combined word (WordExtractor):
    ``page.combinedWords.zipWithIndex`` with every-Nth-word validation
    split and ``baseName_%04d`` example ids
    (``WordExtractor.scala:41-83``)."""

    def annotator(page: dict) -> list[dict]:
        text = page["extracted_text"]
        rows = []
        i = 0  # word index across the page, all lines
        for _, line in _page_lines(page):
            for s, e in _combined_spans(line):
                rows.append(
                    {
                        "conv_id": page["conv_id"],
                        "turn_idx": page["turn_idx"],
                        "word_idx": i,
                        "example_id": (
                            f"{page['conv_id']}_{page['turn_idx']:05d}_{i:04d}"
                        ),
                        "content": simplify_cached(text[s:e]),
                        "span_start": s,
                        "span_end": e,
                        "split": _split_for(i, validation_one_every),
                    }
                )
                i += 1
        return rows

    return annotate_corpus(extracted, annotator)


def q_training_word_examples(sf_dir: str) -> pa.Table:
    extracted = _fast_extraction(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in _WORD_EXAMPLES_SCHEMA.names}
        for conv_id, turn_idx, text in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            i = 0
            for ls, le in _text_line_spans(text):
                for m in _WORD_RUN.finditer(text, ls, le):
                    rows["conv_id"].append(conv_id)
                    rows["turn_idx"].append(turn_idx)
                    rows["word_idx"].append(i)
                    rows["example_id"].append(
                        f"{conv_id}_{turn_idx:05d}_{i:04d}"
                    )
                    rows["content"].append(simplify_cached(m.group(0)))
                    rows["span_start"].append(m.start())
                    rows["span_end"].append(m.end())
                    rows["split"].append(_split_for(i, 10))
                    i += 1
        return pa.Table.from_pydict(rows, schema=_WORD_EXAMPLES_SCHEMA)

    return _to_table(extracted.map_batches(explode, batch_format="pyarrow"))


Q_TRAINING_WORD_EXAMPLES_SQL = f"""
WITH t AS ({_DERIVE_SQL}),
toks AS (
  SELECT conv_id, turn_idx, extracted_text,
         unnest(string_split(extracted_text, ' ')) AS tok,
         generate_subscripts(string_split(extracted_text, ' '), 1) AS k
  FROM t WHERE extracted_text <> ''
),
pos AS (
  SELECT conv_id, turn_idx, tok, k,
         CAST(COALESCE(SUM(LENGTH(tok) + 1) OVER (
           PARTITION BY conv_id, turn_idx ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS span_start
  FROM toks
)
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(k - 1 AS BIGINT) AS word_idx,
       conv_id || '_' || LPAD(CAST(turn_idx AS VARCHAR), 5, '0')
               || '_' || LPAD(CAST(k - 1 AS VARCHAR), 4, '0') AS example_id,
       tok AS content,
       span_start,
       span_start + LENGTH(tok) AS span_end,
       CASE WHEN k % 10 = 0 THEN 'val' ELSE 'train' END AS split
FROM pos
"""


# ------------------------------------------------- GlyphDataset alphabet
def corpus_alphabet(extracted: "ray.data.Dataset") -> pa.Table:
    """Sorted distinct simplified glyph contents + class index, with
    the trailing "" unknown class (``GlyphDataset.scala:41-48``:
    ``alphabet = SortedSet(allGlyphs.map(_.content).map(simplify))``;
    ``classes = alphabet :+ ""``). Distributed as per-batch partial
    distincts (each batch collapses to its unique glyphs — a few dozen
    rows) combined once on the driver: the alphabet is bounded by the
    character inventory, never by corpus size."""

    def partial(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for blocks in batch["blocks"].to_pylist():
            for block in blocks or []:
                for line in block["lines"]:
                    for word in line["words"]:
                        for glyph in word["glyphs"] or []:
                            seen.add(simplify_cached(glyph["text"]))
        return pa.table({"glyph": pa.array(sorted(seen), type=pa.string())})

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    alphabet = sorted(set(_to_table(partials)["glyph"].to_pylist()))
    return pa.table(
        {
            "glyph": pa.array(alphabet + [""], type=pa.string()),
            "class_idx": pa.array(
                list(range(len(alphabet))) + [len(alphabet)], type=pa.int64()
            ),
        }
    )


def q_corpus_alphabet(sf_dir: str) -> pa.Table:
    extracted = _fast_extraction(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for text in batch["extracted_text"].to_pylist():
            seen.update(text)
        seen -= {" ", "\n"}
        return pa.table(
            {"glyph": pa.array(sorted(simplify_cached(c) for c in seen))}
        )

    partials = extracted.map_batches(partial, batch_format="pyarrow")
    alphabet = sorted(set(_to_table(partials)["glyph"].to_pylist()))
    return pa.table(
        {
            "glyph": pa.array(alphabet + [""], type=pa.string()),
            "class_idx": pa.array(
                list(range(len(alphabet))) + [len(alphabet)], type=pa.int64()
            ),
        }
    )


# On this ASCII corpus every glyph is one non-space character of
# extracted_text (glyph tiling = character boundaries), so the oracle
# recomputes the alphabet by exploding characters.
Q_CORPUS_ALPHABET_SQL = f"""
WITH t AS ({_DERIVE_SQL}),
g AS (
  SELECT DISTINCT substring(extracted_text, s.n, 1) AS glyph
  FROM t, LATERAL (
    SELECT unnest(generate_series(1, LENGTH(extracted_text))) AS n
  ) s
  WHERE substring(extracted_text, s.n, 1) <> ' '
)
SELECT glyph, CAST(ROW_NUMBER() OVER (ORDER BY glyph) - 1 AS BIGINT) AS class_idx
FROM g
UNION ALL
SELECT '', (SELECT COUNT(*) FROM g)
"""


# ------------------------------------------- GlyphExtractor / GlyphDataset
def glyph_examples(
    extracted: "ray.data.Dataset",
    alphabet: pa.Table,
) -> "ray.data.Dataset":
    """One training example per glyph: simplified content as label,
    class number via ``alphabetToIndex.getOrElse(content, size)``
    (``GlyphDataset.scala:110-113``), and the margin-padded square
    crop window (``GlyphDataset.scala:79-92``: crop height is 1.1x the
    glyph, centered) expressed on spans: one char padded to a 2-wide
    window clamped to the text. The alphabet table is tiny and
    broadcast once via ``ray.put`` — never re-shipped per batch."""
    glyphs = alphabet["glyph"].to_pylist()
    idx = {g: i for i, g in enumerate(glyphs)}
    unknown = len(idx) - 1 if "" in idx else len(idx)
    index_ref = ray.put((idx, unknown))

    def annotator_batch(batch: pa.Table) -> pa.Table:
        index, unk = ray.get(index_ref)
        rows: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "glyph_idx": [], "label": [],
            "class_idx": [], "span_start": [], "crop_start": [],
            "crop_end": [], "crop_text": [],
        }
        for page in batch.to_pylist():
            text = page["extracted_text"]
            n = len(text)
            g_i = 0
            for _, line in _page_lines(page):
                for word in line["words"]:
                    for glyph in word["glyphs"] or []:
                        s = glyph["span"]["start"]
                        e = glyph["span"]["end"]
                        label = simplify_cached(glyph["text"])
                        cs, ce = max(0, s - 1), min(n, e + 1)
                        rows["conv_id"].append(page["conv_id"])
                        rows["turn_idx"].append(page["turn_idx"])
                        rows["glyph_idx"].append(g_i)
                        rows["label"].append(label)
                        rows["class_idx"].append(index.get(label, unk))
                        rows["span_start"].append(s)
                        rows["crop_start"].append(cs)
                        rows["crop_end"].append(ce)
                        rows["crop_text"].append(text[cs:ce])
                        g_i += 1
        return pa.table(
            {
                "conv_id": pa.array(rows["conv_id"], type=pa.string()),
                "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
                "glyph_idx": pa.array(rows["glyph_idx"], type=pa.int64()),
                "label": pa.array(rows["label"], type=pa.string()),
                "class_idx": pa.array(rows["class_idx"], type=pa.int64()),
                "span_start": pa.array(rows["span_start"], type=pa.int64()),
                "crop_start": pa.array(rows["crop_start"], type=pa.int64()),
                "crop_end": pa.array(rows["crop_end"], type=pa.int64()),
                "crop_text": pa.array(rows["crop_text"], type=pa.string()),
            }
        )

    return extracted.map_batches(
        annotator_batch, batch_format="pyarrow", batch_size=256
    )


# ------------------------------------------------------- GlyphEvaluator
def _fast_glyph_examples(
    extracted: "ray.data.Dataset", validation_one_every: int = 5
) -> "ray.data.Dataset":
    """Glyph-example rows straight from ``extracted_text`` — the
    blocks-free fast derivation (on this corpus every glyph is one
    non-space character; the crop window is the char padded by one,
    exactly ``glyph_examples``' span arithmetic). Pages with
    ``turn_idx % validation_one_every == 0`` form the holdout split
    (the page-level analog of ``TextLineExtractor.scala:42-49``'s
    every-Nth split, and trivially SQL-replicable)."""

    def explode(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "label": [], "split": [], "span_start": [],
            "crop_start": [], "crop_text": [],
        }
        for turn_idx, text in zip(
            batch["turn_idx"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            split = (
                "val" if turn_idx % validation_one_every == 0 else "train"
            )
            n = len(text)
            for i, ch in enumerate(text):
                if ch in (" ", "\n"):
                    continue
                cs = max(0, i - 1)
                rows["label"].append(simplify_cached(ch))
                rows["split"].append(split)
                rows["span_start"].append(i)
                rows["crop_start"].append(cs)
                rows["crop_text"].append(text[cs : min(n, i + 2)])
        return pa.table(
            {
                "label": pa.array(rows["label"], type=pa.string()),
                "split": pa.array(rows["split"], type=pa.string()),
                "span_start": pa.array(rows["span_start"], type=pa.int64()),
                "crop_start": pa.array(rows["crop_start"], type=pa.int64()),
                "crop_text": pa.array(rows["crop_text"], type=pa.string()),
            }
        )

    return extracted.map_batches(explode, batch_format="pyarrow")


def q_glyph_eval(sf_dir: str, validation_one_every: int = 5) -> pa.Table:
    """The ``GlyphEvaluator`` job (``core/learning/GlyphEvaluator
    .scala:29-55`` / ``yiddish/learning/YiddishGlyphEvaluator.scala``):
    train the glyph classifier on the train split, evaluate it per
    class on the held-out pages, report per-class example counts plus
    a trailing ``Mean`` row. Two streaming passes over the corpus
    (fit, then confusion) — nothing materializes; both collapse to
    alphabet-bounded driver tables.

    Oracle shape (IVF-style invariant row): per-class ``n_examples``
    is recomputed exactly by the SQL twin (holdout char counts), and
    ``accuracy_ok`` pins the model's overall holdout accuracy >=
    {floor} — on this clean corpus the center-char feature is
    class-unique, so NB accuracy is ~1; the full per-class
    accuracy/confusion table is available via
    ``evaluate_glyph_classifier`` / ``glyph_confusion`` (pytest-
    pinned)."""
    from ..functions.learning import (
        GLYPH_EVAL_ACC_FLOOR,
        evaluate_glyph_classifier,
        train_glyph_classifier,
    )

    extracted = _fast_extraction(sf_dir)
    # Materialize the exploded examples once: fit and confusion are
    # two passes over the SAME table, and re-deriving it would re-run
    # the whole extraction per pass. This is the in-memory analog of
    # the prepared corpus the reference trains from (at real scale
    # ``prepare_training_corpus`` writes this table to parquet and
    # both passes read it back).
    examples = _fast_glyph_examples(extracted, validation_one_every).materialize()

    def only(split: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["split"], split))

        return f

    model = train_glyph_classifier(
        examples.map_batches(only("train"), batch_format="pyarrow")
    )
    per_class = evaluate_glyph_classifier(
        examples.map_batches(only("val"), batch_format="pyarrow"), model
    ).to_pandas()
    mean = per_class[per_class["label"] == "Mean"]
    acc_ok = bool(
        (mean["accuracy"] >= GLYPH_EVAL_ACC_FLOOR).all()
    ) and len(mean) == 1
    return pa.table(
        {
            "label": pa.array(per_class["label"], type=pa.string()),
            "n_examples": pa.array(per_class["n_examples"], type=pa.int64()),
            "accuracy_ok": pa.array(
                [acc_ok] * len(per_class), type=pa.bool_()
            ),
        }
    )


Q_GLYPH_EVAL_SQL = f"""
WITH t AS ({_DERIVE_SQL}),
g AS (
  SELECT substring(extracted_text, s.n, 1) AS label
  FROM t, LATERAL (
    SELECT unnest(generate_series(1, LENGTH(extracted_text))) AS n
  ) s
  WHERE turn_idx % 5 = 0
    AND substring(extracted_text, s.n, 1) <> ' '
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_examples, true AS accuracy_ok
FROM g GROUP BY label
UNION ALL
SELECT 'Mean', CAST(COUNT(*) AS BIGINT), true FROM g
"""


# ----------------------------------------------------------- YoloAnnotator
YOLO_CLASSES = ("word", "textline")


def yolo_annotations(
    extracted: "ray.data.Dataset",
    *,
    validation_one_every: int | None = 10,
    page_index_fn=None,
) -> "ray.data.Dataset":
    """Normalized YOLO label rows (``YoloAnnotator.scala:78-170``):
    one row per object, ``class x_center y_center width height`` in
    [0,1] rounded to 6 decimals (the reference's ``%.6f`` format).
    Page geometry on text: width = len(extracted_text), height =
    number of lines; a word box spans its combined-word span on the x
    axis and its line's row on the y axis. The train/val split is by
    PAGE index — ``CorpusAnnotator.annotate``'s file enumeration — via
    ``page_index_fn(page) -> int`` (defaults to the transcript
    corpus's doc-id arithmetic)."""
    if page_index_fn is None:
        def page_index_fn(page: dict) -> int:
            return page["turn_idx"] * N_CONVS + int(page["conv_id"][4:])

    def annotator(page: dict) -> list[dict]:
        text = page["extracted_text"]
        width = len(text)
        if width == 0:
            return []
        lines = list(_page_lines(page))
        height = len(lines)
        if height == 0:
            return []
        split = _split_for(page_index_fn(page), validation_one_every)
        rows = []

        def emit(cls: str, obj_idx: int, x0: int, x1: int, li: int) -> None:
            rows.append(
                {
                    "conv_id": page["conv_id"],
                    "turn_idx": page["turn_idx"],
                    "class_name": cls,
                    "class_idx": YOLO_CLASSES.index(cls),
                    "obj_idx": obj_idx,
                    "cx": (x0 + x1) / 2.0 / width,
                    "cy": (li + 0.5) / height,
                    "w": (x1 - x0) / width,
                    "h": 1.0 / height,
                    "split": split,
                }
            )

        w_i = 0
        for li, line in lines:
            for s, e in _combined_spans(line):
                emit("word", w_i, s, e, li)
                w_i += 1
        for li, line in lines:
            emit("textline", li, line["span"]["start"], line["span"]["end"], li)
        return rows

    out = annotate_corpus(extracted, annotator)

    def round6(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cx" not in batch.column_names:
            return batch
        return _round(batch, {"cx": 6, "cy": 6, "w": 6, "h": 6})

    return out.map_batches(round6, batch_format="pyarrow")


def q_yolo_annotations(sf_dir: str) -> pa.Table:
    extracted = _fast_extraction(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in _YOLO_SCHEMA.names}

        def emit(conv_id, turn_idx, cls, obj_idx, x0, x1, li, width,
                 height, split):
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(turn_idx)
            rows["class_name"].append(cls)
            rows["class_idx"].append(YOLO_CLASSES.index(cls))
            rows["obj_idx"].append(obj_idx)
            rows["cx"].append((x0 + x1) / 2.0 / width)
            rows["cy"].append((li + 0.5) / height)
            rows["w"].append((x1 - x0) / width)
            rows["h"].append(1.0 / height)
            rows["split"].append(split)

        for conv_id, turn_idx, text in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            width = len(text)
            lines = _text_line_spans(text)
            if not width or not lines:
                continue
            height = len(lines)
            page_index = turn_idx * N_CONVS + int(conv_id[4:])
            split = _split_for(page_index, 10)
            w_i = 0
            for li, (ls, le) in enumerate(lines):
                for m in _WORD_RUN.finditer(text, ls, le):
                    emit(conv_id, turn_idx, "word", w_i, m.start(),
                         m.end(), li, width, height, split)
                    w_i += 1
            for li, (ls, le) in enumerate(lines):
                emit(conv_id, turn_idx, "textline", li, ls, le, li,
                     width, height, split)
        return pa.Table.from_pydict(rows, schema=_YOLO_SCHEMA)

    out = extracted.map_batches(explode, batch_format="pyarrow")
    return _round(_to_table(out), {"cx": 6, "cy": 6, "w": 6, "h": 6})


Q_YOLO_ANNOTATIONS_SQL = f"""
WITH t AS ({_DERIVE_SQL}),
pages AS (
  SELECT conv_id, turn_idx, extracted_text,
         turn_idx * {N_CONVS} + CAST(SUBSTR(conv_id, 5) AS INT) AS page_index,
         LENGTH(extracted_text) AS width
  FROM t WHERE extracted_text <> ''
),
toks AS (
  SELECT conv_id, turn_idx, width, page_index,
         unnest(string_split(extracted_text, ' ')) AS tok,
         generate_subscripts(string_split(extracted_text, ' '), 1) AS k
  FROM pages
),
pos AS (
  SELECT conv_id, turn_idx, width, page_index, tok, k,
         COALESCE(SUM(LENGTH(tok) + 1) OVER (
           PARTITION BY conv_id, turn_idx ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS s
  FROM toks
),
words AS (
  SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
         'word' AS class_name, CAST(0 AS BIGINT) AS class_idx,
         CAST(k - 1 AS BIGINT) AS obj_idx,
         ROUND((s + s + LENGTH(tok)) / 2.0 / width, 6) AS cx,
         0.5 AS cy,
         ROUND(LENGTH(tok) * 1.0 / width, 6) AS w,
         1.0 AS h,
         CASE WHEN (page_index + 1) % 10 = 0 THEN 'val' ELSE 'train' END AS split
  FROM pos
),
tlines AS (
  SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
         'textline' AS class_name, CAST(1 AS BIGINT) AS class_idx,
         CAST(0 AS BIGINT) AS obj_idx,
         0.5 AS cx, 0.5 AS cy, 1.0 AS w, 1.0 AS h,
         CASE WHEN (page_index + 1) % 10 = 0 THEN 'val' ELSE 'train' END AS split
  FROM pages
)
SELECT * FROM words UNION ALL SELECT * FROM tlines
"""


# ------------------------------------------- YoloWordToGlyphAnnotator
def word_to_glyph_annotations(
    extracted: "ray.data.Dataset",
    *,
    validation_one_every: int | None = 10,
    page_index_fn=None,
) -> "ray.data.Dataset":
    """Word-crop → glyph YOLO labels — the word-to-glyph-splitter
    training set (``YoloWordToGlyphAnnotator.scala:22-131``): one row
    per glyph, box normalized to its COMBINED WORD's rectangle (the
    word crop the reference saves as ``baseName_%04d``), single
    class 0 ``glyph``; width/height clamped to 1.0 exactly as the
    reference clamps boxes that overrun the crop. ``word_idx`` is the
    page-level combined-word counter (the crop id); the train/val
    split is by PAGE index, as in ``yolo_annotations``. Streaming
    flat_map over the extraction — same scale shape as the other
    annotators."""
    if page_index_fn is None:
        def page_index_fn(page: dict) -> int:
            return page["turn_idx"] * N_CONVS + int(page["conv_id"][4:])

    def annotator(page: dict) -> list[dict]:
        split = _split_for(page_index_fn(page), validation_one_every)
        rows: list[dict] = []
        w_i = 0
        for _, line in _page_lines(page):
            # combined-word groups carrying their glyph lists (the
            # ``page.combinedWords`` fold, glyphs concatenated)
            groups: list[list] = []
            for w in line["words"]:
                s, e = w["span"]["start"], w["span"]["end"]
                if groups and s == groups[-1][1]:
                    groups[-1][1] = e
                    groups[-1][2].extend(w["glyphs"] or [])
                else:
                    groups.append([s, e, list(w["glyphs"] or [])])
            for s, e, glyphs in groups:
                ww = e - s
                if ww > 0:
                    for gi, g in enumerate(glyphs):
                        gs = g["span"]["start"]
                        ge = g["span"]["end"]
                        rows.append(
                            {
                                "conv_id": page["conv_id"],
                                "turn_idx": page["turn_idx"],
                                "word_idx": w_i,
                                "glyph_idx": gi,
                                "class_name": "glyph",
                                "class_idx": 0,
                                "cx": ((gs + ge) / 2.0 - s) / ww,
                                "cy": 0.5,
                                "w": min((ge - gs) / ww, 1.0),
                                "h": 1.0,
                                "split": split,
                            }
                        )
                w_i += 1
        return rows

    return annotate_corpus(extracted, annotator)


def q_word_to_glyph_annotations(sf_dir: str) -> pa.Table:
    """Fast-path twin of ``word_to_glyph_annotations`` by the span
    contract: combined words are the non-space runs per line, glyphs
    their single characters (equality with the structural operator is
    test-pinned on the markup corpus)."""
    import numpy as np

    extracted = _fast_extraction(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized per-char explode: the only per-page Python is the
        # token regex; glyph indices/boxes come from repeat/arange
        # arithmetic over the token-length array. Tokens never span
        # newlines (\\S+), so one page-wide finditer preserves the
        # line-by-line word order.
        conv_parts, turn_parts, wi_parts, gi_parts = [], [], [], []
        cx_parts, w_parts, split_parts = [], [], []
        for conv_id, turn_idx, text in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            spans = [(m.start(), m.end()) for m in _WORD_RUN.finditer(text)]
            if not spans:
                continue
            ww = np.diff(np.asarray(spans, dtype=np.int64), axis=1).ravel()
            total = int(ww.sum())
            gi = np.arange(total) - np.repeat(np.cumsum(ww) - ww, ww)
            wwr = np.repeat(ww, ww)
            page_index = turn_idx * N_CONVS + int(conv_id[4:])
            split = _split_for(page_index, 10)
            conv_parts.append(np.full(total, conv_id, dtype=object))
            turn_parts.append(np.full(total, turn_idx, dtype=np.int64))
            wi_parts.append(np.repeat(np.arange(len(ww)), ww))
            gi_parts.append(gi)
            cx_parts.append((gi + 0.5) / wwr)
            w_parts.append(1.0 / wwr)
            split_parts.append(np.full(total, split, dtype=object))
        if not conv_parts:
            return pa.Table.from_pydict(
                {k: [] for k in _W2G_SCHEMA.names}, schema=_W2G_SCHEMA
            )
        n = sum(len(p) for p in gi_parts)
        return pa.Table.from_pydict(
            {
                "conv_id": pa.array(
                    np.concatenate(conv_parts), type=pa.string()
                ),
                "turn_idx": pa.array(np.concatenate(turn_parts)),
                "word_idx": pa.array(np.concatenate(wi_parts)),
                "glyph_idx": pa.array(np.concatenate(gi_parts)),
                "class_name": pa.array(["glyph"] * n, type=pa.string()),
                "class_idx": pa.array(np.zeros(n, dtype=np.int64)),
                "cx": pa.array(np.concatenate(cx_parts)),
                "cy": pa.array(np.full(n, 0.5)),
                "w": pa.array(np.concatenate(w_parts)),
                "h": pa.array(np.full(n, 1.0)),
                "split": pa.array(
                    np.concatenate(split_parts), type=pa.string()
                ),
            },
            schema=_W2G_SCHEMA,
        )

    out = extracted.map_batches(explode, batch_format="pyarrow")
    return _round(_to_table(out), {"cx": 6, "cy": 6, "w": 6, "h": 6})


Q_WORD_TO_GLYPH_ANNOTATIONS_SQL = f"""
WITH t AS ({_DERIVE_SQL}),
pages AS (
  SELECT conv_id, turn_idx, extracted_text,
         turn_idx * {N_CONVS} + CAST(SUBSTR(conv_id, 5) AS INT) AS page_index
  FROM t WHERE extracted_text <> ''
),
toks AS (
  SELECT conv_id, turn_idx, page_index,
         unnest(string_split(extracted_text, ' ')) AS tok,
         generate_subscripts(string_split(extracted_text, ' '), 1) AS k
  FROM pages
)
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
       CAST(k - 1 AS BIGINT) AS word_idx,
       CAST(g - 1 AS BIGINT) AS glyph_idx,
       'glyph' AS class_name, CAST(0 AS BIGINT) AS class_idx,
       ROUND((g - 0.5) / LENGTH(tok), 6) AS cx,
       0.5 AS cy,
       ROUND(1.0 / LENGTH(tok), 6) AS w,
       1.0 AS h,
       CASE WHEN (page_index + 1) % 10 = 0 THEN 'val' ELSE 'train' END AS split
FROM toks, UNNEST(range(1, LENGTH(tok) + 1)) gs(g)
"""


# ------------------------------------------------- RotationAnnotator
def rotation_annotations(
    turns: "ray.data.Dataset",
    *,
    text_col: str = "text",
    validation_one_every: int | None = 10,
    image_size: int = 1280,
    page_index_fn=None,
) -> "ray.data.Dataset":
    """Rotation-model training set — ``RotationAnnotator.scala:18-103``:
    one row per page with the page's measured rotation as the LABEL
    (the reference writes it as a ``%.2f`` text file next to the
    scaled page image). Crucially it runs with ``initialTransforms =
    Seq.empty`` (``RotationAnnotator.scala:29``): unlike every other
    annotator (which sees the page AFTER ``RotationTransformer``
    unrotated it), this one reads the RAW corpus so the label is the
    still-present rotation — hence it maps over the raw TURNS dataset,
    not the extraction output. Our rotation analog is the deskewer's
    indent estimate (``functions/normalize.py::estimate_indent_skew``).

    ``scaled_width``/``scaled_height`` follow the reference's
    aspect-keeping fit into ``image_size`` (long edge pinned,
    truncating ints). Streaming map_batches — one pass, no shuffle.
    The train/val split uses ``page_index_fn(page) -> int`` (the
    corpus file-enumeration index analog; defaults to the transcript
    corpus's doc-id arithmetic — a batch-local counter would not be
    deterministic under repartitioning)."""
    from ..functions.normalize import estimate_indent_skew

    if page_index_fn is None:
        def page_index_fn(page: dict) -> int:
            return page["turn_idx"] * N_CONVS + int(page["conv_id"][4:])

    def annotate(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in _ROTATION_SCHEMA.names}
        idx_fn = page_index_fn
        for page in batch.to_pylist():
            text = page[text_col]
            if not text or not text.strip():
                continue
            lines = [ln for ln in text.split("\n")]
            width = max(len(ln) for ln in lines)
            height = len(lines)
            if width == 0:
                continue
            rotation = estimate_indent_skew(text)
            if height > width:
                sw = int(width / height * image_size)
                sh = image_size
            else:
                sw = image_size
                sh = int(height / width * image_size)
            index = idx_fn(page)
            rows["conv_id"].append(page["conv_id"])
            rows["turn_idx"].append(page["turn_idx"])
            rows["rotation"].append(rotation)
            rows["label"].append(f"{rotation:.2f}")
            rows["scaled_width"].append(sw)
            rows["scaled_height"].append(sh)
            rows["split"].append(_split_for(index, validation_one_every))
        return pa.Table.from_pydict(rows, schema=_ROTATION_SCHEMA)

    return turns.map_batches(annotate, batch_format="pyarrow")


_WORDS_PER_ROTATION_LINE = 8


def q_rotation_annotations(sf_dir: str) -> pa.Table:
    """Driver query for the rotation annotator. The flat document
    corpus is single-line (rotation identically 0 — a vacuous label),
    so the query first REFLOWS each document into a deterministic
    multi-line page with a known synthetic indent pattern (8 words per
    line, line i indented ``doc_id % 4 + i % 2`` spaces — the
    alternating inlier shape the deskewer's median±1 rule averages),
    then runs the REAL kernel on the reflowed text. The SQL oracle
    recomputes the same construction and replicates the
    median/inlier-mean estimate with window functions — if the kernel
    drifts, the hash breaks."""
    from ..functions.normalize import estimate_indent_skew  # noqa: F401

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def reflow(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if not text or not text.strip():
                continue
            words = text.split(" ")
            base = doc_id % 4
            lines = []
            for i in range(0, len(words), _WORDS_PER_ROTATION_LINE):
                li = i // _WORDS_PER_ROTATION_LINE
                indent = base + li % 2
                lines.append(
                    " " * indent
                    + " ".join(words[i : i + _WORDS_PER_ROTATION_LINE])
                )
            rows.append(
                {
                    "conv_id": f"conv{doc_id % N_CONVS:06d}",
                    "turn_idx": doc_id // N_CONVS,
                    "text": "\n".join(lines),
                    "page_index": doc_id,
                }
            )
        return pa.Table.from_pylist(rows, schema=_REFLOW_SCHEMA)

    pages = ds.map_batches(reflow, batch_format="pyarrow")
    out = rotation_annotations(
        pages,
        validation_one_every=10,
        page_index_fn=lambda p: p["page_index"],
    )
    return _round(_to_table(out), {"rotation": 4})


Q_ROTATION_ANNOTATIONS_SQL = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE LENGTH(TRIM(text)) > 0
),
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS k
  FROM docs
),
perline AS (
  SELECT doc_id,
         (k - 1) // {_WORDS_PER_ROTATION_LINE} AS li,
         doc_id % 4 + ((k - 1) // {_WORDS_PER_ROTATION_LINE}) % 2 AS ind,
         SUM(LENGTH(tok)) + COUNT(*) - 1 AS body_len
  FROM toks
  GROUP BY doc_id, (k - 1) // {_WORDS_PER_ROTATION_LINE}, doc_id % 4
),
ranked AS (
  SELECT doc_id, ind,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ind) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n
  FROM perline
),
med AS (
  SELECT doc_id, ind AS median FROM ranked WHERE rn = n // 2
),
skews AS (
  SELECT r.doc_id, AVG(CAST(r.ind AS DOUBLE)) AS rotation
  FROM ranked r JOIN med m ON r.doc_id = m.doc_id
  WHERE r.ind BETWEEN m.median - 1 AND m.median + 1
  GROUP BY r.doc_id
),
dims AS (
  SELECT doc_id,
         MAX(ind + body_len) AS width,
         COUNT(*) AS height
  FROM perline GROUP BY doc_id
)
SELECT 'conv' || LPAD(CAST(d.doc_id % {N_CONVS} AS VARCHAR), 6, '0') AS conv_id,
       CAST(d.doc_id // {N_CONVS} AS INT) AS turn_idx,
       ROUND(s.rotation, 4) AS rotation,
       printf('%.2f', s.rotation) AS label,
       CAST(CASE WHEN d.height > d.width
                 THEN FLOOR(CAST(d.width AS DOUBLE) / d.height * 1280)
                 ELSE 1280 END AS BIGINT) AS scaled_width,
       CAST(CASE WHEN d.height > d.width
                 THEN 1280
                 ELSE FLOOR(CAST(d.height AS DOUBLE) / d.width * 1280)
                 END AS BIGINT) AS scaled_height,
       CASE WHEN (d.doc_id + 1) % 10 = 0 THEN 'val' ELSE 'train' END AS split
FROM dims d JOIN skews s ON d.doc_id = s.doc_id
"""

_REFLOW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("text", pa.string()),
        pa.field("page_index", pa.int64()),
    ]
)
_ROTATION_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("rotation", pa.float64()),
        pa.field("label", pa.string()),
        pa.field("scaled_width", pa.int64()),
        pa.field("scaled_height", pa.int64()),
        pa.field("split", pa.string()),
    ]
)


# ---------------------------------------------------- fast text derivation
# The structural operators above walk the nested blocks column — the
# general path (custom segmenters, hyphen elements, alternatives all
# visible). For the standard extraction the SAME examples derive
# directly from ``extracted_text`` by the span contract: lines are the
# newline segments (blocks joined "\n\n" -> blank segments skipped),
# combined words are the maximal non-space runs of a line (piece spans
# tile lines and adjacency == no space — test-pinned), and glyph
# contents are the non-space characters. The fast q_ wrappers below
# use this derivation over a blocks-free extraction (measured 6-20x on
# the sf0.1 corpus: no nested-struct materialization, no per-page
# Python tree walk); equality with the structural operators is pinned
# by tests on the markup corpus.
import re as _re

_WORD_RUN = _re.compile(r"\S+")


def _text_line_spans(text: str) -> "list[tuple[int, int]]":
    spans = []
    pos = 0
    for seg in text.split("\n"):
        if seg:
            spans.append((pos, pos + len(seg)))
        pos += len(seg) + 1
    return spans


def _fast_extraction(sf_dir: str):
    from .extract import build_extraction

    turns = derive_transcripts(sf_dir)
    return build_extraction(turns, include_blocks=False).select_columns(
        ["conv_id", "turn_idx", "extracted_text"]
    )


# ------------------------------------------------------------- utilities


# typed empty-result schemas: an all-empty corpus yields zero-column
# empty blocks from annotate_corpus; the driver compares column NAMES,
# so the q_ wrappers must return typed empties
_LINE_EXAMPLES_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("line_idx", pa.int64()),
        pa.field("example_id", pa.string()),
        pa.field("content", pa.string()),
        pa.field("span_start", pa.int64()),
        pa.field("span_end", pa.int64()),
        pa.field("split", pa.string()),
    ]
)
_WORD_EXAMPLES_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("word_idx", pa.int64()),
        pa.field("example_id", pa.string()),
        pa.field("content", pa.string()),
        pa.field("span_start", pa.int64()),
        pa.field("span_end", pa.int64()),
        pa.field("split", pa.string()),
    ]
)
_YOLO_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("class_name", pa.string()),
        pa.field("class_idx", pa.int64()),
        pa.field("obj_idx", pa.int64()),
        pa.field("cx", pa.float64()),
        pa.field("cy", pa.float64()),
        pa.field("w", pa.float64()),
        pa.field("h", pa.float64()),
        pa.field("split", pa.string()),
    ]
)
_W2G_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("word_idx", pa.int64()),
        pa.field("glyph_idx", pa.int64()),
        pa.field("class_name", pa.string()),
        pa.field("class_idx", pa.int64()),
        pa.field("cx", pa.float64()),
        pa.field("cy", pa.float64()),
        pa.field("w", pa.float64()),
        pa.field("h", pa.float64()),
        pa.field("split", pa.string()),
    ]
)




def alto_to_text(
    corpus_dir: str,
    out_dir: str,
    *,
    keep_structure: bool = False,
    simplifier=simplify,
) -> dict:
    """ALTO-corpus -> plain-text corpus conversion — the
    ``YiddishAltoToText`` job (``yiddish/corpus/YiddishAltoToText.scala
    :21-50``): every ``*.xml`` under ``corpus_dir`` is parsed
    (``Alto.fromXML`` analog), its content written as ``basename.txt``
    plus a ``basename_simplified.txt`` twin, with the relative path
    preserved when ``keep_structure``. Distributed: the FILE LIST is
    the dataset; each task parses and writes its own files (parse +
    write scale with the corpus, the driver only counts)."""
    from pathlib import Path

    corpus = Path(corpus_dir)
    files = sorted(str(p) for p in corpus.rglob("*.xml"))
    if not files:
        raise FileNotFoundError(f"no .xml files under {corpus_dir}")
    out_root = Path(out_dir)
    out_root.mkdir(parents=True, exist_ok=True)

    def convert(batch: pa.Table) -> pa.Table:
        from ..functions.render_alto import blocks_to_text, parse_alto

        n = 0
        for path in batch["path"].to_pylist():
            p = Path(path)
            parsed = parse_alto(p.read_text(encoding="utf-8"))
            content = blocks_to_text(parsed["blocks"])
            rel = (
                p.relative_to(corpus) if keep_structure else Path(p.name)
            )
            base = out_root / rel.with_suffix("")
            base.parent.mkdir(parents=True, exist_ok=True)
            base.with_suffix(".txt").write_text(content, encoding="utf-8")
            if simplifier is not None:
                Path(f"{base}_simplified.txt").write_text(
                    simplifier(content), encoding="utf-8"
                )
            n += 1
        return pa.table({"n": pa.array([n], type=pa.int64())})

    counts = ray.data.from_items(
        [{"path": f} for f in files]
    ).map_batches(convert, batch_format="pyarrow")
    total = int(
        sum(
            t["n"][0].as_py()
            # materialize() first: a bare to_arrow_refs() re-plans a
            # limit-1 schema probe, which would RE-RUN the per-file
            # write side effects
            for t in ray.get(counts.materialize().to_arrow_refs())
            if t.num_rows
        )
    )
    return {"out_dir": str(out_root), "files": total}


def prepare_training_corpus(
    input_dir: str,
    out_dir: str,
    *,
    kind: str = "lines",
    validation_one_every: int | None = 10,
) -> dict:
    """End-to-end corpus prep job: read transcripts, extract, explode
    examples, write split-partitioned parquet (``labels/train`` /
    ``labels/val`` analog — partition dirs double as resume units)."""
    from ..sources.reader import read_transcripts
    from .extract import build_extraction

    turns = read_transcripts(input_dir)
    extracted = build_extraction(turns, include_blocks=True)
    maker = {"lines": line_examples, "words": word_examples}[kind]
    examples = maker(extracted, validation_one_every=validation_one_every)
    examples.write_parquet(out_dir, partition_cols=["split"])
    written = ray.data.read_parquet(out_dir)
    return {"out_dir": out_dir, "rows": written.count(), "kind": kind}
