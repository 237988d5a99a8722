"""Trainable glyph classifier — the GlyphTrainer / ModelBuilder analog.

Reference: ``core/learning/GlyphTrainer.scala`` trains the DJL CNN
over ``GlyphDataset`` examples (28x28 crops -> alphabet classes) and
``ModelBuilder`` persists/loads the resulting model which
``GlyphGuesser.guess`` then serves per glyph. No torch exists in this
environment, so the model here is a multinomial naive-Bayes
classifier over the glyph's crop-window context (center/left/right
characters — the text analog of the pixel crop), which is:

* **trainable the same way** — one streaming pass over the prepared
  example table (``pipelines/corpus_prep.glyph_examples``) emitting
  per-batch (class, feature) count PARTIALS, combined once on the
  driver (counts are tiny: |alphabet| x 3|alphabet|);
* **servable the same way** — ``as_candidates_fn()`` returns the
  ``glyph_candidates_fn`` hook the beam guesser consumes
  (``functions/extract.py::_guess_words``), so a trained model drops
  into the extraction pipeline exactly where ``GlyphGuesser`` does;
* **persistable** — ``to_json`` / ``from_json`` (the model-zoo
  save/load surface of ``ModelBuilder``).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import pandas as pd
import pyarrow as pa

import ray.data


def _norm_ctx(ch: str) -> str:
    """Whitespace variants collapse to one boundary symbol."""
    return " " if ch in ("", " ", "\n", "\t") else ch


def _example_features(crop_text: str, crop_start: int, span_start: int) -> list[str]:
    """(tagged) features of one training example: the center char and
    its immediate neighbours inside the crop window."""
    pos = span_start - crop_start
    center = crop_text[pos] if pos < len(crop_text) else " "
    left = crop_text[pos - 1] if pos > 0 else " "
    right = crop_text[pos + 1] if pos + 1 < len(crop_text) else " "
    return [f"c:{_norm_ctx(center)}", f"l:{_norm_ctx(left)}", f"r:{_norm_ctx(right)}"]


def _word_features(word_text: str, i: int) -> list[str]:
    """The SAME feature map at serving time, from a word's characters
    (word boundaries are spaces in the rendered text, matching the
    crop windows the model trained on)."""
    center = word_text[i]
    left = word_text[i - 1] if i > 0 else " "
    right = word_text[i + 1] if i + 1 < len(word_text) else " "
    return [f"c:{_norm_ctx(center)}", f"l:{_norm_ctx(left)}", f"r:{_norm_ctx(right)}"]


@dataclass
class GlyphClassifier:
    """Multinomial NB over crop-context features; ``alpha`` is the
    Laplace smoothing mass (unseen feature/class pairs stay possible,
    so a corrupted center char can still be out-voted by context)."""

    classes: list[str]
    class_counts: dict[str, int]
    feature_counts: dict[str, dict[str, int]]  # feature -> class -> n
    alpha: float = 0.5

    def _log_scores(self, features: list[str]) -> dict[str, float]:
        total = sum(self.class_counts.values()) or 1
        v = max(len(self.classes), 1)
        out = {}
        for cls in self.classes:
            n_c = self.class_counts.get(cls, 0)
            s = math.log((n_c + self.alpha) / (total + self.alpha * v))
            for f in features:
                n_fc = self.feature_counts.get(f, {}).get(cls, 0)
                s += math.log(
                    (n_fc + self.alpha) / (n_c + self.alpha * v)
                )
            out[cls] = s
        return out

    def predict(self, word_text: str, i: int, top_k: int = 5) -> list[tuple[str, float]]:
        """Top-k (char, confidence) for position ``i`` — the
        ``GlyphGuesser.guess(mat, glyph, k)`` serving call; confidences
        are normalized posteriors."""
        scores = self._log_scores(_word_features(word_text, i))
        if not scores:
            return [(word_text[i], 1.0)]
        m = max(scores.values())
        exp = {c: math.exp(s - m) for c, s in scores.items()}
        z = sum(exp.values())
        ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        return [(c, p / z) for c, p in ranked]

    def as_candidates_fn(self, top_k: int = 5):
        """The ``glyph_candidates_fn`` extraction hook: word text ->
        per-position candidate lists for the beam."""

        def fn(word_text: str) -> list[list[tuple[str, float]]]:
            return [
                self.predict(word_text, i, top_k)
                for i in range(len(word_text))
            ]

        return fn

    # ---- ModelBuilder surface
    def to_json(self) -> str:
        return json.dumps(
            {
                "classes": self.classes,
                "class_counts": self.class_counts,
                "feature_counts": self.feature_counts,
                "alpha": self.alpha,
            }
        )

    @classmethod
    def from_json(cls, blob: str) -> "GlyphClassifier":
        d = json.loads(blob)
        return cls(
            classes=d["classes"],
            class_counts={k: int(v) for k, v in d["class_counts"].items()},
            feature_counts={
                f: {c: int(n) for c, n in m.items()}
                for f, m in d["feature_counts"].items()
            },
            alpha=float(d["alpha"]),
        )


def train_glyph_classifier(
    examples: "ray.data.Dataset",
    alphabet: "pa.Table | None" = None,
    *,
    alpha: float = 0.5,
) -> GlyphClassifier:
    """One streaming training pass over the prepared glyph-example
    table (``glyph_examples`` rows: label + crop window): each batch
    collapses to (feature, class, n) partial counts — a few hundred
    rows however large the corpus — combined once on the driver.
    The GlyphTrainer epoch loop collapses to this single count pass
    because NB has a closed-form fit; a gradient model would reuse the
    same partial-combine shape per epoch."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[tuple[str, str], int] = {}
        cls_rows: dict[str, int] = {}
        for ex in batch.itertuples():
            feats = _example_features(
                ex.crop_text, ex.crop_start, ex.span_start
            )
            cls_rows[ex.label] = cls_rows.get(ex.label, 0) + 1
            for f in feats:
                rows[(f, ex.label)] = rows.get((f, ex.label), 0) + 1
        out = pd.DataFrame(
            [(f, c, n) for (f, c), n in rows.items()]
            + [("__class__", c, n) for c, n in cls_rows.items()],
            columns=["feature", "cls", "n"],
        )
        return out

    parts = examples.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby(["feature", "cls"], as_index=False)["n"].sum()
    class_counts = (
        agg[agg["feature"] == "__class__"]
        .set_index("cls")["n"]
        .astype(int)
        .to_dict()
    )
    feature_counts: dict[str, dict[str, int]] = {}
    for row in agg[agg["feature"] != "__class__"].itertuples():
        feature_counts.setdefault(row.feature, {})[row.cls] = int(row.n)
    if alphabet is not None:
        classes = [g for g in alphabet["glyph"].to_pylist() if g != ""]
    else:
        # classes from the observed training labels (the alphabet IS
        # the sorted distinct label set, GlyphDataset.scala:41-48)
        classes = sorted(class_counts)
    return GlyphClassifier(
        classes=classes,
        class_counts=class_counts,
        feature_counts=feature_counts,
        alpha=alpha,
    )


# ---------------------------------------------------- glyph evaluation
GLYPH_EVAL_ACC_FLOOR = 0.9


def glyph_confusion(
    examples: "ray.data.Dataset", model: GlyphClassifier
) -> pd.DataFrame:
    """Confusion counts (label, predicted, n) of ``model`` over a
    glyph-example table — the streaming core of the
    ``GlyphEvaluator.evaluate`` analog (``core/learning/
    GlyphEvaluator.scala:29-55``: guess each corpus glyph, compare to
    the simplified expected content). Each batch collapses to its
    (label, predicted) pair counts — bounded by |alphabet|^2, not by
    corpus size — and predictions are memoized per distinct crop
    trigram (the feature map only sees left/center/right), so the
    per-batch cost is O(distinct trigrams), not O(glyphs). The model
    is broadcast once via ``ray.put``."""
    model_ref = ray.put(model.to_json())

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = GlyphClassifier.from_json(ray.get(model_ref))
        memo: dict[tuple, str] = {}
        counts: dict[tuple[str, str], int] = {}
        for ex in batch.itertuples():
            feats = tuple(
                _example_features(ex.crop_text, ex.crop_start, ex.span_start)
            )
            pred = memo.get(feats)
            if pred is None:
                scores = m._log_scores(list(feats))
                pred = (
                    min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                    if scores
                    else ex.label
                )
                memo[feats] = pred
            counts[(ex.label, pred)] = counts.get((ex.label, pred), 0) + 1
        return pd.DataFrame(
            [(l, p, n) for (l, p), n in counts.items()],
            columns=["label", "predicted", "n"],
        )

    parts = examples.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=["label", "predicted", "n"])
    return parts.groupby(["label", "predicted"], as_index=False)["n"].sum()


def evaluate_glyph_classifier(
    examples: "ray.data.Dataset", model: GlyphClassifier
) -> pa.Table:
    """Per-class accuracy table + a trailing ``Mean`` row — the
    corpus-level evaluation job the reference runs via
    ``YiddishGlyphEvaluator`` (``yiddish/learning/
    YiddishGlyphEvaluator.scala:38-49``, overall accuracy) extended
    with the per-class breakdown. One streaming confusion pass
    (:func:`glyph_confusion`); the per-class fold happens on the
    alphabet-sized driver table."""
    conf = glyph_confusion(examples, model)
    labels = sorted(conf["label"].unique()) if len(conf) else []
    rows = []
    total_n = total_correct = 0
    for label in labels:
        sub = conf[conf["label"] == label]
        n = int(sub["n"].sum())
        n_correct = int(sub.loc[sub["predicted"] == label, "n"].sum())
        total_n += n
        total_correct += n_correct
        rows.append((label, n, n_correct, n_correct / n if n else 0.0))
    rows.append(
        (
            "Mean",
            total_n,
            total_correct,
            total_correct / total_n if total_n else 0.0,
        )
    )
    return pa.table(
        {
            "label": pa.array([r[0] for r in rows], type=pa.string()),
            "n_examples": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_correct": pa.array([r[2] for r in rows], type=pa.int64()),
            "accuracy": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )


# -------------------------------------------------- document classifier
DOC_FEATURE_BUCKETS = 1 << 18


def _doc_feature(token: str, n_buckets: "int | None") -> str:
    """Token -> feature key. With ``n_buckets`` set this is the
    hashing trick: every token maps to one of ``n_buckets`` stable
    buckets (blake2b-64, NOT Python's per-process ``hash``), so the
    count partials, the driver combine and the serialized model are
    all bounded by buckets x classes however large the corpus
    vocabulary grows. At the default 2^18 buckets a small vocabulary
    (v << sqrt(2^18)) is collision-free in practice, so nothing is
    lost at test scale. ``None`` keeps exact token features."""
    if n_buckets is None:
        return token
    import hashlib

    h = int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
    )
    return str(h % n_buckets)


class DocClassifier:
    """Multinomial NB over word unigrams — the trainable DOC-level
    sibling of :class:`GlyphClassifier` (language ID / quality-domain
    classification for training-data routing). Same streaming fit
    shape: per-batch (feature, class) count partials, tiny driver
    combine. The feature space is capped by hashing tokens into
    ``n_feature_buckets`` buckets (the web-scale guard — state is
    O(buckets x classes) regardless of corpus vocabulary); pass
    ``n_feature_buckets=None`` for exact token features."""

    def __init__(self, classes: list[str], class_counts: dict,
                 feature_counts: dict, alpha: float = 0.5,
                 n_feature_buckets: "int | None" = DOC_FEATURE_BUCKETS):
        self.classes = classes
        self.class_counts = class_counts
        self.feature_counts = feature_counts  # feature -> class -> n
        self.alpha = alpha
        self.n_feature_buckets = n_feature_buckets

    def predict(self, text: str) -> str:
        tokens = [
            _doc_feature(t, self.n_feature_buckets)
            for t in str(text).lower().split()
        ]
        total = sum(self.class_counts.values()) or 1
        v = max(len(self.feature_counts), 1)
        best, best_s = self.classes[0] if self.classes else "", -1e30
        for cls in self.classes:
            n_c = self.class_counts.get(cls, 0)
            s = math.log((n_c + self.alpha) / (total + self.alpha * len(self.classes or [1])))
            for t in tokens:
                n_tc = self.feature_counts.get(t, {}).get(cls, 0)
                s += math.log((n_tc + self.alpha) / (n_c + self.alpha * v))
            if s > best_s:
                best, best_s = cls, s
        return best

    def to_json(self) -> str:
        return json.dumps(
            {
                "classes": self.classes,
                "class_counts": self.class_counts,
                "feature_counts": self.feature_counts,
                "alpha": self.alpha,
                "n_feature_buckets": self.n_feature_buckets,
            }
        )

    @classmethod
    def from_json(cls, blob: str) -> "DocClassifier":
        d = json.loads(blob)
        return cls(d["classes"], d["class_counts"], d["feature_counts"],
                   d["alpha"], d.get("n_feature_buckets"))


def train_doc_classifier(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 0.5,
    n_feature_buckets: "int | None" = DOC_FEATURE_BUCKETS,
) -> DocClassifier:
    """One streaming count pass: each batch collapses to (feature,
    class, n) partials; the driver combines a table bounded by
    min(vocabulary, ``n_feature_buckets``) x classes — never
    documents, and never an unbounded vocabulary (tokens are hashed
    into the bucket space inside the partial, so the cap holds on the
    workers too)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[tuple[str, str], int] = {}
        cls_rows: dict[str, int] = {}
        feat_memo: dict[str, str] = {}
        for text, label in zip(batch[text_col], batch[label_col]):
            cls_rows[label] = cls_rows.get(label, 0) + 1
            for t in str(text).lower().split():
                f = feat_memo.get(t)
                if f is None:
                    f = feat_memo[t] = _doc_feature(t, n_feature_buckets)
                rows[(f, label)] = rows.get((f, label), 0) + 1
        return pd.DataFrame(
            [(t, c, n) for (t, c), n in rows.items()]
            + [("__class__", c, n) for c, n in cls_rows.items()],
            columns=["feature", "cls", "n"],
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby(["feature", "cls"], as_index=False)["n"].sum()
    class_counts = (
        agg[agg["feature"] == "__class__"].set_index("cls")["n"].astype(int).to_dict()
    )
    feature_counts: dict[str, dict[str, int]] = {}
    for row in agg[agg["feature"] != "__class__"].itertuples():
        feature_counts.setdefault(row.feature, {})[row.cls] = int(row.n)
    return DocClassifier(
        classes=sorted(class_counts),
        class_counts=class_counts,
        feature_counts=feature_counts,
        alpha=alpha,
        n_feature_buckets=n_feature_buckets,
    )
