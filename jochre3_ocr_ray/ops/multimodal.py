"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as an actor-pool
``map_batches`` stage with small batches (large payloads → batch
memory = batch_size × payload, so the stage pins ``batch_size`` low
and relies on the streaming executor's backpressure).

The actual codecs are NOT in this container, so ``decode_image`` is a
clearly-marked stub (``NotImplementedError``) and the default feature
extractor is a deterministic fake (blake2b-seeded vector) — the
Ray-side plumbing (schema, actor signature, batch sizing, output
layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_META_TYPE = pa.struct(
    [
        pa.field("media_type", pa.string()),   # "image" | "audio" | "video"
        pa.field("format", pa.string()),       # "png" | "wav" | ...
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("meta", MEDIA_META_TYPE),
    ]
)

FEATURE_DIM = 32


def decode_image(payload: bytes, fmt: str) -> "object":
    """Decode an image payload to pixels. STUB — no codec libraries in
    this environment. The real implementation plugs in here (PIL/
    opencv) without touching the Ray plumbing."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "swap in PIL/opencv here"
    )


def fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic fake embedding: md5-chain float vector in [-1, 1).
    Stands in for a model forward pass. md5 (not blake2b) so the
    feature — and therefore ``q_media_features``'s norms — can be
    recomputed independently by the DuckDB oracle: dim ``8k+j`` is the
    j-th 4-hex-char chunk of ``md5(payload || ':' || k)``."""
    vals: list[int] = []
    for k in range(FEATURE_DIM // 8):
        hexd = hashlib.md5(payload + b":" + str(k).encode()).hexdigest()
        vals.extend(int(hexd[4 * j : 4 * j + 4], 16) for j in range(8))
    return (np.array(vals, dtype=np.float64) / 32768.0) - 1.0


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload -> feature vector + stats.

    Model/codec state would load once here in ``__init__`` (the
    GlyphGuesser pattern, reference ``core/learning/
    GlyphGuesser.scala:20-81``)."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim  # model load goes here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [fake_feature(p) for p in payloads]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
                "feature": pa.array(
                    [f.tolist() for f in feats],
                    type=pa.list_(pa.float64(), self.feature_dim),
                ),
            }
        )


def synthesize_media_dataset(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic fake media table derived from documents: payload =
    utf-8 bytes of the text, metadata from its length."""
    from ..sources.reader import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        metas = [
            {
                "media_type": "image",
                "format": "fake",
                "width": (len(t) % 64) + 1,
                "height": ((len(t) // 64) % 64) + 1,
                "duration_ms": 0,
            }
            for t in texts
        ]
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "payload": pa.array(
                    [t.encode("utf-8") for t in texts], type=pa.binary()
                ),
                "meta": pa.array(metas, type=MEDIA_META_TYPE),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=1024)


def q_media_features(sf_dir: str) -> pa.Table:
    """Feature extraction over the synthesized media table; returns
    (media_id, n_bytes, feat_norm). Hash-checked: the fake feature is
    an md5 chain the SQL oracle recomputes term by term."""
    media = synthesize_media_dataset(sf_dir)
    feats = media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,           # small: payloads can be large
        concurrency=(1, 4),
        num_cpus=1,
    )

    def norms(batch: pa.Table) -> pa.Table:
        from .relational import _round

        mat = np.stack(
            [np.asarray(f, dtype=np.float64) for f in batch["feature"].to_pylist()]
        )
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": batch["n_bytes"],
                "feat_norm": pa.array(np.linalg.norm(mat, axis=1)),
            }
        )
        return _round(out, {"feat_norm": 4})

    return feats.map_batches(norms, batch_format="pyarrow")


def _media_features_sql() -> str:
    """Generated oracle: recompute every fake-feature dimension from
    ``md5(text || ':' || k)`` hex chunks, then the L2 norm. The media
    table is itself derived from ``documents`` (payload = utf-8 text
    bytes), so the oracle runs on the same base table."""
    terms = " + ".join(
        f"power(('0x' || substr(md5(text || ':{k}'), {4 * j + 1}, 4))::BIGINT"
        " / 32768.0 - 1.0, 2)"
        for k in range(FEATURE_DIM // 8)
        for j in range(8)
    )
    return f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       ROUND(sqrt({terms}), 4) AS feat_norm
FROM documents
"""


Q_MEDIA_FEATURES_SQL = _media_features_sql()


def resize_image(payload: bytes, fmt: str, width: int, height: int) -> bytes:
    """Resize an image payload. STUB — no codec libraries in this
    environment (PIL/opencv plug in here); the Ray-side plumbing
    (actor signature, batch sizing) is real and tested via the fake
    format."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "swap in PIL/opencv here"
    )


FRAME_BYTES = 64  # fake-codec frame size


class FrameSampler:
    """Actor-pool frame-sampling stage: one media row -> N frame rows
    (the flat_map-shaped explode of the multimodal brief). The real
    video codec plugs into ``_split_frames``; the fake format defines
    a frame as a fixed byte chunk, so the plumbing — explode, per-frame
    ids, small ``batch_size`` for payload memory — is real and
    oracle-checkable while the codec is stubbed."""

    def __init__(self, every_nth: int = 2, frame_bytes: int = FRAME_BYTES):
        self.every_nth = every_nth      # temporal subsampling knob
        self.frame_bytes = frame_bytes  # codec state loads here

    def _split_frames(self, payload: bytes, fmt: str) -> list[bytes]:
        if fmt != "fake":
            raise NotImplementedError(
                "video codecs are not available in this environment"
            )
        fb = self.frame_bytes
        return [payload[i : i + fb] for i in range(0, len(payload), fb)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, frames = [], [], []
        metas = batch["meta"].to_pylist()
        for mid, payload, meta in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), metas
        ):
            all_frames = self._split_frames(payload, meta["format"])
            for k in range(0, len(all_frames), self.every_nth):
                media_ids.append(mid)
                frame_idx.append(k)
                frames.append(all_frames[k])
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def q_media_frames(sf_dir: str) -> pa.Table:
    """Frame sampling over the synthesized media table: explode every
    media row into its sampled frames (every 2nd fixed-size chunk of
    the fake codec), then per-media frame counts + byte totals. The
    oracle recomputes both from the payload length arithmetic."""
    media = synthesize_media_dataset(sf_dir)
    frames = media.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=256,           # small: frame explosion amplifies rows
        concurrency=(1, 4),
        num_cpus=1,
    )

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.binary_length(batch["frame"])
        t = pa.table(
            {
                "media_id": batch["media_id"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "bytes": pc.cast(lens, pa.int64()),
            }
        )
        return t.group_by("media_id").aggregate([("n", "sum"), ("bytes", "sum")])

    partials = frames.map_batches(counts, batch_format="pyarrow")
    from .relational import _to_table

    result = (
        _to_table(partials)
        .group_by("media_id")
        .aggregate([("n_sum", "sum"), ("bytes_sum", "sum")])
        .rename_columns(["media_id", "n_frames", "frame_bytes"])
    )
    return result


Q_MEDIA_FRAMES_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
frames AS (
  -- empty payloads produce no frame rows on the Ray side (flat_map
  -- explodes zero frames), so drop them here too (ADVICE r2)
  SELECT media_id, n_bytes,
         CAST(CEIL(n_bytes / {FRAME_BYTES}.0) AS BIGINT) AS total_frames
  FROM m
  WHERE n_bytes > 0
)
SELECT media_id,
       -- every 2nd frame: ceil(total/2)
       CAST(CEIL(total_frames / 2.0) AS BIGINT) AS n_frames,
       -- sampled frame bytes: full chunks of {FRAME_BYTES} except a
       -- short tail chunk when the LAST frame index is even (sampled)
       CAST(
         CEIL(total_frames / 2.0) * {FRAME_BYTES}
         - CASE WHEN (total_frames - 1) % 2 = 0
                THEN ({FRAME_BYTES} - (CASE WHEN n_bytes % {FRAME_BYTES} = 0
                                            THEN {FRAME_BYTES}
                                            ELSE n_bytes % {FRAME_BYTES} END))
                ELSE 0 END
       AS BIGINT) AS frame_bytes
FROM frames
"""


# ------------------------------------------------------------- resize
RESIZE_FACTOR = 4


class MediaResizer:
    """Actor-pool resize stage — the ``ResizeImageAndKeepAspectRatio``
    service shape for binary media (small ``batch_size``: input AND
    output payloads live in the batch). The real codec plugs into
    ``_resize``; the fake format defines resize-by-k as keeping every
    k-th byte, so the plumbing (actor signature, payload-in/payload-out
    schema, scale metadata column) is real and oracle-checkable."""

    def __init__(self, factor: int = RESIZE_FACTOR):
        self.factor = factor  # codec/model state loads here

    def _resize(self, payload: bytes, fmt: str) -> bytes:
        if fmt != "fake":
            return resize_image(payload, fmt, 0, 0)  # real-codec stub
        return payload[:: self.factor]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmts = [m["format"] for m in batch["meta"].to_pylist()]
        out = [self._resize(p, f) for p, f in zip(payloads, fmts)]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, type=pa.binary()),
                "n_bytes_in": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
                "n_bytes_out": pa.array(
                    [len(p) for p in out], type=pa.int64()
                ),
                "scale": pa.array(
                    [1.0 / self.factor] * len(out), type=pa.float64()
                ),
            }
        )


def q_media_resize(sf_dir: str, factor: int = RESIZE_FACTOR) -> pa.Table:
    """Resize plumbing over the synthesized media table; returns
    (media_id, n_bytes_in, n_bytes_out, scale). Hash-checked: the fake
    resize keeps every k-th byte, so n_bytes_out = ceil(n/k) — pure
    byte arithmetic the oracle recomputes."""
    media = synthesize_media_dataset(sf_dir)
    resized = media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow",
        batch_size=256,           # payloads in AND out of the batch
        concurrency=(1, 4),
        num_cpus=1,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["payload"])

    return resized.map_batches(project, batch_format="pyarrow")


Q_MEDIA_RESIZE_SQL = f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
       CAST(CEIL(octet_length(encode(text)) / {RESIZE_FACTOR}.0) AS BIGINT)
         AS n_bytes_out,
       1.0 / {RESIZE_FACTOR} AS scale
FROM documents
"""


# ---------------------------------------------------- fused media pass
class MediaPipeline:
    """Fused decode-once media stage: ONE pass over each payload
    computes the feature norm, the sampled-frame counts and the resize
    byte accounting — the production shape (decode a 100-TB media
    corpus once, run every extraction on the decoded buffer) instead of
    three separate payload scans. Actor pool: codec/model state would
    load once here; the sub-kernels are the SAME objects the standalone
    stages use (``fake_feature``, ``FrameSampler._split_frames``,
    ``MediaResizer._resize``), so fused and standalone cannot drift.

    Zero-byte payloads explode into zero frames on the standalone path;
    here they carry n_frames = frame_bytes = 0 (every media row keeps
    its profile row)."""

    def __init__(self, every_nth: int = 2, factor: int = RESIZE_FACTOR):
        self._sampler = FrameSampler(every_nth=every_nth)
        self._resizer = MediaResizer(factor=factor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        feat_norm, n_frames, frame_bytes, n_out = [], [], [], []
        for payload, meta in zip(payloads, metas):
            feat_norm.append(float(np.linalg.norm(fake_feature(payload))))
            frames = self._sampler._split_frames(payload, meta["format"])
            sampled = frames[:: self._sampler.every_nth]
            n_frames.append(len(sampled))
            frame_bytes.append(sum(len(f) for f in sampled))
            n_out.append(len(self._resizer._resize(payload, meta["format"])))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
                "feat_norm": pa.array(
                    np.round(np.array(feat_norm, dtype=np.float64), 4)
                ),
                "n_frames": pa.array(n_frames, type=pa.int64()),
                "frame_bytes": pa.array(frame_bytes, type=pa.int64()),
                "n_bytes_out": pa.array(n_out, type=pa.int64()),
                "scale": pa.array(
                    [1.0 / self._resizer.factor] * len(payloads),
                    type=pa.float64(),
                ),
            }
        )


_MEDIA_PIPELINE_SINGLETON: "MediaPipeline | None" = None


def media_pipeline_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task kernel with per-worker state: the fused media
    stage builds once per worker process (codec/model state would load
    there) — an actor pool pays a spawn wave per query and caps
    parallelism at its pool size."""
    global _MEDIA_PIPELINE_SINGLETON
    if _MEDIA_PIPELINE_SINGLETON is None:
        _MEDIA_PIPELINE_SINGLETON = MediaPipeline()
    return _MEDIA_PIPELINE_SINGLETON(batch)


def q_media_pipeline(sf_dir: str) -> "ray.data.Dataset":
    """Driver entry consolidating media_features / media_frames /
    media_resize into the decode-once fused pass (each standalone stage
    remains exposed + oracle-equivalent; see ``MediaPipeline``)."""
    media = synthesize_media_dataset(sf_dir)
    return media.map_batches(
        media_pipeline_batch,
        batch_format="pyarrow",
        batch_size=256,           # payloads live in the batch
        num_cpus=1,
    )


Q_MEDIA_PIPELINE_SQL = f"""
WITH f AS ({Q_MEDIA_FEATURES_SQL}),
fr AS ({Q_MEDIA_FRAMES_SQL}),
rz AS ({Q_MEDIA_RESIZE_SQL})
SELECT f.media_id, f.n_bytes, f.feat_norm,
       COALESCE(fr.n_frames, 0) AS n_frames,
       COALESCE(fr.frame_bytes, 0) AS frame_bytes,
       rz.n_bytes_out, rz.scale
FROM f
LEFT JOIN fr ON f.media_id = fr.media_id
JOIN rz ON f.media_id = rz.media_id
"""
