"""Training-data curation pipeline — the ops composed end-to-end.

The document-side flagship (the brief's large-scale training-data
pipeline): quality scoring -> threshold filters -> exact dedup
(keep-one per content hash) -> optional near-dup cluster pruning.
Every stage is a vectorized ``map_batches`` or a hash-partitioned
group stage; nothing materializes the corpus.

``curate_documents`` (exact-dedup only), ``curate_documents_near_dup``
(MinHash-cluster pruning — deterministically exact on this corpus, see
``ops/dedup.py``), and ``curate_training_chunks`` (the full quality ->
scrub -> dedup -> chunk -> split composition) are all hash-checked
against SQL oracles.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..ops.relational import _read, _round, _to_table, partitioned_apply

MIN_TOKENS = 10
MIN_ALPHA = 0.5


def _stats_and_hash(batch: pa.Table) -> pa.Table:
    """Vectorized quality stats + content hash per document."""
    text = batch["text"]
    trimmed = pc.utf8_trim_whitespace(text)
    ws_runs = pc.count_substring_regex(trimmed, r"\s+")
    nonempty = pc.greater(pc.utf8_length(trimmed), 0)
    n_tokens = pc.if_else(nonempty, pc.add(ws_runs, 1), pa.scalar(0, pa.int32()))
    n = pc.cast(pc.utf8_length(text), pa.float64())
    alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
    alpha_ratio = pc.divide(alpha, pc.max_element_wise(n, pa.scalar(1.0)))
    digests = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in text.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_hash": pa.array(digests),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "alpha_ratio": alpha_ratio,
        }
    )


def curated_dataset(
    sf_dir: str,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
) -> "ray.data.Dataset":
    """documents -> kept (doc_id, n_tokens, alpha_ratio) rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stats = ds.map_batches(_stats_and_hash, batch_format="pyarrow",
                           batch_size=65536)

    def quality_filter(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["n_tokens"], min_tokens),
            pc.greater_equal(batch["alpha_ratio"], min_alpha),
        )
        return batch.filter(mask)

    filtered = stats.map_batches(quality_filter, batch_format="pyarrow")

    # exact dedup keep-one: hash-partitioned, min doc_id per text_hash
    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.loc[part.groupby("text_hash")["doc_id"].idxmin()]

    return partitioned_apply(filtered, ["text_hash"], keep_first)


def balanced_training_mix(
    sf_dir: str,
    n_per_stratum: int = 25,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    hash_fn: str = "siphash",
) -> "ray.data.Dataset":
    """Quality-filter -> exact-dedup -> BALANCED per-(lang, source)
    fixed-size sample — the data-mixing step of a training pipeline
    (equal examples per stratum regardless of how skewed the raw
    corpus is). Sampling is the deterministic bottom-k hash sketch
    (``sources.sampling.stratified_sample``), so the mix is
    reproducible across runs, resumes and partitionings. Returns
    kept rows ``(doc_id, lang, source, n_tokens)``. ``hash_fn="md5"``
    swaps the sampling key hash for the SQL-replicable one (the
    driver-oracle path; siphash stays the scale default)."""
    from ..sources.sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def stats(batch: pa.Table) -> pa.Table:
        out = _stats_and_hash(batch.select(["doc_id", "text"]))
        return out.append_column("lang", batch["lang"]).append_column(
            "source", batch["source"]
        )

    scored = ds.map_batches(stats, batch_format="pyarrow", batch_size=65536)

    def quality_filter(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch["n_tokens"], min_tokens),
            pc.greater_equal(batch["alpha_ratio"], min_alpha),
        )
        return batch.filter(mask)

    filtered = scored.map_batches(quality_filter, batch_format="pyarrow")

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.loc[part.groupby("text_hash")["doc_id"].idxmin()]

    deduped = partitioned_apply(filtered, ["text_hash"], keep_first)

    def add_stratum(batch: pa.Table) -> pa.Table:
        stratum = pc.binary_join_element_wise(
            pc.cast(batch["lang"], pa.string()),
            pc.cast(batch["source"], pa.string()),
            "/",
        )
        return batch.append_column("stratum", stratum)

    with_stratum = deduped.map_batches(add_stratum, batch_format="pyarrow")
    sampled = stratified_sample(
        with_stratum,
        n_per_stratum,
        group_col="stratum",
        key_col="doc_id",
        hash_fn=hash_fn,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "lang", "source", "n_tokens"])

    return sampled.map_batches(project, batch_format="pyarrow")


BALANCED_N_PER_STRATUM = 5


def q_balanced_mix(
    sf_dir: str, n_per_stratum: int = BALANCED_N_PER_STRATUM
) -> pa.Table:
    """Driver entry for the balanced training mix + the deterministic
    training tape: quality filter -> exact dedup -> per-(lang, source)
    bottom-k sample, then a ``tape_pos`` column giving each sampled
    row's position in the epoch-salted deterministic shuffle
    (``sources.sampling.deterministic_shuffle`` semantics: rank of the
    salted key hash). Both the sample membership AND the permutation
    use the SQL-replicable md5 key hash, so the oracle recomputes the
    exact row set and the exact tape order. The tape rank here is
    computed driver-side because the sampled mix is fixed-size-small
    by construction (n_per_stratum x strata); the full-corpus tape is
    ``deterministic_shuffle`` — one distributed sort, no driver
    state."""
    import numpy as np

    from ..sources.sampling import _md5_hash64

    tab = _to_table(
        balanced_training_mix(
            sf_dir, n_per_stratum=n_per_stratum, hash_fn="md5"
        )
    ).to_pandas()
    if tab.empty:
        # everything quality-filtered away: a typed empty mix (the
        # schema can't be recovered from the empty map_groups output)
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "tape_pos": pa.array([], type=pa.int64()),
            }
        )
    h = _md5_hash64(tab["doc_id"].to_numpy(), salt="tape:")
    tab = (
        tab.assign(_h=h)
        .sort_values(["_h", "doc_id"])
        .reset_index(drop=True)
        .drop(columns=["_h"])
    )
    tab["tape_pos"] = np.arange(len(tab), dtype=np.int64)
    return pa.Table.from_pandas(tab, preserve_index=False)


Q_BALANCED_MIX_SQL = f"""
WITH stats AS (
  SELECT doc_id, text, lang, source,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
         END AS n_tokens,
         LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
           / GREATEST(LENGTH(text), 1.0) AS alpha_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM stats
  WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY text
),
deduped AS (
  SELECT f.doc_id, f.lang, f.source, f.n_tokens
  FROM filtered f JOIN keepers k ON f.doc_id = k.doc_id
),
ranked AS (
  SELECT doc_id, lang, source, n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                    doc_id
         ) AS rn
  FROM deduped
),
sampled AS (
  SELECT doc_id, lang, source, n_tokens FROM ranked
  WHERE rn <= {BALANCED_N_PER_STRATUM}
)
SELECT doc_id, lang, source, n_tokens,
       ROW_NUMBER() OVER (
         ORDER BY ('0x' || substr(md5('tape:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
                  doc_id
       ) - 1 AS tape_pos
FROM sampled
"""


def q_curate_documents(sf_dir: str) -> pa.Table:
    kept = _to_table(curated_dataset(sf_dir))
    kept = kept.select(["doc_id", "n_tokens", "alpha_ratio"])
    return _round(kept, {"alpha_ratio": 4})


Q_CURATE_DOCUMENTS_SQL = f"""
WITH stats AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
         END AS n_tokens,
         LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
           / GREATEST(LENGTH(text), 1.0) AS alpha_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM stats
  WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY text
)
SELECT f.doc_id, f.n_tokens, ROUND(f.alpha_ratio, 4) AS alpha_ratio
FROM filtered f JOIN keepers k ON f.doc_id = k.doc_id
"""


def q_curate_documents_near_dup(sf_dir: str) -> pa.Table:
    """Curation + near-dup cluster pruning, keep-one per cluster.

    The canonical keeper is recomputed per cluster among the members
    that SURVIVED the quality filter + exact dedup (not the
    corpus-wide min id): if a cluster's global canonical doc was
    quality-filtered away, the smallest surviving member is kept
    instead — a keep-one dedup must never silently drop a whole
    cluster's content.

    Shape: the cluster table is tiny (only near-dup members), so it is
    broadcast; the curated corpus streams through one tagging pass;
    only the CLUSTERED survivors (tiny) come to the driver to pick
    keepers; the final filter streams again with the keeper set
    broadcast. The corpus itself never materializes."""
    tagged, keepers = _cluster_tagged_curation(sf_dir)
    import ray

    keep_ref = ray.put(keepers)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keep_ref)
        mask = (batch["cluster_id"] < 0) | batch["doc_id"].isin(ks)
        return batch.loc[mask, ["doc_id", "n_tokens", "alpha_ratio"]]

    out = _to_table(tagged.map_batches(prune, batch_format="pandas"))
    return _round(out, {"alpha_ratio": 4})


def _cluster_tagged_curation(sf_dir: str):
    """Shared machinery of the near-dup curation variants: curate ->
    tag every row with its near-dup cluster id (broadcast map, -1 =
    unclustered) -> pick per-cluster canonical keepers AMONG THE
    CURATED SURVIVORS (not the corpus-wide min id — a cluster whose
    global canonical doc was quality-filtered away keeps its smallest
    surviving member instead). Returns the MATERIALIZED tagged
    dataset (a tiny 5-scalar-column table — materializing avoids
    re-running the curation lineage for each downstream consumer) and
    the keeper id set."""
    import ray

    from ..ops.dedup import q_dedup_clusters

    clusters = q_dedup_clusters(sf_dir).to_pandas()
    cluster_map = dict(
        zip(clusters["doc_id"].astype(int), clusters["cluster_id"].astype(int))
    )
    map_ref = ray.put(cluster_map)

    kept = curated_dataset(sf_dir)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        batch = batch.copy()
        batch["cluster_id"] = [m.get(int(d), -1) for d in batch["doc_id"]]
        return batch

    tagged = kept.map_batches(tag, batch_format="pandas").materialize()
    clustered = _to_table(
        tagged.map_batches(
            lambda b: b[b["cluster_id"] >= 0], batch_format="pandas"
        )
    ).to_pandas()
    if len(clustered):
        keepers = set(
            clustered.groupby("cluster_id")["doc_id"].min().astype(int)
        )
    else:
        keepers = set()
    return tagged, keepers


def _curate_near_dup_sql() -> str:
    from ..ops.dedup import JACCARD_THRESHOLD, _clusters_ctes

    return f"""
WITH RECURSIVE {_clusters_ctes(JACCARD_THRESHOLD)},
stats AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
         END AS n_tokens,
         LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
           / GREATEST(LENGTH(text), 1.0) AS alpha_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM stats
  WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
),
exact_keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY text
),
curated AS (
  SELECT f.doc_id, f.n_tokens, f.alpha_ratio
  FROM filtered f JOIN exact_keepers k ON f.doc_id = k.doc_id
),
tagged AS (
  SELECT c.*, COALESCE(cl.cluster_id, c.doc_id) AS cid
  FROM curated c LEFT JOIN clusters cl ON cl.doc_id = c.doc_id
)
SELECT doc_id, n_tokens, ROUND(alpha_ratio, 4) AS alpha_ratio
FROM (
  SELECT t.*, MIN(doc_id) OVER (PARTITION BY cid) AS keeper FROM tagged t
)
WHERE doc_id = keeper
"""


Q_CURATE_DOCUMENTS_NEAR_DUP_SQL = _curate_near_dup_sql()


def q_curate_documents_all(sf_dir: str) -> pa.Table:
    """Consolidated driver entry: BOTH curation variants — exact-dedup
    -only and exact+near-dup-cluster pruning — tagged-unioned on
    ``(mode, doc_id, n_tokens, alpha_ratio)`` so the whole query
    surface fits the driver's 50-slot correctness window (the
    customers_semi_anti consolidation shape). Each variant keeps its
    own independent SQL ground truth.

    Fused execution: the curated corpus streams ONCE through one
    cluster-tagging pass (``_cluster_tagged_curation`` — materialized
    as a tiny scalar table so the curation lineage runs once, not per
    consumer), and a single map emits the exact rows plus the pruned
    near-dup rows (their outputs are equality-pinned against the
    standalone ``q_curate_documents`` / ``q_curate_documents_near_dup``
    in TestConsolidatedEntries). Only the tiny CLUSTERED subset comes
    to the driver to pick keepers, exactly as in the standalone
    near-dup variant."""
    import ray

    tagged, keepers = _cluster_tagged_curation(sf_dir)
    keep_ref = ray.put(keepers)

    cols = ["doc_id", "n_tokens", "alpha_ratio"]

    def emit_both(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keep_ref)
        exact = batch[cols].assign(mode="exact")
        mask = (batch["cluster_id"] < 0) | batch["doc_id"].isin(ks)
        nd = batch.loc[mask, cols].assign(mode="near_dup")
        return pd.concat([exact, nd], ignore_index=True)

    out = _round(
        _to_table(tagged.map_batches(emit_both, batch_format="pandas")),
        {"alpha_ratio": 4},
    )
    return out.select(["mode", "doc_id", "n_tokens", "alpha_ratio"])


Q_CURATE_DOCUMENTS_ALL_SQL = f"""
SELECT 'exact' AS mode, doc_id, n_tokens, alpha_ratio
FROM ({Q_CURATE_DOCUMENTS_SQL}) ex
UNION ALL
SELECT 'near_dup', doc_id, n_tokens, alpha_ratio
FROM ({Q_CURATE_DOCUMENTS_NEAR_DUP_SQL}) nd
"""


# ------------------------------------------- full training-data pipeline
VAL_PCT = 10


def curate_training_chunks_ds(sf_dir: str) -> "ray.data.Dataset":
    """The canonical LLM training-data pipeline composed end-to-end —
    quality filter -> PII scrub -> exact dedup (keep min id per
    SCRUBBED text, the real-world order: scrub first so near-identical
    docs differing only in redacted PII dedupe together) -> overlapping
    training-window chunking -> deterministic hash train/val split.
    Every stage is the already-oracle-checked operator; the composition
    itself is hash-checked against one composed SQL oracle. All stages
    stream: vectorized map_batches + one hash-partitioned keep-one;
    the corpus never materializes."""
    import numpy as np

    from ..ops.textstats import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        PII_PATTERNS,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        # quality stats on the ORIGINAL text
        text = batch["text"]
        trimmed = pc.utf8_trim_whitespace(text)
        ws_runs = pc.count_substring_regex(trimmed, r"\s+")
        nonempty = pc.greater(pc.utf8_length(trimmed), 0)
        n_tokens = pc.if_else(
            nonempty, pc.add(ws_runs, 1), pa.scalar(0, pa.int32())
        )
        n = pc.cast(pc.utf8_length(text), pa.float64())
        alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
        alpha_ratio = pc.divide(alpha, pc.max_element_wise(n, pa.scalar(1.0)))
        mask = pc.and_(
            pc.greater_equal(pc.cast(n_tokens, pa.int64()), MIN_TOKENS),
            pc.greater_equal(alpha_ratio, MIN_ALPHA),
        )
        kept = batch.filter(mask)
        # PII scrub (same RE2 chain as q_pii_scrub)
        scrubbed = kept["text"]
        for name, pattern in PII_PATTERNS:
            scrubbed = pc.replace_substring_regex(
                scrubbed, pattern, f"<{name.upper()}>"
            )
        digests = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in scrubbed.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "scrubbed": scrubbed,
                "text_hash": pa.array(digests),
            }
        )

    staged = ds.map_batches(stage, batch_format="pyarrow", batch_size=65536)

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        return part.loc[part.groupby("text_hash")["doc_id"].idxmin()]

    kept = partitioned_apply(staged, ["text_hash"], keep_first)

    val_threshold = (1 << 32) * VAL_PCT // 100

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "chunk_idx": [], "chunk_text": [],
                "n_tokens": [], "split": []}
        for doc_id, text in zip(batch["doc_id"], batch["scrubbed"]):
            toks = str(text).split()
            nt = len(toks)
            if nt == 0:
                continue
            split = (
                "val"
                if int(
                    hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16
                ) < val_threshold
                else "train"
            )
            k = 0
            start = 0
            while start < nt:
                piece = toks[start : start + CHUNK_TOKENS]
                rows["doc_id"].append(int(doc_id))
                rows["chunk_idx"].append(k)
                rows["chunk_text"].append(" ".join(piece))
                rows["n_tokens"].append(len(piece))
                rows["split"].append(split)
                if start + CHUNK_TOKENS >= nt:
                    break
                k += 1
                start += CHUNK_STRIDE
        import pandas as _pd

        return _pd.DataFrame(rows)

    return kept.map_batches(chunk, batch_format="pandas")


def q_curate_training_chunks(sf_dir: str) -> pa.Table:
    """Driver entry: materializes the (test-scale) chunk table; the
    streaming consumer is ``curate_training_chunks_ds(...).
    write_parquet(out, partition_cols=["split"])``."""
    t = _to_table(curate_training_chunks_ds(sf_dir))
    if t.num_columns == 0:
        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "split": pa.array([], type=pa.string()),
            }
        )
    return t


def _curate_training_chunks_sql() -> str:
    from ..ops.textstats import CHUNK_STRIDE, CHUNK_TOKENS, PII_PATTERNS

    scrub_expr = "text"
    for name, pattern in PII_PATTERNS:
        pat = pattern.replace("'", "''")
        scrub_expr = (
            f"regexp_replace({scrub_expr}, '{pat}', '<{name.upper()}>', 'g')"
        )
    return f"""
WITH stats AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
         END AS n_toks,
         LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
           / GREATEST(LENGTH(text), 1.0) AS alpha_ratio
  FROM documents
),
scrubbed AS (
  SELECT doc_id, {scrub_expr} AS stext FROM stats
  WHERE n_toks >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM scrubbed GROUP BY stext),
kept AS (
  SELECT s.doc_id, s.stext,
         CASE WHEN ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   < (4294967296 * {VAL_PCT} / 100)
              THEN 'val' ELSE 'train' END AS split
  FROM scrubbed s JOIN keepers k ON s.doc_id = k.doc_id
),
toks AS (
  SELECT doc_id, split,
         unnest(regexp_split_to_array(TRIM(stext), '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(TRIM(stext), '\\s+'), 1)
           AS pos
  FROM kept WHERE LENGTH(TRIM(stext)) > 0
),
nn AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
chunks AS (
  SELECT doc_id, unnest(generate_series(
    0,
    CAST(CASE WHEN n <= {CHUNK_TOKENS} THEN 0
         ELSE CEIL((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) END AS BIGINT)
  )) AS chunk_idx
  FROM nn
)
SELECT c.doc_id, c.chunk_idx,
       STRING_AGG(t.tok, ' ' ORDER BY t.pos) AS chunk_text,
       COUNT(*) AS n_tokens,
       ANY_VALUE(t.split) AS split
FROM chunks c
JOIN toks t
  ON t.doc_id = c.doc_id
 AND t.pos > c.chunk_idx * {CHUNK_STRIDE}
 AND t.pos <= c.chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}
GROUP BY c.doc_id, c.chunk_idx
"""


Q_CURATE_TRAINING_CHUNKS_SQL = _curate_training_chunks_sql()
