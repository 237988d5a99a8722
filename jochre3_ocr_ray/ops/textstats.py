"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline components (first-class per the
build brief): token counting, quality scoring, language ID, document
fingerprinting. All are single-pass ``map_batches`` stages — row-local,
no shuffle — vectorized with ``pyarrow.compute`` string kernels where a
kernel exists.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .relational import _read, _round, _to_table



# ------------------------------------------------------------ token count
def ws_token_count(text: pa.Array) -> pa.Array:
    """Whitespace token count, vectorized: tokens = whitespace runs + 1,
    0 for empty strings."""
    trimmed = pc.utf8_trim_whitespace(text)
    ws_runs = pc.count_substring_regex(trimmed, r"\s+")
    nonempty = pc.greater(pc.utf8_length(trimmed), 0)
    n_tokens = pc.if_else(nonempty, pc.add(ws_runs, 1), pa.scalar(0, pa.int32()))
    return pc.cast(n_tokens, pa.int64())


def q_token_count(sf_dir: str) -> pa.Table:
    """Whitespace token count per document (vectorized)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": ws_token_count(batch["text"]),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", batch_size=65536)


Q_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
            ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
       END AS n_tokens
FROM documents
"""


# --------------------------------------------------------- quality score
def quality_columns(text: pa.Array) -> dict[str, pa.Array]:
    """Char-class ratio columns (length / alpha / digit / space),
    unrounded — callers round for oracle comparison."""
    n = pc.cast(pc.utf8_length(text), pa.float64())
    safe_n = pc.max_element_wise(n, pa.scalar(1.0))
    alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
    digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.float64())
    space = pc.cast(pc.count_substring_regex(text, " "), pa.float64())
    return {
        "n_chars_seen": pc.cast(n, pa.int64()),
        "alpha_ratio": pc.divide(alpha, safe_n),
        "digit_ratio": pc.divide(digit, safe_n),
        "space_ratio": pc.divide(space, safe_n),
    }


def q_quality_score(sf_dir: str) -> pa.Table:
    """Char-class ratios (length / alpha / digit / space) per document —
    the quality-heuristic family (length/punct/stopword ratios)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        out = pa.table({"doc_id": batch["doc_id"], **quality_columns(batch["text"])})
        return _round(out, {"alpha_ratio": 4, "digit_ratio": 4, "space_ratio": 4})

    return ds.map_batches(score, batch_format="pyarrow", batch_size=65536)


Q_QUALITY_SCORE_SQL = """
SELECT doc_id,
       LENGTH(text) AS n_chars_seen,
       ROUND(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g'))
             / GREATEST(LENGTH(text), 1.0), 4) AS alpha_ratio,
       ROUND(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g'))
             / GREATEST(LENGTH(text), 1.0), 4) AS digit_ratio,
       ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
             / GREATEST(LENGTH(text), 1.0), 4) AS space_ratio
FROM documents
"""


# ---------------------------------------------------------- fingerprint
def fingerprint_column(text: pa.Array) -> pa.Array:
    """md5 of the whitespace-normalized, lowercased text. Normalization
    (trim / ws-collapse / lower) runs in Arrow's C kernels; the residual
    per-row Python is only the C md5 call."""
    norm = pc.utf8_lower(
        pc.replace_substring_regex(pc.utf8_trim_whitespace(text), r"\s+", " ")
    )
    md5 = hashlib.md5
    digests = [md5(t.encode("utf-8")).hexdigest() for t in norm.to_pylist()]
    return pa.array(digests, type=pa.string())


def q_fingerprint(sf_dir: str) -> pa.Table:
    """Deterministic content fingerprint: md5 of the whitespace-
    normalized, lowercased text (exact-dedup key / provenance id)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": fingerprint_column(batch["text"]),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=65536)


Q_FINGERPRINT_SQL = """
SELECT doc_id,
       MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


# -------------------------------------------------------------- lang id
# stopword-marker heuristic language ID. Deterministic, so it gets a
# full SQL oracle: the marker tables become a VALUES join and the
# argmax-with-alphabetical-tiebreak is a window function.
_LANG_MARKERS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "with", "for", "it"},
    "fr": {"le", "la", "les", "des", "une", "est", "dans", "pour", "que", "avec"},
    "es": {"el", "los", "las", "una", "es", "en", "que", "por", "para", "con"},
    "de": {"der", "die", "das", "und", "ist", "ein", "mit", "für", "nicht", "von"},
}


class LangId:
    """Actor-pool language-ID stage (marker tables built once)."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.token_re = re.compile(r"[a-zà-ÿäöüß]+")
        self.han_re = re.compile(r"[一-鿿]")
        self.rtl_re = re.compile(r"[֐-ۿ]")

    def predict_one(self, text: str) -> str:
        if self.han_re.search(text):
            return "zh"
        if self.rtl_re.search(text):
            return "rtl"
        tokens = self.token_re.findall(text.lower())
        if not tokens:
            return "unknown"
        best_lang, best_hits = "unknown", 0
        for lang in sorted(self.markers):
            hits = sum(1 for t in tokens if t in self.markers[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict_one(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "predicted_lang": pa.array(preds, type=pa.string()),
            }
        )


def q_langid(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )


def _langid_sql() -> str:
    """SQL replica of ``LangId.predict_one``: han/rtl script overrides,
    else the lang with the most marker-token hits (>=1), alphabetical
    tiebreak, else 'unknown'. Markers generated from ``_LANG_MARKERS``
    so both sides share one table."""
    marker_values = ",\n    ".join(
        f"('{lang}', '{m}')"
        for lang in sorted(_LANG_MARKERS)
        for m in sorted(_LANG_MARKERS[lang])
    )
    return f"""
WITH flags AS (
  SELECT doc_id, lower(text) AS lt,
         regexp_matches(text, '[一-鿿]') AS has_han,
         regexp_matches(text, '[֐-ۿ]') AS has_rtl
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lt, '[a-zà-ÿäöüß]+')) AS tok
  FROM flags WHERE NOT has_han AND NOT has_rtl
),
markers(lang, marker) AS (
  VALUES
    {marker_values}
),
hits AS (
  SELECT t.doc_id, m.lang, COUNT(*) AS n_hits
  FROM toks t JOIN markers m ON t.tok = m.marker
  GROUP BY t.doc_id, m.lang
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY n_hits DESC, lang ASC) AS rn
  FROM hits
)
SELECT f.doc_id,
       CASE WHEN f.has_han THEN 'zh'
            WHEN f.has_rtl THEN 'rtl'
            ELSE COALESCE(b.lang, 'unknown') END AS predicted_lang
FROM flags f
LEFT JOIN best b ON b.doc_id = f.doc_id AND b.rn = 1
"""


Q_LANGID_SQL = _langid_sql()


# ----------------------------------------------------- BPE-ish tokens
# GPT-2-style pretokenizer regex, restricted to constructs RE2 supports
# (no lookahead) — and BOTH sides run RE2: pyarrow's
# count_substring_regex and DuckDB's regexp_extract_all, so the oracle
# is engine-identical, not just semantically similar.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: pa.Array) -> pa.Array:
    """BPE-ish pretokenizer token count, vectorized RE2 match counting."""
    return pc.cast(pc.count_substring_regex(text, BPE_PATTERN), pa.int64())


def q_token_count_bpe(sf_dir: str) -> pa.Table:
    """BPE-ish pretokenizer token count per document (the LLM-cost
    estimator the build brief calls for alongside whitespace counts):
    vectorized RE2 match counting, single pass, no shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": bpe_token_count(batch["text"]),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", batch_size=65536)


Q_TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


# --------------------------------------------------- rolling fingerprint
_ROLL_BASE = np.uint64(257)
_ROLL_MASK = np.uint64((1 << 61) - 1)


def rolling_hashes(text: str, window: int = 16) -> np.ndarray:
    """Rabin-Karp rolling hashes over the utf-8 bytes: one 61-bit hash
    per ``window``-byte substring, computed with the O(n) slide (add
    head, drop tail) — the winnowing/fingerprinting kernel (each
    document's selected hashes become its content fingerprint set)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < window:
        window = max(1, n)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # precompute base powers; slide in one vectorized pass via
        # cumulative polynomial trick: h[i] = sum(data[i+j]*B^(w-1-j))
        powers = np.empty(window, dtype=np.uint64)
        powers[window - 1] = np.uint64(1)
        for j in range(window - 2, -1, -1):
            powers[j] = (powers[j + 1] * _ROLL_BASE) & _ROLL_MASK
        m = n - window + 1
        out = np.zeros(m, dtype=np.uint64)
        for j in range(window):  # window is small and fixed; data-axis vectorized
            out = (out + data[j : j + m] * powers[j]) & _ROLL_MASK
    return out


def winnow_fingerprints(text: str, window: int = 16, stride: int = 8) -> set[int]:
    """Winnowing: the MIN rolling hash of each ``stride``-wide band —
    position-robust document fingerprints (near-dup candidates share
    fingerprints under local edits)."""
    hs = rolling_hashes(text, window)
    if hs.size == 0:
        return set()
    pad = (-hs.size) % stride
    if pad:
        hs = np.concatenate([hs, np.full(pad, np.iinfo(np.uint64).max, np.uint64)])
    return set(hs.reshape(-1, stride).min(axis=1).tolist())


# ----------------------------------------------------------- PII scrub
# Both engines run RE2 (Arrow's count/replace and DuckDB's regexp_*),
# so the scrub and its oracle are pattern-identical by construction.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
)


def pii_scrub_columns(text: pa.Array) -> dict[str, pa.Array]:
    """Scrubbed text + per-pattern match counts, vectorized RE2."""
    counts = {}
    for name, pattern in PII_PATTERNS:
        counts[name] = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        text = pc.replace_substring_regex(text, pattern, f"<{name.upper()}>")
    cols: dict[str, pa.Array] = {"scrubbed_text": text}
    for name, _ in PII_PATTERNS:
        cols[f"n_{name}"] = counts[name]
    return cols


def q_pii_scrub(sf_dir: str) -> pa.Table:
    """PII redaction over the documents table — a first-class
    training-data-pipeline stage: emails/phones/SSNs replaced by
    typed placeholders, per-doc match counts reported. Vectorized RE2
    (`pyarrow.compute` kernels), single streaming pass, no shuffle;
    the DuckDB oracle applies the same patterns with ``regexp_replace
    (..., 'g')``."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], **pii_scrub_columns(batch["text"])}
        )

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=65536)


def _pii_sql() -> str:
    text_expr = "text"
    count_cols = []
    for name, pattern in PII_PATTERNS:
        pat = pattern.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        text_expr = (
            f"regexp_replace({text_expr}, '{pat}', '<{name.upper()}>', 'g')"
        )
    return (
        "SELECT doc_id, "
        + text_expr
        + " AS scrubbed_text, "
        + ", ".join(count_cols)
        + " FROM documents"
    )


Q_PII_SCRUB_SQL = _pii_sql()


# ----------------------------------------------------- training chunks
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def q_chunk_documents(
    sf_dir: str,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> pa.Table:
    """Overlapping training-window chunking — the
    document -> fixed-token-window explode every LLM data pipeline
    ends with: whitespace tokens, ``window`` tokens per chunk,
    ``stride`` tokens between chunk starts (window-stride overlap
    carried between consecutive chunks), short final chunk kept iff it
    adds tokens beyond the previous window. flat_map-shaped
    ``map_batches`` (row-local, no shuffle); chunk boundaries are pure
    token arithmetic, so the DuckDB oracle recomputes them exactly."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_idx, chunk_text, n_tok = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = text.split()
            n = len(toks)
            if n == 0:
                continue
            k = 0
            start = 0
            while start < n:
                piece = toks[start : start + window]
                doc_ids.append(doc_id)
                chunk_idx.append(k)
                chunk_text.append(" ".join(piece))
                n_tok.append(len(piece))
                if start + window >= n:
                    break
                k += 1
                start += stride
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
                "chunk_text": pa.array(chunk_text, type=pa.string()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=8192)


Q_CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(TRIM(text), '\\s+'), 1)
           AS pos
  FROM documents WHERE LENGTH(TRIM(text)) > 0
),
nn AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
chunks AS (
  -- chunk k covers tokens [k*stride+1, k*stride+window]; the last
  -- chunk is the first k with k*stride+window >= n
  SELECT doc_id, unnest(generate_series(
    0,
    CAST(CASE WHEN n <= {CHUNK_TOKENS} THEN 0
         ELSE CEIL((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) END AS BIGINT)
  )) AS chunk_idx
  FROM nn
)
SELECT c.doc_id, c.chunk_idx,
       STRING_AGG(t.tok, ' ' ORDER BY t.pos) AS chunk_text,
       COUNT(*) AS n_tokens
FROM chunks c
JOIN toks t
  ON t.doc_id = c.doc_id
 AND t.pos > c.chunk_idx * {CHUNK_STRIDE}
 AND t.pos <= c.chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}
GROUP BY c.doc_id, c.chunk_idx
"""



# ------------------------------------------------------------- tf-idf
TFIDF_TOP_K = 3


def term_count_batch(
    batch: pa.Table, doc_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Vectorized (doc, term, tf) explode for one batch: lower / strip /
    split run in Arrow's C string kernels (non-[a-z] runs collapse to a
    single space, so the split tokens ARE the ``[a-z]+`` runs), the
    explode is ``list_flatten`` + ``list_parent_indices``, and the
    per-doc counting is Arrow's hash group-by. No per-row Python."""
    lower = pc.utf8_lower(batch[text_col])
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(lower, "[^a-z]+", " ")
    )
    lists = pc.split_pattern(norm, " ")
    flat = pa.table(
        {
            "doc_id": pc.take(batch[doc_col], pc.list_parent_indices(lists)),
            "term": pc.list_flatten(lists),
        }
    )
    flat = flat.filter(pc.not_equal(flat["term"], ""))  # empty docs
    counted = flat.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "doc_id": pc.cast(counted["doc_id"], pa.int64()),
            "term": counted["term"],
            "tf": pc.cast(counted["count_all"], pa.int64()),
        }
    )


def tfidf_scores(
    ds: "ray.data.Dataset",
    n_docs: int,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "auto",
) -> "ray.data.Dataset":
    """Distributed TF-IDF — the corpus-statistics scoring primitive
    (salience ranking / keyword features for curation).

    1. per-batch (doc, term, tf) counts — a fully vectorized
       flat_map-shaped explode (``term_count_batch``), no shuffle —
       MATERIALIZED once so the df reduction and the score stage both
       read the cached blocks instead of re-tokenizing the corpus;
    2. document frequency: per-batch partial term counts (the combiner)
       then one vocab-bounded reduction;
    3. join-back of df, SIZE-GATED like the dim joins
       (``DIM_BROADCAST_MAX_BYTES``, ops/relational.py): ``mode="auto"``
       broadcasts the df table via ``ray.put`` while it fits and falls
       back to a hash-partitioned ``Dataset.join`` on term past the
       gate; ``mode="broadcast"`` / ``mode="join"`` force a path (the
       two are equality-pinned in tests/test_ops.py). At web-scale
       vocab pass ``mode="join"`` — it never collects the vocabulary
       to the driver.

    Scores: ``tf * ln(n_docs / df)`` (natural log, double — matches
    DuckDB ``LN`` bit-for-bit)."""
    import pandas as pd

    from .relational import (
        DIM_BROADCAST_MAX_BYTES,
        _to_table,
        join_partitions,
    )

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")

    doc_terms = ds.map_batches(
        lambda b: term_count_batch(b, doc_col, text_col),
        batch_format="pyarrow",
    ).materialize()
    n = float(n_docs)

    def df_partial(batch: pa.Table) -> pa.Table:
        part = batch.group_by("term").aggregate([([], "count_all")])
        return pa.table(
            {"term": part["term"], "df": pc.cast(part["count_all"], pa.int64())}
        )

    df_partials = doc_terms.map_batches(df_partial, batch_format="pyarrow")

    if mode == "join":
        df_ds = df_partials.groupby("term").sum("df").rename_columns(
            {"sum(df)": "df"}
        )
        joined = doc_terms.join(
            df_ds,
            join_type="inner",
            num_partitions=join_partitions(doc_terms.size_bytes() or 0),
            on=("term",),
        )

        def score_joined(batch: pa.Table) -> pa.Table:
            dfs = batch["df"].to_numpy().astype(np.float64)
            tfidf = batch["tf"].to_numpy().astype(np.float64) * np.log(n / dfs)
            return batch.select(["doc_id", "term", "tf", "df"]).append_column(
                "tfidf", pa.array(tfidf)
            )

        return joined.map_batches(score_joined, batch_format="pyarrow")

    # broadcast / auto: combine the partials into one vocab-sized table
    df_tab = (
        _to_table(df_partials).group_by("term").aggregate([("df", "sum")])
    )
    if mode == "auto" and df_tab.nbytes > DIM_BROADCAST_MAX_BYTES:
        return tfidf_scores(
            ds, n_docs, doc_col=doc_col, text_col=text_col, mode="join"
        )
    df_series = pd.Series(
        df_tab["df_sum"].to_numpy().astype(np.int64),
        index=df_tab["term"].to_pandas(),
    )
    df_ref = ray.put(df_series)

    def score(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)  # hashtable lookup, vectorized in cython
        dfs = (
            batch["term"].to_pandas().map(dfm).to_numpy().astype(np.float64)
        )
        tfidf = batch["tf"].to_numpy().astype(np.float64) * np.log(n / dfs)
        return batch.append_column(
            "df", pa.array(dfs.astype(np.int64))
        ).append_column("tfidf", pa.array(tfidf))

    return doc_terms.map_batches(score, batch_format="pyarrow")


def q_tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K) -> pa.Table:
    """Top-k salient terms per document by tf-idf (ties broken by term
    ascending — deterministic against the oracle's window rank)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = _doc_count(sf_dir)
    scored = tfidf_scores(ds, n_docs)

    def topk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(
            ["doc_id", "tfidf", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return batch.groupby("doc_id", sort=False).head(k)

    # co-locate each doc's terms, rank within the partition
    from .relational import partitioned_apply

    out = partitioned_apply(scored, ["doc_id"], topk)
    t = _to_table(out)
    return _round(
        t.select(["doc_id", "term", "tf", "df", "tfidf"]), {"tfidf": 4}
    )


def _doc_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


Q_TFIDF_TOP_TERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
counts AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfs AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
scored AS (
  SELECT c.doc_id, c.term, c.tf, d.df,
         c.tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / d.df) AS tfidf
  FROM counts c JOIN dfs d ON c.term = d.term
)
SELECT doc_id, term, tf, df, ROUND(tfidf, 4) AS tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term
  ) AS rnk FROM scored
)
WHERE rnk <= {TFIDF_TOP_K}
"""


# ------------------------------------------------- sequence packing
PACK_SEQ_TOKENS = 512


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    budget: int = PACK_SEQ_TOKENS,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    as_dataset: bool = False,
) -> "pa.Table | ray.data.Dataset":
    """Training sequence packing (concat-then-split): lay every
    document's tokens on one global tape in ``id_col`` order and cut
    it every ``budget`` tokens — the standard packing used to fill
    fixed-length LM training sequences without padding. Each row gets
    its ``global_start`` tape position, the ``seq_id`` it begins in
    and its ``seq_offset`` within that sequence.

    This is a DISTRIBUTED ORDERED PREFIX SCAN: one ``sort`` on the id
    defines the order (the only exchange); the sorted blocks' token
    sums come back as O(blocks) scalars; the driver takes the
    exclusive prefix and re-dispatches one offset per block; each
    block then computes its rows' global positions with a local
    cumsum. No stage ever holds more than a block; driver state is
    O(blocks).

    ``as_dataset=True`` is the web-scale library path: the packed
    blocks stay in the object store and come back as a Dataset
    (``from_arrow_refs`` — no driver concatenation), ready for
    ``write_parquet``/further stages at 10^12 docs. The default table
    return (the q_ driver contract) equals it row-for-row
    (pytest-pinned)."""
    import ray as _ray

    mat = ds.sort(id_col).materialize()
    refs = mat.to_arrow_refs()

    @_ray.remote
    def block_sum(t: pa.Table) -> "tuple[int, int]":
        if t.num_rows == 0:
            return (1 << 62), 0
        return (
            int(pc.min(t[id_col]).as_py()),
            int(pc.sum(t[ntok_col]).as_py() or 0),
        )

    # order blocks by their min id explicitly rather than trusting the
    # ref list to come back in range order — the prefix sum is only
    # correct under the sorted block order, so pin it (sorted blocks
    # have disjoint id ranges, min id is a total order)
    stats = _ray.get([block_sum.remote(r) for r in refs])
    order = np.argsort([s[0] for s in stats], kind="stable")
    refs = [refs[i] for i in order]
    sums = [stats[i][1] for i in order]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1])).astype(np.int64)

    @_ray.remote
    def pack_block(t: pa.Table, offset: int) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "global_start": pa.array([], type=pa.int64()),
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_offset": pa.array([], type=pa.int64()),
                }
            )
        n = t[ntok_col].to_numpy().astype(np.int64)
        start = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n),
                "global_start": pa.array(start),
                "seq_id": pa.array(start // budget),
                "seq_offset": pa.array(start % budget),
            }
        )

    out_refs = [pack_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if as_dataset:
        import ray.data as rd

        return rd.from_arrow_refs(out_refs)
    parts = _ray.get(out_refs)
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "global_start": pa.array([], type=pa.int64()),
                "seq_id": pa.array([], type=pa.int64()),
                "seq_offset": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def q_pack_sequences(sf_dir: str, budget: int = PACK_SEQ_TOKENS) -> pa.Table:
    """Pack the document corpus into fixed-``budget`` token sequences
    (whitespace token counts, doc_id tape order). Exact oracle: the
    SQL recomputes the exclusive running sum with a window frame."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def with_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        ws_runs = pc.count_substring_regex(trimmed, r"\s+")
        nonempty = pc.greater(pc.utf8_length(trimmed), 0)
        n_tokens = pc.if_else(
            nonempty, pc.add(ws_runs, 1), pa.scalar(0, pa.int32())
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )

    counted = ds.map_batches(with_counts, batch_format="pyarrow")
    return pack_sequences(counted, budget=budget)


Q_PACK_SEQUENCES_SQL = f"""
WITH counts AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))
         END AS n_tokens
  FROM documents
),
tape AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS global_start
  FROM counts
)
SELECT doc_id, n_tokens, global_start,
       global_start // {PACK_SEQ_TOKENS} AS seq_id,
       global_start % {PACK_SEQ_TOKENS} AS seq_offset
FROM tape ORDER BY doc_id
"""


# ------------------------------------------- repetition quality stats
# Gopher-style repetition filter thresholds (Rae et al. 2021 use
# fraction-of-duplicate-ngram rules; the constants here are tuned to
# be non-vacuous on the synthetic corpus, the RULE SHAPE is the point)
REP_MIN_DISTINCT_RATIO = 0.55
REP_MAX_TOP_BIGRAM_FRAC = 0.20


def repetition_values(text: str) -> tuple[int, float, float] | None:
    """(n_tokens, distinct_token_ratio, top_bigram_frac) for one doc, or
    ``None`` for zero-token docs (skipped on both engines)."""
    toks = (text or "").strip().lower().split()
    if not toks:
        return None
    n = len(toks)
    distinct_ratio = len(set(toks)) / n
    if n >= 2:
        counts: dict[tuple, int] = {}
        for i in range(n - 1):
            bg = (toks[i], toks[i + 1])
            counts[bg] = counts.get(bg, 0) + 1
        top_frac = max(counts.values()) / (n - 1)
    else:
        top_frac = 0.0
    return n, distinct_ratio, top_frac


def repetition_flag(distinct_ratio: float, top_frac: float) -> bool:
    return (distinct_ratio < REP_MIN_DISTINCT_RATIO) or (
        top_frac > REP_MAX_TOP_BIGRAM_FRAC
    )


def q_repetition_stats(sf_dir: str) -> pa.Table:
    """Repetition-based quality signals per document — the
    Gopher-family rules a curation pipeline filters on: the distinct
    token ratio (low = boilerplate/copy-paste loops) and the fraction
    of word bigrams taken by the single most frequent bigram (high =
    template spam). ``flagged`` applies both thresholds. Row-local
    streaming (one map_batches, no shuffle); docs with zero tokens are
    skipped on both engines."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        rows = {
            "doc_id": [],
            "n_tokens": [],
            "distinct_token_ratio": [],
            "top_bigram_frac": [],
        }
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            vals = repetition_values(text)
            if vals is None:
                continue
            n, distinct_ratio, top_frac = vals
            rows["doc_id"].append(doc_id)
            rows["n_tokens"].append(n)
            rows["distinct_token_ratio"].append(distinct_ratio)
            rows["top_bigram_frac"].append(top_frac)
        flagged = [
            repetition_flag(d, t)
            for d, t in zip(
                rows["distinct_token_ratio"], rows["top_bigram_frac"]
            )
        ]
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
                "distinct_token_ratio": pa.array(
                    rows["distinct_token_ratio"], type=pa.float64()
                ),
                "top_bigram_frac": pa.array(
                    rows["top_bigram_frac"], type=pa.float64()
                ),
                "flagged": pa.array(flagged, type=pa.bool_()),
            }
        )

    out = _to_table(ds.map_batches(stats, batch_format="pyarrow"))
    return _round(out, {"distinct_token_ratio": 4, "top_bigram_frac": 4})


Q_REPETITION_STATS_SQL = f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
           '\\s+', ' ', 'g') AS t
  FROM documents
),
toks AS (
  SELECT doc_id,
         unnest(string_split(t, ' ')) AS tok,
         generate_subscripts(string_split(t, ' '), 1) AS pos
  FROM norm WHERE t <> ''
),
base AS (
  SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT tok) AS n_distinct
  FROM toks GROUP BY doc_id
),
bigrams AS (
  SELECT doc_id, tok || ' ' || nxt AS bg
  FROM (
    SELECT doc_id, tok, pos,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
  ) WHERE nxt IS NOT NULL
),
top_bg AS (
  SELECT doc_id, MAX(c) AS top_c
  FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT b.doc_id,
       b.n AS n_tokens,
       ROUND(b.n_distinct * 1.0 / b.n, 4) AS distinct_token_ratio,
       ROUND(COALESCE(t.top_c * 1.0 / (b.n - 1), 0.0), 4) AS top_bigram_frac,
       (b.n_distinct * 1.0 / b.n < {REP_MIN_DISTINCT_RATIO}
        OR COALESCE(t.top_c * 1.0 / (b.n - 1), 0.0)
           > {REP_MAX_TOP_BIGRAM_FRAC}) AS flagged
FROM base b LEFT JOIN top_bg t ON b.doc_id = t.doc_id
"""


# ------------------------------------------------------ fused profile
class DocProfile:
    """Fused single-pass text-profile stage: ONE scan of the documents
    table computes token counts (whitespace + BPE-ish), quality ratios,
    content fingerprint, language ID, PII scrub and repetition stats.

    At 100 TB this replaces seven separate scans (seven reads of the
    same text column off storage) with one streaming pass — the
    curation-profile shape every LLM data pipeline runs first. Actor
    pool so the language-ID marker tables / compiled regexes build once
    per actor (``__init__``), not per batch. Zero-token docs carry NULL
    repetition columns (the standalone ``q_repetition_stats`` drops
    those rows; here every doc keeps its profile row).

    Each sub-kernel is the SAME module-level function its standalone
    ``q_`` twin calls (``ws_token_count`` / ``bpe_token_count`` /
    ``quality_columns`` / ``fingerprint_column`` / ``pii_scrub_columns``
    / ``repetition_values`` / ``LangId``), so the fused profile and the
    individual operators cannot drift apart."""

    def __init__(self):
        self._langid = LangId()

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
        cols["n_tokens"] = ws_token_count(text)
        cols["n_bpe_tokens"] = bpe_token_count(text)
        cols.update(quality_columns(text))
        cols["fingerprint"] = fingerprint_column(text)
        texts = text.to_pylist()
        cols["predicted_lang"] = pa.array(
            [self._langid.predict_one(t) for t in texts], type=pa.string()
        )
        cols.update(pii_scrub_columns(text))
        reps = [repetition_values(t) for t in texts]
        cols["distinct_token_ratio"] = pa.array(
            [r[1] if r else None for r in reps], type=pa.float64()
        )
        cols["top_bigram_frac"] = pa.array(
            [r[2] if r else None for r in reps], type=pa.float64()
        )
        cols["rep_flagged"] = pa.array(
            [repetition_flag(r[1], r[2]) if r else None for r in reps],
            type=pa.bool_(),
        )
        out = pa.table(cols)
        return _round(
            out,
            {
                "alpha_ratio": 4,
                "digit_ratio": 4,
                "space_ratio": 4,
                "distinct_token_ratio": 4,
                "top_bigram_frac": 4,
            },
        )


_PROFILE_SINGLETON: "DocProfile | None" = None


def doc_profile_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task kernel with per-worker state (the headline
    extraction's pattern): the ``DocProfile`` instance builds once per
    worker PROCESS and is reused by every task scheduled there — actor
    pools pay a spawn wave per query on small inputs."""
    global _PROFILE_SINGLETON
    if _PROFILE_SINGLETON is None:
        _PROFILE_SINGLETON = DocProfile()
    return _PROFILE_SINGLETON(batch)


def q_doc_profile(sf_dir: str) -> "ray.data.Dataset":
    """One-pass document profile (driver entry consolidating the
    token_count / token_count_bpe / quality_score / fingerprint /
    langid / pii_scrub / repetition_stats operators — each still
    individually exposed + pytest-pinned; this single scan is their
    composed production shape). One read block per CPU: the kernel is
    the compute-heavy stage and the small-file block cap would leave
    most of the pool idle."""
    from ..sources.reader import read_parquet_clean

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=max(8, cpus),
    )
    return ds.map_batches(doc_profile_batch, batch_format="pyarrow")


Q_DOC_PROFILE_SQL = f"""
WITH tc AS ({Q_TOKEN_COUNT_SQL}),
bpe AS ({Q_TOKEN_COUNT_BPE_SQL}),
q AS ({Q_QUALITY_SCORE_SQL}),
fp AS ({Q_FINGERPRINT_SQL}),
lid AS ({Q_LANGID_SQL}),
pii AS ({Q_PII_SCRUB_SQL}),
rep AS ({Q_REPETITION_STATS_SQL})
SELECT tc.doc_id, tc.n_tokens, bpe.n_bpe_tokens,
       q.n_chars_seen, q.alpha_ratio, q.digit_ratio, q.space_ratio,
       fp.fingerprint, lid.predicted_lang,
       pii.scrubbed_text, pii.n_email, pii.n_phone, pii.n_ssn,
       rep.distinct_token_ratio, rep.top_bigram_frac,
       rep.flagged AS rep_flagged
FROM tc
JOIN bpe USING (doc_id)
JOIN q USING (doc_id)
JOIN fp USING (doc_id)
JOIN lid USING (doc_id)
JOIN pii USING (doc_id)
LEFT JOIN rep USING (doc_id)
"""
