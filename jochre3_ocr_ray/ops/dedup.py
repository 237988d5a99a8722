"""Deduplication operators — exact and near-dup families.

Scale-first designs (the brief's training-data-pipeline components):

* **exact** — content-hash + hash-partitioned ``groupby`` keeping the
  first (min doc_id) member per group, with per-batch partial
  aggregation so the shuffle moves one row per distinct hash per
  block, not the corpus.
* **MinHash + LSH** — word-shingle sets -> k=64 permutations (one
  vectorized universal-hash pass per batch, numpy) -> b bands × r rows
  -> explode to (band, band_hash, doc_id) -> ``groupby`` band buckets
  -> candidate pairs -> exact Jaccard verification on the shingle
  sets. Only bucket-mates are verified: the all-pairs O(N²) never
  happens.
* **SimHash** — 64-bit signature from hashed token features; pairs
  within Hamming distance d found by the 4-segment pigeonhole trick
  (segment-exact-match buckets), verified on true Hamming distance.
* **Embedding near-dup** — exact blocked cosine against a broadcast
  matrix at test scale (the oracle-checkable baseline); the LSH
  (random-hyperplane) bucketed variant is the 100 TB path.

Determinism: all hash seeds fixed; candidate pairs emitted as
``id_a < id_b``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa


import ray
import ray.data
from ray.data.aggregate import Min, Sum

from .relational import _read, _round, _to_table, partitioned_apply

_WS = re.compile(r"\s+")

# fixed universal-hash parameters (MinHash permutations), seed=42
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(42)
_N_PERM = 64
_PERM_A = _RNG.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
_PERM_B = _RNG.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64)
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS


def _shingles(text: str, n: int = 2) -> set[int]:
    """Word n-gram shingles, hashed to stable 64-bit ints."""
    tokens = _WS.sub(" ", text.strip()).lower().split(" ")
    if not tokens or tokens == [""]:
        return set()
    if len(tokens) < n:
        grams = [" ".join(tokens)]
    else:
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    out = set()
    for g in grams:
        digest = hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
        out.add(int.from_bytes(digest, "little") & ((1 << 61) - 1))
    return out


def _minhash(shingles: set[int]) -> np.ndarray:
    if not shingles:
        return np.full(_N_PERM, _MERSENNE, dtype=np.int64)
    arr = np.fromiter(shingles, dtype=np.int64, count=len(shingles))
    # (a*x + b) mod p for all perms at once: (n_perm, n_shingles)
    prods = (_PERM_A[:, None] * arr[None, :] + _PERM_B[:, None]) % _MERSENNE
    return prods.min(axis=1)


def _band_keys(sig: np.ndarray) -> list[str]:
    keys = []
    for b in range(_BANDS):
        chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        keys.append(f"{b}:{digest}")
    return keys


# ------------------------------------------------------------------ exact
def q_dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: keep min doc_id per identical text, with dup count."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_partial(batch: pa.Table) -> pa.Table:
        digests = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        t = pa.table({"text_hash": pa.array(digests), "doc_id": batch["doc_id"]})
        return t.group_by("text_hash").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )

    partials = ds.map_batches(hash_partial, batch_format="pyarrow", batch_size=65536)
    result = _to_table(
        partials.groupby("text_hash").aggregate(
            Min("doc_id_min", alias_name="doc_id"),
            Sum("doc_id_count", alias_name="dup_count"),
        )
    )
    return result.select(["doc_id", "dup_count"])


Q_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents
GROUP BY text
"""


# ----------------------------------------------------------- minhash lsh
def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_pairs: bool = True,
) -> "ray.data.Dataset":
    """documents -> (id_a, id_b) LSH candidate pairs (deduped across
    bands unless the caller fuses dedup into its own next stage)."""

    def to_bands(batch: pa.Table) -> pa.Table:
        ids, bands = [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sig = _minhash(_shingles(text))
            for key in _band_keys(sig):
                ids.append(doc_id)
                bands.append(key)
        return pa.table(
            {"band": pa.array(bands), id_col: pa.array(ids, type=pa.int64())}
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=4096)

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, group in part.groupby("band", sort=False):
            ids = sorted(group[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out.append((a, b))
        return pd.DataFrame(out, columns=["id_a", "id_b"]).astype("int64")

    pairs = partitioned_apply(banded, ["band"], bucket_pairs)
    if not dedup_pairs:
        return pairs
    # dedup pairs found in multiple bands (hash-partitioned, vectorized)
    return partitioned_apply(
        pairs, ["id_a", "id_b"],
        lambda part: part.drop_duplicates(["id_a", "id_b"]),
    )


def q_dedup_minhash(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Near-dup pairs: LSH candidates verified with exact Jaccard.

    Verification joins each candidate pair against a broadcast
    id->shingle-set map (small at test scale; at 100 TB the verify
    stage re-reads the two shards by id-range instead)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    # shingle sets computed IN PARALLEL (map_batches) and merged into the
    # broadcast verify map on the driver — at test scale the map fits in
    # the object store; the 100 TB path re-reads pair shards by id-range
    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sets = [
            np.fromiter(s, dtype=np.int64, count=len(s)) if (s := _shingles(t)) else
            np.empty(0, dtype=np.int64)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array([a.tolist() for a in sets],
                                     type=pa.list_(pa.int64())),
            }
        )

    sh = _to_table(ds.map_batches(shingle_rows, batch_format="pyarrow",
                                  batch_size=2048))
    shingle_map = {
        int(i): set(s)
        for i, s in zip(sh["doc_id"].to_pylist(), sh["shingles"].to_pylist())
    }
    map_ref = ray.put(shingle_map)
    pairs = minhash_candidate_pairs(ds, dedup_pairs=False)

    # single fused partition stage: pair-dedup (pairs found in several
    # bands) + exact-Jaccard verification
    def dedup_and_verify(part: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(map_ref)
        part = part.drop_duplicates(["id_a", "id_b"])
        out = []
        for a, b in zip(part["id_a"], part["id_b"]):
            sa, sb = smap[int(a)], smap[int(b)]
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= threshold:
                out.append((int(a), int(b), j))
        return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"]).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )

    verified = partitioned_apply(pairs, ["id_a", "id_b"], dedup_and_verify)
    return _round(verified, {"jaccard": 4})


# --------------------------------------------------------------- simhash
def _simhash(text: str) -> int:
    tokens = _WS.sub(" ", text.strip()).lower().split(" ")
    if not tokens or tokens == [""]:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = np.uint64(
            int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
        )
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


def q_dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash, pigeonhole-bucketed on 16-bit segments."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sign(batch: pa.Table) -> pa.Table:
        sigs = [_simhash(t) for t in batch["text"].to_pylist()]
        rows = {"doc_id": [], "segment": [], "sig": []}
        for doc_id, sig in zip(batch["doc_id"].to_pylist(), sigs):
            for seg in range(4):
                rows["doc_id"].append(doc_id)
                rows["segment"].append(f"{seg}:{(sig >> (seg * 16)) & 0xFFFF}")
                rows["sig"].append(sig)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "segment": pa.array(rows["segment"]),
                "sig": pa.array(np.array(rows["sig"], dtype=np.uint64)),
            }
        )

    banded = ds.map_batches(sign, batch_format="pyarrow", batch_size=4096)

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, group in part.groupby("segment", sort=False):
            rows = group.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].to_numpy()
            sigs = rows["sig"].to_numpy(dtype=np.uint64)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ham = int(bin(int(sigs[i]) ^ int(sigs[j])).count("1"))
                    if ham <= max_hamming:
                        out.append((int(ids[i]), int(ids[j]), ham))
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"]).astype("int64")

    pairs = partitioned_apply(banded, ["segment"], bucket_pairs)
    return _to_table(
        partitioned_apply(
            pairs, ["id_a", "id_b"],
            lambda part: part.drop_duplicates(["id_a", "id_b"]),
        )
    )


# ------------------------------------------------- embedding cosine dedup
def q_embedding_near_dup(sf_dir: str, threshold: float = 0.9) -> pa.Table:
    """Exact cosine near-dup pairs via blocked matmul vs a broadcast
    matrix — the oracle-checkable baseline (LSH variant below scales)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_df = ds.to_pandas()
    ids = all_df["vec_id"].to_numpy()
    mat = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        rows = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        rows /= np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
        sims = rows @ all_mat.T
        my_ids = batch["vec_id"].to_numpy()
        out = []
        for i, a in enumerate(my_ids):
            hits = np.where(sims[i] >= threshold)[0]
            for j in hits:
                b = all_ids[j]
                if a < b:  # dedup + drop self
                    out.append((int(a), int(b), float(sims[i, j])))
        return pd.DataFrame(out, columns=["id_a", "id_b", "cos_sim"]).astype(
            {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
        )

    pairs = ds.map_batches(block, batch_format="pandas", batch_size=2048)
    return _round(pairs, {"cos_sim": 4})


Q_EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
"""


def q_embedding_near_dup_lsh(sf_dir: str, threshold: float = 0.9) -> pa.Table:
    """Scale path: random-hyperplane LSH buckets, exact verify within
    buckets only (approximate recall; rows-only check)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    planes = np.random.RandomState(7).standard_normal((16, 64))
    planes_ref = ray.put(planes)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        signs = (mat @ pl.T) > 0
        # two 8-bit codes per vector -> two buckets (band trick)
        out = {"bucket": [], "vec_id": [], "embedding": []}
        for i, vid in enumerate(batch["vec_id"]):
            bits = signs[i]
            for band in range(2):
                code = int(
                    sum(1 << k for k in range(8) if bits[band * 8 + k])
                )
                out["bucket"].append(f"{band}:{code}")
                out["vec_id"].append(int(vid))
                out["embedding"].append(batch["embedding"].iloc[i])
        return pd.DataFrame(out)

    banded = ds.map_batches(bucketize, batch_format="pandas", batch_size=4096)

    def verify(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, group in part.groupby("bucket", sort=False):
            group = group.drop_duplicates("vec_id").sort_values("vec_id")
            if len(group) < 2:
                continue
            mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ mat.T
            ids = group["vec_id"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if sims[i, j] >= threshold:
                        out.append((int(ids[i]), int(ids[j]), float(sims[i, j])))
        return pd.DataFrame(out, columns=["id_a", "id_b", "cos_sim"]).astype(
            {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
        )

    pairs = partitioned_apply(banded, ["bucket"], verify)
    deduped = partitioned_apply(
        pairs, ["id_a", "id_b"],
        lambda part: part.drop_duplicates(["id_a", "id_b"]),
    )
    return _round(deduped, {"cos_sim": 4})


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard(text_a: str, text_b: str, n: int = 2) -> float:
    """Exact word n-gram Jaccard similarity (the verify kernel)."""
    sa, sb = _shingles(text_a, n), _shingles(text_b, n)
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0
