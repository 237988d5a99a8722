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
import zlib

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


_FNV_PRIME = np.uint64(1099511628211)


def _token_hashes(text: str) -> np.ndarray:
    """Stable per-token 64-bit hashes (two crc32 halves — C-speed,
    process-stable, unlike Python's seeded ``hash``)."""
    tokens = _WS.sub(" ", text.strip()).lower().split(" ")
    if not tokens or tokens == [""]:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (
            (zlib.crc32(t.encode("utf-8")) << 32)
            | zlib.crc32(t.encode("utf-8"), 0x9E3779B9)
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def _shingles(text: str, n: int = 2) -> set[int]:
    """Word n-gram shingles as stable 61-bit ints (vectorized FNV-style
    combine of per-token hashes — one numpy pass, no per-shingle
    digest calls)."""
    hs = _token_hashes(text)
    if len(hs) == 0:
        return set()
    if len(hs) < n:
        acc = hs[:1].copy()
        for k in range(1, len(hs)):
            acc = (acc * _FNV_PRIME) ^ hs[k : k + 1]
    else:
        m = len(hs) - n + 1
        acc = hs[:m].copy()
        for k in range(1, n):
            acc = (acc * _FNV_PRIME) ^ hs[k : m + k]
    acc &= np.uint64((1 << 61) - 1)
    return set(acc.tolist())


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
def minhash_band_rows(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """documents -> exploded (band, doc_id) LSH rows."""

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

    return ds.map_batches(to_bands, batch_format="pyarrow", batch_size=4096)


def minhash_candidate_pairs(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """documents -> deduped (id_a, id_b) LSH candidate pairs."""
    banded = minhash_band_rows(ds, text_col, id_col)

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        # vectorized pre-filter: only bands with >=2 members can yield
        # pairs — drops the vast majority of groups before iteration
        part = part[part.duplicated("band", keep=False)]
        out = []
        for _, group in part.groupby("band", sort=False):
            ids = sorted(group[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out.append((a, b))
        return pd.DataFrame(out, columns=["id_a", "id_b"]).astype("int64")

    pairs = partitioned_apply(banded, ["band"], bucket_pairs)
    # dedup pairs found in multiple bands (hash-partitioned, vectorized)
    return partitioned_apply(
        pairs, ["id_a", "id_b"],
        lambda part: part.drop_duplicates(["id_a", "id_b"]),
    )


def q_dedup_minhash(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Near-dup pairs: LSH candidates verified with exact Jaccard
    (candidate generation + verification fused into the single band
    shuffle; see inline comments)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    # broadcast the raw texts (small side); the verify stage computes
    # shingles lazily ONLY for docs that appear in candidate pairs, with
    # a per-partition memo — no all-docs shingle pass, no big driver map.
    # The 100 TB path re-reads pair shards by id-range instead.
    docs_df = _to_table(ds).to_pandas()
    text_ref = ray.put(dict(zip(docs_df["doc_id"].astype(int), docs_df["text"])))
    # ONE shuffle total: candidate generation AND exact-Jaccard verify
    # fused into the band-partition stage. A pair surfacing in several
    # bands is verified once per band (cheap — per-partition shingle
    # memo); the final dedup runs driver-side on the VERIFIED pairs,
    # which are tiny relative to the corpus even at scale.
    banded = minhash_band_rows(ds)

    def verify_partition(part: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(text_ref)
        memo: dict[int, set[int]] = {}

        def sh(doc_id: int) -> set[int]:
            s = memo.get(doc_id)
            if s is None:
                s = _shingles(texts[doc_id])
                memo[doc_id] = s
            return s

        part = part[part.duplicated("band", keep=False)]
        out = []
        for _, group in part.groupby("band", sort=False):
            ids = sorted(group["doc_id"].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    sa, sb = sh(int(a)), sh(int(b))
                    union = len(sa | sb)
                    j = len(sa & sb) / union if union else 0.0
                    if j >= threshold:
                        out.append((int(a), int(b), j))
        return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"]).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )

    verified = _to_table(
        partitioned_apply(banded, ["band"], verify_partition)
    ).to_pandas()
    verified = verified.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
    return _round(
        pa.Table.from_pandas(verified, preserve_index=False), {"jaccard": 4}
    )


# --------------------------------------------------------------- simhash
def _simhash(text: str) -> int:
    hs = _token_hashes(text)
    if len(hs) == 0:
        return 0
    # all tokens x 64 bit positions in one vectorized pass
    bits = (
        (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
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
        part = part[part.duplicated("segment", keep=False)]
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


# ---------------------------------------------------- near-dup clustering
def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over near-dup pairs -> {doc_id: cluster_id} where the
    cluster id is the minimum member (the canonical keeper). The pair
    set is tiny relative to the corpus, so this runs on the driver; at
    extreme pair counts switch to iterative min-label propagation
    (groupby rounds), which these semantics are compatible with."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the canonical keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def q_dedup_clusters(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Near-dup clusters: MinHash pairs -> connected components ->
    (doc_id, cluster_id, keep). ``keep`` marks the canonical (min id)
    member — the "keep first per group" dedup decision. Rows-only
    check (LSH is approximate)."""
    pairs_table = q_dedup_minhash(sf_dir, threshold=threshold)
    pairs = list(
        zip(
            pairs_table["id_a"].to_pylist(),
            pairs_table["id_b"].to_pylist(),
        )
    )
    labels = connected_components(pairs)
    doc_ids = sorted(labels)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "cluster_id": pa.array([labels[d] for d in doc_ids], type=pa.int64()),
            "keep": pa.array([labels[d] == d for d in doc_ids], type=pa.bool_()),
        }
    )
