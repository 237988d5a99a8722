"""Streaming sketch operators — approximate distinct counting
(HyperLogLog) and heavy-hitter detection (Misra-Gries).

Both follow the one-pass partial/merge shape the t-digest quantile
sketch established (``ops/relational.py::grouped_quantiles_tdigest``):
each batch reduces to a tiny fixed-size summary, summaries merge
associatively (register max / counter union), and the driver holds
only O(groups × sketch-size) state — corpus size never matters.

Driver-oracle strategy:

* HLL is approximate, so its driver query is an IVF-style INVARIANT
  row: the SQL recomputes the exact ``COUNT(DISTINCT ...)`` and the
  Ray side asserts its estimate lands within the published error bound
  (verified by an exact pass — harness, not part of the sketch).
* Misra-Gries admits a FULL exact oracle: the summary is guaranteed to
  contain every item above the frequency threshold (no false
  negatives), and a second exact-count pass over the tiny candidate
  set removes the false positives — so the result equals the plain
  ``GROUP BY ... HAVING`` answer exactly while only ever shuffling
  sketch-sized state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .relational import _read, _to_table

# ------------------------------------------------------- HyperLogLog
HLL_P = 12  # 2^12 registers; relative error ~1.04/sqrt(4096) = 1.6%
# 3-sigma bound plus one count of absolute slack for tiny groups
HLL_REL_EPS = 0.05


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mix function) —
    the 64-bit hash for integer keys."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (no float log2 — rounding
    near 2^k would off-by-one the register rank)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = v >= (np.uint64(1) << s)
        bl[mask] += shift
        v[mask] >>= s
    bl[w > np.uint64(0)] += 1
    return bl


def _hll_update(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = (64 - p) - _bit_length_u64(w) + 1  # w==0 -> 64-p+1
    np.maximum.at(registers, idx, rho.astype(registers.dtype))


def _hll_estimate(registers: np.ndarray) -> float:
    m = registers.size
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard alpha_m for m >= 128
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))  # LinearCounting small range
    return float(est)


def grouped_distinct_hll(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    *,
    p: int = HLL_P,
) -> "dict[str, float]":
    """ONE-PASS approximate grouped distinct count. Per batch: hash the
    integer values (splitmix64), fold into per-group 2^p register
    arrays (serialized as bytes — one tiny row per group per batch);
    merge = elementwise register MAX via ``groupby().map_groups``
    (shuffle moves only registers); the driver evaluates the HLL
    estimate with the LinearCounting small-range correction. Driver
    state is O(groups × 2^p) bytes. Integer values hash via
    splitmix64; any other dtype (strings, floats) hashes via
    ``pandas.util.hash_array`` (vectorized cython siphash — no
    per-value Python loop) finalized by splitmix64."""
    m = 1 << p

    def _hashes(vals: pd.Series) -> np.ndarray:
        if pd.api.types.is_integer_dtype(vals):
            return _splitmix64(vals.to_numpy(np.int64))
        h = pd.util.hash_array(vals.to_numpy(), categorize=False)
        return _splitmix64(h.astype(np.uint64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {key: [], "regs": []}
        for gkey, g in batch.groupby(key, sort=False):
            regs = np.zeros(m, dtype=np.uint8)
            _hll_update(regs, _hashes(g[value]), p)
            rows[key].append(gkey)
            rows["regs"].append(regs.tobytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for b in group["regs"]:
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
        return pd.DataFrame(
            {key: [group[key].iloc[0]], "regs": [regs.tobytes()]}
        )

    merged = (
        parts.groupby(key).map_groups(merge, batch_format="pandas").to_pandas()
    )
    return {
        getattr(row, key): _hll_estimate(
            np.frombuffer(row.regs, dtype=np.uint8)
        )
        for row in merged.itertuples()
    }


def q_events_user_hll(sf_dir: str) -> pa.Table:
    """Bound-checked driver rows for the HLL path: per event_type,
    ``n_exact`` is the true distinct-user count (recomputed exactly by
    a dedup-partial pass — verification harness) and ``within_bound``
    asserts the sketch estimate sits within ``HLL_REL_EPS`` (plus one
    count of absolute slack). The SQL oracle recomputes n_exact and
    demands every bound hold."""
    events = _read(sf_dir, "events", columns=["event_type", "user_id"])
    ests = grouped_distinct_hll(events, "event_type", "user_id")

    # exact verification pass: per-batch (group, value) dedup partials
    # bound what ships; the driver distincts the tiny union
    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    uniq = (
        _to_table(events.map_batches(pairs, batch_format="pandas"))
        .to_pandas()
        .drop_duplicates()
        .groupby("event_type")
        .size()
    )
    out = {"event_type": [], "n_exact": [], "within_bound": []}
    for gkey in sorted(uniq.index):
        n = int(uniq[gkey])
        err = abs(ests[gkey] - n)
        out["event_type"].append(gkey)
        out["n_exact"].append(n)
        out["within_bound"].append(bool(err <= HLL_REL_EPS * n + 1))
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "n_exact": pa.array(out["n_exact"], type=pa.int64()),
            "within_bound": pa.array(out["within_bound"], type=pa.bool_()),
        }
    )


Q_EVENTS_USER_HLL_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------------- Misra-Gries
# report items above 0.08% of the stream — chosen so the driver query
# is non-vacuous at every test scale factor (the synthetic user
# distribution is near-uniform, so a 0.5% bar would select nobody at
# sf0.1 and everybody at sf0.01); k = 2/frac = 2500 counters, still
# sketch-sized
HH_FRAC = 0.0008


def _mg_trim(counts: "dict[int, int]", k: int) -> "dict[int, int]":
    """Trim a counter map to at most ``k`` entries by decrementing all
    counters by the (k+1)-th largest — the mergeable Misra-Gries
    reduction (Agarwal et al., 'Mergeable Summaries'): total
    undercount stays <= n/ (k+1) across arbitrary merges."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values(), reverse=True)
    cut = vals[k]
    return {v: c - cut for v, c in counts.items() if c > cut}


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    *,
    frac: float = HH_FRAC,
    k: int | None = None,
) -> pa.Table:
    """EXACT heavy hitters with sketch-sized state: items whose count
    is >= ceil(frac * n).

    Pass 1 streams Misra-Gries summaries (k = 2/frac counters) per
    batch plus a per-batch row-count row; the driver unions the
    summaries (sum, then one trim) — by the mergeable-summaries
    guarantee every true heavy hitter survives (no false negatives).
    Pass 2 broadcasts the tiny candidate set and exactly counts ONLY
    those items (per-batch filtered value_counts partials), then the
    threshold filter removes the false positives. Result == the plain
    ``GROUP BY/HAVING`` answer; nothing larger than the sketch or the
    candidate counts ever moves."""
    if k is None:
        k = max(16, int(2.0 / frac))

    st = ds.schema()
    in_type = dict(zip(st.names, st.types))[col]
    if not isinstance(in_type, pa.DataType):
        # pandas-backed datasets report object columns as the Python
        # ``object`` class, not an Arrow type — strings in practice
        in_type = pa.string()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        counts = _mg_trim(dict(vc.items()), k)
        # last row is the batch's ROW-COUNT carrier, marked by
        # n_rows > 0 — its value/cnt fields are ignored downstream
        # (summary rows are selected by n_rows == 0, and its cnt of 0
        # adds nothing even on a value collision). Its value is an
        # existing value from the batch so the column keeps its native
        # dtype for ANY input type (int, string, ...), not an int
        # sentinel.
        vals = list(counts.keys())
        cnts = list(counts.values())
        nrs = [0] * len(counts)
        if len(batch):
            vals.append(batch[col].iloc[0])
            cnts.append(0)
            nrs.append(len(batch))
        return pd.DataFrame({"value": vals, "cnt": cnts, "n_rows": nrs})

    parts = _to_table(ds.map_batches(partial, batch_format="pandas")).to_pandas()
    n = int(parts["n_rows"].sum())
    if n == 0:
        return pa.table(
            {
                col: pa.array([], type=in_type),
                "n": pa.array([], type=pa.int64()),
            }
        )
    summary = (
        parts[parts["n_rows"] == 0].groupby("value")["cnt"].sum().to_dict()
    )
    summary = _mg_trim(summary, k)
    threshold = max(1, int(np.ceil(frac * n)))
    candidates = set(summary.keys())
    cand_ref = ray.put(candidates)

    def exact_counts(batch: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        hits = batch[batch[col].isin(cand)]
        vc = hits[col].value_counts()
        return pd.DataFrame({"value": vc.index, "cnt": vc.values})

    counted = (
        _to_table(ds.map_batches(exact_counts, batch_format="pandas"))
        .to_pandas()
        .groupby("value")["cnt"]
        .sum()
    )
    keep = counted[counted >= threshold].sort_index()
    return pa.table(
        {
            col: pa.array(keep.index.tolist(), type=in_type),
            "n": pa.array(keep.to_numpy(np.int64), type=pa.int64()),
        }
    )


def q_heavy_hitter_users(sf_dir: str) -> pa.Table:
    """Users generating >= 0.5% of all events — the hot-key detection
    primitive (the same skew the salted as-of join defends against),
    answered exactly through the Misra-Gries candidate/verify path."""
    events = _read(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(events, "user_id", frac=HH_FRAC)


Q_HEAVY_HITTER_USERS_SQL = f"""
SELECT user_id, COUNT(*) AS n
FROM events
GROUP BY user_id
HAVING COUNT(*) >= CEIL({HH_FRAC} * (SELECT COUNT(*) FROM events))
ORDER BY user_id
"""
