"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on an sf dir, compare
row count, column names, and order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if df.empty:
        return "empty"
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    if ONLY:
        unknown = [n for n in ONLY if n not in queries]
        if unknown:
            # a silently-skipped filter name reads as "verified" — fail
            print(f"FAIL unknown query name(s): {unknown} — copy from queries()")
            failures += len(unknown)
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        try:
            ray_df = to_pandas(fn(SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, no oracle)")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        problems = []
        if len(ray_df) != len(oracle_df):
            problems.append(f"rows {len(ray_df)} vs {len(oracle_df)}")
        if sorted(ray_df.columns) != sorted(oracle_df.columns):
            problems.append(
                f"cols {sorted(ray_df.columns)} vs {sorted(oracle_df.columns)}"
            )
        elif value_hash(ray_df) != value_hash(oracle_df):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(ray_df)} rows match")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
