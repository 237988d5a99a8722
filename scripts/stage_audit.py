"""Per-stage Ray Data execution audit — runs the headline extraction
and the top bench queries, then prints each Dataset's ``stats()``
summary (per-operator wall time, blocks, rows, output size). The
feedback loop behind the per-stage tuning decisions recorded in
BASELINE.md (batch sizes, partition counts, actor-vs-task choices).

Usage: python scripts/stage_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def summarize(stats: str) -> str:
    """Compress a Ray stats() dump to the per-operator headline lines."""
    keep = []
    for line in stats.splitlines():
        if re.match(r"^(Operator|\* (Remote wall time|Output num rows|Peak heap))", line.strip()):
            keep.append(line.rstrip())
    return "\n".join(keep)


def main() -> int:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")

    from jochre3_ocr_ray.ops.transcripts import derive_transcripts
    from jochre3_ocr_ray.pipelines.extract import build_extraction

    print("=== extraction (blocks on) ===")
    ds = build_extraction(derive_transcripts(SF_DIR), include_blocks=True)
    ds = ds.materialize()
    print(summarize(ds.stats()))

    # show one grouped-shuffle shape's stats via its dataset (query
    # functions materialize internally and keep no stats handle)
    from jochre3_ocr_ray.ops.relational import _read, partitioned_apply

    print("\n=== partitioned_apply shuffle (event_sessions shape) ===")
    import pandas as pd

    events = _read(SF_DIR, "events", columns=["user_id", "ts"])
    out = partitioned_apply(
        events, ["user_id"], lambda p: p.groupby("user_id", as_index=False).size()
    ).materialize()
    print(summarize(out.stats()))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
