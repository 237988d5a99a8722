"""Per-partition lineage manifests — resumable, idempotent runs.

The reference's only resume story is idempotent per-file outputs
(``OutputLocation`` overwrite, ``Jochre.scala:158-171``) plus the
``ProcessingStep`` provenance record embedded in every output
(``ProcessingStep.scala:7-17``). At 100 TB that becomes: output
partitioned by input shard, each shard written atomically (temp dir +
rename) with a JSON manifest recording inputs, row counts, timings and
pipeline version. A re-run skips shards whose manifest says complete —
kill the job anywhere, resubmit, finished work is never recomputed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from ..schema import PIPELINE_VERSION, schema_fingerprint

LINEAGE_DIR = "_lineage"


class LineageLog:
    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.lineage = self.out_dir / LINEAGE_DIR
        self.lineage.mkdir(parents=True, exist_ok=True)

    def _manifest_path(self, shard_id: str) -> Path:
        return self.lineage / f"{shard_id}.json"

    def is_complete(self, shard_id: str) -> bool:
        p = self._manifest_path(shard_id)
        if not p.exists():
            return False
        try:
            manifest = json.loads(p.read_text())
        except json.JSONDecodeError:
            return False
        # version AND schema fingerprint must both match: the
        # fingerprint catches schema changes that shipped without a
        # version bump (ADVICE r2 — round 2 added skew/kind/glyphs
        # under an unchanged version, so resume accepted mixed-schema
        # shards). Manifests written before the fingerprint existed
        # fail the check and are recomputed — correct, not wasteful.
        return (
            manifest.get("status") == "complete"
            and manifest.get("pipeline_version") == PIPELINE_VERSION
            and manifest.get("schema_fingerprint") == schema_fingerprint()
        )

    def shard_output_dir(self, shard_id: str) -> Path:
        return self.out_dir / f"shard={shard_id}"

    def begin_shard(self, shard_id: str) -> Path:
        """Return a clean temp dir for the shard's output."""
        tmp = self.out_dir / f"_tmp_shard={shard_id}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        return tmp

    def commit_shard(
        self,
        shard_id: str,
        tmp_dir: Path,
        inputs: list[str],
        rows_in: int,
        rows_out: int,
        wall_sec: float,
        metrics: dict | None = None,
    ) -> None:
        """Atomically publish the shard output + write its manifest."""
        final = self.shard_output_dir(shard_id)
        if final.exists():
            shutil.rmtree(final)
        os.replace(tmp_dir, final)
        manifest = {
            "status": "complete",
            "shard_id": shard_id,
            "inputs": inputs,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_sec": round(wall_sec, 3),
            "pipeline_version": PIPELINE_VERSION,
            "schema_fingerprint": schema_fingerprint(),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "metrics": metrics or {},
        }
        path = self._manifest_path(shard_id)
        tmp_path = path.with_suffix(".json.tmp")
        tmp_path.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp_path, path)

    def completed_shards(self) -> list[str]:
        return sorted(
            p.stem for p in self.lineage.glob("*.json") if self.is_complete(p.stem)
        )
