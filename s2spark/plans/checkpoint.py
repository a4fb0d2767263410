"""Snapshot checkpointing: resumable multi-stage jobs.

Iceberg snapshots are the deployment target (BASELINE.json north_star); this
container has no Iceberg runtime, so the same contract is implemented with
atomic parquet snapshot directories + a manifest: a stage's output is
visible iff its manifest row is committed, and `resume_or_compute` replays
completed stages from their snapshots.  Swapping the io layer for Iceberg
(`df.writeTo(...).createOrReplace()` + snapshot ids) changes only this file.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "MANIFEST.jsonl")

    def _committed(self) -> dict[str, str]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    # A crash mid-append leaves a torn trailing line; treat it
                    # as uncommitted (recompute that stage) instead of wedging
                    # every future resume with a JSONDecodeError.
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    done[row["stage"]] = row["path"]
        return done

    def commit(self, stage: str, path: str, n_rows: int) -> None:
        # If a prior append was torn mid-line (crash), start on a fresh line
        # so the new record isn't glued onto the torn fragment and lost.
        needs_nl = (os.path.exists(self.manifest_path)
                    and os.path.getsize(self.manifest_path) > 0)
        if needs_nl:
            with open(self.manifest_path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                needs_nl = f.read(1) != b"\n"
        with open(self.manifest_path, "a") as f:
            if needs_nl:
                f.write("\n")
            f.write(json.dumps({"stage": stage, "path": path, "n_rows": n_rows,
                                "ts": time.time()}) + "\n")

    def resume_or_compute(self, spark: SparkSession, stage: str,
                          compute: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage's snapshot if committed, else compute -> write ->
        commit -> read back (so downstream always reads the snapshot, making
        the stage boundary a true barrier for restarts)."""
        done = self._committed()
        if stage in done:
            return spark.read.parquet(done[stage])
        path = os.path.join(self.root, f"{stage}-{int(time.time() * 1000)}")
        df = compute()
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        self.commit(stage, path, n)
        return spark.read.parquet(path)
