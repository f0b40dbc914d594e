"""Snapshot store: checkpointed frontier state with atomic commits.

North rule: "resumable from Iceberg-snapshot checkpoints with per-partition
lineage + metrics". This sandbox has no Iceberg runtime jar, so the store
implements the same contract on parquet + a JSON manifest:

  root/
    _manifest.json            {"current": N, "snapshots": {N: {...meta}}}
    snap=N/<table>/*.parquet  immutable snapshot data

Commit protocol = write data dirs for snapshot N, then atomically rename a
tmp manifest over _manifest.json (single-file rename = the same atomicity
Iceberg gets from its catalog pointer swap). A crash mid-write leaves the
manifest pointing at snapshot N-1 — resume re-runs iteration N from its
inputs, which are all snapshot-N-1 tables, so the rerun is deterministic and
idempotent. On a real cluster, swap SnapshotStore for Iceberg
`writeTo(...).createOrReplace()` — the engine code paths are identical.

Each snapshot records metrics + per-partition lineage (rows per partition of
each table) in the manifest.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"current": -1, "snapshots": {}}
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self) -> int:
        return self.manifest()["current"]

    # --------------------------------------------------------------- tables
    def _table_dir(self, snap: int, table: str) -> str:
        return os.path.join(self.root, f"snap={snap}", table)

    def read(self, table: str, snap: int | None = None) -> DataFrame:
        """Read via the MANIFEST path: carry-forward tables are recorded
        pointing at an older snapshot's data dir (manifest reuse), so
        resolving by directory convention would silently miss them — that
        bug dropped robots rules after the first iteration until the
        crawl-order oracle test caught it."""
        if snap is None:
            snap = self.current_snapshot()
        meta = (
            self.manifest()["snapshots"].get(str(snap), {}).get("tables", {})
        ).get(table)
        path = meta["path"] if meta else self._table_dir(snap, table)
        return self.spark.read.parquet(path)

    def exists(self, table: str, snap: int | None = None) -> bool:
        if snap is None:
            snap = self.current_snapshot()
        if snap < 0:
            return False
        tables = self.manifest()["snapshots"].get(str(snap), {}).get("tables", {})
        if table in tables:
            return True
        return os.path.isdir(self._table_dir(snap, table))

    def commit(
        self,
        tables: dict[str, DataFrame],
        metrics: dict[str, Any] | None = None,
        carry_forward: list[str] | None = None,
        row_metrics: dict[str, str] | None = None,
    ) -> int:
        """Write `tables` as snapshot current+1 and atomically publish it.

        `carry_forward` names tables copied by reference from the previous
        snapshot (manifest records the older path — no data rewrite, like
        Iceberg manifest reuse).

        `row_metrics` maps metric name → table name; the metric value is
        that table's total row count, derived from the lineage scan that
        commit performs anyway — so callers never re-execute a plan just to
        count its rows."""
        man = self.manifest()
        snap = man["current"] + 1
        snap_meta: dict[str, Any] = {"tables": {}, "metrics": metrics or {}}

        for name, df in tables.items():
            path = self._table_dir(snap, name)
            if os.path.exists(path):
                shutil.rmtree(path)  # crashed partial write of this snap
            df.write.mode("overwrite").parquet(path)
            # per-partition lineage: rows per file partition
            lineage = [
                {"partition": r["p"], "rows": r["n"]}
                for r in self.spark.read.parquet(path)
                .groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
            snap_meta["tables"][name] = {
                "path": path,
                "lineage": lineage,
                "rows": sum(e["rows"] for e in lineage),
            }

        for metric, table in (row_metrics or {}).items():
            snap_meta["metrics"][metric] = snap_meta["tables"][table]["rows"]

        for name in carry_forward or []:
            prev = man["snapshots"][str(man["current"])]["tables"][name]
            snap_meta["tables"][name] = prev

        man["snapshots"][str(snap)] = snap_meta
        man["current"] = snap
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic publish
        return snap

    def read_at(self, table: str, snap: int) -> DataFrame:
        meta = self.manifest()["snapshots"][str(snap)]["tables"][table]
        return self.spark.read.parquet(meta["path"])
