"""Durable per-superstep checkpoint/resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference has no resume at all — a killed run restarts from ingest.
Here every K supersteps we write the rank/label table plus a metrics row
(the MetaChunk analogue: l1_err, pr_sum, dangling_mass —
MetaChunk.java:11-21 — extended with lineage fields) keyed by
(run_id, iteration). On resume, the latest complete iteration is loaded
and the loop continues from there; tests assert byte-equal trajectories
(FIXTURES.md F6).

Storage: Iceberg when the catalog jars are on the classpath, else plain
partitioned Parquet under a checkpoint root — same layout
(``ranks_ckpt/run_id=../iteration=..``, ``metrics/``), so the engine is
Iceberg-ready without making local tests depend on jars
(SURVEY.md §7 "hard parts" item 5).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


class CheckpointManager:
    """Parquet-layout checkpoint store (Iceberg-compatible layout).

    save():   write ranks snapshot + metrics row for an iteration.
    latest(): (ranks_df, meta) of the newest complete iteration, or None.
    """

    def __init__(self, root: str, run_id: str | None = None) -> None:
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(self._dir(), exist_ok=True)

    def _dir(self) -> str:
        return os.path.join(self.root, self.run_id)

    def _ranks_path(self, iteration: int) -> str:
        return os.path.join(self._dir(), f"ranks_ckpt/iteration={iteration}")

    def _meta_path(self) -> str:
        return os.path.join(self._dir(), "metrics.json")

    def save(
        self,
        ranks: DataFrame,
        iteration: int,
        l1_err: float,
        pr_sum: float,
        dangling_mass: float,
        wall_ms: int = 0,
        n_partitions: int = 0,
        errors: list[float] | None = None,
        dangling_masses: list[float] | None = None,
    ) -> None:
        path = self._ranks_path(iteration)
        ranks.write.mode("overwrite").parquet(path)
        # metrics written last = commit point; a torn rank write without
        # its metrics row is invisible to latest().
        history: list[dict] = []
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                history = json.load(f)
        history = [m for m in history if m["iteration"] < iteration]
        history.append(
            {
                "run_id": self.run_id,
                "iteration": iteration,
                "l1_err": l1_err,
                "pr_sum": pr_sum,
                "dangling_mass": dangling_mass,
                "wall_ms": wall_ms,
                "n_partitions": n_partitions,
                "snapshot_ref": path,
                "errors": errors or [],
                "dangling_masses": dangling_masses or [],
            }
        )
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(history, f)
        os.replace(tmp, self._meta_path())

    def latest(self, spark: SparkSession):
        if not os.path.exists(self._meta_path()):
            return None
        with open(self._meta_path()) as f:
            history = json.load(f)
        if not history:
            return None
        meta = max(history, key=lambda m: m["iteration"])
        ranks = spark.read.parquet(meta["snapshot_ref"])
        return ranks, meta

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """The metrics history as a DataFrame (schemas.METRICS columns)."""
        from ..schemas import METRICS

        with open(self._meta_path()) as f:
            history = json.load(f)
        rows = [
            {k.name: m.get(k.name) for k in METRICS.fields} for m in history
        ]
        return spark.createDataFrame(rows, schema=METRICS)
