"""Durable per-superstep checkpoint/resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

The reference has no resume at all — a killed run restarts from ingest.
Here every K supersteps we write the rank/label table plus a metrics row
(the MetaChunk analogue: l1_err, pr_sum, dangling_mass —
MetaChunk.java:11-21 — extended with lineage fields) keyed by
(run_id, iteration). On resume, the latest complete iteration is loaded
and the loop continues from there; tests assert byte-equal trajectories
(FIXTURES.md F6).

Storage goes through plans.tableio — real Iceberg tables when the
runtime jars are present, identical-layout partitioned Parquet
otherwise — as TWO tables:

  * ``ranks_ckpt`` — rank snapshots partitioned by (run_id, iteration);
    re-saving an iteration replaces only its partition (dynamic
    overwrite / Iceberg overwritePartitions), never sibling runs.
  * ``metrics``    — append-only per-checkpoint rows. The metrics append
    happens LAST and is the commit point: a torn rank write without its
    metrics row is invisible to ``latest()``, which is what makes
    kill-mid-write resume safe.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tableio import IcebergTableIO, ParquetTableIO, iceberg_available, make_tableio

__all__ = ["CheckpointManager", "iceberg_available"]

# the durable metrics schema: schemas.METRICS plus the full trajectory
# arrays needed to restore PageRankResult.errors/dangling_mass on resume
_METRICS_FULL = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("iteration", T.IntegerType(), False),
        T.StructField("l1_err", T.DoubleType(), True),
        T.StructField("pr_sum", T.DoubleType(), True),
        T.StructField("dangling_mass", T.DoubleType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("n_partitions", T.IntegerType(), True),
        T.StructField("snapshot_ref", T.StringType(), True),
        T.StructField("errors", T.ArrayType(T.DoubleType()), True),
        T.StructField("dangling_masses", T.ArrayType(T.DoubleType()), True),
        # monotone save sequence: metrics are append-only, so a
        # crash-resume that re-saves an iteration appends a SECOND row
        # for it; readers keep the max-save_seq row per iteration so
        # the surviving row is deterministic (not dropDuplicates'
        # arbitrary pick)
        T.StructField("save_seq", T.LongType(), True),
    ]
)

_RANKS_TABLE = "ranks_ckpt"
_METRICS_TABLE = "metrics"
_PART_COLS = ("run_id", "iteration")


class CheckpointManager:
    """Table-backed checkpoint store (Iceberg or parquet, plans.tableio).

    save():   write ranks snapshot partition + append one metrics row.
    latest(): (ranks_df, meta) of the newest committed iteration, or None.
    """

    def __init__(
        self,
        root: str,
        run_id: str | None = None,
        io: ParquetTableIO | IcebergTableIO | None = None,
        prefer: str = "auto",
    ) -> None:
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self._io = io
        self._prefer = prefer

    def _backend(self, spark: SparkSession):
        if self._io is None:
            self._io = make_tableio(spark, self.root, self._prefer)
        return self._io

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
        spark = ranks.sparkSession
        io = self._backend(spark)
        snap = ranks.select(
            F.col("id").cast("long").alias("id"),
            F.col("rank").cast("double").alias("rank"),
        ).withColumns(
            {"run_id": F.lit(self.run_id), "iteration": F.lit(iteration)}
        )
        io.overwrite_partitions(snap, _RANKS_TABLE, _PART_COLS)
        row = {
            "run_id": self.run_id,
            "iteration": int(iteration),
            "l1_err": float(l1_err),
            "pr_sum": float(pr_sum),
            "dangling_mass": float(dangling_mass),
            "wall_ms": int(wall_ms),
            "n_partitions": int(n_partitions),
            "snapshot_ref": (
                f"{io.kind}:{_RANKS_TABLE}/run_id={self.run_id}"
                f"/iteration={iteration}"
            ),
            "errors": [float(x) for x in (errors or [])],
            "dangling_masses": [float(x) for x in (dangling_masses or [])],
            "save_seq": time.time_ns(),
        }
        mdf = spark.createDataFrame([row], schema=_METRICS_FULL)
        io.append(mdf, _METRICS_TABLE)  # commit point — always last

    def _metrics_rows(self, spark: SparkSession):
        io = self._backend(spark)
        if not io.exists(_METRICS_TABLE):
            return None
        m = io.read(spark, _METRICS_TABLE).filter(
            F.col("run_id") == self.run_id
        )
        if "save_seq" not in m.columns:  # pre-save_seq table layout
            return m.dropDuplicates(["iteration"])
        # deterministic survivor per iteration: the LAST save wins
        # (max save_seq); dropDuplicates would keep an arbitrary row
        w = Window.partitionBy("iteration").orderBy(
            F.col("save_seq").desc_nulls_last()
        )
        return (
            m.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def latest(self, spark: SparkSession):
        m = self._metrics_rows(spark)
        if m is None:
            return None
        top = m.orderBy(F.col("iteration").desc()).limit(1).collect()
        if not top:
            return None
        meta = top[0].asDict()
        io = self._backend(spark)
        ranks = (
            io.read(spark, _RANKS_TABLE)
            .filter(
                (F.col("run_id") == self.run_id)
                & (F.col("iteration") == meta["iteration"])
            )
            .select("id", "rank")
        )
        return ranks, meta

    def prune(self, spark: SparkSession, keep_last: int = 2) -> list[int]:
        """Retention for the rank snapshots: drop every committed
        iteration of THIS run except the newest ``keep_last``.

        Snapshots dominate checkpoint storage (O(V) rows each, one per
        checkpointed superstep — a 40-round converged run keeps 8
        full rank tables at interval 5); resume only ever reads the
        newest committed one, so everything older is dead weight. The
        metrics rows are kept in full — they are the run's trajectory
        history and are O(1) per checkpoint. Partition-aligned deletes
        only: whole (run_id, iteration) partitions, metadata-only under
        Iceberg, directory removal under the parquet layout. Returns
        the pruned iterations (ascending)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        m = self._metrics_rows(spark)
        if m is None:
            return []
        its = sorted(
            r["iteration"]
            for r in m.select("iteration").distinct().collect()
        )
        io = self._backend(spark)
        # metrics keep the FULL history, so intersect with snapshots
        # actually on disk — repeated prune calls are no-ops (the scan
        # touches only the partition column: partition pruning)
        existing = {
            r["iteration"]
            for r in io.read(spark, _RANKS_TABLE)
            .filter(F.col("run_id") == self.run_id)
            .select("iteration")
            .distinct()
            .collect()
        }
        drop = [it for it in its[:-keep_last] if it in existing]
        if not drop:
            return []
        io.delete_partitions(
            _RANKS_TABLE,
            [{"run_id": self.run_id, "iteration": it} for it in drop],
        )
        return drop

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """The metrics history as a DataFrame (schemas.METRICS columns)."""
        from ..schemas import METRICS

        m = self._metrics_rows(spark)
        if m is None:
            return spark.createDataFrame([], schema=METRICS)
        return m.select(*[f.name for f in METRICS.fields])
