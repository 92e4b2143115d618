"""One table-IO seam for every durable table the engine writes
(north_rule: Iceberg-backed rank/label checkpoints and a metrics table).

Two interchangeable backends behind the same four operations:

  * ``IcebergTableIO`` — real Iceberg tables through a Spark catalog
    (``org.apache.iceberg.spark.SparkCatalog``, hadoop-type warehouse).
    Appends are Iceberg commits; partition overwrites use
    ``overwritePartitions()`` (dynamic). Selected automatically when the
    Iceberg runtime jars are on the session classpath.
  * ``ParquetTableIO`` — identical layout as plain partitioned Parquet
    under a root directory, with Spark's dynamic partition-overwrite so
    re-writing one (run_id, iteration) partition never clobbers others.
    This is the jar-less fallback that keeps local tests green
    (SURVEY.md §7 "hard parts" item 5).

Both write the SAME logical tables, so a checkpoint taken on a laptop
parquet root replays on a cluster Iceberg catalog unchanged. The
container this repo is developed in has no Iceberg jars; the Iceberg
path is exercised by tests that skip when `iceberg_available()` is
false, and the selection logic + DDL are covered either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on this session's
    classpath (catalog implementations are lazily instantiated, so the
    class check is the availability check)."""
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # noqa: SLF001
        return True
    except Exception:
        return False


class ParquetTableIO:
    """Partitioned-Parquet tables under `root` (Iceberg-compatible
    layout: one directory per table, hive-style partition dirs)."""

    kind = "parquet"

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self._path(table))

    def append(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...] = ()
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...]
    ) -> None:
        """Replace only the partitions present in df (dynamic mode)."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self._path(table))
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._path(table))

    def delete_partitions(
        self, table: str, partition_values: list[dict]
    ) -> int:
        """Drop whole partitions (retention/pruning). Each dict maps
        partition column -> value IN THE TABLE'S PARTITION ORDER (the
        hive dir nesting). Returns how many existed and were removed."""
        import shutil

        removed = 0
        for pv in partition_values:
            segs = [f"{k}={v}" for k, v in pv.items()]
            p = os.path.join(self._path(table), *segs)
            if os.path.isdir(p):
                shutil.rmtree(p)
                removed += 1
        return removed


class IcebergTableIO:
    """Iceberg tables in a hadoop-type catalog rooted at `warehouse`.
    The catalog is registered on the live session (catalog configs are
    picked up lazily, so no session restart is needed)."""

    kind = "iceberg"

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        catalog: str = "dxa",
        namespace: str = "ckpt",
    ) -> None:
        self.catalog = catalog
        self.namespace = namespace
        spark.conf.set(
            f"spark.sql.catalog.{catalog}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
        spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", warehouse)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        self._spark = spark

    def _name(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self._spark.catalog.tableExists(self._name(table))

    def _create(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...]
    ) -> None:
        w = df.writeTo(self._name(table))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.create()

    def append(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...] = ()
    ) -> None:
        if not self.exists(table):
            self._create(df, table, partition_by)
        else:
            df.writeTo(self._name(table)).append()

    def overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: tuple[str, ...]
    ) -> None:
        if not self.exists(table):
            self._create(df, table, partition_by)
        else:
            df.writeTo(self._name(table)).overwritePartitions()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._name(table))

    def delete_partitions(
        self, table: str, partition_values: list[dict]
    ) -> int:
        """Partition-aligned DELETE — metadata-only in Iceberg (drops
        whole data files, no rewrite) because every predicate matches
        the partition spec exactly."""
        if not self.exists(table) or not partition_values:
            return 0
        preds = []
        for pv in partition_values:
            conj = " AND ".join(
                f"{k} = '{v}'" if isinstance(v, str) else f"{k} = {v}"
                for k, v in pv.items()
            )
            preds.append(f"({conj})")
        self._spark.sql(
            f"DELETE FROM {self._name(table)} WHERE {' OR '.join(preds)}"
        )
        return len(partition_values)


def make_tableio(
    spark: SparkSession, root: str, prefer: str = "auto"
) -> ParquetTableIO | IcebergTableIO:
    """Iceberg when the jars are present (or prefer='iceberg'), else the
    parquet layout at the same root."""
    if prefer == "iceberg" or (prefer == "auto" and iceberg_available(spark)):
        return IcebergTableIO(spark, warehouse=root)
    return ParquetTableIO(root)
