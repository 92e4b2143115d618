"""TableIO seam: parquet backend semantics, Iceberg selection/skip
logic, and checkpoint-table layout guarantees."""

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.plans.tableio import (
    IcebergTableIO,
    ParquetTableIO,
    iceberg_available,
    make_tableio,
)


def _df(spark, run_id, iteration, vals):
    return (
        spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "id long, rank double"
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("iteration", F.lit(iteration))
    )


def test_parquet_append_and_read(spark, tmp_path):
    io = ParquetTableIO(str(tmp_path / "t"))
    assert not io.exists("m")
    io.append(_df(spark, "a", 1, [1, 2]), "m")
    io.append(_df(spark, "a", 2, [3, 4]), "m")
    assert io.exists("m")
    got = io.read(spark, "m")
    assert got.count() == 4
    assert got.filter(F.col("iteration") == 2).count() == 2


def test_parquet_overwrite_partitions_is_surgical(spark, tmp_path):
    """Re-writing one (run_id, iteration) partition must not clobber
    sibling partitions (dynamic partition overwrite)."""
    io = ParquetTableIO(str(tmp_path / "t2"))
    part = ("run_id", "iteration")
    io.overwrite_partitions(_df(spark, "a", 1, [1.0]), "r", part)
    io.overwrite_partitions(_df(spark, "a", 2, [2.0]), "r", part)
    io.overwrite_partitions(_df(spark, "b", 1, [9.0]), "r", part)
    # rewrite (a, 2) with a new value
    io.overwrite_partitions(_df(spark, "a", 2, [5.0]), "r", part)
    rows = {
        (r["run_id"], r["iteration"]): r["rank"]
        for r in io.read(spark, "r").collect()
    }
    assert rows == {("a", 1): 1.0, ("a", 2): 5.0, ("b", 1): 9.0}


def test_make_tableio_selects_by_availability(spark, tmp_path):
    io = make_tableio(spark, str(tmp_path / "t3"))
    if iceberg_available(spark):
        assert io.kind == "iceberg"
    else:
        assert io.kind == "parquet"
    # explicit parquet preference always honored
    assert make_tableio(spark, str(tmp_path / "t4"), prefer="parquet").kind \
        == "parquet"


def test_iceberg_roundtrip_or_skip(spark, tmp_path):
    """Real Iceberg table round-trip; skipped when the runtime jars are
    absent (this container has none — the path runs on any cluster with
    iceberg-spark-runtime on the classpath)."""
    if not iceberg_available(spark):
        pytest.skip("iceberg runtime jars not on classpath")
    io = IcebergTableIO(spark, warehouse=str(tmp_path / "wh"))
    part = ("run_id", "iteration")
    io.overwrite_partitions(_df(spark, "a", 1, [1.0]), "r", part)
    io.overwrite_partitions(_df(spark, "a", 2, [2.0]), "r", part)
    io.overwrite_partitions(_df(spark, "a", 2, [5.0]), "r", part)
    rows = {
        (r["run_id"], r["iteration"]): r["rank"]
        for r in io.read(spark, "r").collect()
    }
    assert rows == {("a", 1): 1.0, ("a", 2): 5.0}
    io.append(_df(spark, "a", 3, [7.0]), "m")
    assert io.read(spark, "m").count() == 1
