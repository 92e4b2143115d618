"""Bucketed-storage co-location (plans/bucketing.py): two tables
written bucketed on the same key must equi-join with NO Exchange in
the physical plan, and results must equal the plain-join baseline."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.datagen import edges_to_spark, fast_synthetic_edges
from dxa_pagerank_spark.plans.bucketing import colocated_join, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def bucketed_tables(spark):
    tmp = tempfile.mkdtemp(prefix="bucketing_test_")
    src, dst = fast_synthetic_edges(2000, 4, seed=11)
    edges = edges_to_spark(spark, src, dst)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    write_bucketed(edges, "t_edges_b", "src", 8, path=f"{tmp}/edges")
    write_bucketed(
        deg.withColumnRenamed("id", "src"), "t_deg_b", "src", 8,
        path=f"{tmp}/deg",
    )
    yield edges, deg
    spark.sql("DROP TABLE IF EXISTS t_edges_b")
    spark.sql("DROP TABLE IF EXISTS t_deg_b")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "t_edges_b", "t_deg_b", "src")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero data movement
        assert "BatchEvalPython" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    edges, deg = bucketed_tables
    got = (
        colocated_join(spark, "t_edges_b", "t_deg_b", "src")
        .groupBy("dst")
        .agg(F.round(F.sum(1.0 / F.col("out_deg")), 9).alias("mass"))
    )
    want = (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(F.round(F.sum(1.0 / F.col("out_deg")), 9).alias("mass"))
    )
    g = {r["dst"]: r["mass"] for r in got.collect()}
    w = {r["dst"]: r["mass"] for r in want.collect()}
    assert g == w and len(g) > 0
