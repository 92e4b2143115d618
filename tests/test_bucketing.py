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


def test_pagerank_from_bucketed_adjacency(spark):
    """Opt-in loop mode (VERDICT r04 #3): pagerank(adjacency=...) over
    a storage-bucketed (src, dst, w) table must (a) match the
    edge-frame loop's trajectory to FP-roundoff on every vertex, and
    (b) run the adjacency build with no repartition of the stored side
    (the bucketed scan's partitioning is trusted as-is)."""
    from dxa_pagerank_spark.operators.pagerank import pagerank

    tmp = tempfile.mkdtemp(prefix="bucketed_pr_")
    try:
        n = 500
        src, dst = fast_synthetic_edges(n, 4, seed=13)
        edges = edges_to_spark(spark, src, dst)
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_deg")
        )
        adj = edges.join(deg, edges.src == deg.id).select(
            "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
        )
        write_bucketed(adj, "t_adj_pr_b", "src", 8, path=f"{tmp}/adj")
        want = pagerank(
            spark, edges, num_vertices=n, threshold=1e-10, max_rounds=30
        )
        got = pagerank(
            spark, None, num_vertices=n, threshold=1e-10, max_rounds=30,
            adjacency=spark.table("t_adj_pr_b"),
        )
        assert got.rounds == want.rounds and got.converged == want.converged
        a = {r["id"]: r["rank"] for r in got.ranks.collect()}
        b = {r["id"]: r["rank"] for r in want.ranks.collect()}
        assert set(a) == set(b) == set(range(n))
        assert all(abs(a[i] - b[i]) < 1e-12 for i in a)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_adj_pr_b")
        shutil.rmtree(tmp, ignore_errors=True)


def test_pagerank_adjacency_guards(spark):
    from dxa_pagerank_spark.operators.pagerank import pagerank

    src, dst = fast_synthetic_edges(50, 3, seed=5)
    edges = edges_to_spark(spark, src, dst)
    adj = edges.withColumn("w", F.lit(0.5))
    with pytest.raises(ValueError, match="hub_salt"):
        pagerank(spark, None, num_vertices=50, adjacency=adj, hub_salt=4)
    with pytest.raises(ValueError, match="edges or adjacency"):
        pagerank(spark, None, num_vertices=50)


def test_adjacency_mode_gather_plan_no_exchange_on_stored_side(spark):
    """The point of pagerank(adjacency=...): the gather join must NOT
    re-Exchange the stored (bucketed) side — only the small rank table
    and the aggregate shuffle. Also pins the id-width rule: the loop
    takes the stored table's width, so the prep casts are identities
    and the bucketed scan's outputPartitioning survives (a narrowing
    cast would be a non-alias projection and silently re-shuffle |E|
    rows every round)."""
    from pyspark.storagelevel import StorageLevel

    tmp = tempfile.mkdtemp(prefix="bucketed_plan_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        src, dst = fast_synthetic_edges(2000, 4, seed=11)
        edges = edges_to_spark(spark, src, dst)
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_deg")
        )
        adjdf = edges.join(deg, edges.src == deg.id).select(
            "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
        )
        write_bucketed(adjdf, "t_adj_plan_b", "src", 8, path=f"{tmp}/adj")
        # identical prep to pagerank()'s adjacency branch: identity
        # casts at the stored width (bigint here)
        adj = (
            spark.table("t_adj_plan_b")
            .select(
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
                F.col("w").cast("double").alias("w"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        adj.count()
        ranks = (
            spark.range(2000)
            .select(
                F.col("id").cast("long").alias("id"),
                F.lit(0.0005).alias("rank"),
            )
            .repartition(8, "id")
            .localCheckpoint(eager=True)
        )
        gather = (
            adj.join(ranks, adj.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        plan = _plan(gather)
        n_exchanges = plan.count("+- Exchange") + plan.count(":- Exchange")
        assert n_exchanges == 2  # ranks -> join, partial agg -> final
        # the stored branch reads cache -> scan with nothing between
        tree = plan.split("\n\n")[0]
        adj_branch = tree[tree.index(":- ") : tree.index("+- Sort")]
        assert "Exchange" not in adj_branch
        assert "Bucketed: true" in plan
        adj.unpersist()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_adj_plan_b")
        shutil.rmtree(tmp, ignore_errors=True)
