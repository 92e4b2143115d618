"""edge_delta / edge_delta_report (functions/snapshots.py)."""

from dxa_pagerank_spark.functions.snapshots import (
    edge_delta,
    edge_delta_report,
)


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


OLD = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 1)]  # dup collapses
NEW = [(1, 2), (2, 3), (2, 4), (5, 1)]


def test_statuses(spark):
    got = {
        (r["src"], r["dst"]): r["status"]
        for r in edge_delta(_df(spark, OLD), _df(spark, NEW)).collect()
    }
    assert got == {
        (1, 2): "kept",
        (1, 3): "removed",
        (2, 3): "kept",
        (3, 1): "removed",
        (2, 4): "added",
        (5, 1): "added",
    }


def test_report(spark):
    row = edge_delta_report(_df(spark, OLD), _df(spark, NEW)).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_kept"]) == (2, 2, 2)
    # affected sources: added {2,5} + removed {1,3} -> 4 distinct
    assert row["n_affected_sources"] == 4
    assert row["edge_churn"] == round(4 / 4, 6)


def test_identical_graphs_have_zero_churn(spark):
    row = edge_delta_report(_df(spark, OLD), _df(spark, OLD)).collect()[0]
    assert row["n_added"] == 0 and row["n_removed"] == 0
    assert row["n_affected_sources"] == 0
    assert row["edge_churn"] == 0.0


def test_plan_is_single_equi_join(spark):
    plan = (
        edge_delta(_df(spark, OLD), _df(spark, NEW))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
