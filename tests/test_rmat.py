"""R-MAT generator (datagen_rmat.py): Spark == NumPy replica, skew
properties, JVM-only shuffle-free plan."""

import numpy as np
import pytest

from dxa_pagerank_spark.datagen_rmat import rmat_edges, rmat_edges_numpy


def test_spark_matches_numpy_replica(spark):
    got = (
        rmat_edges(spark, scale=8, edge_factor=4, seed=7)
        .toPandas()
        .to_numpy()
    )
    src, dst = rmat_edges_numpy(scale=8, edge_factor=4, seed=7)
    # spark.range order is the edge index order
    np.testing.assert_array_equal(got[:, 0], src)
    np.testing.assert_array_equal(got[:, 1], dst)


def test_vertex_ids_in_range(spark):
    src, dst = rmat_edges_numpy(scale=6, edge_factor=8)
    n = 1 << 6
    assert src.min() >= 0 and src.max() < n
    assert dst.min() >= 0 and dst.max() < n


def test_degrees_are_skewed():
    # a=0.57 concentrates mass in the low quadrant: the top source's
    # degree must dwarf the mean (that is the point of the generator)
    src, _ = rmat_edges_numpy(scale=10, edge_factor=16)
    deg = np.bincount(src, minlength=1 << 10)
    assert deg.max() > 10 * deg[deg > 0].mean()
    # and vertex 0 region is the hot corner
    assert deg[:32].sum() > deg[-32:].sum()


def test_seed_changes_edges():
    a = rmat_edges_numpy(scale=6, edge_factor=4, seed=0)
    b = rmat_edges_numpy(scale=6, edge_factor=4, seed=1)
    assert not (
        np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    )


def test_plan_is_shuffle_free_jvm_only(spark):
    plan = (
        rmat_edges(spark, scale=8, edge_factor=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_draw_alias_guard():
    from dxa_pagerank_spark.datagen_rmat import _FOLD  # noqa: F401

    with pytest.raises(ValueError, match="aliasing|alias"):
        rmat_edges(None, scale=28, edge_factor=16)


def test_bad_probabilities_raise():
    with pytest.raises(ValueError):
        rmat_edges_numpy(scale=4, edge_factor=2, a=0.6, b=0.3, c=0.2)


def test_xxhash_mode_in_range_skewed_and_shuffle_free(spark):
    df = rmat_edges(spark, scale=10, edge_factor=8, hash_fn="xxhash64")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    pdf = df.toPandas()
    n = 1 << 10
    assert pdf["src"].between(0, n - 1).all()
    assert pdf["dst"].between(0, n - 1).all()
    deg = pdf.groupby("src").size()
    assert deg.max() > 10 * deg.mean()


def test_xxhash_mode_has_no_alias_bound(spark):
    # scale past the portable guard must NOT raise in xxhash mode
    df = rmat_edges(spark, scale=28, edge_factor=16, hash_fn="xxhash64")
    assert df.limit(1).count() == 1
