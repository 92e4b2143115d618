"""Warm-start (initial_ranks) PageRank: law-exact vs a NumPy replica,
convergence acceleration, and cold-start regression guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.pagerank import pagerank


def _warm_replica(n, src, dst, init, rounds, damping=0.85):
    """The warm-start law: ranks over non-dangling ids from `init`
    (1/n fill), dangling mass = conservation residual each round."""
    src, dst = np.asarray(src), np.asarray(dst)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    nd = out_deg > 0
    pr = np.full(n, 1.0 / n)
    for i, r in init.items():
        pr[i] = r
    dangling = 1.0 - pr[nd].sum()
    for _ in range(rounds):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, pr[src] / out_deg[src])
        new = pr.copy()
        new[nd] = (1 - damping) / n + damping * contrib[nd] + damping * dangling / n
        dangling = 1.0 - new[nd].sum()
        pr = new
    # final dangling restore
    contrib = np.zeros(n)
    np.add.at(contrib, dst, pr[src] / out_deg[src])
    pr[~nd] = (1 - damping) / n + damping * contrib[~nd] + damping * dangling / n
    return pr


def _graph():
    src = [0, 0, 1, 2, 3, 4, 4, 5, 6]
    dst = [1, 2, 2, 0, 4, 0, 5, 6, 7]  # 7 dangling
    return src, dst, 8


def test_warm_start_matches_replica(spark):
    src, dst, n = _graph()
    edges = spark.createDataFrame(list(zip(src, dst)), "src long, dst long")
    init = {0: 0.3, 1: 0.05, 2: 0.2, 3: 0.01, 4: 0.14, 5: 0.1, 6: 0.1}
    idf = spark.createDataFrame(
        sorted(init.items()), "id long, rank double"
    )
    res = pagerank(
        spark, edges, threshold=1e-18, max_rounds=3, initial_ranks=idf
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    expect = _warm_replica(n, src, dst, init, rounds=3)
    for i in range(n):
        assert got[i] == pytest.approx(expect[i], abs=1e-15), i


def test_warm_start_from_converged_is_fixed_point(spark):
    src, dst, n = _graph()
    edges = spark.createDataFrame(list(zip(src, dst)), "src long, dst long")
    cold = pagerank(spark, edges, threshold=1e-12, max_rounds=200)
    assert cold.converged
    warm = pagerank(
        spark,
        edges,
        threshold=1e-10,
        max_rounds=200,
        initial_ranks=cold.ranks,
    )
    assert warm.converged and warm.rounds <= 2  # immediate fixed point
    wr = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    cr = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    for i in cr:
        assert wr[i] == pytest.approx(cr[i], abs=1e-9)


def test_warm_start_accelerates_on_changed_graph(spark):
    src, dst, n = _graph()
    edges_old = spark.createDataFrame(
        list(zip(src, dst)), "src long, dst long"
    )
    edges_new = spark.createDataFrame(
        list(zip(src + [6], dst + [0])), "src long, dst long"
    )
    cold_new = pagerank(spark, edges_new, threshold=1e-10, max_rounds=200)
    base = pagerank(spark, edges_old, threshold=1e-10, max_rounds=200)
    warm_new = pagerank(
        spark,
        edges_new,
        threshold=1e-10,
        max_rounds=200,
        initial_ranks=base.ranks,
    )
    assert warm_new.converged and cold_new.converged
    assert warm_new.rounds < cold_new.rounds  # the point of warm starts
    wr = {r["id"]: r["rank"] for r in warm_new.ranks.collect()}
    cr = {r["id"]: r["rank"] for r in cold_new.ranks.collect()}
    for i in cr:
        assert wr[i] == pytest.approx(cr[i], abs=1e-8), i


def test_cold_start_unchanged_by_default(spark):
    # regression guard: default path (no initial_ranks) still matches
    # the reference trajectory oracle
    from dxa_pagerank_spark.oracle import pagerank_oracle

    src, dst, n = _graph()
    edges = spark.createDataFrame(list(zip(src, dst)), "src long, dst long")
    res = pagerank(spark, edges, threshold=1e-18, max_rounds=4)
    trace = pagerank_oracle(
        n, np.array(src), np.array(dst), threshold=1e-18, max_rounds=4
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    for i in range(n):
        assert got[i] == pytest.approx(trace.ranks[i], abs=1e-15), i
