"""eigenvector_centrality (operators/eigencentrality.py): NumPy
power-iteration replica, star-graph closed form, edgeless guard."""

from __future__ import annotations

import numpy as np
import pytest

from dxa_pagerank_spark.operators.eigencentrality import (
    eigenvector_centrality,
)


def _replica(edge_list, rounds):
    verts = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    x = np.full(len(verts), 1.0 / len(verts))
    for _ in range(rounds):
        y = np.zeros(len(verts))
        for s, d in edge_list:
            y[idx[d]] += x[idx[s]]
        tot = y.sum() or 1.0
        x = y / tot
    return {v: x[idx[v]] for v in verts}


def test_matches_replica_random(spark):
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
    got = {
        r["id"]: r["centrality"]
        for r in eigenvector_centrality(
            spark,
            spark.createDataFrame(edges, "src long, dst long"),
            rounds=8,
        ).collect()
    }
    exp = _replica(edges, 8)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)


def test_star_concentrates_then_collapses(spark):
    edges = [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got1 = {
        r["id"]: r["centrality"]
        for r in eigenvector_centrality(spark, df, rounds=1).collect()
    }
    # round 1: all mass flows to the hub
    assert got1[0] == pytest.approx(1.0)
    assert all(got1[i] == 0.0 for i in range(1, 6))
    # round 2: the hub's in-neighbors hold nothing, the gather is all-
    # zero, and the guarded normalization collapses to 0 (the DAG-sink
    # degenerate case the docstring documents) — replica agrees
    got2 = {
        r["id"]: r["centrality"]
        for r in eigenvector_centrality(spark, df, rounds=2).collect()
    }
    exp2 = _replica(edges, 2)
    assert got2 == pytest.approx(exp2)
    assert all(v == 0.0 for v in got2.values())


def test_duplicate_edges_count(spark):
    e1 = [(1, 2), (1, 2), (3, 2), (1, 4)]
    got = {
        r["id"]: r["centrality"]
        for r in eigenvector_centrality(
            spark,
            spark.createDataFrame(e1, "src long, dst long"),
            rounds=1,
        ).collect()
    }
    # round 1: raw(2) = 2*x(1) + x(3) = 3/4, raw(4) = 1/4
    assert got[2] == pytest.approx(0.75)
    assert got[4] == pytest.approx(0.25)
    assert got[1] == 0.0


def test_rejects_negative_rounds(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        eigenvector_centrality(spark, df, rounds=-1)
