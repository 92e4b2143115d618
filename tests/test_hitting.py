"""hitting_times (operators/hitting.py): NumPy value-iteration
replica, closed-form chain, truncation law, and guards."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.hitting import hitting_times


def _replica(edge_list, targets, rounds):
    verts = sorted({v for e in edge_list for v in e})
    outs = {}
    for s, d in edge_list:
        outs.setdefault(s, []).append(d)
    h = {v: 0.0 for v in verts}
    for _ in range(rounds):
        nh = {}
        for v in verts:
            if v in targets:
                nh[v] = 0.0
            elif v not in outs:
                nh[v] = 1.0 + h[v]
            else:
                nh[v] = 1.0 + sum(
                    h[u] * (1.0 / len(outs[v])) for u in outs[v]
                )
        h = nh
    return h


def _run(spark, edge_list, targets, rounds):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["hit_time"]
        for r in hitting_times(
            spark, df, list(targets), rounds=rounds
        ).collect()
    }


def test_chain_exact(spark):
    # 3 -> 2 -> 1 -> 0 (target): deterministic walk, h = distance
    edges = [(3, 2), (2, 1), (1, 0)]
    got = _run(spark, edges, {0}, rounds=10)
    assert got[0] == 0.0
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert got[3] == 3.0


def test_matches_replica_random(spark):
    import random

    rng = random.Random(17)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(50)]
    targets = {0, 7}
    for rounds in (0, 1, 6):
        got = _run(spark, edges, targets, rounds)
        exp = _replica(edges, targets, rounds)
        assert set(got) == set(exp)
        for v in exp:
            assert got[v] == pytest.approx(exp[v], abs=1e-12)


def test_unreachable_climbs_to_truncation(spark):
    # 5 -> 6 cycle never reaches target 0; their h == rounds
    edges = [(1, 0), (5, 6), (6, 5)]
    got = _run(spark, edges, {0}, rounds=8)
    assert got[5] == 8.0 and got[6] == 8.0
    assert got[1] == 1.0
    # 0 is dangling AND a target: stays 0
    assert got[0] == 0.0


def test_guards(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        hitting_times(spark, df, [])
    with pytest.raises(ValueError):
        hitting_times(spark, df, [0], rounds=-1)
