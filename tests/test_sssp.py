"""Weighted SSSP (operators/sssp.py) vs a pure-Python Dijkstra on
weighted/unweighted/multi-source/unreachable fixtures."""

import heapq

import pytest

from dxa_pagerank_spark.operators.sssp import shortest_paths


def _py_sssp(edges, sources):
    adj = {}
    verts = set()
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        verts.update((u, v))
    out = {}
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        for v, d in dist.items():
            out[(s, v)] = d
    return out


WEIGHTED = [
    (1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0),  # 1->3 cheaper via 2
    (3, 4, 0.5), (1, 4, 10.0), (4, 5, 2.0),
    (7, 8, 1.0),  # island
]


def _check(spark, edges, sources, weighted=True):
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    got = {
        (r["s"], r["id"]): r["dist"]
        for r in shortest_paths(
            spark, df, sources, weight_col="w" if weighted else None
        ).collect()
    }
    ref = _py_sssp(
        edges if weighted else [(u, v, 1.0) for u, v, _ in edges], sources
    )
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k


def test_weighted_matches_dijkstra_multi_source(spark):
    _check(spark, WEIGHTED, [1, 7])


def test_unit_costs_equal_hops(spark):
    _check(spark, WEIGHTED, [1], weighted=False)


def test_relaxation_beats_greedy_hop_path(spark):
    # direct edge exists but the 3-hop path is cheaper: 1->2->3->4 = 2.5
    df = spark.createDataFrame(WEIGHTED, "src LONG, dst LONG, w DOUBLE")
    got = {
        (r["s"], r["id"]): r["dist"]
        for r in shortest_paths(spark, df, [1], weight_col="w").collect()
    }
    assert got[(1, 4)] == pytest.approx(2.5)
    assert (1, 7) not in got  # unreachable island emits nothing


def test_missing_source_ignored(spark):
    _check(spark, WEIGHTED, [1, 999])


def test_negative_cost_raises(spark):
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, -0.5)], "src LONG, dst LONG, w DOUBLE"
    )
    with pytest.raises(ValueError):
        shortest_paths(spark, df, [1], weight_col="w")
