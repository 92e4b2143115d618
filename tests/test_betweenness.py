"""Betweenness (operators/betweenness.py) vs a pure-Python Brandes
replica on hand graphs: exact (all-source) runs, pivot-sampled runs,
multiple-shortest-path splits, and disconnected pieces."""

import collections

import pytest

from dxa_pagerank_spark.operators.betweenness import betweenness


def _py_brandes(edges, sources):
    adj = collections.defaultdict(list)
    verts = set()
    for u, v in set(edges):
        if u == v:
            continue
        adj[u].append(v)
        verts.update((u, v))
    bc = {v: 0.0 for v in verts}
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = [s]
        while q:
            nq = []
            for u in q:
                order.append(u)
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nq.append(w)
                        sigma[w] = 0.0
            # sigma accumulates over ALL same-level predecessors
            for u in q:
                for w in adj[u]:
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            q = nq
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                bc[v] += delta[v]
    return bc


def _check(spark, edges, sources):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r["id"]: r["betweenness"] for r in betweenness(spark, df, sources).collect()}
    ref = _py_brandes(edges, sources)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-9), v


DIAMOND = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]  # two shortest 1->4 paths


def test_diamond_splits_dependency(spark):
    _check(spark, DIAMOND, [1])
    # 2 and 3 each carry half of the 1->4 and 1->5 dependencies
    # (delta = 1/2 * (1 + delta(4)) = 1/2 * 2 = 1); 4 carries the 1->5 pair
    ref = _py_brandes(DIAMOND, [1])
    assert ref[2] == ref[3] == pytest.approx(1.0)
    assert ref[4] == pytest.approx(1.0)


def test_exact_all_sources_chain_and_cycle(spark):
    chain = [(1, 2), (2, 3), (3, 4)]
    _check(spark, chain, [1, 2, 3, 4])
    cycle = [(1, 2), (2, 3), (3, 1)]
    _check(spark, cycle, [1, 2, 3])


def test_pivot_subset_and_disconnected(spark):
    edges = DIAMOND + [(10, 11), (11, 12)]
    _check(spark, edges, [1, 10])
    # a pivot that is not in the graph is ignored
    _check(spark, edges, [1, 999])


def test_duplicate_edges_and_self_loops_ignored(spark):
    edges = [(1, 2), (1, 2), (2, 2), (2, 3)]
    _check(spark, edges, [1, 2, 3])
    ref = _py_brandes(edges, [1, 2, 3])
    assert ref[2] == pytest.approx(1.0)
