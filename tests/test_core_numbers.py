"""core_numbers vs a pure-Python peeling oracle (networkx semantics)."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.kcore import core_numbers


def _coreness_replica(edges):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = {x for e in edges for x in e}
    core = {v: 0 for v in verts}
    deg = {v: len(adj.get(v, ())) for v in verts}
    alive = {v for v in verts if deg[v] > 0}
    k = 0
    while alive:
        k += 1
        changed = True
        while changed:
            drop = {v for v in alive if sum(1 for w in adj[v] if w in alive) < k}
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
            alive -= drop
    return core


def _lcg_graph(n=50, m=260, seed=2024):
    x, out = seed, []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((u, x % n))
    return out


def test_core_numbers_matches_replica(spark):
    edges = _lcg_graph() + [(0, 0), (97, 98)]  # self-loop + leaf pair
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["coreness"] for r in core_numbers(spark, df).collect()}
    assert got == _coreness_replica(edges)


def test_core_numbers_clique_plus_tail(spark):
    # K5 -> coreness 4 inside, a 2-path tail -> coreness 1
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(4, 10), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["coreness"] for r in core_numbers(spark, df).collect()}
    assert {got[i] for i in range(5)} == {4}
    assert got[10] == 1 and got[11] == 1


def test_core_numbers_max_k_guard(spark):
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="max_k"):
        core_numbers(spark, df, max_k=2)
