"""Borůvka MSF vs a Kruskal replica under the same tie-break order."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.mst import boruvka_msf


def _kruskal(edges):
    """Kruskal under the (w, a, b) total order — the unique MSF the
    tie-broken Borůvka must produce."""
    can = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        can[(a, b)] = min(can.get((a, b), float("inf")), float(w))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (a, b), w in sorted(can.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _lcg_weighted(n=40, m=160, seed=4242):
    x, out = seed, []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        v = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((u, v, 1.0 + (x % 7)))  # many weight ties
    return out


def test_boruvka_matches_kruskal(spark):
    edges = _lcg_weighted() + [(0, 0, 1.0), (38, 39, 2.0), (38, 39, 9.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = sorted(
        (r["a"], r["b"], r["weight"]) for r in boruvka_msf(spark, df).collect()
    )
    assert got == _kruskal(edges)


def test_boruvka_path_graph_chain_contraction(spark):
    # increasing weights along a path: every component chooses its left
    # edge -> the choice graph is one long chain, stressing contraction
    n = 30
    edges = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = sorted(
        (r["a"], r["b"], r["weight"]) for r in boruvka_msf(spark, df).collect()
    )
    assert got == [(i, i + 1, float(i + 1)) for i in range(n - 1)]


def test_boruvka_forest_on_disconnected_graph(spark):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (10, 11, 5.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = sorted(
        (r["a"], r["b"], r["weight"]) for r in boruvka_msf(spark, df).collect()
    )
    assert got == [(0, 1, 1.0), (1, 2, 2.0), (10, 11, 5.0)]
