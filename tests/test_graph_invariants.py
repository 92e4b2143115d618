"""Cross-operator invariants on seeded random graphs: the new round-3
operators must agree with each other and with the established ones
(census total == triangle count; coreness levels == k_core members;
MSF weight == Kruskal optimum; forest is spanning and acyclic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.kcore import core_numbers, k_core
from dxa_pagerank_spark.operators.motifs import triad_census
from dxa_pagerank_spark.operators.mst import boruvka_msf
from dxa_pagerank_spark.operators.triangles import triangle_count


def _lcg_edges(n, m, seed):
    x, out = seed, []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((u, x % n))
    return out


@pytest.mark.parametrize("seed", [11, 222, 3333])
def test_census_total_equals_triangle_count(spark, seed):
    edges = _lcg_edges(45, 220, seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    census = triad_census(spark, df)
    total = census.agg(F.sum("n")).collect()[0][0] or 0
    assert total == triangle_count(spark, df)


@pytest.mark.parametrize("seed", [17, 4242])
def test_coreness_levels_equal_kcore_members(spark, seed):
    edges = _lcg_edges(40, 200, seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    cn = {r["id"]: r["coreness"] for r in core_numbers(spark, df).collect()}
    kmax = max(cn.values())
    assert kmax >= 1
    for k in (1, 2, kmax):
        members = {r["id"] for r in k_core(spark, df, k=k).collect()}
        assert members == {v for v, c in cn.items() if c >= k}, k


@pytest.mark.parametrize("seed", [5, 999])
def test_msf_weight_is_optimal_and_forest_spans(spark, seed):
    edges = [
        (u, v, 1.0 + ((u * 7 + v * 13 + seed) % 9))
        for u, v in _lcg_edges(35, 150, seed)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    forest = [
        (r["a"], r["b"], r["weight"])
        for r in boruvka_msf(spark, df).collect()
    ]
    # Kruskal optimum on the canonical simple graph
    can = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        can[(a, b)] = min(can.get((a, b), float("inf")), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    opt_w, n_comp = 0.0, 0
    verts = {x for e in can for x in e}
    merged = 0
    for (a, b), w in sorted(can.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            opt_w += w
            merged += 1
    n_comp = len(verts) - merged
    assert len(forest) == len(verts) - n_comp  # spanning forest size
    assert sum(w for _, _, w in forest) == pytest.approx(opt_w)
    # acyclic: union-find over forest edges never sees a cycle
    parent.clear()
    for a, b, _ in forest:
        ra, rb = find(a), find(b)
        assert ra != rb, (a, b)
        parent[ra] = rb
