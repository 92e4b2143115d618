"""SCC + bowtie vs an iterative-Tarjan oracle on randomized digraphs."""

import random

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.scc import (
    bowtie_classes,
    strongly_connected_components,
)


def tarjan_scc(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan; returns id -> min vertex id of its SCC."""
    adj: dict[int, list[int]] = {v: [] for v in range(n)}
    for s, d in edges:
        if s != d:
            adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = 0
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def bowtie_oracle(
    n: int, edges: list[tuple[int, int]]
) -> dict[int, str]:
    scc = tarjan_scc(n, edges)
    sizes: dict[int, int] = {}
    for v, c in scc.items():
        sizes[c] = sizes.get(c, 0) + 1
    core = min(c for c, s in sizes.items() if s == max(sizes.values()))
    adj: dict[int, list[int]] = {v: [] for v in range(n)}
    radj: dict[int, list[int]] = {v: [] for v in range(n)}
    for s, d in edges:
        if s != d:
            adj[s].append(d)
            radj[d].append(s)

    def reach(seeds, a):
        seen = set(seeds)
        todo = list(seeds)
        while todo:
            v = todo.pop()
            for w in a[v]:
                if w not in seen:
                    seen.add(w)
                    todo.append(w)
        return seen

    core_set = {v for v in range(n) if scc[v] == core}
    fwd = reach(core_set, adj)
    bwd = reach(core_set, radj)
    out = {}
    for v in range(n):
        if scc[v] == core:
            out[v] = "core"
        elif v in bwd:
            out[v] = "in"
        elif v in fwd:
            out[v] = "out"
        else:
            out[v] = "other"
    return out


def _run_scc(spark, n, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    got = strongly_connected_components(spark, df, num_vertices=n)
    return {r["id"]: r["scc"] for r in got.collect()}


def test_scc_hand_graph(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (5, 0), (7, 7)]
    assert _run_scc(spark, 8, edges) == tarjan_scc(8, edges)


def test_scc_single_cycle_and_chain(spark):
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    chain = [(6, 7), (7, 8)]
    assert _run_scc(spark, 9, cycle + chain) == tarjan_scc(9, cycle + chain)


def test_scc_all_isolated(spark):
    assert _run_scc(spark, 5, []) == {v: v for v in range(5)}


@pytest.mark.parametrize("seed,n,m", [(1, 40, 90), (2, 60, 80), (3, 30, 150)])
def test_scc_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    assert _run_scc(spark, n, edges) == tarjan_scc(n, edges)


def test_bowtie_hand_graph(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (5, 0), (7, 7)]
    got = bowtie_classes(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        num_vertices=8,
    )
    assert {r["id"]: r["cls"] for r in got.collect()} == bowtie_oracle(
        8, edges
    )


def test_bowtie_random_graph(spark):
    rng = random.Random(7)
    n, m = 50, 70
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    got = bowtie_classes(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        num_vertices=n,
    )
    assert {r["id"]: r["cls"] for r in got.collect()} == bowtie_oracle(
        n, edges
    )


def test_scc_partitioning_invariance(spark):
    rng = random.Random(11)
    n, m = 35, 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(
        13, F.col("dst")
    )
    got = strongly_connected_components(spark, df, num_vertices=n)
    assert {r["id"]: r["scc"] for r in got.collect()} == tarjan_scc(n, edges)


def test_scc_raises_on_inner_round_exhaustion(spark):
    """ADVICE r02: exhausting max_inner before the fixpoint must raise
    (a partial propagation silently splits one SCC into wrong labels)."""
    import pytest

    # a 12-cycle needs ~11 propagation rounds; max_inner=3 cannot finish
    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        strongly_connected_components(spark, edges, max_inner=3)
