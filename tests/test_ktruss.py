"""k_truss vs a pure-Python peeling oracle."""

import random

from dxa_pagerank_spark.operators.ktruss import k_truss


def _oracle(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    need = k - 2
    while und:
        adj = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        drop = {
            (u, v)
            for u, v in und
            if len(adj[u] & adj[v]) < need
        }
        if not drop:
            break
        und -= drop
    return und


def _run(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r["u"], r["v"]) for r in k_truss(spark, df, k).collect()}


def test_ktruss_hand_graph(spark):
    # K4 on {0..3} plus a pendant triangle and a tail
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 4), (3, 5), (4, 5), (5, 6)]
    edges = k4 + extra
    assert _run(spark, edges, 4) == _oracle(edges, 4)  # only the K4
    assert _run(spark, edges, 3) == _oracle(edges, 3)  # K4 + triangle
    assert _run(spark, edges, 2) == _oracle(edges, 2)  # everything


def test_ktruss_cascade_peeling(spark):
    # removing one low-support edge must cascade (tri-strip)
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    assert _run(spark, edges, 3) == _oracle(edges, 3)
    assert _run(spark, edges, 4) == _oracle(edges, 4) == set()


def test_ktruss_random_graphs(spark):
    rng = random.Random(13)
    n, m = 25, 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    for k in (3, 4, 5):
        assert _run(spark, edges, k) == _oracle(edges, k)
