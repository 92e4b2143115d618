"""random_walks vs a pure-Python replay of the deterministic rule."""

import random

from dxa_pagerank_spark.operators.walks import A, B, C, P, random_walks


def _score(d, v, t):
    return (A * ((d + B * (v + C * t)) % P)) % P


def _oracle(edges, seeds, length):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    rows = set()
    for seed in seeds:
        v = seed
        rows.add((seed, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = min(nbrs, key=lambda d: _score(d, v, t))
            rows.add((seed, t, v))
    return rows


def _got(df):
    return {(r["walk_id"], r["step"], r["v"]) for r in df.collect()}


def _run(spark, edges, seeds, length=4):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return _got(random_walks(e, s, length=length))


def test_walks_hand_graph(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 3)]
    assert _run(spark, edges, [0, 3]) == _oracle(edges, [0, 3], 4)


def test_walks_stop_at_dangling(spark):
    edges = [(0, 1), (1, 2)]  # 2 has no out-edges
    got = _run(spark, edges, [0], length=5)
    assert got == {(0, 0, 0), (0, 1, 1), (0, 2, 2)}


def test_walks_random_graph(spark):
    rng = random.Random(9)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    seeds = list(range(0, 40, 7))
    assert _run(spark, edges, seeds, length=6) == _oracle(edges, seeds, 6)


def test_walk_scores_injective_per_step():
    # no ties ever: for fixed (v, t) the score is injective in dst
    seen = {_score(d, 17, 3) for d in range(100000)}
    assert len(seen) == 100000
