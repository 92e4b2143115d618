"""bfs_levels vs a pure-Python BFS oracle."""

import random
from collections import deque

from dxa_pagerank_spark.operators.bfs import bfs_levels, distance_histogram


def _oracle(edges, seeds, max_depth, direction="fwd"):
    adj = {}
    for s, d in set(edges):
        if direction == "fwd":
            adj.setdefault(s, []).append(d)
        else:
            adj.setdefault(d, []).append(s)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= max_depth:
            continue
        for w in adj.get(v, []):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return {
        r["id"]: r["dist"] for r in bfs_levels(e, s, **kw).collect()
    }


def test_bfs_hand_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (5, 6)]
    assert _run(spark, edges, [0]) == _oracle(edges, [0], 16)


def test_bfs_multi_source_and_bwd(spark):
    edges = [(0, 1), (1, 2), (3, 2), (2, 4)]
    assert _run(spark, edges, [0, 3]) == _oracle(edges, [0, 3], 16)
    assert _run(spark, edges, [4], direction="bwd") == _oracle(
        edges, [4], 16, direction="bwd"
    )


def test_bfs_max_depth_truncates(spark):
    chain = [(i, i + 1) for i in range(6)]
    assert _run(spark, chain, [0], max_depth=3) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_random_graph(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    seeds = [0, 7, 21]
    assert _run(spark, edges, seeds, max_depth=10) == _oracle(
        edges, seeds, 10
    )


def test_distance_histogram(spark):
    edges = [(0, 1), (1, 2), (0, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "id long")
    got = {
        r["dist"]: r["n_vertices"]
        for r in distance_histogram(bfs_levels(e, s)).collect()
    }
    assert got == {0: 1, 1: 2}
