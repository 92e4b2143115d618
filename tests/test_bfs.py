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


def test_double_sweep_bounds_path_and_cycle(spark):
    from dxa_pagerank_spark.operators.bfs import double_sweep_bound

    # path 0-1-2-3-4-5: true diameter 5; double sweep finds it exactly
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    row = double_sweep_bound(spark, path).collect()[0]
    assert row["diameter_lb"] == 5
    assert row["diameter_lb"] <= row["diameter_ub"]
    # start = highest degree tie-min-id = 1 (degree 2), far end is 4
    # hops away; second sweep from an endpoint reaches the true 5
    assert row["ecc_far"] == 5

    # 8-cycle: true diameter 4; lb == 4, ub <= 8
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)], "src long, dst long"
    )
    row = cyc_row = double_sweep_bound(spark, cyc).collect()[0]
    assert cyc_row["diameter_lb"] == 4
    assert cyc_row["diameter_ub"] >= 4


def test_double_sweep_replica_random(spark):
    import random

    from dxa_pagerank_spark.operators.bfs import double_sweep_bound

    rng = random.Random(3)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs(s):
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for v in q:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nq.append(w)
            q = nq
        return dist

    deg = {v: len(ns) for v, ns in adj.items()}
    start = min(sorted(deg), key=lambda v: (-deg[v], v))
    d1 = bfs(start)
    far = min(d1, key=lambda v: (-d1[v], v))
    d2 = bfs(far)
    ecc_far = max(d2.values())
    row = double_sweep_bound(spark, spark.createDataFrame(
        edges, "src long, dst long")).collect()[0]
    assert row["start_id"] == start
    assert row["ecc_start"] == d1[far]
    assert row["far_id"] == far
    assert row["ecc_far"] == ecc_far
    # true diameter of the start's component within the bounds
    true_diam = max(
        max(bfs(v).values()) for v in d1
    )
    assert row["diameter_lb"] <= true_diam <= row["diameter_ub"]
