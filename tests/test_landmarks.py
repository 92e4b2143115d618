"""Landmark distance oracle (operators/landmarks.py) vs a pure-Python
BFS replica: exact landmark distances, bound sandwiching, and the
on-a-shortest-path exactness law."""

from __future__ import annotations

import random
from collections import deque

from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.landmarks import (
    estimate_distances,
    landmark_distances,
    select_landmarks,
)


def _sym_adj(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _bfs(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        x = q.popleft()
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def test_landmark_distances_match_bfs_replica(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    adj = _sym_adj(edges)

    k = 4
    # replica landmark choice: degree desc, id asc
    expect_lm = sorted(adj, key=lambda i: (-len(adj[i]), i))[:k]
    got_lm = sorted(r.id for r in select_landmarks(df, k).collect())
    assert got_lm == sorted(expect_lm)

    got = {
        (r.landmark, r.id): r.dist
        for r in landmark_distances(spark, df, k=k, max_depth=30).collect()
    }
    expect = {
        (l, v): d for l in expect_lm for v, d in _bfs(adj, l).items()
    }
    assert got == expect


def test_estimate_bounds_sandwich_true_distance(spark):
    rng = random.Random(9)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    adj = _sym_adj(edges)

    dists = landmark_distances(spark, df, k=5, max_depth=30)
    ids = sorted(adj)
    qpairs = [(ids[i], ids[-1 - i]) for i in range(10) if ids[i] != ids[-1 - i]]
    pairs = spark.createDataFrame(qpairs, "u long, v long")
    rows = estimate_distances(dists, pairs).collect()
    assert rows, "expected estimable pairs on a dense random graph"
    for r in rows:
        true = _bfs(adj, r.u).get(r.v)
        assert true is not None
        assert r.d_lower <= true <= r.d_upper
        assert r.n_landmarks >= 1


def test_upper_bound_exact_when_landmark_on_path(spark):
    # path 0-1-2-3-4 plus a hub (5) wired to everything: the hub has
    # max degree, becomes a landmark, and sits on a shortest path for
    # every non-adjacent pair => d_upper == true distance == 2
    edges = [(i, i + 1) for i in range(4)] + [(5, i) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    dists = landmark_distances(spark, df, k=1, max_depth=10)
    assert [r.id for r in select_landmarks(df, 1).collect()] == [5]
    pairs = spark.createDataFrame([(0, 4), (0, 3)], "u long, v long")
    got = {
        (r.u, r.v): (r.d_lower, r.d_upper)
        for r in estimate_distances(dists, pairs).collect()
    }
    assert got == {(0, 4): (0, 2), (0, 3): (0, 2)}


def test_disconnected_pairs_emit_no_row(spark):
    # two components; landmarks (k=1) land in the big one, so a pair
    # spanning components has no common landmark -> no row
    edges = [(0, 1), (1, 2), (0, 2), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    dists = landmark_distances(spark, df, k=1, max_depth=10)
    pairs = spark.createDataFrame([(0, 10), (0, 2)], "u long, v long")
    got = {(r.u, r.v) for r in estimate_distances(dists, pairs).collect()}
    assert got == {(0, 2)}


def test_landmark_closeness_replica(spark):
    # path 0-1-2-3-4 plus hub 2 connected to 5: landmarks = 4 highest
    # undirected degree
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from dxa_pagerank_spark.operators.landmarks import (
        landmark_closeness,
        landmark_distances,
        select_landmarks,
    )

    lms = [r["id"] for r in select_landmarks(df, 4).collect()]
    dmap = {}
    for r in landmark_distances(spark, df, k=4, max_depth=16).collect():
        dmap.setdefault(r["id"], []).append(r["dist"])
    got = {
        r["id"]: (r["n_landmarks"], r["dist_sum"], r["closeness"])
        for r in landmark_closeness(spark, df, k=4, max_depth=16).collect()
    }
    assert set(got) == set(dmap)
    for v, ds in dmap.items():
        n, s = len(ds), sum(ds)
        assert got[v][0] == n and got[v][1] == s
        if s > 0:
            assert abs(got[v][2] - n / s) < 1e-12
        else:
            assert got[v][2] is None
    # sanity: the graph center (2) beats the periphery (4)
    assert got[2][2] > got[4][2]
    assert len(lms) == 4
