"""Katz centrality + neighborhood/harmonic (HyperBall design) vs
pure-Python oracles (SURVEY.md §5.2: every operator gets an
independent reference implementation)."""

import collections

import numpy as np
import pytest

from dxa_pagerank_spark.datagen import edges_to_spark, fast_synthetic_edges
from dxa_pagerank_spark.operators.katz import katz_centrality
from dxa_pagerank_spark.operators.neighborhood import (
    harmonic_centrality,
    neighborhood_function,
    neighborhood_profile,
)


def _katz_oracle(src, dst, n, alpha, beta, rounds):
    """Dense replay: x_{t+1} = beta + alpha * A^T x_t, duplicate edges
    count (multiset semantics, like operators/pagerank.py)."""
    x = {v: beta for v in set(src) | set(dst)}
    for _ in range(rounds):
        gathered = collections.defaultdict(float)
        for s, d in zip(src, dst):
            gathered[d] += x[s]
        x = {v: beta + alpha * gathered.get(v, 0.0) for v in x}
    return x


def _bfs_dists(adj, root, max_depth):
    dist = {root: 0}
    frontier = [root]
    d = 0
    while frontier and d < max_depth:
        d += 1
        nxt = []
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


def _ball_profile_oracle(src, dst, rounds, direction="out"):
    """|B_t(v)| per (v, t) from per-root BFS over distinct edges."""
    pairs = set(zip(src, dst))
    if direction == "in":
        pairs = {(d, s) for s, d in pairs}
    adj = collections.defaultdict(list)
    for s, d in pairs:
        adj[s].append(d)
    verts = {v for p in pairs for v in p}
    out = {}
    for v in verts:
        dist = _bfs_dists(adj, v, rounds)
        for t in range(rounds + 1):
            out[(v, t)] = sum(1 for x in dist.values() if x <= t)
    return out


def test_katz_line_graph(spark):
    # 0 -> 1 -> 2: closed form x_k(v) = beta * sum alpha^j paths
    src, dst = np.array([0, 1]), np.array([1, 2])
    res = {
        r["id"]: r["score"]
        for r in katz_centrality(
            spark, edges_to_spark(spark, src, dst), alpha=0.5, beta=1.0, rounds=4
        ).collect()
    }
    # x(0)=1; x(1)=1+0.5*x(0); x(2)=1+0.5*x(1) at fixpoint of 4 rounds
    assert res[0] == pytest.approx(1.0)
    assert res[1] == pytest.approx(1.5)
    assert res[2] == pytest.approx(1.75)


def test_katz_random_graph(spark):
    n = 300
    src, dst = fast_synthetic_edges(n, 4, seed=11)
    expected = _katz_oracle(src, dst, n, alpha=0.05, beta=1.0, rounds=5)
    got = {
        r["id"]: r["score"]
        for r in katz_centrality(
            spark,
            edges_to_spark(spark, src, dst),
            alpha=0.05,
            beta=1.0,
            rounds=5,
        ).collect()
    }
    assert got.keys() == expected.keys()
    for v in expected:
        assert got[v] == pytest.approx(expected[v], rel=1e-12)


def test_katz_normalized(spark):
    src, dst = fast_synthetic_edges(100, 3, seed=3)
    got = katz_centrality(
        spark, edges_to_spark(spark, src, dst), rounds=3, normalize=True
    )
    norm = sum(r["score"] ** 2 for r in got.collect())
    assert norm == pytest.approx(1.0, rel=1e-9)


@pytest.mark.parametrize("direction", ["out", "in"])
def test_ball_profile_exact(spark, direction):
    src, dst = fast_synthetic_edges(120, 3, seed=7)
    rounds = 4
    expected = _ball_profile_oracle(src, dst, rounds, direction)
    prof = neighborhood_profile(
        spark,
        edges_to_spark(spark, src, dst),
        rounds=rounds,
        mode="exact",
        direction=direction,
    )
    got = {(r["id"], r["t"]): r["ball_size"] for r in prof.collect()}
    assert got == expected


def test_harmonic_centrality_exact(spark):
    src, dst = fast_synthetic_edges(100, 3, seed=5)
    rounds = 5
    pairs = set(zip(src, dst))
    radj = collections.defaultdict(list)
    for s, d in pairs:
        radj[d].append(s)  # reverse adjacency: in-distance BFS
    verts = {v for p in pairs for v in p}
    expected = {}
    for v in verts:
        dist = _bfs_dists(radj, v, rounds)
        expected[v] = sum(1.0 / d for u, d in dist.items() if 0 < d <= rounds)
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(
            spark, edges_to_spark(spark, src, dst), rounds=rounds
        ).collect()
    }
    assert got.keys() == expected.keys()
    for v in expected:
        assert got[v] == pytest.approx(expected[v], rel=1e-12)


def test_neighborhood_function_exact(spark):
    src, dst = fast_synthetic_edges(150, 2, seed=13)
    rounds = 4
    prof = _ball_profile_oracle(src, dst, rounds)
    expected = {
        t: sum(v for (node, tt), v in prof.items() if tt == t)
        for t in range(rounds + 1)
    }
    got = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(
            spark, edges_to_spark(spark, src, dst), rounds=rounds
        ).collect()
    }
    assert got == expected


def test_hll_mode_tracks_exact(spark):
    """HyperBall sketch mode: DataSketches estimates stay within the
    lgK=12 error envelope of the exact ball sizes (the 100-TB path
    measured against the correctness form)."""
    src, dst = fast_synthetic_edges(400, 3, seed=17)
    rounds = 3
    exact = {
        (r["id"], r["t"]): r["ball_size"]
        for r in neighborhood_profile(
            spark, edges_to_spark(spark, src, dst), rounds=rounds, mode="exact"
        ).collect()
    }
    est = {
        (r["id"], r["t"]): r["ball_size"]
        for r in neighborhood_profile(
            spark, edges_to_spark(spark, src, dst), rounds=rounds, mode="hll"
        ).collect()
    }
    assert est.keys() == exact.keys()
    for k, v in exact.items():
        assert est[k] == pytest.approx(v, rel=0.05)
