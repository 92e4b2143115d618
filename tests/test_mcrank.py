"""pagerank_monte_carlo vs a pure-Python replay of the deterministic
walk sampling, plus ranking-quality sanity vs the exact loop."""

from collections import Counter, defaultdict

import pytest

from dxa_pagerank_spark.operators.mcrank import pagerank_monte_carlo

P = 2147483647
A = 1103515245
B = 12345
C = 31


def _replica(edges, verts, damping=0.85, m=4, max_length=20):
    thr = int(damping * P)
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    visits = Counter()
    for seed in verts:
        for r in range(m):
            w = seed * m + r
            v = seed
            visits[v] += 1
            for t in range(1, max_length + 1):
                if (A * ((w + B * t) % P)) % P >= thr:
                    break
                if not adj[v]:
                    break
                v = min(
                    adj[v],
                    key=lambda d: (A * ((d + B * (w + C * t)) % P)) % P,
                )
                visits[v] += 1
    total = sum(visits.values())
    return {v: (visits.get(v, 0), visits.get(v, 0) / total) for v in verts}


# a 12-vertex graph with a hub, a cycle, a chain, and dangling sinks
EDGES = [
    (0, 1), (1, 2), (2, 0),          # cycle
    (3, 0), (4, 0), (5, 0), (6, 0),  # feeders into the cycle
    (0, 7), (7, 8),                  # chain to a dangling sink
    (9, 10),                         # isolated pair, 10 dangling
    (2, 3), (8, 11),                 # 11 dangling
]
VERTS = list(range(12))


def _run(spark, edges, verts, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in verts], "id long")
    return {
        r["id"]: (r["n_visits"], r["est_rank"])
        for r in pagerank_monte_carlo(spark, e, v, **kw).collect()
    }


def test_visit_counts_match_replica_exactly(spark):
    got = _run(spark, EDGES, VERTS, walks_per_vertex=4, max_length=20)
    want = _replica(EDGES, VERTS, m=4, max_length=20)
    assert {v: c for v, (c, _) in got.items()} == {
        v: c for v, (c, _) in want.items()
    }
    for v in VERTS:
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-6)


def test_est_rank_sums_to_one(spark):
    got = _run(spark, EDGES, VERTS, walks_per_vertex=4)
    assert sum(e for _, e in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_every_seed_visited_and_zero_rows_explicit(spark):
    got = _run(spark, EDGES, VERTS, walks_per_vertex=1)
    assert set(got) == set(VERTS)
    for v in VERTS:
        assert got[v][0] >= 1  # every walk counts its own seed


def test_hub_dominates_on_a_star(spark):
    star = [(i, 100) for i in range(20)]
    verts = list(range(20)) + [100]
    got = _run(spark, star, verts, walks_per_vertex=4, max_length=10)
    hub_visits = got[100][0]
    assert hub_visits == max(c for c, _ in got.values())
    assert hub_visits > 20  # most walks take their first step to the hub


def test_head_agrees_with_exact_pagerank(spark):
    from dxa_pagerank_spark.operators.pagerank import pagerank

    e = spark.createDataFrame(EDGES, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in VERTS], "id long")
    exact = pagerank(spark, e, vertices=v, threshold=1e-10, max_rounds=100)
    top_exact = max(exact.ranks.collect(), key=lambda r: r["rank"])["id"]
    got = _run(spark, EDGES, VERTS, walks_per_vertex=16, max_length=30)
    top_mc = max(VERTS, key=lambda x: got[x][0])
    assert top_mc == top_exact
