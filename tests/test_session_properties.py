"""Structural properties of the continuation-batch operators, on
seeded random graphs:

* WL refinement is permutation-EQUIVARIANT: relabeling vertices
  permutes colors but the class-size multiset is invariant (the
  whole point of a structural fingerprint).
* rich_club curves are monotone: club size and club edge count are
  non-increasing in the threshold; phi stays in [0, 1].
* hitting_times is monotone in rounds: E[min(T, i)] is
  non-decreasing in i (truncated expectations of a nonneg variable).
"""

from __future__ import annotations

import random

from dxa_pagerank_spark.operators.graphstats import rich_club
from dxa_pagerank_spark.operators.hitting import hitting_times
from dxa_pagerank_spark.operators.wlrefine import wl_class_sizes


def _rand_edges(seed, n=24, m=70):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_wl_permutation_equivariance(spark):
    for seed in (1, 2):
        edges = _rand_edges(seed)
        rng = random.Random(seed + 100)
        ids = sorted({v for e in edges for v in e})
        perm = dict(zip(ids, rng.sample(range(1000, 1000 + len(ids)),
                                        len(ids))))
        permuted = [(perm[a], perm[b]) for a, b in edges]
        orig = sorted(
            r["n_vertices"]
            for r in wl_class_sizes(
                spark.createDataFrame(edges, "src long, dst long"),
                rounds=2,
            ).collect()
        )
        perm_sizes = sorted(
            r["n_vertices"]
            for r in wl_class_sizes(
                spark.createDataFrame(permuted, "src long, dst long"),
                rounds=2,
            ).collect()
        )
        assert orig == perm_sizes, seed


def test_rich_club_monotone(spark):
    for seed in (3, 4):
        edges = _rand_edges(seed, n=30, m=120)
        rows = sorted(
            (r["k"], r["club_nodes"], r["club_edges"], r["phi"])
            for r in rich_club(
                spark.createDataFrame(edges, "src long, dst long")
            ).collect()
        )
        for (k1, n1, e1, p1), (k2, n2, e2, p2) in zip(rows, rows[1:]):
            assert k1 < k2
            assert n1 >= n2 and e1 >= e2
        for _, _, _, p in rows:
            assert 0.0 <= p <= 1.0


def test_hitting_times_monotone_in_rounds(spark):
    edges = _rand_edges(5, n=15, m=40)
    df = spark.createDataFrame(edges, "src long, dst long")
    prev = None
    for rounds in (2, 4, 8):
        cur = {
            r["id"]: r["hit_time"]
            for r in hitting_times(
                spark, df, [0], rounds=rounds
            ).collect()
        }
        if prev is not None:
            assert all(cur[v] >= prev[v] - 1e-12 for v in prev)
        prev = cur
