"""SimRank oracles: exact comparison against a naive dense pure-Python
implementation of truncated SimRank on small directed graphs, plus the
hub-cap and pruning laws."""

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.simrank import simrank

# web-ish motif: a hub (0) linking everywhere, a 2-cycle, a dangling
# in-degree-0 source, and parallel-path siblings
EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4),
    (1, 2), (2, 1),
    (3, 4), (5, 4), (5, 3),
    (6, 1),
]


def simrank_py(edges, rounds, c, max_in_degree=None):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    ins = {v: sorted({s for s, d in edges if d == v}) for v in nodes}
    if max_in_degree is not None:
        ins = {
            v: (nbrs if len(nbrs) <= max_in_degree else [])
            for v, nbrs in ins.items()
        }
    s = {(a, b): 1.0 if a == b else 0.0 for a in nodes for b in nodes}
    for _ in range(rounds):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = 1.0
                    continue
                ia, ib = ins[a], ins[b]
                if not ia or not ib:
                    nxt[(a, b)] = 0.0
                    continue
                tot = sum(s[(i, j)] for i in ia for j in ib)
                nxt[(a, b)] = c / (len(ia) * len(ib)) * tot
        s = nxt
    return {
        (a, b): v for (a, b), v in s.items() if a < b and v > 0
    }


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_matches_dense_reference(spark, rounds):
    got = {
        (r.a, r.b): r.score
        for r in simrank(_edges_df(spark), rounds=rounds, c=0.8).collect()
    }
    want = simrank_py(EDGES, rounds, 0.8)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_scores_bounded_and_symmetric_inputs_have_equal_scores(spark):
    rows = simrank(_edges_df(spark), rounds=3, c=0.8).collect()
    assert rows, "fixture graph has similar pairs"
    for r in rows:
        assert 0 < r.score <= 0.8  # off-diagonal scores bounded by C
    # (1, 2): mutually-linking 2-cycle both also fed by the hub
    assert any((r.a, r.b) == (1, 2) for r in rows)


def test_max_in_degree_cap_matches_reference(spark):
    got = {
        (r.a, r.b): r.score
        for r in simrank(
            _edges_df(spark), rounds=3, c=0.8, max_in_degree=2
        ).collect()
    }
    want = simrank_py(EDGES, 3, 0.8, max_in_degree=2)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_min_score_prunes_only_the_tail(spark):
    full = {
        (r.a, r.b): r.score
        for r in simrank(_edges_df(spark), rounds=2, c=0.8).collect()
    }
    pruned = {
        (r.a, r.b): r.score
        for r in simrank(
            _edges_df(spark), rounds=2, c=0.8, min_score=0.2
        ).collect()
    }
    # truncation is sound: surviving pairs keep scores <= the untruncated
    # value, and every pair >= the threshold in the full run survives
    for k, v in pruned.items():
        assert v <= full[k] + 1e-12
    assert {k for k, v in full.items() if v >= 0.2} <= set(pruned)
