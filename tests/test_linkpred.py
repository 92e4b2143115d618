"""Link prediction (Adamic-Adar / Jaccard) and effective diameter vs
brute-force pure-Python oracles."""

import math
import random
from collections import defaultdict
from itertools import combinations

import pytest

from dxa_pagerank_spark.operators.linkpred import link_prediction
from dxa_pagerank_spark.operators.neighborhood import (
    effective_diameter,
    neighborhood_function,
)


def _oracle(edges, min_common=1, max_degree=None):
    nbr = defaultdict(set)
    for s, d in set(edges):
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    scores = {}
    agg = defaultdict(lambda: [0, 0.0])
    for z, members in nbr.items():
        if max_degree is not None and len(members) > max_degree:
            continue
        for a, b in combinations(sorted(members), 2):
            agg[(a, b)][0] += 1
            agg[(a, b)][1] += 1.0 / math.log(len(nbr[z]))
    for (a, b), (n, aa) in agg.items():
        if n < min_common or b in nbr[a]:
            continue
        jac = n / (len(nbr[a]) + len(nbr[b]) - n)
        scores[(a, b)] = (n, aa, jac)
    return scores


def _got(df):
    return {
        (r["a"], r["b"]): (r["n_common"], r["adamic_adar"], r["jaccard"])
        for r in df.collect()
    }


def _check(got, want):
    assert set(got) == set(want)
    for k, (n, aa, jac) in want.items():
        gn, gaa, gjac = got[k]
        assert gn == n
        assert gaa == pytest.approx(aa, abs=1e-12)
        assert gjac == pytest.approx(jac, abs=1e-12)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_linkpred_hand(spark):
    # path 1-2-3 plus triangle 3-4-5: (1,3) share {2}; (2,4),(2,5)
    # share {3}; (4,5) adjacent -> excluded
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    got = _got(link_prediction(_edges_df(spark, edges)))
    _check(got, _oracle(edges))
    assert (4, 5) not in got  # existing edge never predicted


def test_linkpred_direction_and_dups_ignored(spark):
    # reversed duplicates and self-loops collapse into one undirected
    # edge set
    edges = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 3)]
    _check(_got(link_prediction(_edges_df(spark, edges))), _oracle(edges))


def test_linkpred_random(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
    for mc, cap in ((1, None), (2, None), (1, 6)):
        _check(
            _got(
                link_prediction(
                    _edges_df(spark, edges), min_common=mc, max_degree=cap
                )
            ),
            _oracle(edges, min_common=mc, max_degree=cap),
        )


def test_linkpred_degree_cap_drops_hub_pairs(spark):
    edges = [(0, d) for d in range(1, 9)] + [(1, 9), (2, 9)]
    got = _got(link_prediction(_edges_df(spark, edges), max_degree=4))
    _check(got, _oracle(edges, max_degree=4))
    # hub 0's pairs are gone, but z=9 (degree 2) still scores (1,2)
    assert (1, 2) in got


def test_linkpred_plan_is_jvm_only(spark):
    plan = (
        link_prediction(_edges_df(spark, [(1, 2), (2, 3)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan


def _eff_diameter_oracle(edges, rounds, fraction):
    # BFS all-pairs truncated distances
    adj = defaultdict(set)
    verts = set()
    for s, d in set(edges):
        adj[s].add(d)
        verts.update((s, d))
    nf = {}
    for t in range(rounds + 1):
        nf[t] = 0
    for u in verts:
        dist = {u: 0}
        frontier = [u]
        for t in range(1, rounds + 1):
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = t
                        nxt.append(y)
            frontier = nxt
        for t in range(rounds + 1):
            nf[t] += sum(1 for v in dist.values() if v <= t)
    target = fraction * nf[rounds]
    for t in range(rounds + 1):
        if nf[t] >= target:
            if t == 0:
                return 0.0, 0
            return t - 1 + (target - nf[t - 1]) / (nf[t] - nf[t - 1]), t
    raise AssertionError("unreachable")


def test_effective_diameter_chain(spark):
    # directed chain 0->1->2->3->4: exact interpolated value
    edges = [(i, i + 1) for i in range(4)]
    df = _edges_df(spark, edges)
    want, want_t = _eff_diameter_oracle(edges, 6, 0.9)
    row = effective_diameter(spark, df, rounds=6, fraction=0.9).collect()[0]
    assert row["eff_diameter"] == pytest.approx(want, abs=1e-12)
    assert row["t_ceil"] == want_t
    nf = {
        r["t"]: r["n_pairs"]
        for r in neighborhood_function(spark, df, rounds=6).collect()
    }
    assert row["max_pairs"] == nf[6]


def test_effective_diameter_random(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(40)]
    df = _edges_df(spark, edges)
    want, want_t = _eff_diameter_oracle(edges, 5, 0.75)
    row = effective_diameter(
        spark, df, rounds=5, fraction=0.75
    ).collect()[0]
    assert row["eff_diameter"] == pytest.approx(want, abs=1e-12)
    assert row["t_ceil"] == want_t


def test_effective_diameter_complete_graph_is_zero_or_one(spark):
    # K3: every pair at distance <=1; N(0)=3, N(1)=9, target=0.9*9=8.1
    edges = [(a, b) for a in range(3) for b in range(3) if a != b]
    row = effective_diameter(
        spark, _edges_df(spark, edges), rounds=3
    ).collect()[0]
    want, want_t = _eff_diameter_oracle(edges, 3, 0.9)
    assert row["eff_diameter"] == pytest.approx(want, abs=1e-12)
    assert row["t_ceil"] == want_t
