"""cocitation / coupling vs brute-force set oracles."""

import random
from collections import defaultdict
from itertools import combinations

from dxa_pagerank_spark.operators.cocitation import cocitation, coupling


def _oracle(edges, shared_idx, paired_idx, max_degree=None):
    groups = defaultdict(set)
    for e in set(edges):
        groups[e[shared_idx]].add(e[paired_idx])
    pairs = defaultdict(int)
    for members in groups.values():
        if max_degree is not None and len(members) > max_degree:
            continue
        for a, b in combinations(sorted(members), 2):
            pairs[(a, b)] += 1
    return dict(pairs)


def _got(df):
    return {(r["a"], r["b"]): r["n_common"] for r in df.collect()}


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_cocitation_hand(spark):
    edges = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (1, 10)]
    df = _edges_df(spark, edges)
    assert _got(cocitation(df)) == _oracle(edges, 0, 1)
    assert _got(coupling(df)) == _oracle(edges, 1, 0)


def test_cocitation_random(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    df = _edges_df(spark, edges)
    assert _got(cocitation(df, min_common=2)) == {
        k: v for k, v in _oracle(edges, 0, 1).items() if v >= 2
    }
    assert _got(coupling(df)) == _oracle(edges, 1, 0)


def test_cocitation_degree_cap_drops_hubs(spark):
    # hub source 0 links everywhere; capped run must exclude its pairs
    edges = [(0, d) for d in range(10)] + [(1, 2), (1, 3), (4, 2), (4, 3)]
    df = _edges_df(spark, edges)
    assert _got(cocitation(df, max_degree=5)) == _oracle(
        edges, 0, 1, max_degree=5
    )
    assert (0, 1) not in _got(cocitation(df, max_degree=5))


def test_cocitation_plan_is_jvm_only(spark):
    df = _edges_df(spark, [(1, 2), (1, 3)])
    plan = cocitation(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
