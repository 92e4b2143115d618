"""Warm-start connected components: exactness vs a cold run and vs the
union-find oracle, plus the round-count advantage the warm start exists
for."""

import random

from dxa_pagerank_spark.operators.components import (
    connected_components,
    incremental_components,
)
from dxa_pagerank_spark.oracle import connected_components_oracle


def _labels(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_warm_equals_cold_random_growth(spark):
    rng = random.Random(7)
    n = 60
    all_edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    yesterday = all_edges[:100]
    prior = connected_components(spark, _edges_df(spark, yesterday))
    warm = incremental_components(
        spark, _edges_df(spark, all_edges), prior
    )
    cold = connected_components(spark, _edges_df(spark, all_edges))
    assert _labels(warm) == _labels(cold)
    src = [e[0] for e in all_edges]
    dst = [e[1] for e in all_edges]
    want = connected_components_oracle(n, src, dst)
    got = {
        i: c
        for i, c in _labels(warm)
        if i in {x for e in all_edges for x in e}
    }
    for i, c in got.items():
        assert want[i] == c


def test_warm_start_merges_two_old_components(spark):
    # yesterday: two separate chains; today: one bridging edge. The
    # merged component must take the global min id.
    yesterday = [(10, 11), (11, 12), (20, 21), (21, 22)]
    prior = connected_components(spark, _edges_df(spark, yesterday))
    today = yesterday + [(12, 20)]
    warm = incremental_components(spark, _edges_df(spark, today), prior)
    assert _labels(warm) == {
        (i, 10) for i in (10, 11, 12, 20, 21, 22)
    }


def test_isolated_priors_survive(spark):
    # a vertex that had edges yesterday... is append-only, so it still
    # does; but a vertex known only as an isolated self-label must stay
    # in the universe with its self-component.
    prior = spark.createDataFrame(
        [(1, 1), (2, 2), (99, 99)], "id long, component long"
    )
    today = [(1, 2)]
    warm = incremental_components(spark, _edges_df(spark, today), prior)
    assert _labels(warm) == {(1, 1), (2, 1), (99, 99)}


def test_warm_start_uses_fewer_rounds_on_a_chain(spark):
    # a long path is the two-phase worst case; after the warm start the
    # prior labels are already stars, so only the appended tail edge
    # needs stitching.
    chain = [(i, i + 1) for i in range(40)]
    cold_stats: dict = {}
    connected_components(
        spark, _edges_df(spark, chain), stats=cold_stats
    ).collect()
    prior = connected_components(spark, _edges_df(spark, chain))
    today = chain + [(40, 41)]
    warm_stats: dict = {}
    warm = incremental_components(
        spark, _edges_df(spark, today), prior, stats=warm_stats
    )
    assert _labels(warm) == {(i, 0) for i in range(42)}
    assert warm_stats["rounds"] < cold_stats["rounds"]
