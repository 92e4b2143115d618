"""Explicit hub-salting: results must be identical with and without."""

import numpy as np

from dxa_pagerank_spark.datagen import edges_to_spark, hub_graph
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.oracle import pagerank_oracle


def test_salted_pagerank_identical_on_hub_graph(spark):
    n, src, dst = hub_graph(801)
    # make vertex 1 a super-SOURCE too: it points at everyone
    extra_src = np.zeros(n - 1, dtype=np.int64)
    extra_dst = np.arange(1, n, dtype=np.int64)
    src = np.concatenate([src, extra_src])
    dst = np.concatenate([dst, extra_dst])
    edges = edges_to_spark(spark, src, dst)

    plain = pagerank(spark, edges, num_vertices=n, threshold=1e-9,
                     max_rounds=80, num_partitions=4)
    salted = pagerank(spark, edges, num_vertices=n, threshold=1e-9,
                      max_rounds=80, num_partitions=4,
                      hub_salt=4, hub_threshold=100)
    oracle = pagerank_oracle(n, src, dst, 0.85, 1e-9, 80)

    a = {r["id"]: r["rank"] for r in plain.ranks.collect()}
    b = {r["id"]: r["rank"] for r in salted.ranks.collect()}
    assert plain.rounds == salted.rounds == oracle.rounds
    diffs = np.array([abs(a[i] - b[i]) for i in range(n)])
    assert diffs.max() < 1e-12  # same ops, same result
    np.testing.assert_allclose(
        np.array([b[i] for i in range(n)]), oracle.ranks, atol=1e-9
    )


def test_salting_noop_when_no_hubs(spark):
    from dxa_pagerank_spark.datagen import fast_synthetic_edges

    src, dst = fast_synthetic_edges(500, 4, seed=8)
    edges = edges_to_spark(spark, src, dst)
    plain = pagerank(spark, edges, num_vertices=500, threshold=1e-8,
                     max_rounds=50, num_partitions=4)
    salted = pagerank(spark, edges, num_vertices=500, threshold=1e-8,
                      max_rounds=50, num_partitions=4,
                      hub_salt=8, hub_threshold=10_000)  # nothing qualifies
    a = {r["id"]: r["rank"] for r in plain.ranks.collect()}
    b = {r["id"]: r["rank"] for r in salted.ranks.collect()}
    assert plain.rounds == salted.rounds
    assert max(abs(a[i] - b[i]) for i in a) < 1e-12
