"""Batched topic-sensitive PageRank == per-topic personalized_pagerank."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.ppr import personalized_pagerank
from dxa_pagerank_spark.operators.topicrank import topic_sensitive_pagerank


def _edges(spark):
    rows = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (5, 2),
            (0, 1), (6, 7)]  # dup edge + a dangling sink (7)
    return spark.createDataFrame(rows, "src long, dst long")


def test_batched_equals_single_topic_runs(spark):
    edges = _edges(spark)
    topics = {"ta": [0, 5], "tb": [3], "tc": [7, 1, 2]}
    got = {
        (r["topic"], r["id"]): r["rank"]
        for r in topic_sensitive_pagerank(
            spark, edges, topics, rounds=4
        ).collect()
    }
    for t, seeds in topics.items():
        single = {
            r["id"]: r["rank"]
            for r in personalized_pagerank(
                spark, edges, seeds, rounds=4
            ).collect()
        }
        for vid, rank in single.items():
            assert got[(t, vid)] == pytest.approx(rank, rel=0, abs=1e-15), (
                t,
                vid,
            )
    # probability mass: each topic's vector sums to ~1
    import collections

    sums = collections.defaultdict(float)
    for (t, _), r in got.items():
        sums[t] += r
    for t, s in sums.items():
        assert s == pytest.approx(1.0, abs=1e-9), t


def test_empty_seed_set_raises(spark):
    with pytest.raises(ValueError, match="empty seed set"):
        topic_sensitive_pagerank(spark, _edges(spark), {"t": []})
