"""Rendezvous hashing (operators/partitioning.py): replica of the
LCG weights/argmax, balance, and the minimal-movement guarantee that
distinguishes HRW from mod re-sharding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.partitioning import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    _SHARD_STRIDE,
    rendezvous_assign,
)


def _h(key, s):
    x = (key + _LCG_C + s * _SHARD_STRIDE) % _LCG_M
    return (_LCG_A * ((x * x) % _LCG_M) + _LCG_C) % _LCG_M


def _assign(key, n):
    best = (-1, -1)
    for s in range(n):
        h = _h(key, s)
        if h > best[0]:
            best = (h, s)
    return best[1]


def test_hrw_matches_replica_and_balances(spark):
    n = 8
    df = spark.range(2000).select(
        F.col("id"), rendezvous_assign(F.col("id"), n).alias("shard")
    )
    got = {r["id"]: r["shard"] for r in df.collect()}
    counts = {}
    for k in range(2000):
        exp = _assign(k, n)
        assert got[k] == exp
        counts[exp] = counts.get(exp, 0) + 1
    # balanced within a loose band (expected 250/shard)
    assert min(counts.values()) > 150
    assert max(counts.values()) < 350


def test_hrw_minimal_movement_vs_mod(spark):
    rows = 3000
    df = spark.range(rows).select(
        "id",
        rendezvous_assign(F.col("id"), 8).alias("s8"),
        rendezvous_assign(F.col("id"), 10).alias("s10"),
        F.pmod(F.col("id"), F.lit(8)).alias("m8"),
        F.pmod(F.col("id"), F.lit(10)).alias("m10"),
    )
    r = df.agg(
        F.sum((F.col("s8") != F.col("s10")).cast("int")).alias("hrw_moved"),
        F.sum((F.col("m8") != F.col("m10")).cast("int")).alias("mod_moved"),
    ).collect()[0]
    # HRW: expected movement 2/10 = 20%; mod: ~90%
    assert r["hrw_moved"] / rows < 0.35
    assert r["mod_moved"] / rows > 0.7
    # keys that moved only moved TO the new shards' wins or stayed —
    # no old-shard-to-old-shard churn
    churn = df.filter(
        (F.col("s8") != F.col("s10")) & (F.col("s10") < 8)
    ).count()
    assert churn == 0


def test_hrw_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        rendezvous_assign(F.lit(1), 0)
