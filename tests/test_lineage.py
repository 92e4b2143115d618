"""cut_lineage (plans/lineage.py): stats-resetting checkpoints.

Pins the bug class found in round 3: `localCheckpoint` copies the
origin plan's size estimate into the LogicalRDD, so a loop whose round
joins k >= 2 state-derived tables compounds the estimate geometrically
and Catalyst's BigInteger stats arithmetic comes to dominate planning
(Louvain measured 1.3 -> 49.5 s/round on a 49-edge coarse graph).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dxa_pagerank_spark.plans.lineage import cut_lineage


def _stat_bits(df) -> int:
    return (
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def test_cut_lineage_roundtrips_values(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 17).alias("v")
    )
    cut = cut_lineage(df)
    assert cut.schema == df.schema
    assert sorted(cut.collect()) == sorted(df.collect())


def test_cut_lineage_resets_inherited_stats(spark):
    """Simulate a state⋈state loop: with bare localCheckpoint the
    checkpointed estimate grows geometrically (digit count doubles per
    round); with cut_lineage it is constant."""
    state = spark.range(50).select("id", F.col("id").alias("v"))

    plain = state.localCheckpoint(eager=True)
    cut = cut_lineage(state)
    plain_bits, cut_bits = [], []
    for _ in range(4):
        nxt = plain.alias("a").join(
            plain.alias("b"), F.col("a.v") == F.col("b.id")
        ).select(F.col("a.id").alias("id"), F.col("b.v").alias("v"))
        plain = nxt.localCheckpoint(eager=True)
        plain_bits.append(_stat_bits(plain))

        nxt = cut.alias("a").join(
            cut.alias("b"), F.col("a.v") == F.col("b.id")
        ).select(F.col("a.id").alias("id"), F.col("b.v").alias("v"))
        cut = cut_lineage(nxt)
        cut_bits.append(_stat_bits(cut))

    # bare localCheckpoint: inherited estimate squares every round
    assert plain_bits[-1] > 2 * plain_bits[0]
    # cut_lineage: constant session-default estimate, round after round
    assert cut_bits[-1] == cut_bits[0]
    assert cut_bits[0] <= 64

    # and the data is identical down both paths
    assert sorted(r.asDict().items() for r in cut.collect()) == sorted(
        r.asDict().items() for r in plain.collect()
    )


def test_iterative_operators_use_bounded_stats(spark):
    """The three loops that join multiple state-derived tables per
    round (Louvain move rounds, pointer doubling, Boruvka) keep every
    checkpointed estimate below a constant bound — a regression here
    means someone reverted a cut_lineage to bare localCheckpoint."""
    import random

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from dxa_pagerank_spark.operators.louvain import louvain
    from dxa_pagerank_spark.operators.mst import boruvka_msf
    from dxa_pagerank_spark.operators.redirects import resolve_redirects

    rng = random.Random(3)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")

    seen: list[int] = []
    orig = CDF.localCheckpoint

    def patched(self, eager=True, storageLevel=None):
        ck = (
            orig(self, eager)
            if storageLevel is None
            else orig(self, eager, storageLevel)
        )
        seen.append(_stat_bits(ck))
        return ck

    CDF.localCheckpoint = patched
    try:
        louvain(spark, df, max_move_rounds=6, max_levels=3).labels.count()
        rdf = (
            df.groupBy("src")
            .agg(F.min("dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        resolve_redirects(spark, rdf).count()
        wdf = df.withColumn(
            "weight", (F.col("src") * 7 + F.col("dst") * 13) % 50 + 1.0
        )
        boruvka_msf(spark, wdf).count()
    finally:
        CDF.localCheckpoint = orig

    assert seen, "expected the loops to checkpoint"
    # every checkpoint's estimate stays a few machine words — the
    # geometric regime reached thousands of bits within a handful of
    # rounds at this scale
    assert max(seen) < 512, f"stats estimate escaped: max {max(seen)} bits"
