"""Local community detection: personalized-PageRank conductance sweep
(Andersen, Chung & Lang, "Local graph partitioning using PageRank
vectors", FOCS 2006).

The classic local-clustering recipe: rank vertices by degree-normalized
seeded PageRank, then sweep prefixes of that order and score each
prefix S_t by conductance

    cond(S_t) = cut(S_t) / min(vol(S_t), vol(V) - vol(S_t))

— the best prefix is the seed's community. ACL's push algorithm is
inherently sequential; the distributed re-expression runs the seeded
power iteration (operators/ppr.py — the same approximation family) and
evaluates EVERY prefix of the sweep in one pass of window cumulative
sums, instead of growing the set one vertex at a time.

north_rule scope extension (no reference code — the reference computes
plain PageRank only, MainPR.java); conductance is evaluated on the
symmetrized simple graph, the standard convention for sweep cuts.

Physical shape: the PPR loop's cost dominates (audited in
operators/ppr.py). After it: one distinct canonical-edge shuffle, one
degree groupBy, a sort-limit top_m truncation (TakeOrderedAndProject —
never a global sort), two edge->prefix-rank equi-joins whose inner
result is at most the edges INSIDE the top_m ball, and cumulative
windows over the top_m-row table (constant-size, single tiny task —
same contract as rank_fusion's rank windows). Exact-integer
vol/cut bookkeeping; the only division is the output conductance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ppr_sweep(
    spark: SparkSession,
    edges: DataFrame,
    seeds: Sequence[int],
    damping: float = 0.85,
    rounds: int = 5,
    top_m: int = 50,
) -> DataFrame:
    """-> (t, id, vol, cut, conductance): the sweep curve over the
    top_m prefix of the degree-normalized seeded-PageRank order
    (score = rank/degree desc, ties by id asc). Row t describes the
    prefix {v_1..v_t}; argmin conductance is the detected local
    community. Prefixes whose complement volume is 0 (the whole graph)
    are dropped — conductance is undefined there.
    """
    from pyspark.sql import Window

    from dxa_pagerank_spark.operators.ppr import personalized_pagerank

    if top_m < 1:
        raise ValueError("top_m must be >= 1")
    ppr = personalized_pagerank(
        spark, edges, list(seeds), damping=damping, rounds=rounds
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    udeg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # score rounded to 12 decimals BEFORE ordering: structurally
    # symmetric vertices get bit-identical scores regardless of float
    # summation order, so the (score desc, id asc) order — and with it
    # the whole sweep — is deterministic and engine-portable
    scored = ppr.join(udeg, "id").select(
        "id", "d", F.round(F.col("rank") / F.col("d"), 12).alias("score")
    )
    topm = scored.orderBy(F.desc("score"), F.asc("id")).limit(top_m)
    # row_number over <= top_m rows: constant-size single-task window
    ranked = topm.withColumn(
        "t",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id"))),
    ).select("id", "d", "t")
    # an edge becomes internal at prefix max(t_a, t_b); edges with an
    # endpoint outside the ball never join (inner) — they stay cut for
    # every prefix and are accounted via vol - 2*internal
    eint = (
        und.join(
            ranked.select(F.col("id").alias("a"), F.col("t").alias("ta")),
            "a",
        )
        .join(
            ranked.select(F.col("id").alias("b"), F.col("t").alias("tb")),
            "b",
        )
        .select(F.greatest("ta", "tb").alias("te"))
        .groupBy("te")
        .agg(F.count(F.lit(1)).alias("ce"))
    )
    total = udeg.agg(F.sum("d").alias("vol_total"))
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = (
        ranked.join(eint, ranked["t"] == eint["te"], "left")
        .select(
            "t",
            "id",
            "d",
            F.coalesce("ce", F.lit(0)).alias("ce"),
        )
        .select(
            "t",
            "id",
            F.sum("d").over(w).alias("vol"),
            F.sum("ce").over(w).alias("ei"),
        )
        .crossJoin(total)
    )
    comp = F.col("vol_total") - F.col("vol")
    denom = F.least(F.col("vol"), comp)
    return sweep.filter(denom > 0).select(
        "t",
        "id",
        "vol",
        (F.col("vol") - 2 * F.col("ei")).alias("cut"),
        ((F.col("vol") - 2 * F.col("ei")) / denom).alias("conductance"),
    )


def best_sweep_cut(sweep: DataFrame) -> DataFrame:
    """-> the 1-row argmin-conductance prefix of a ppr_sweep curve
    (ties to the smaller prefix t, so the answer is deterministic)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("conductance"), F.asc("t"))
    return (
        sweep.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
