"""Deterministic random walks over a directed link graph.
[north_rule extension — no reference code; walk sampling is the
standard web-graph embedding / sampling primitive (DeepWalk KDD'14,
node2vec KDD'16) that a training-data pipeline runs next to PageRank]

Walks are *deterministic pseudo-random*: at vertex v choosing step t,
the successor is the out-neighbor d minimizing

    score(d, v, t) = (1103515245 * ((d + 12345*(v + 31*t)) % p)) % p,
    p = 2147483647 (prime)

a two-stage LCG-style mix. For fixed (v, t) the map d -> score is
injective (shift mod p, then multiply by a unit mod p), so there are
never ties and the walk is a pure function of (graph, seed vertex) —
reproducible across engines, partitionings, and retries, which is what
makes the output oracle-checkable and the sampling auditable. All
operands stay < 2^62, so the arithmetic is exact in int64 on any
engine.

Per step the plan is one equi-join (current positions ⋈ edges on src)
and one groupBy(walk) min_by — both JVM, map-side combinable. The
frontier is one row per live walk (<< |E|), so each step shuffles only
the walk set; the edge table is the static probe side. Walks that
reach a dangling vertex (no out-edges) simply stop. L is a small
constant, so the unrolled loop is L tiny jobs; lineage is truncated
per step with localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P = 2147483647
A = 1103515245
B = 12345
C = 31


def step_score(dst_col, v_col, t: int):
    """The deterministic neighbor-selection score (shared with the SQL
    oracles; injective in dst for fixed (v, t))."""
    inner = (dst_col + F.lit(B) * (v_col + F.lit(C * t))) % F.lit(P)
    return (F.lit(A) * inner) % F.lit(P)


def random_walks(
    edges: DataFrame, seeds: DataFrame, length: int = 4
) -> DataFrame:
    """-> (walk_id, step, v): deterministic walks of up to `length`
    steps from each seed (walk_id = seed id; step 0 = the seed itself;
    a walk ends early at a vertex with no out-edges)."""
    e = edges.select("src", "dst").distinct()
    cur = seeds.select(
        F.col("id").alias("walk_id"),
        F.lit(0).alias("step"),
        F.col("id").alias("v"),
    ).localCheckpoint(eager=True)
    out = cur
    for t in range(1, length + 1):
        cur = (
            cur.join(e, cur.v == e.src)
            .groupBy("walk_id")
            .agg(
                F.min_by("dst", step_score(F.col("dst"), F.col("v"), t))
                .alias("v")
            )
            .select("walk_id", F.lit(t).alias("step"), "v")
            .localCheckpoint(eager=True)
        )
        out = out.union(cur)
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """-> (walk_id, center, context, offset): every ordered skip-gram
    co-occurrence within `window` steps along a walk (DeepWalk KDD'14
    §4.2 / word2vec context windows; offset = context step - center
    step, never 0). The self-join is an equi-join on walk_id, and a
    walk contributes at most length+1 rows per side, so the per-key
    fan-out is a small constant — no skew regardless of graph shape."""
    w = int(window)
    a = walks.select(
        "walk_id", F.col("step").alias("i"), F.col("v").alias("center")
    )
    b = walks.select(
        "walk_id", F.col("step").alias("j"), F.col("v").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= w)
        )
        .select(
            "walk_id",
            "center",
            "context",
            (F.col("j") - F.col("i")).alias("offset"),
        )
    )


def skipgram_cooccurrence(walks: DataFrame, window: int = 2) -> DataFrame:
    """-> (center, context, n_cooc, pmi): the aggregated skip-gram
    co-occurrence table with pointwise mutual information — the
    training-pair table a DeepWalk/node2vec embedding run consumes
    (and, per Levy & Goldberg NeurIPS'14, the implicit matrix that
    skip-gram factorizes). Everything is exact-integer until the final
    PMI ln, so the SQL oracle replays it bit-for-bit.

    Plan shape: the pair counts are one map-side-combinable groupBy;
    the marginals are two window sums over the already-aggregated
    (center, context) table (|pairs| rows, not |cooccurrences|); the
    grand total is a 1-row aggregate broadcast back."""
    cnt = (
        skipgram_pairs(walks, window)
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
    )
    tot = cnt.agg(F.sum("n_cooc").alias("t"))
    c_cnt = F.sum("n_cooc").over(Window.partitionBy("center"))
    x_cnt = F.sum("n_cooc").over(Window.partitionBy("context"))
    return (
        cnt.withColumn("c_cnt", c_cnt)
        .withColumn("x_cnt", x_cnt)
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "n_cooc",
            F.round(
                F.log(
                    F.col("n_cooc")
                    * F.col("t")
                    / (F.col("c_cnt") * F.col("x_cnt"))
                ),
                6,
            ).alias("pmi"),
        )
    )
