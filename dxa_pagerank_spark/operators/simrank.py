"""SimRank structural similarity over a directed link graph.
[north_rule extension — no reference code; dxa-pageRank stores only the
in-adjacency (Vertex.java:16) and computes no pairwise similarity]

SimRank (Jeh & Widom, KDD 2002): two pages are similar when similar
pages link to them —

    s(a, a) = 1
    s(a, b) = C / (|I(a)| |I(b)|) * sum_{i in I(a), j in I(b)} s(i, j)

with I(v) the in-neighbour set and decay C (0.8 in the paper).  The
fixpoint is approached from s_0 = identity; ``rounds`` power iterations
give the standard truncated SimRank (the paper's own evaluation uses
k <= 5).

Dataflow per round (all equi-joins / aggregations, JVM-side):

    pairs(i, j, s) ->join in(i -> a)-> (a, j) ->join in(j -> b)-> (a, b)
    -> groupBy (a, b) sum(s) -> * C/(|I(a)||I(b)|) -> union diagonal

i.e. the sparse pair table is pushed forward one in-edge on each side —
the pair-graph analogue of the PageRank gather.  State stays sparse:
only pairs with a length-<=k meeting path ever appear (s_k(a,b) != 0
iff some common ancestor reaches both within k steps).

100-TB shape: like co-citation, the blow-up is the hub — a vertex with
in-degree d mints d^2 pairs in one round, so the same two production
caps apply: ``max_in_degree`` drops boilerplate-grade hubs from I(.)
BEFORE any join (a nav bar linked from every page makes everything
similar to everything — zero signal), and ``min_score`` prunes the
tail each round (scores decay by C per round, so a pair's score is
bounded by C^k and thresholding is sound truncation, the paper's own
pruning strategy).  Full-graph SimRank is pair-quadratic by definition;
at web scale this operator is meant for the aggregated site graph or a
capped page neighbourhood, not the raw 10^12-page crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank(
    edges: DataFrame,
    rounds: int = 3,
    c: float = 0.8,
    max_in_degree: int | None = None,
    min_score: float = 0.0,
) -> DataFrame:
    """-> (a, b, score) for a < b with score > 0 after ``rounds``
    truncated SimRank iterations (diagonal rows are implicit: 1.0)."""
    e = edges.select("src", "dst").distinct()
    ine = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    if max_in_degree is not None:
        keep = (
            ine.groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= max_in_degree)
            .select("node")
        )
        ine = ine.join(keep, "node", "left_semi")
    deg = ine.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    nodes = e.select(F.col("src").alias("id")).unionAll(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    diag = nodes.select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.lit(1.0).alias("score"),
    )

    # in-structure is graph-sized (small next to the pair state): keep
    # it broadcast so each round shuffles only the pair table
    ine_b = F.broadcast(ine.persist())
    deg_b = F.broadcast(deg.persist())

    pairs = diag
    for r in range(rounds):
        if r:
            # truncate lineage BETWEEN supersteps (not after the last:
            # the caller's plan stays inspectable and no barrier is paid
            # past the final round), like the other iterative loops here
            pairs = pairs.localCheckpoint(eager=False)
        stepped = (
            pairs.join(ine_b.alias("ia"), pairs.a == F.col("ia.nbr"))
            .select(F.col("ia.node").alias("na"), "b", "score")
            .join(ine_b.alias("jb"), F.col("b") == F.col("jb.nbr"))
            .select("na", F.col("jb.node").alias("nb"), "score")
            .filter(F.col("na") != F.col("nb"))
            .groupBy("na", "nb")
            .agg(F.sum("score").alias("s"))
            .join(deg_b.alias("da"), F.col("na") == F.col("da.node"))
            .join(deg_b.alias("db"), F.col("nb") == F.col("db.node"))
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                (F.lit(c) * F.col("s") / (F.col("da.d") * F.col("db.d"))
                 ).alias("score"),
            )
        )
        if min_score > 0.0:
            stepped = stepped.filter(F.col("score") >= min_score)
        pairs = diag.unionAll(stepped)

    result = pairs.filter(
        (F.col("a") < F.col("b")) & (F.col("score") > 0)
    )
    return result
