"""Multi-source weighted shortest paths (frontier Bellman-Ford).
[north_rule scope extension — no reference counterpart; the weighted
companion to bfs.py's hop distances]

Classic relaxation with the frontier optimization: only vertices whose
distance improved last round propagate, so each round is one
frontier-⋈-edges shuffle + a min-aggregate, and the loop ends when no
distance improves (at most |V|-1 rounds for non-negative weights; web
graphs converge in a handful). All sources advance in ONE wave as
(s, v, dist) state rows — k sources cost one traversal, the same
batching as bfs.py and betweenness.py.

Determinism: a path's cost is accumulated strictly in path order
(every relaxation extends a prefix sum by one edge), so the set of
candidate doubles per (source, vertex) is identical however the rounds
interleave, and the min is engine-exact — which is why the unrolled
SQL oracle can replay it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    weight_col: str | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (s, id, dist): cheapest-path cost from every source to every
    reachable vertex. `weight_col` is the non-negative per-edge cost
    (omit for unit costs = hop counts). Unreached (s, v) pairs emit no
    row (distance is infinite, not zero)."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    cost = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = (
        edges.select("src", "dst", cost.alias("w"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    # fail loudly on a negative cost: Bellman-Ford with the frontier
    # cutoff (and the bounded-round oracle) is only correct for w >= 0,
    # and silently dropping such edges would return wrong distances
    if e.filter(F.col("w") < 0).limit(1).count() > 0:
        e.unpersist()
        raise ValueError("shortest_paths requires non-negative edge costs")
    verts = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()

    src_df = spark.createDataFrame(
        [(int(s),) for s in sources], "s LONG"
    ).join(verts, F.col("s") == F.col("id"), "left_semi")
    dist = src_df.select(
        "s", F.col("s").alias("v"), F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist

    try:
        for _ in range(int(max_rounds)):
            cand = (
                frontier.join(e, frontier["v"] == e["src"])
                .groupBy("s", F.col("dst").alias("nv"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
                .withColumnRenamed("nv", "v")
            )
            improved = (
                cand.join(dist, ["s", "v"], "left")
                .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
                .select("s", "v", F.col("nd").alias("dist"))
                .localCheckpoint(eager=True)
            )
            if improved.rdd.isEmpty():
                break
            old = dist
            dist = (
                dist.join(improved.select("s", "v"), ["s", "v"], "left_anti")
                .union(improved)
                .localCheckpoint(eager=True)
            )
            frontier = improved
        return dist.select("s", F.col("v").alias("id"), "dist")
    finally:
        e.unpersist()
