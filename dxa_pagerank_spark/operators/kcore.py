"""k-core decomposition (peeling) over the undirected simple graph.

north_rule scope extension (no reference code): repeatedly delete
vertices whose degree in the surviving induced subgraph is < k until a
fixpoint; the survivors are the k-core. Directions and duplicate edges
are ignored (same symmetrize+distinct view as connected components).

Physical plan: the symmetrized edge table is built once; each peel
round is one semi-join of edges against the surviving vertex set (hash
join, survivor side shrinks monotonically — broadcastable as soon as it
fits) + one degree aggregation. One count() action per round is the
convergence test and BSP barrier; lineage truncated per round.
Rounds are O(peeling depth), which is tiny on web-ish graphs (the
degeneracy ordering removes whole shells per round, not single
vertices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, degree) of the k-core's vertices (degree within the
    core). Empty result when no k-core exists."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .repartition(P, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    alive = deg.filter(F.col("degree") >= k).select("id").localCheckpoint(eager=True)
    n_alive = alive.count()

    try:
        for _ in range(max_rounds):
            if n_alive == 0:
                break
            e2 = (
                sym.join(alive.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(alive.withColumnRenamed("id", "v"), "v", "left_semi")
            )
            deg2 = e2.groupBy(F.col("u").alias("id")).agg(
                F.count(F.lit(1)).alias("degree")
            )
            nxt = deg2.filter(F.col("degree") >= k).select("id").localCheckpoint(
                eager=True
            )
            n_next = nxt.count()
            old = alive
            alive = nxt
            try:
                old.unpersist()
            except Exception:
                pass
            if n_next == n_alive:
                n_alive = n_next
                break
            n_alive = n_next
        # final degrees within the core
        e2 = (
            sym.join(alive.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("id", "v"), "v", "left_semi")
        )
        return e2.groupBy(F.col("u").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
    finally:
        sym.unpersist()
