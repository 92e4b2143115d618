"""Betweenness centrality — batched multi-pivot Brandes.
[north_rule scope extension — no reference counterpart; completes the
centrality family (pagerank, katz, harmonic, hits/salsa, k-core)]

Brandes 2001 ("A faster algorithm for betweenness centrality", public
literature): for each source s, a BFS forward pass counts shortest
paths (sigma), then a level-by-level backward sweep accumulates the
pair-dependency

    delta_s(v) = sum over successors w on shortest paths of
                 sigma_s(v) / sigma_s(w) * (1 + delta_s(w))

and betweenness(v) = sum over sources s != v of delta_s(v). Exact
betweenness uses ALL sources; the published approximation (Brandes &
Pich 2007) samples pivot sources — this operator takes an explicit
pivot list so results are deterministic and oracle-replayable.

Distributed shape: ALL pivots advance in ONE wave — state rows are
(s, v, dist, sigma), so each BFS level is a single frontier-⋈-edges
shuffle for every pivot at once (k pivots cost one traversal of depth
diameter, not k traversals). Backward sweep walks dist levels top-down
with the same (s, v)-keyed joins. Frontier-only shuffles (the bfs.py
envelope times n_pivots); the edge table is deduplicated up front
(betweenness is a simple-digraph notion) and persisted once. Web
graphs keep the level count small (bulk distances are ~O(log n) hops);
every level is localCheckpointed so plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, betweenness): pivot-sampled Brandes betweenness over the
    distinct non-loop directed edge set; every vertex of the graph
    appears (0.0 when on no shortest path). `sources` are the pivots;
    exact betweenness = pass every vertex id."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts.count()

    src_df = spark.createDataFrame(
        [(int(s),) for s in sources], "s LONG"
    ).join(verts, F.col("s") == F.col("id"), "left_semi")

    # ---- forward: levels with shortest-path counts --------------------
    frontier = src_df.select(
        "s", F.col("s").alias("v"), F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    visited = frontier
    levels = [frontier]
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["v"] == e["src"])
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nv", "v")
            .join(visited.select("s", "v"), ["s", "v"], "left_anti")
            .select("s", "v", F.lit(d).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.rdd.isEmpty():
            break
        levels.append(nxt)
        old = visited
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    max_d = len(levels) - 1

    # ---- backward: dependency accumulation, deepest level first -------
    delta = levels[max_d].select("s", "v", F.lit(0.0).alias("delta"))
    acc = [delta]
    for d in range(max_d - 1, -1, -1):
        lv = levels[d].select("s", "v", "sigma")
        succ = levels[d + 1].select(
            "s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w")
        ).join(
            delta.select("s", F.col("v").alias("w"), "delta"), ["s", "w"]
        )
        contrib = (
            lv.join(e, lv["v"] == e["src"])
            .join(
                succ,
                (F.col("dst") == succ["w"]) & (lv["s"] == succ["s"]),
            )
            .groupBy(lv["s"].alias("s"), lv["v"].alias("v"))
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sigma_w"))
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("contrib")
            )
        )
        delta = (
            lv.select("s", "v")
            .join(contrib, ["s", "v"], "left")
            .select("s", "v", F.coalesce("contrib", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        acc.append(delta)

    all_delta = acc[0]
    for d in acc[1:]:
        all_delta = all_delta.union(d)
    bc = (
        all_delta.filter(F.col("v") != F.col("s"))
        .groupBy("v")
        .agg(F.sum("delta").alias("b"))
    )
    out = verts.join(bc, verts["id"] == bc["v"], "left").select(
        "id", F.coalesce("b", F.lit(0.0)).alias("betweenness")
    ).localCheckpoint(eager=True)
    e.unpersist()
    verts.unpersist()
    return out
