"""Multi-source BFS hop distances over a directed link graph.
[north_rule extension — no reference code; hop-distance distributions
from seed sets are the other half of the Broder WWW-2000 web-structure
analysis (avg directed distance ~16), and multi-source BFS is the
standard frontier primitive (crawl-depth audits, link-spam radius)]

Level-synchronous frontier expansion:

    frontier_0 = seeds (dist 0)
    frontier_t = (frontier_{t-1} ⋈ edges on src).dst  \\  visited

Each step is one equi-join + distinct + anti-join — all JVM; the probe
side is the static distinct edge table, the build side is the frontier
(shrinks to the unvisited boundary). `visited` carries (id, dist) and
grows by exactly the new frontier each level, so a vertex's recorded
dist is the FIRST level that reached it = the minimum hop count.
Lineage is truncated per level (localCheckpoint), same discipline as
every other iterative loop in this engine.

100-TB shape: the working set per level is O(|frontier|) rows shuffled
against the pre-partitioned edge table; no per-vertex Python, no
driver-side state beyond the loop counter and an empty-check. Web
graphs have ~log-diameter cores, so levels are few; max_depth bounds
adversarial chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 16,
    direction: str = "fwd",
) -> DataFrame:
    """-> (id, dist): minimum hop count from any seed along ('fwd')
    or against ('bwd') edge direction; seeds have dist 0. Vertices
    unreachable within max_depth are absent."""
    a, b = ("src", "dst") if direction == "fwd" else ("dst", "src")
    e = edges.select("src", "dst").distinct()
    visited = (
        seeds.select("id")
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("id")
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", a), a, "left_semi")
            .select(F.col(b).alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    return visited


def distance_histogram(levels: DataFrame) -> DataFrame:
    """-> (dist, n_vertices): how many vertices sit at each hop count."""
    return levels.groupBy("dist").agg(F.count(F.lit(1)).alias("n_vertices"))


def double_sweep_bound(
    spark, edges: DataFrame, max_depth: int = 32
) -> DataFrame:
    """Double-sweep diameter bounds (Magnien, Latapy & Habib, ACM JEA
    2009 — the standard cheap certificate next to the interpolated
    effective diameter): BFS from a deterministic start (highest
    undirected degree, ties to min id), hop to the farthest vertex u
    (ties to min id), BFS again from u; then

        diameter >= ecc(u)            (any eccentricity lower-bounds)
        diameter <= 2 * min(ecc(start), ecc(u))   (triangle inequality)

    over the start's connected component of the SYMMETRIZED simple
    graph (a disconnected remainder is invisible to any BFS bound —
    callers pair this with connected_components).

    1-row result: (start_id, ecc_start, far_id, ecc_far, diameter_lb,
    diameter_ub). Exactly two batched BFS passes (frontier-only rounds
    like bfs_levels) + two tiny argmax actions — the whole point of
    the technique is that two sweeps often pin the diameter of
    small-world web graphs within a few hops."""
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionAll(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    start_rows = deg.orderBy(F.desc("d"), F.asc("id")).limit(1).collect()
    if not start_rows:
        raise ValueError("graph has no non-loop edges")
    start = start_rows[0]["id"]
    l1 = bfs_levels(
        sym,
        spark.createDataFrame([(int(start),)], "id long"),
        max_depth=max_depth,
    )
    far1 = (
        l1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    )
    u, ecc_start = int(far1["id"]), int(far1["dist"])
    l2 = bfs_levels(
        sym,
        spark.createDataFrame([(u,)], "id long"),
        max_depth=max_depth,
    )
    ecc_far = int(
        l2.agg(F.max("dist").alias("m")).collect()[0]["m"]
    )
    lb = max(ecc_start, ecc_far)
    ub = 2 * min(ecc_start, ecc_far)
    return spark.createDataFrame(
        [(int(start), ecc_start, u, ecc_far, lb, ub)],
        "start_id long, ecc_start long, far_id long, ecc_far long,"
        " diameter_lb long, diameter_ub long",
    )
