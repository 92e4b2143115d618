"""Landmark-based shortest-path distance estimation.
[north_rule extension — no reference code; landmark/sketch distance
oracles (Potamias-Bonchi-Castillo-Gionis CIKM'09, "Fast shortest path
distance estimation in large networks") are the standard way a web- or
social-graph service answers d(u, v) queries at 10^12-edge scale:
k one-time BFS traversals replace a per-query traversal.]

Offline phase: pick k landmarks (highest-degree vertices — the
best-performing simple strategy in the paper — ties to the smaller id
so selection is deterministic), then run ONE batched multi-source BFS
over the symmetrized graph producing dist(l, v) for every landmark ×
reachable vertex: a k·|V|-row table, the only state this oracle ever
needs.

Online phase (a join, not a traversal): for query pairs (u, v),

    d_upper(u,v) = min_l  d(u,l) + d(l,v)   (triangle inequality)
    d_lower(u,v) = max_l |d(u,l) - d(l,v)|  (reverse triangle ineq.)

so the true distance lies in [d_lower, d_upper], and d_upper is exact
whenever some landmark sits on a shortest u-v path.

100-TB shape: the distance table is k·|V| rows (k is 4..64 — a
constant multiple of the vertex table, co-partitionable by vertex id);
estimation is two equi-joins keyed by vertex + one (u, v) aggregate
with per-pair fan-out exactly k. Nothing is ever quadratic in |V| and
the edge table is touched only by the offline BFS (frontier-only
shuffles, see operators/sssp.py). The k-row landmark id list is
driver-materialized (same contract as the k-means centroid literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.sssp import shortest_paths


def _symmetrize(edges: DataFrame) -> DataFrame:
    """directed (src, dst) -> distinct undirected arcs, self-loops
    dropped (distance is over the underlying undirected graph, as in
    the paper's social/web evaluations)."""
    fwd = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.union(rev).filter(F.col("src") != F.col("dst")).distinct()
    )


def select_landmarks(edges: DataFrame, k: int) -> DataFrame:
    """-> (id,): the k vertices of highest undirected degree, ties to
    the smaller id. Plans as TakeOrderedAndProject (per-partition
    top-k heaps), never a global sort."""
    sym = _symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return (
        deg.orderBy(F.col("deg").desc(), F.col("id").asc())
        .limit(int(k))
        .select("id")
    )


def landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 16,
    max_depth: int = 16,
) -> DataFrame:
    """-> (landmark, id, dist): exact hop distance from each of the k
    chosen landmarks to every vertex within max_depth (one batched
    multi-source BFS; unreachable pairs emit no row)."""
    sym = _symmetrize(edges)
    lm_ids = [r.id for r in select_landmarks(edges, k).collect()]
    d = shortest_paths(spark, sym, lm_ids, max_rounds=int(max_depth))
    return d.select(
        F.col("s").alias("landmark"),
        "id",
        F.col("dist").cast("long").alias("dist"),
    )


def estimate_distances(dists: DataFrame, pairs: DataFrame) -> DataFrame:
    """(landmark, id, dist) × query pairs (u, v) -> per-pair bounds
    (u, v, d_lower, d_upper, n_landmarks). Pairs with no landmark
    reaching both endpoints emit no row (the oracle is silent, not
    wrong, on disconnected queries)."""
    du = dists.select(
        F.col("landmark").alias("l"),
        F.col("id").alias("u"),
        F.col("dist").alias("du"),
    )
    dv = dists.select(
        F.col("landmark").alias("l"),
        F.col("id").alias("v"),
        F.col("dist").alias("dv"),
    )
    return (
        pairs.select("u", "v")
        .join(du, "u")
        .join(dv, ["l", "v"])
        .groupBy("u", "v")
        .agg(
            F.max(F.abs(F.col("du") - F.col("dv"))).alias("d_lower"),
            F.min(F.col("du") + F.col("dv")).alias("d_upper"),
            F.count(F.lit(1)).alias("n_landmarks"),
        )
    )


def landmark_closeness(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 16,
    max_depth: int = 16,
) -> DataFrame:
    """-> (id, n_landmarks, dist_sum, closeness): landmark-estimated
    closeness centrality — closeness(v) ~ n_landmarks / sum over
    reached landmarks of d(v, landmark). The k-landmark sample
    replaces the all-pairs BFS that exact closeness needs (Eppstein-
    Wang 2004 sampled closeness; the landmark frame is Potamias et
    al. CIKM'09), turning an O(|V|) traversal per vertex into ONE
    shared k-source BFS plus a per-vertex aggregate over <= k rows.

    Vertices reaching no landmark emit no row; landmarks themselves
    include their 0-distance self-row, matching sampled-closeness
    convention (the 0 term contributes to the mean). Exact-integer
    dist_sum; closeness is the one division at output. Zero-sum
    rows (a landmark vertex reaching only itself) yield NULL
    closeness rather than a division blowup.
    """
    d = landmark_distances(spark, edges, k=k, max_depth=max_depth)
    agg = d.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_landmarks"),
        F.sum("dist").alias("dist_sum"),
    )
    return agg.select(
        "id",
        "n_landmarks",
        "dist_sum",
        F.when(
            F.col("dist_sum") > 0,
            F.col("n_landmarks") / F.col("dist_sum"),
        ).alias("closeness"),
    )
