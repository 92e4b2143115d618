"""Triangle counting via degree-ordered edge orientation + wedge
closure. [north_rule — no reference code]

Algorithm (the standard MapReduce/Spark formulation of node-iterator++):

  1. undirected simple graph (dedupe, drop self-loops);
  2. orient every edge from the endpoint with (degree, id)-smaller key
     to the larger — each triangle then has exactly one "pivot" vertex
     with two out-edges, so it is counted exactly once;
  3. wedges: self-join oriented edges on the pivot, keeping the
     (deg,id)-ordered pair of endpoints;
  4. close: semi-join wedges against the oriented edge set.

Scale notes: orientation bounds each pivot's out-degree by O(sqrt(E))
on skewed graphs — the hub vertex of a star graph gets out-degree ~0,
so the wedge self-join never explodes on super-nodes (this IS the skew
handling). Joins are equi-joins on vertex keys; AQE skew-join is the
backstop. ``count`` aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """-> oriented(src, dst) with (deg,id)-order src < dst, deduped."""
    from .components import _symmetrize

    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    with_deg = (
        sym.join(deg.withColumnRenamed("u", "uu"), sym.u == F.col("uu"))
        .select("u", "v", F.col("deg").alias("du"))
        .join(deg.withColumnRenamed("u", "vv"), F.col("v") == F.col("vv"))
        .select("u", "v", "du", F.col("deg").alias("dv"))
    )
    return with_deg.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.col("dv").alias("dst_deg"),
    )


def triangle_count(spark: SparkSession, edges: DataFrame) -> int:
    """Global triangle count of the undirected simple graph."""
    o = _oriented(edges).localCheckpoint(eager=True)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (
            (F.col("e1.dst_deg") < F.col("e2.dst_deg"))
            | (
                (F.col("e1.dst_deg") == F.col("e2.dst_deg"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        ),
    ).select(F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b"))
    closing = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return wedges.join(closing, ["a", "b"], "inner").count()


def triangle_count_df(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """1-row DataFrame (n_triangles long) — for the driver contract."""
    n = triangle_count(spark, edges)
    return spark.createDataFrame([(n,)], "n_triangles long")


def clustering_coefficients(
    spark: SparkSession, edges: DataFrame
) -> DataFrame:
    """-> (id, clustering) local clustering coefficient per vertex of
    the undirected simple graph: 2*T(v) / (d(v)*(d(v)-1)), 0 when
    d(v) < 2. Same degree-ordered enumeration as triangle_count (each
    triangle closed exactly once), then each closed triangle credits
    its three vertices — still skew-safe on hub vertices."""
    from .components import _symmetrize
    from .pagerank import vertex_universe

    verts = vertex_universe(spark, edges)
    o = _oriented(edges).localCheckpoint(eager=True)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (
            (F.col("e1.dst_deg") < F.col("e2.dst_deg"))
            | (
                (F.col("e1.dst_deg") == F.col("e2.dst_deg"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        ),
    ).select(
        F.col("e1.src").alias("p"),
        F.col("e1.dst").alias("a"),
        F.col("e2.dst").alias("b"),
    )
    closing = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    tri = wedges.join(closing, ["a", "b"], "inner")
    tri_per_vertex = (
        tri.select(F.explode(F.array("p", "a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return (
        verts.join(deg, "id", "left")
        .join(tri_per_vertex, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) >= 2,
                2.0
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


# --- DOULION-style sparsified counting (the 10^12-edge scale path) ---
#
# Exact counting's wedge join costs O(sum over pivots of outdeg^2); at
# web scale the sampled form (Tsourakakis/Kang/Koutra/Faloutsos, KDD
# 2009, public literature) keeps each undirected simple edge with
# probability 1/p_inv and scales the sampled-subgraph count by
# p_inv^3 — an unbiased estimator whose wedge work drops ~p_inv^2 and
# whose candidate output drops ~p_inv^3. The coin is a DETERMINISTIC
# per-edge hash (two Lehmer-style modular steps, every intermediate
# < 2^52 so int64/ANSI-safe), so the estimate is reproducible and the
# SQL oracle replays the identical sample bit-for-bit.

_HASH_MOD = 2147483647  # 2^31 - 1, the Park-Miller modulus
_HASH_A = 1000003
_HASH_G = 16807


def _edge_hash_col(a, b, seed: int):
    """int64-safe deterministic hash of the undirected edge (a, b) in
    [0, 2^31-1): mirrors the SQL form used by the driver oracle."""
    h = ((a % _HASH_MOD) * _HASH_A + (b % _HASH_MOD) + F.lit(seed)) % _HASH_MOD
    return (h * _HASH_G) % _HASH_MOD


def triangle_count_sampled(
    spark: SparkSession,
    edges: DataFrame,
    p_inv: int,
    seed: int = 0,
) -> DataFrame:
    """-> 1 row (n_tri_sampled long, n_triangles_est long): exact
    triangle count of the hash-sampled (rate 1/p_inv) undirected simple
    subgraph, and the DOULION estimate n_tri_sampled * p_inv**3.

    The filter lands BEFORE orientation, so degrees, wedges, and the
    closing join all operate on the thinned edge set — the whole exact
    pipeline shrinks, not just the last join."""
    if p_inv < 1:
        raise ValueError(f"p_inv must be >= 1, got {p_inv}")
    # NO dedup here: the hash is a pure function of the undirected
    # value (a, b), so duplicates decide identically and the dedup
    # inside _oriented's symmetrize sees the same sampled edge set —
    # sampling commutes with distinct, and skipping it saves a full
    # edge-table shuffle before the thinning filter.
    und = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
    )
    samp = und.filter(
        _edge_hash_col(F.col("a"), F.col("b"), seed) % p_inv == 0
    )
    n = triangle_count(
        spark, samp.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return spark.createDataFrame(
        [(n, n * p_inv**3)], "n_tri_sampled long, n_triangles_est long"
    )
