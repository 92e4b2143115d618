"""Link prediction over the undirected page graph.
[north_rule extension — no reference code; dxa-pageRank never relates
vertex pairs beyond the in-adjacency it stores, Vertex.java:16]

Classic neighborhood-based link-prediction scores (Liben-Nowell &
Kleinberg 2003; Adamic & Adar 2003 — public literature): for each
NON-adjacent pair (a, b) sharing at least ``min_common`` undirected
neighbors,

  n_common(a,b) = |N(a) ∩ N(b)|
  adamic_adar   = Σ_{z ∈ N(a)∩N(b)} 1 / ln(deg(z))
  jaccard       = n_common / (deg(a) + deg(b) − n_common)

Plan shape (all JVM joins/aggregations, same pattern as
operators/cocitation.py):

  distinct edges → symmetrize → degree table →
  hub cap (semi-join BEFORE the self-join) →
  self-join on the shared vertex z → pair groupBy(count, Σ1/ln d_z) →
  anti-join out already-linked pairs → degree joins for Jaccard.

100-TB shape: a shared vertex of degree d emits d·(d−1)/2 pair rows,
so ``max_degree`` bounds the self-join blow-up exactly like the
co-citation cap (and a nav-bar hub is common-neighbor noise anyway —
it "connects" every page pair on the site). With the cap, output is
O(V · cap²) worst case and each stage is one key-partitioned shuffle;
the degree table is |V| rows and joins by plain equi-keys. A z of
degree 1 cannot be a common neighbor, so ln(deg(z)) ≥ ln 2 > 0 for
every scored term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    """-> (a, b): symmetric distinct adjacency, self-loops dropped."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """-> (a, b, n_common, adamic_adar, jaccard) for non-adjacent
    pairs a < b with >= min_common common undirected neighbors.

    ``max_degree`` drops shared vertices whose undirected degree
    exceeds it BEFORE pair generation (hub/boilerplate cap); degrees
    in the scores are always the uncapped true degrees.
    """
    und = _undirected(edges)
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("a").alias("id"), "d"
    )

    # adjacency oriented as (z = shared vertex, v = its neighbor)
    ez = und.select(F.col("a").alias("z"), F.col("b").alias("v"))
    if max_degree is not None:
        keep = deg.filter(F.col("d") <= max_degree).select(
            F.col("id").alias("z")
        )
        ez = ez.join(keep, "z", "left_semi")
    ez = ez.join(
        deg.select(F.col("id").alias("z"), F.col("d").alias("dz")), "z"
    )

    pairs = (
        ez.alias("x")
        .join(ez.alias("y"), F.col("x.z") == F.col("y.z"))
        .filter(F.col("x.v") < F.col("y.v"))
        .select(
            F.col("x.v").alias("a"),
            F.col("y.v").alias("b"),
            F.col("x.dz").alias("dz"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.lit(1.0) / F.log("dz")).alias("adamic_adar"),
        )
        .filter(F.col("n_common") >= min_common)
    )

    # link *prediction*: drop pairs that are already edges (und is
    # symmetric, so checking the (a, b) orientation suffices)
    new_pairs = pairs.join(und, ["a", "b"], "left_anti")

    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    return (
        new_pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "n_common",
            "adamic_adar",
            (
                F.col("n_common")
                / (F.col("da") + F.col("db") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
