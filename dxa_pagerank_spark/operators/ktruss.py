"""k-truss decomposition (edge peeling by triangle support).
[north_rule extension — no reference code; k-truss (Cohen 2008) is the
edge-analogue of k-core: the maximal subgraph where every edge closes
>= k-2 triangles — the standard cohesive-community core on web/social
graphs, stricter than k-core and cheaper than clique mining]

Peeling loop, all JVM joins/aggregations:

  repeat until no edge is dropped:
    1. enumerate each triangle of the surviving subgraph exactly once
       (degree-ordered orientation — the same O(sqrt(E))-bounded wedge
       plan as operators/triangles.py);
    2. explode each triangle into its 3 undirected edges; support =
       count per edge (map-side combinable);
    3. keep edges with support >= k-2.

Dropping edges can only lower other edges' support, so the loop is
monotone and terminates; each round re-checkpoints the shrinking edge
set (constant plan size). Rounds are O(peeling depth) — small on real
graphs. The triangle enumeration dominates; its skew safety comes from
the orientation, not from luck (hub pivots get out-degree ~0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .triangles import _oriented


def _pair(u, v):
    return F.least(u, v), F.greatest(u, v)


def _triangles(und: DataFrame) -> DataFrame:
    """-> (x, y, z): each triangle of the undirected graph once
    (vertices in (deg,id)-orientation order)."""
    o = _oriented(und).localCheckpoint(eager=True)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
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
        F.col("e1.src").alias("x"),
        F.col("e1.dst").alias("y"),
        F.col("e2.dst").alias("z"),
    )
    # Closing edge can ONLY be y->z in oriented form: the wedge join
    # emits (y, z) in (deg,id)-orientation order, and every oriented
    # edge runs from the (deg,id)-smaller endpoint to the larger, so
    # z->y never exists.  A plain equi-join (hash/sort-merge) — an
    # OR-of-conjunctions here has no extractable equi-keys and Catalyst
    # would plan a CartesianProduct (O(wedges x edges)).  Mirrors
    # triangles.py's closing join.
    closing = e3.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    return wedges.join(closing, ["y", "z"], "inner").select("x", "y", "z")


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
) -> DataFrame:
    """-> (u, v) with u < v: the undirected simple edges of the
    k-truss (every surviving edge participates in >= k-2 triangles of
    the surviving subgraph)."""
    lo, hi = _pair(F.col("src"), F.col("dst"))
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(lo.alias("u"), hi.alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    need = k - 2
    for _ in range(max_rounds):
        n_before = und.count()
        if n_before == 0:
            break
        tri = _triangles(und.select(F.col("u").alias("src"), F.col("v").alias("dst")))
        sides = []
        for a, b in (("x", "y"), ("x", "z"), ("y", "z")):
            lo, hi = _pair(F.col(a), F.col(b))
            sides.append(tri.select(lo.alias("u"), hi.alias("v")))
        support = (
            sides[0].unionAll(sides[1]).unionAll(sides[2])
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        und_new = (
            und.join(support, ["u", "v"], "left")
            .filter(F.coalesce(F.col("sup"), F.lit(0)) >= need)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if und_new.count() == n_before:
            break
        und = und_new
    return und
