"""Directed triad census over the link graph. [north_rule — no
reference code]

Counts the seven connected-triangle triad classes of Davis–Leinhardt
MAN notation (Holland & Leinhardt 1970; the standard web/social graph
motif statistic): every unordered vertex triple whose three pairs are
all adjacent (ignoring direction) is classified by its directed edge
pattern:

  * ``030T`` — 0 mutual dyads, transitive  (a→b, a→c, b→c)
  * ``030C`` — 0 mutual dyads, cyclic      (a→b, b→c, c→a)
  * ``120D`` — 1 mutual dyad, third vertex points at BOTH ends
  * ``120U`` — 1 mutual dyad, BOTH ends point at the third vertex
  * ``120C`` — 1 mutual dyad, third vertex one-in-one-out (cyclic)
  * ``210``  — 2 mutual dyads
  * ``300``  — 3 mutual dyads

Algorithm (skew-safe, all equi-joins):

  1. triangles of the undirected simple graph via the SAME
     degree-ordered wedge closure as ``triangles.triangle_count`` —
     orientation bounds every pivot's out-degree by O(sqrt(E)), so hub
     vertices cannot explode the wedge self-join;
  2. canonicalize each triangle to (v1 < v2 < v3) with ``array_sort``;
  3. one ``pair_state(a < b, fwd, bwd)`` table built by a single
     groupBy over the distinct directed edges — three equi-joins attach
     the six direction flags to each triangle;
  4. the class is a pure column CASE over the six flags; the census is
     one map-side-combinable groupBy.

At 100 TB: the expensive part is triangle enumeration, identical in
shape (and cost) to triangle counting; pair_state is the same size as
the distinct undirected edge set and both joins are vertex-pair-keyed
equi-joins — AQE skew-join is the backstop. Nothing driver-side, no
Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIAD_CLASSES = ("030T", "030C", "120D", "120U", "120C", "210", "300")


def _pair_states(edges: DataFrame) -> DataFrame:
    """-> (a, b, fwd, bwd) for every distinct undirected non-loop pair
    a < b: fwd = 1 iff a→b present, bwd = 1 iff b→a present."""
    d = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return (
        d.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("g"),
        )
        .groupBy("a", "b")
        .agg(F.max("f").alias("fwd"), F.max("g").alias("bwd"))
    )


def _id_triangles(edges: DataFrame) -> DataFrame:
    """-> (v1, v2, v3) with v1 < v2 < v3: every triangle of the
    undirected simple graph, once, via degree-ordered wedge closure."""
    from .triangles import _oriented

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
    srt = F.array_sort(F.array("p", "a", "b"))
    return tri.select(
        srt.getItem(0).alias("v1"),
        srt.getItem(1).alias("v2"),
        srt.getItem(2).alias("v3"),
    )


def triad_census(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """-> (triad_class string, n long), one row per class present.

    Only the seven all-pairs-adjacent classes are counted (dyad-level
    and disconnected triad classes are derivable from the degree /
    reciprocity statistics without triple enumeration).
    """
    tri = _id_triangles(edges)
    ps = _pair_states(edges).localCheckpoint(eager=True)

    def attach(t: DataFrame, x: str, y: str, tag: str) -> DataFrame:
        p = ps.select(
            F.col("a").alias(x),
            F.col("b").alias(y),
            F.col("fwd").alias(f"f{tag}"),
            F.col("bwd").alias(f"g{tag}"),
        )
        return t.join(p, [x, y], "inner")

    # flags: f12 = v1→v2 present, g12 = v2→v1 present, etc.
    flagged = attach(
        attach(attach(tri, "v1", "v2", "12"), "v1", "v3", "13"),
        "v2",
        "v3",
        "23",
    )
    m12 = F.col("f12") * F.col("g12")
    m13 = F.col("f13") * F.col("g13")
    m23 = F.col("f23") * F.col("g23")
    n_mut = m12 + m13 + m23
    cyc = (
        (F.col("f12") * F.col("f23") * F.col("g13"))
        + (F.col("g12") * F.col("g23") * F.col("f13"))
    )
    # one mutual dyad: count how many of the two single edges leave the
    # third vertex (2 → D "down onto the dyad", 0 → U, 1 → C cyclic).
    out_third = (
        F.when(m12 == 1, F.col("g13") + F.col("g23"))  # third = v3
        .when(m13 == 1, F.col("g12") + F.col("f23"))  # third = v2
        .otherwise(F.col("f12") + F.col("f13"))  # third = v1
    )
    cls = (
        F.when(n_mut == 3, F.lit("300"))
        .when(n_mut == 2, F.lit("210"))
        .when(n_mut == 0, F.when(cyc == 1, F.lit("030C")).otherwise(F.lit("030T")))
        .otherwise(
            F.when(out_third == 2, F.lit("120D"))
            .when(out_third == 0, F.lit("120U"))
            .otherwise(F.lit("120C"))
        )
    )
    return (
        flagged.select(cls.alias("triad_class"))
        .groupBy("triad_class")
        .agg(F.count(F.lit(1)).alias("n"))
    )
