"""Whole-graph structural statistics: reciprocity and degree
assortativity.

Standard link-graph characterization metrics (Newman, "Assortative
mixing in networks", PRL 89, 2002; reciprocity is classic in web-graph
studies — the web is famously low-reciprocity vs social graphs). The
reference computes no graph statistics beyond the edge count
(MainPR.java:114); these extend the engine's analysis surface over the
same edge tables.

Physical shape, both: degree tables are one groupBy each; edges join
degrees on an equi-key (broadcastable when the degree table is small,
shuffle hash join at scale); the answer is a single global aggregate of
sums — partial map-side, 1-row result. No driver-side iteration, no
per-row Python, no cartesian anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocity(edges: DataFrame) -> DataFrame:
    """1-row (n_edges, n_reciprocal, reciprocity): of the DISTINCT
    non-loop directed edges (u,v), what fraction have (v,u) present.

    Distinct first — edge-file multiplicity (SURVEY §2.3.6) would
    otherwise double-count; self-loops are reciprocal by construction
    and excluded, the standard convention. left_semi against the
    reversed edge set: no row explosion, the join output is at most the
    distinct edge count.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .select(
            "n_edges",
            "n_reciprocal",
            (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """1-row Pearson correlation, across distinct non-loop edges (u,v),
    between out-degree(u) and in-degree(v) — the out-in directed
    assortativity coefficient. Positive: high-fanout pages link to
    popular pages; web graphs are typically slightly disassortative.

    Degrees are counted over the SAME distinct non-loop edge set being
    correlated (self-consistent, the networkx convention). Pearson is
    computed from the five sufficient sums in one aggregate — no
    centering pass, no second scan.
    """
    # Lazy result: the distinct edge set appears three times in the
    # plan (degree builds + the correlate scan). A caller holding a hot
    # edge table should persist it upstream; persisting here would have
    # to outlive this function's return (the result is unexecuted).
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    pairs = e.join(out_deg, "src").join(in_deg, "dst").select(
        F.col("x").cast("double"), F.col("y").cast("double")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("assortativity"),
    )
