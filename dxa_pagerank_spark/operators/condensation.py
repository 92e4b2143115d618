"""Condensation DAG of a directed graph: contract every strongly
connected component to one vertex, then place each component at its
topological depth (longest path from any root component).

This is the standard structural summary one level above the Broder
bowtie (operators/scc.py bowtie_classes): the web's SCC condensation
is a DAG whose depth profile says how "layered" the crawl is — the
giant SCC sits mid-depth, upstream feeder layers (IN) above it,
downstream sink layers (OUT) below.

Reference: no reference code — the reference implements PageRank only
(MainPR.java); condensation composes this repo's SCC operator
per the north_rule's connected-structure family.

Scale shape:
  * contraction = two vertex-keyed equi-joins of the edge table
    against the (id, scc) label table + one groupBy — the edge table
    is touched once, labels are the small side (16 bytes/vertex).
  * levels = bounded max-relaxation over the COMPONENT graph, which
    is orders of magnitude smaller than the page graph (the giant
    SCC collapses to one row); per round one equi-join + groupBy-max
    on the frontier of still-rising components.
  * DAG input is guaranteed by construction (SCC contraction); the
    loop still guards with max_rounds and raises on non-convergence
    (a cycle would rise forever) instead of returning wrong depths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def condensation_edges(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Contract (src, dst) page edges through (id, scc) labels ->
    (src_scc, dst_scc, n_edges), self-loops (intra-component edges)
    dropped, parallel edges counted into n_edges."""
    lab_s = labels.select(F.col("id").alias("src"), F.col("scc").alias("src_scc"))
    lab_d = labels.select(F.col("id").alias("dst"), F.col("scc").alias("dst_scc"))
    return (
        edges.select("src", "dst")
        .join(lab_s, "src")
        .join(lab_d, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def topological_levels(
    spark: SparkSession,
    comp_edges: DataFrame,
    components: DataFrame,
    max_rounds: int = 100,
) -> DataFrame:
    """(scc, level) for every component: level = number of edges on
    the longest condensation-DAG path ending at the component (roots
    are level 0).  Bounded max-relaxation; raises if the graph has a
    cycle (not a condensation) or depth exceeds max_rounds."""
    ce = comp_edges.select(
        F.col("src_scc").alias("src"), F.col("dst_scc").alias("dst")
    ).localCheckpoint(eager=True)
    lvl = components.select(
        F.col("scc").alias("id"), F.lit(0).cast("long").alias("level")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        cand = (
            ce.join(lvl, ce["src"] == lvl["id"])
            .groupBy("dst")
            .agg((F.max("level") + F.lit(1)).alias("cand"))
        )
        nxt = (
            lvl.join(cand, lvl["id"] == cand["dst"], "left")
            .select(
                "id",
                F.greatest(
                    F.col("level"), F.coalesce(F.col("cand"), F.lit(0))
                ).alias("level"),
                (F.coalesce(F.col("cand"), F.lit(0)) > F.col("level")).alias(
                    "_rose"
                ),
            )
        ).localCheckpoint(eager=True)
        rose = nxt.agg(F.sum(F.col("_rose").cast("long"))).collect()[0][0]
        lvl = nxt.select("id", "level")
        if not rose:
            return lvl.select(F.col("id").alias("scc"), "level")
    raise RuntimeError(
        f"topological_levels did not converge in {max_rounds} rounds — "
        "input is not a DAG or is deeper than max_rounds"
    )


def condensation_report(
    spark: SparkSession,
    edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 100,
) -> DataFrame:
    """(scc, level, size): every SCC of the labeled graph with its
    vertex count and topological depth in the condensation DAG."""
    comps = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("size"))
    levels = topological_levels(
        spark, condensation_edges(edges, labels), comps.select("scc"), max_rounds
    )
    return comps.join(levels, "scc").select("scc", "level", "size")
