"""Borůvka minimum spanning forest over a weighted undirected graph.
[north_rule extension — no reference code]

The distributed-MST classic (Borůvka 1926; the GHS algorithm and every
MapReduce/Pregel MST descend from it): each round, every component
selects its minimum-weight outgoing edge; selected edges join the
forest; touching components merge. Components at least halve per
round → O(log V) rounds.

Determinism contract: the input multigraph first reduces to one
canonical undirected edge per pair (min weight; (a < b) orientation),
and every per-component argmin breaks weight ties by (a, b) — so the
forest is unique and the SQL oracle replays it exactly.

Round shape (all equi-joins / aggregates):
  1. attach component labels to both edge endpoints (two joins keyed
     by vertex), drop intra-component edges;
  2. per-component argmin via ONE max/min(struct) aggregate (no window
     function);
  3. the chosen edges form a pseudoforest on component labels (each
     node out-degree 1; 2-cycles between mutually-choosing pairs) —
     contracted with the large-star/small-star connected-components
     operator (log-round doubling: a plain neighbor-min loop would
     need O(chain length) rounds on a path-shaped choice graph), so
     each component label maps to the MIN label of its merged group;
  4. relabel vertices through the contraction map.

Raises when the outer or inner round caps are exhausted before the
fixpoint — never returns a partial forest (repo hardening rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxa_pagerank_spark.plans.lineage import cut_lineage


def _canonical(edges: DataFrame) -> DataFrame:
    """multigraph (src, dst, weight) -> one (a < b, w) per pair, min
    weight, self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def boruvka_msf(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
    max_inner: int = 40,
) -> DataFrame:
    """-> (a, b, weight): the minimum spanning forest's edges (V - C
    rows for C connected components)."""
    can = cut_lineage(_canonical(edges))
    comp = (
        can.select(F.col("a").alias("id"))
        .union(can.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("c"))
    )
    comp = cut_lineage(comp)
    forest: DataFrame | None = None
    for _ in range(max_rounds):
        ca = comp.select(F.col("id").alias("a"), F.col("c").alias("cu"))
        cb = comp.select(F.col("id").alias("b"), F.col("c").alias("cv"))
        live = (
            can.join(ca, "a")
            .join(cb, "b")
            .filter(F.col("cu") != F.col("cv"))
        )
        # every per-round checkpoint is a cut_lineage, not a bare
        # localCheckpoint: the round joins two comp-derived tables, so
        # inherited size estimates would compound exponentially across
        # rounds in Catalyst's stats math (see plans/lineage.py)
        live = cut_lineage(live)
        if live.limit(1).count() == 0:
            break
        # per-component minimum outgoing edge, ties by (a, b)
        half = live.select(F.col("cu").alias("comp"), "w", "a", "b").union(
            live.select(F.col("cv").alias("comp"), "w", "a", "b")
        )
        chosen = (
            half.groupBy("comp")
            .agg(F.min(F.struct("w", "a", "b")).alias("e"))
            .select(
                F.col("e.a").alias("a"),
                F.col("e.b").alias("b"),
                F.col("e.w").alias("w"),
            )
            .distinct()
        )
        chosen = cut_lineage(chosen)
        forest = chosen if forest is None else forest.union(chosen)
        # contract: each component label maps to the MINIMUM label of
        # its connected group in the chosen-edge graph — delegated to
        # the large-star/small-star operator (log-round doubling, the
        # scale path; a plain neighbor-min loop would need O(chain
        # length) rounds on a path-shaped choice graph). The result is
        # implementation-independent (min of group), which is what the
        # SQL oracle replays.
        from .components import connected_components

        la = comp.select(F.col("id").alias("a"), F.col("c").alias("cu"))
        lb = comp.select(F.col("id").alias("b"), F.col("c").alias("cv"))
        cedges = (
            chosen.join(la, "a")
            .join(lb, "b")
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        )
        labels = connected_components(
            spark, cedges, max_rounds=max_inner
        ).select(F.col("id").alias("c"), F.col("component").alias("m"))
        comp = (
            comp.join(labels, "c", "left")
            .select("id", F.coalesce("m", F.col("c")).alias("c"))
        )
        comp = cut_lineage(comp)
    else:
        raise RuntimeError(
            f"boruvka_msf did not converge in {max_rounds} rounds"
        )
    if forest is None:
        return spark.createDataFrame([], "a long, b long, weight double")
    return forest.select("a", "b", F.col("w").alias("weight"))
