"""Synchronous label propagation (LPA). [north_rule — no reference code]

Community detection over the undirected simple graph. The classic
algorithm is order-dependent; per BASELINE.json ("label assignments
match exactly") we fix a deterministic synchronous variant, shared with
the oracle (oracle.label_propagation_oracle):

  * labels init to the vertex id;
  * each round every vertex with >= 1 neighbor adopts the most frequent
    label among its neighbors (own label NOT counted); tie-break:
    smallest label;
  * stop at fixpoint or max_rounds.

Physical shape per round: edges ⋈ labels (shuffle the small label
table) -> groupBy (dst, label) count (map-side partial agg) -> per-dst
argmax via a single max(struct(cnt, -label)) aggregate — no window
function, so no extra sort; two shuffles total, both keyed by vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    num_vertices: int | None = None,
    vertices: DataFrame | None = None,
    max_rounds: int = 20,
) -> DataFrame:
    """-> labels(id, label); isolated vertices keep their own id."""
    from .components import _symmetrize
    from .pagerank import vertex_universe

    verts = vertex_universe(spark, edges, num_vertices, vertices)
    sym = (
        _symmetrize(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
        .localCheckpoint(eager=True)
    )

    labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )

    for _ in range(max_rounds):
        counts = (
            sym.join(labels, sym.u == labels.id)
            .groupBy(F.col("v").alias("vid"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt desc, label asc): max(struct(cnt, -label)).
        best = counts.groupBy("vid").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg")))
            .alias("top")
        ).select("vid", (-F.col("top.neg")).alias("new_label"))

        new_labels = (
            labels.alias("l")
            .join(best.alias("b"), F.col("l.id") == F.col("b.vid"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.coalesce(F.col("b.new_label"), F.col("l.label")).alias("label"),
                (
                    F.coalesce(F.col("b.new_label"), F.col("l.label"))
                    != F.col("l.label")
                ).cast("long").alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        old = labels
        labels = new_labels.select("id", "label")
        try:
            old.unpersist()
        except Exception:
            pass
        if n_changed == 0:
            break
    return labels
