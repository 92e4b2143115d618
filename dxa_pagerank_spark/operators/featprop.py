"""GNN-style feature propagation over the link graph (one smoothing
round of SGC / LightGCN-type mean aggregation). [north_rule extension —
no reference code]

    x'_v = ( x_v + Σ_{u ∈ N(v)} x_u ) / (1 + |N(v)|)

over the undirected simple graph — the standard training-free graph
convolution used to enrich per-document embeddings with neighborhood
context before retrieval / clustering / classification (Wu et al. 2019
SGC; He et al. 2020 LightGCN drop the nonlinearity exactly like this).
Neighbors without a feature row contribute nothing and do not count in
the mean; vertices without features produce no output row.

Determinism contract (repo-wide): the neighbor sum is a LEFT FOLD in
ascending neighbor-id order (collect → array_sort → F.aggregate), not
a groupBy SUM — float addition is not associative, and an
order-unspecified partial aggregate would differ between engines in
the last ulp. The SQL oracle replays the identical fold
(list(val ORDER BY u) + list_reduce), so scores match bit-for-bit.

100-TB shape: the corpus-scale work is one edges⋈features equi-join
and one (dst, dim-index) groupBy with the exploded features — E×dim
rows through one shuffle, the standard columnar formulation. The fold
state per group is that vertex's neighbor count, so hub vertices bound
memory at max-degree × 8 bytes per dimension; cap hubs upstream
(degree_skew_report tells you where) or switch the aggregate to plain
sum when bit-exactness across engines is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def smooth_features(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, pos, value): one mean-aggregation round, exploded to
    (vertex, dimension-index, smoothed value) — the exchange-friendly
    long form (reassemble with collect_list(struct(pos, value)) if an
    array column is needed)."""
    from .components import _symmetrize

    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    fe = features.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))

    nb = sym.join(fe.select(F.col("id").alias("u"), "pos", "val"), "u")
    summed = nb.groupBy(F.col("v").alias("id"), "pos").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("u", "val"))),
            F.lit(0.0),
            lambda acc, s: acc + s["val"],
        ).alias("nsum"),
        F.count(F.lit(1)).alias("nd"),
    )
    return (
        fe.join(summed, ["id", "pos"], "left")
        .select(
            "id",
            "pos",
            (
                (F.col("val") + F.coalesce(F.col("nsum"), F.lit(0.0)))
                / (F.lit(1) + F.coalesce(F.col("nd"), F.lit(0)))
            ).alias("value"),
        )
    )
