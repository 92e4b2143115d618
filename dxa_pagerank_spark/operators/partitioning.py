"""Partitioning advisor: predict a layout's shuffle cost before paying
for it at 100 TB.
[north_rule tie-in — the reference hard-codes round-robin chunk
placement (see SURVEY.md §2 op 3); on Spark the layout is a choice,
and this report is how you make it with numbers instead of folklore.]

For a candidate vertex->partition assignment over edges(src, dst), three
quantities determine what the iterative gather loops (PageRank, CC,
LPA, ...) will actually pay per superstep:

  * ``edge_cut_frac`` — fraction of edges whose endpoints land in
    different partitions: every cut edge moves a rank/label across the
    wire each round.
  * ``load_imbalance`` — max/mean partition edge load: the superstep
    barrier waits for the heaviest partition, so imbalance multiplies
    wall-clock directly.
  * ``ghost_factor`` — avg number of partitions that need a copy of
    each referenced dst vertex (#distinct (partition(src), dst) /
    #distinct dst): the exact row count of the per-round rank exchange
    in a src-partitioned gather, i.e. the communication volume, not a
    proxy.

Each metric is one scan + flat aggregations (map-side combined; the
ghost factor adds one distinct over (partition, dst)). Assignments are
pure column expressions, so comparing K strategies costs K cheap
passes over the edge table — nothing iterative, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_partitioner(n_partitions: int):
    """vertex id -> pmod(id, P): Spark's default hash-shuffle layout for
    long keys (HashPartitioner is mod-based on the key hash; for longs
    the fixture-visible form IS pmod, which keeps oracles closed-form)."""
    return lambda v: F.pmod(v, F.lit(n_partitions))


def block_partitioner(block_size: int, n_partitions: int):
    """vertex id -> (id // block) % P: range/block placement — what you
    get when ids encode locality (site-contiguous page ids, time-ordered
    crawl ids) and you want neighbours co-located."""
    return lambda v: F.pmod(F.floor(v / F.lit(block_size)), F.lit(n_partitions))


def partition_report(
    edges: DataFrame,
    strategies: dict[str, "Column | object"],
) -> DataFrame:
    """edges(src, dst) x {name: vertex->partition fn} ->
    (strategy, edge_cut_frac, load_imbalance, ghost_factor), one row
    per candidate layout."""
    reports = []
    for name, part in strategies.items():
        p = edges.select(
            part(F.col("src")).alias("ps"),
            part(F.col("dst")).alias("pd"),
            "src",
            "dst",
        )
        cut_and_load = p.groupBy("ps").agg(
            F.count(F.lit(1)).alias("load"),
            F.sum((F.col("ps") != F.col("pd")).cast("long")).alias("cut"),
        )
        totals = cut_and_load.agg(
            (F.sum("cut") / F.sum("load")).alias("edge_cut_frac"),
            (F.max("load") / F.avg("load")).alias("load_imbalance"),
        )
        ghost = p.select("ps", "dst").distinct().agg(
            (F.count(F.lit(1)) / F.countDistinct("dst")).alias("ghost_factor")
        )
        reports.append(
            totals.crossJoin(ghost).select(
                F.lit(name).alias("strategy"),
                F.round("edge_cut_frac", 6).alias("edge_cut_frac"),
                F.round("load_imbalance", 6).alias("load_imbalance"),
                F.round("ghost_factor", 6).alias("ghost_factor"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
