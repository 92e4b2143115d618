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


_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483647
_SHARD_STRIDE = 40503


def rendezvous_hash(key: Column, shard: Column) -> Column:
    """Engine-portable weight for (key, shard): square-then-LCG —

        x = (key + C + shard * 40503) % M
        h = (A * ((x * x) % M) + C) % M

    The square is the essential step: an affine (LCG-only) mix keeps
    h(s) an arithmetic progression in s mod M, whose argmax is biased
    (measured ~±60% shard imbalance); the quadratic breaks the
    affinity (measured ±10% balance at n=8..10, the R-MAT generator's
    quadratic-mix trick). All intermediates < 2^62 (x < M ~ 2^31, so
    x*x < 2^62), BIGINT arithmetic exact in both engines — a SQL
    oracle replays it literally."""
    x = (key + F.lit(_LCG_C) + shard * F.lit(_SHARD_STRIDE)) % F.lit(
        _LCG_M
    )
    return (F.lit(_LCG_A) * ((x * x) % F.lit(_LCG_M)) + F.lit(_LCG_C)) % F.lit(
        _LCG_M
    )


def rendezvous_assign(key: Column, n_shards: int) -> Column:
    """Highest-random-weight (rendezvous) shard assignment
    (Thaler & Ravishankar, IEEE/ACM ToN 1998 — the consistent-
    placement rule behind cache/shard routing without a ring):
    shard(key) = argmax over s of rendezvous_hash(key, s), ties to
    the smaller s.

    The property that matters at fleet scale: when shards are added,
    a key moves ONLY if a new shard wins its rendezvous — expected
    movement k/(n+k) on n -> n+k, vs ~1 under pmod re-sharding
    (measured in tests/test_partitioning_hrw.py).

    Pure column program: the argmax is a left fold over
    sequence(0, n-1) (no explode, no join, no shuffle — each row
    evaluates n hash expressions inside codegen). The SQL oracle
    replays it as an (key x shard) argmax with the same tie rule."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shards = F.sequence(F.lit(0), F.lit(n_shards - 1))
    init = F.struct(
        F.lit(-1).cast("long").alias("h"), F.lit(-1).alias("s")
    )
    picked = F.aggregate(
        shards,
        init,
        lambda acc, s: F.when(
            rendezvous_hash(key, s) > acc["h"],
            F.struct(
                rendezvous_hash(key, s).alias("h"), s.alias("s")
            ),
        ).otherwise(acc),
    )
    return picked["s"]
