"""Crawl-frontier scheduling: politeness-batched fetch waves.
[north_rule extension — no reference code; the per-host politeness
queue is the classic crawler-frontier design (Mercator, Heydon &
Najork 1999; Heritrix), here as a declarative batch plan over a
priority-scored URL table.]

Rank every URL within its host by (priority DESC, id ASC) and assign
wave = (host_rank - 1) // per_host: wave w fetches at most `per_host`
URLs from any single host (the politeness constraint) while each host
surfaces its highest-priority pages first. Feeding PageRank as the
priority makes this the standard importance-first recrawl plan.

Physical shape: exactly one shuffle — the per-host rank window. With
`max_waves` set (the normal case: only the next few waves get
fetched), the rank<=K filter over the row_number window is optimized
by Spark into WindowGroupLimit — a map-side per-host top-K BEFORE the
exchange — so a mega-host ships only per_host*max_waves rows to its
window partition instead of its full URL set; without the cap, one
pathological host's rows do land in a single partition (documented
skew, same envelope as any per-host sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_frontier(
    frontier: DataFrame,
    per_host: int,
    max_waves: int | None = None,
    id_col: str = "id",
    host_col: str = "host",
    priority_col: str = "priority",
) -> DataFrame:
    """frontier(id, host, priority) -> (id, host, host_rank, wave),
    higher priority = fetched earlier; wave is 0-based."""
    if per_host < 1:
        raise ValueError("per_host must be >= 1")
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(id_col)
    )
    ranked = frontier.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias("host"),
        F.row_number().over(w).alias("host_rank"),
    )
    if max_waves is not None:
        ranked = ranked.filter(
            F.col("host_rank") <= per_host * max_waves
        )
    return ranked.select(
        "id",
        "host",
        "host_rank",
        F.floor((F.col("host_rank") - 1) / per_host).alias("wave"),
    )


def apportion_budget(
    weights: DataFrame,
    budget: int,
    id_col: str = "id",
    w_col: str = "w",
) -> DataFrame:
    """Hamilton largest-remainder apportionment of an integer fetch
    budget across hosts proportional to integer weights -> (id, w,
    alloc), sum(alloc) == budget exactly.

    The crawl-planning step between ranking and scheduling: given a
    global per-cycle fetch budget B and host importance weights w_i
    (e.g. site-level visit counts from pagerank_monte_carlo, or any
    integer signal), each host gets floor(B*w_i/W) fetches plus one of
    the B - sum(floor) leftovers, awarded to the largest remainders
    (B*w_i) mod W with ties to the smaller id — the unique, standard,
    order-free proportional rounding (Hamilton 1792; the "largest
    remainder method" of apportionment theory).

    Exactness: quotas are computed in decimal(38,0) (the degree_skew
    precedent) so B*w_i never rounds — at crawl scale B ~ 1e9 and
    W ~ 1e13 overflow int64 but not 38 digits — and every comparison
    is integer, so the SQL oracle replays the allocation bit-for-bit.

    Physical shape: one 1-row total broadcast back, pure expressions
    for quota/remainder, then ONE global rank window over the HOST
    table (hosts << pages; a 1e7-host sort is the small end of the
    plan) to pick leftover winners.  Zero-weight hosts keep explicit
    alloc=0 rows."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    dec = "decimal(38,0)"
    w = weights.select(
        F.col(id_col).alias("id"), F.col(w_col).cast("long").alias("w")
    )
    if w.filter(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("weights must be >= 0")
    tot = w.agg(F.sum(F.col("w").cast(dec)).alias("t"))
    if (tot.collect()[0][0] or 0) <= 0:
        return w.select("id", "w", F.lit(0).cast("long").alias("alloc"))
    prod = F.lit(budget).cast(dec) * F.col("w").cast(dec)
    quoted = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "id",
            "w",
            (prod - (prod % F.col("t"))).cast(dec).alias("_num"),
            (prod % F.col("t")).alias("_rem"),
            F.col("t"),
        )
        .select(
            "id",
            "w",
            (F.col("_num") / F.col("t")).cast("long").alias("_fl"),
            "_rem",
        )
    ).localCheckpoint(eager=True)
    leftover = budget - quoted.agg(F.sum("_fl")).collect()[0][0]
    rank = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col("id").asc())
    )
    return quoted.select(
        "id",
        "w",
        (
            F.col("_fl")
            + F.when(rank <= F.lit(int(leftover)), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("alloc"),
    )
