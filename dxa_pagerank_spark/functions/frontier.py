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
