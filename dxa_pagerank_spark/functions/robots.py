"""Robots-exclusion compliance for the crawl frontier.
[north_rule extension — no reference code; robots.txt semantics follow
the public REP spec (RFC 9309) restricted to the directives every
crawler honours: User-agent grouping, Disallow prefixes, Crawl-delay.]

``parse_robots`` is a fully declarative parser: the robots.txt body is
split to lines, exploded with position, each line's directive extracted
by regexp, and the line attributed to its governing ``User-agent``
group with a running ``last(ignorenulls)`` window over line position —
the classic "carry the most recent header down" trick, so no Python
and no per-host UDF state. Rules for the requested agent collapse to
one row per host:

    (host, disallow_all, crawl_delay, prefixes)

``apply_robots`` then enforces them on frontier(id, host, path,
priority):

  1. banned hosts (``Disallow: /``) leave the frontier (anti-join);
  2. URLs whose path starts with a disallowed prefix leave (explode the
     host's prefixes, startswith match, anti-join) — BEFORE ranking,
     so blocked URLs never consume politeness slots;
  3. the per-host fetch window shrinks for slow hosts: effective
     per-wave cap = max(1, per_host // crawl_delay).

100-TB shape: robots bodies are tiny (the spec caps parse obligation at
500 KiB) and rules are one row per host, so the parse is a flat column
program + one groupBy(host); enforcement is host-keyed joins that reuse
the same partitioning as the politeness window that follows. The
variable per-host cap would defeat the WindowGroupLimit optimization
(the rank filter is no longer a constant), so the schedule keeps a
constant ``per_host * max_waves`` prefilter first — map-side per-host
top-K before the exchange, same envelope as schedule_frontier — and
applies the exact delay-scaled cap after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """robots(host, robots_txt) -> (host, disallow_all, crawl_delay,
    prefixes) for the given agent. Hosts whose file has no group for
    the agent get no row (= default allow); callers treat absent hosts
    as (false, 1, []). Directive names are case-insensitive; an empty
    ``Disallow:`` allows everything (per REP)."""
    lines = robots.select(
        "host", F.posexplode(F.split("robots_txt", "\n")).alias("pos", "line")
    )
    ua = F.regexp_extract("line", r"(?i)^\s*user-agent\s*:\s*(\S+)", 1)
    dis = F.regexp_extract("line", r"(?i)^\s*disallow\s*:\s*(\S*)", 1)
    is_dis = F.lower(F.trim("line")).startswith("disallow")
    delay = F.regexp_extract("line", r"(?i)^\s*crawl-delay\s*:\s*(\d+)", 1)
    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = lines.select(
        "host",
        F.last(F.when(ua != "", ua), ignorenulls=True).over(w).alias("ua"),
        F.when(is_dis, dis).alias("disallow"),
        F.when(delay != "", delay.cast("long")).alias("delay"),
    ).filter(F.col("ua") == agent)
    return attributed.groupBy("host").agg(
        F.coalesce(F.max(F.col("disallow") == "/"), F.lit(False)).alias(
            "disallow_all"
        ),
        F.coalesce(F.max("delay"), F.lit(1)).alias("crawl_delay"),
        F.array_sort(
            F.collect_set(
                F.when(
                    (F.col("disallow") != "/") & (F.col("disallow") != ""),
                    F.col("disallow"),
                )
            )
        ).alias("prefixes"),
    )


def apply_robots(
    frontier: DataFrame,
    rules: DataFrame,
    per_host: int,
    max_waves: int,
) -> DataFrame:
    """frontier(id, host, path, priority) + parse_robots rules ->
    (id, host, host_rank, wave): the politeness schedule restricted to
    robots-allowed URLs, with Crawl-delay shrinking a host's per-wave
    fetch cap to max(1, per_host // delay)."""
    if per_host < 1:
        raise ValueError("per_host must be >= 1")
    banned = rules.filter("disallow_all").select("host")
    blocked = (
        rules.select("host", F.explode("prefixes").alias("prefix"))
        .join(frontier.select("id", "host", "path"), "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .select("id")
    )
    allowed = (
        frontier.join(banned, "host", "left_anti")
        .join(blocked, "id", "left_anti")
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("id"))
    ranked = allowed.select(
        "id", "host", F.row_number().over(w).alias("host_rank")
    ).filter(
        # constant bound first: keeps the map-side WindowGroupLimit
        F.col("host_rank") <= per_host * max_waves
    )
    cap = F.greatest(
        F.lit(1), F.floor(F.lit(per_host) / F.col("crawl_delay"))
    )
    return (
        ranked.join(rules.select("host", "crawl_delay"), "host", "left")
        .withColumn("crawl_delay", F.coalesce("crawl_delay", F.lit(1)))
        .select(
            "id",
            "host",
            "host_rank",
            F.floor((F.col("host_rank") - 1) / cap).alias("wave"),
        )
        .filter(F.col("wave") < max_waves)
    )
