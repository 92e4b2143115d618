"""Crawl-snapshot merging: latest version per url.
[north_rule extension — no reference counterpart]

A web corpus is assembled from many crawl snapshots; the same url
appears once per crawl that fetched it. Before any per-url processing
the snapshots are merged latest-wins — the canonical recrawl dedup
(what Common Crawl's index calls picking the newest capture).

Plan shape at 100 TB: one shuffle by url (the window partition key),
row_number + filter plans with WindowGroupLimit so each partition
keeps only its head row instead of materializing full sorted groups.
With the pages table bucketed by url (plans/bucketing.py) even that
exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    count_col: str = "n_snapshots",
) -> DataFrame:
    """Keep the newest snapshot per url; adds ``count_col`` = number of
    snapshots seen for that url. Ties on the timestamp (two captures in
    the same second) break deterministically by md5(text) ascending, so
    reruns and engines agree byte-for-byte."""
    w = Window.partitionBy(url_col).orderBy(
        F.desc(ts_col), F.asc(F.md5(F.col("text")))
    )
    wc = Window.partitionBy(url_col)
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .withColumn(count_col, F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-to-crawl churn report -> one row per url with a status:

      * ``added``     — url only in the new crawl
      * ``removed``   — url only in the old crawl
      * ``changed``   — in both, text content differs (md5 compare)
      * ``unchanged`` — in both, byte-identical text

    The standard freshness/decay analytic between two snapshots (what
    recrawl schedulers and index-delta pipelines consume). Compare by
    content hash, not the text itself, so the join carries 32-byte
    digests instead of page bodies.

    Plan shape: each side reduces to (url, md5) — column pruning keeps
    page bodies out of the exchange — then ONE full-outer equi-join on
    url and a pure CASE. At 100 TB both sides shuffle once by url;
    bucketed-by-url storage (plans/bucketing.py) removes even that.
    """
    o = old.select(
        F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias("oh")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias("nh")
    )
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("oh").isNull(), F.lit("added"))
        .when(F.col("nh").isNull(), F.lit("removed"))
        .when(F.col("oh") != F.col("nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def crawl_delta_report(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """1-row rollup of crawl_delta: (n_added, n_removed, n_changed,
    n_unchanged, churn) with churn = (added+removed+changed) / new-crawl
    size — the headline freshness number."""
    d = crawl_delta(old, new, url_col, text_col)
    agg = d.agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias(
            "n_added"
        ),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias(
            "n_removed"
        ),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0)).alias(
            "n_changed"
        ),
        F.sum(
            F.when(F.col("status") == "unchanged", 1).otherwise(0)
        ).alias("n_unchanged"),
    )
    return agg.select(
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        (
            (F.col("n_added") + F.col("n_removed") + F.col("n_changed"))
            / (F.col("n_added") + F.col("n_changed") + F.col("n_unchanged"))
        ).alias("churn"),
    )


def edge_delta(
    old_edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link-graph delta between two crawl cycles -> (src, dst, status)
    with status in {added, removed, kept}.

    The edge-level companion of crawl_delta (which diffs page CONTENT):
    what the recrawl changed in the GRAPH is what decides whether
    yesterday's analytics still stand — it feeds the warm-start paths
    (operators/pagerank.py initial_ranks, incremental components) and
    tells an operator how much of the link structure moved. Edge sets
    are compared as sets (each side deduplicated — multi-anchor
    multiplicity is a page property, not a graph-delta one).

    Physical shape at 100 TB: one full-outer equi-join on (src, dst) —
    both sides key-partitioned by the join columns, map-side combine on
    the distinct. Nothing wider than the edge tables themselves.
    """
    o = old_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().withColumn("_o", F.lit(1))
    n = new_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().withColumn("_n", F.lit(1))
    j = o.join(n, ["src", "dst"], "full_outer")
    return j.select(
        "src",
        "dst",
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def edge_delta_report(
    old_edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """1-row rollup of edge_delta: counts per status, the affected
    SOURCE count (sources touching any added/removed edge — the set a
    warm-start recompute actually has to care about), and edge churn =
    (added+removed)/|new graph|."""
    d = edge_delta(old_edges, new_edges, src_col, dst_col)
    agg = d.agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias(
            "n_added"
        ),
        F.sum(
            F.when(F.col("status") == "removed", 1).otherwise(0)
        ).alias("n_removed"),
        F.sum(F.when(F.col("status") == "kept", 1).otherwise(0)).alias(
            "n_kept"
        ),
        F.count_distinct(
            F.when(F.col("status") != "kept", F.col("src"))
        ).alias("n_affected_sources"),
    )
    return agg.select(
        "n_added",
        "n_removed",
        "n_kept",
        "n_affected_sources",
        F.round(
            (F.col("n_added") + F.col("n_removed"))
            / (F.col("n_added") + F.col("n_kept")),
            6,
        ).alias("edge_churn"),
    )


def change_rate(
    observations: DataFrame,
    url_col: str = "url",
    changed_col: str = "changed",
    interval_days: float = 1.0,
) -> DataFrame:
    """Per-url Poisson change-rate estimate from repeated recrawl
    observations (Cho & Garcia-Molina, "Estimating frequency of
    change", ACM TOIT 2003): with n equal-interval accesses of which
    X detected a change, the consistent estimator for the daily
    change rate is

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / interval_days

    — the paper's bias-reduced form (eq. for r_hat with the +0.5
    regularizer), which stays finite at X = n where the naive
    -ln(1 - X/n) MLE diverges (a page that changed every visit is
    changing FASTER than the crawl samples, not infinitely fast).
    suggested_revisit_days = 1 / lambda_hat (capped below at the
    observation interval — revisiting faster than we ever sampled is
    extrapolation the estimator cannot support).

    Input: (url, changed) rows, one per recrawl observation (the
    output shape of crawl_delta restricted to status in
    ('changed', 'unchanged'), unioned across crawl cycles).

    100-TB shape: ONE map-side-combinable groupBy(url) — counts only;
    the two floats per url fold at output. Rows with other statuses
    (added/removed) are not observations of an existing page and are
    ignored.
    """
    obs = observations.select(
        F.col(url_col).alias("url"),
        F.col(changed_col).cast("int").alias("x"),
    )
    agg = obs.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").alias("n_changed"),
    )
    lam = -F.log(
        (F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
        / (F.col("n_obs") + F.lit(0.5))
    ) / F.lit(float(interval_days))
    return agg.select(
        "url",
        "n_obs",
        "n_changed",
        lam.alias("change_rate"),
        F.when(
            lam > 0,
            F.greatest(
                F.lit(1.0) / lam, F.lit(float(interval_days))
            ),
        ).alias("revisit_days"),
    )
