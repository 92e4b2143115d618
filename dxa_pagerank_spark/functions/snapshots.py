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
