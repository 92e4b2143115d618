"""Sitemap ingestion: the discovery half of crawl politeness.
[north_rule extension — no reference code; sitemaps.org protocol, the
public XML format every crawler consumes alongside robots.txt]

``parse_sitemaps`` turns (host, sitemap xml) into one row per listed
URL with its optional lastmod / priority hints — fully declaratively:
``regexp_extract_all`` splits the document into ``<url>`` blocks
(dotall, so formatting whitespace is irrelevant), explode, then one
regexp per field. No Python, no XML library: the sitemap grammar
needed by a crawler is three leaf tags, and a column program parses
millions of sitemaps as a flat projection.

``sitemap_discovery`` joins the listed URLs against the crawled page
set: URLs a sitemap advertises that the crawl has never fetched are
exactly the frontier's highest-value additions (the site operator says
they exist), carrying the protocol's priority hint (default 0.5 per
spec) as the initial fetch priority.

100-TB shape: parse is scan + explode (output ≈ 50k rows per sitemap
max, the protocol's own cap); discovery is one left-anti hash join on
url against the crawled set, host-partitioned like every frontier op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_LOC = r"(?s)<loc>\s*(\S+?)\s*</loc>"
_LASTMOD = r"<lastmod>\s*([0-9T:+\-Z]+)\s*</lastmod>"
_PRIORITY = r"<priority>\s*([0-9.]+)\s*</priority>"


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, sitemap_xml) -> (host, loc, lastmod, priority): one row
    per <url> entry; lastmod NULL when absent, priority 0.5 (the
    protocol default) when absent; entries without <loc> are invalid
    per spec and dropped."""
    blocks = sitemaps.select(
        "host",
        F.explode(
            F.regexp_extract_all("sitemap_xml", F.lit(_URL_BLOCK), F.lit(1))
        ).alias("block"),
    )
    loc = F.regexp_extract("block", _LOC, 1)
    lastmod = F.regexp_extract("block", _LASTMOD, 1)
    prio = F.regexp_extract("block", _PRIORITY, 1)
    return blocks.select(
        "host",
        loc.alias("loc"),
        F.when(lastmod != "", F.to_timestamp(lastmod)).alias("lastmod"),
        F.coalesce(
            F.when(prio != "", prio.cast("double")), F.lit(0.5)
        ).alias("priority"),
    ).filter(F.col("loc") != "")


def sitemap_discovery(
    listed: DataFrame, crawled: DataFrame
) -> DataFrame:
    """parse_sitemaps rows x crawled(url) -> (host, loc, priority,
    crawled): every advertised URL, flagged by whether the crawl has
    it; the uncrawled ones are frontier seeds at the sitemap's own
    priority hint."""
    hits = crawled.select(F.col("url").alias("loc"), F.lit(True).alias("hit"))
    return (
        listed.join(hits, "loc", "left")
        .select(
            "host",
            "loc",
            "priority",
            F.coalesce("hit", F.lit(False)).alias("crawled"),
        )
    )
