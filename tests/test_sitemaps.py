"""Sitemap-protocol oracles: the declarative XML parse against
hand-computed rows (defaults, absent fields, invalid entries,
formatting whitespace) and the discovery join."""

from datetime import datetime

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.sitemaps import (
    parse_sitemaps,
    sitemap_discovery,
)

XML_A = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.org/p1</loc>
    <lastmod>2024-01-02T03:04:05</lastmod>
    <priority>0.9</priority>
  </url>
  <url><loc>https://a.org/p2</loc></url>
  <url><priority>1.0</priority></url>
</urlset>
"""

XML_B = "<urlset><url><loc>  https://b.org/x  </loc><priority>0.1</priority></url></urlset>"


def _parsed(spark):
    df = spark.createDataFrame(
        [(0, XML_A), (1, XML_B)], "host long, sitemap_xml string"
    )
    return parse_sitemaps(df)


def test_parse_rows(spark):
    got = sorted(
        (r.host, r.loc, r.lastmod, r.priority) for r in _parsed(spark).collect()
    )
    assert got == [
        (0, "https://a.org/p1", datetime(2024, 1, 2, 3, 4, 5), 0.9),
        (0, "https://a.org/p2", None, 0.5),  # protocol defaults
        (1, "https://b.org/x", None, 0.1),  # whitespace trimmed
    ]  # the loc-less entry is invalid per spec and dropped


def test_discovery_flags_uncrawled(spark):
    crawled = spark.createDataFrame(
        [("https://a.org/p1",)], "url string"
    )
    got = {
        r.loc: (r.crawled, r.priority)
        for r in sitemap_discovery(_parsed(spark), crawled).collect()
    }
    assert got == {
        "https://a.org/p1": (True, 0.9),
        "https://a.org/p2": (False, 0.5),
        "https://b.org/x": (False, 0.1),
    }


def test_plan_is_jvm_only(spark):
    crawled = spark.createDataFrame([("u",)], "url string")
    df = sitemap_discovery(_parsed(spark), crawled)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
