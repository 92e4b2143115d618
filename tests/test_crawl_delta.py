"""crawl_delta / crawl_delta_report vs a dict-based replica."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.functions.snapshots import (
    crawl_delta,
    crawl_delta_report,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_crawl_delta_statuses(spark):
    old = _mk(spark, [("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")])
    new = _mk(spark, [("b", "2"), ("c", "3x"), ("d", "4"), ("e", "5")])
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "a": "removed",
        "b": "unchanged",
        "c": "changed",
        "d": "unchanged",
        "e": "added",
    }


def test_crawl_delta_report_churn(spark):
    old = _mk(spark, [("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")])
    new = _mk(spark, [("b", "2"), ("c", "3x"), ("d", "4"), ("e", "5")])
    row = crawl_delta_report(old, new).collect()[0]
    assert (
        row["n_added"],
        row["n_removed"],
        row["n_changed"],
        row["n_unchanged"],
    ) == (1, 1, 1, 2)
    assert row["churn"] == pytest.approx(3 / 4)


def test_crawl_delta_empty_old(spark):
    old = _mk(spark, [])
    new = _mk(spark, [("x", "1")])
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {"x": "added"}
