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


def test_change_rate_replica_and_laws(spark):
    import math

    from dxa_pagerank_spark.functions.snapshots import change_rate

    rows = (
        [("a", True)] * 3 + [("a", False)] * 7      # changes 3/10
        + [("b", True)] * 10                         # always changed
        + [("c", False)] * 10                        # never changed
        + [("d", True)] * 1 + [("d", False)] * 1     # sparse history
    )
    df = spark.createDataFrame(rows, "url string, changed boolean")
    got = {
        r["url"]: (
            r["n_obs"],
            r["n_changed"],
            r["change_rate"],
            r["revisit_days"],
        )
        for r in change_rate(df, interval_days=2.0).collect()
    }

    def lam(n, x, dt=2.0):
        return -math.log((n - x + 0.5) / (n + 0.5)) / dt

    for url, (n, x) in (("a", (10, 3)), ("b", (10, 10)),
                        ("c", (10, 0)), ("d", (2, 1))):
        en, ex, er, erv = got[url]
        assert (en, ex) == (n, x)
        assert abs(er - lam(n, x)) < 1e-12
        if lam(n, x) > 0:
            assert abs(erv - max(1.0 / lam(n, x), 2.0)) < 1e-9
    # always-changed stays FINITE (the +0.5 regularizer), and its
    # revisit suggestion floors at the sampling interval
    assert got["b"][2] < float("inf")
    assert got["b"][3] == 2.0
    # never-changed has rate exactly 0 (the +0.5 cancels) and no
    # finite revisit suggestion
    assert got["c"][2] == 0.0
    assert got["c"][3] is None
    # ordering: faster-changing pages get shorter revisits
    assert got["b"][3] <= got["a"][3]
