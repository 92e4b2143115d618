"""Crawl-trap detection (functions/traps.py) vs hand-computed cases."""

import pytest

from dxa_pagerank_spark.functions.traps import (
    detect_crawl_traps,
    url_templates,
)


def _templ(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    r = url_templates(df).collect()[0]
    return r["host"], r["template"]


def test_template_collapses_digit_runs(spark):
    host, t = _templ(spark, "http://A.Example.com/cal/2026/08/20?page=3")
    assert host == "a.example.com"
    assert t == "/cal/{d}/{d}/{d}?page={d}"


def test_template_collapses_long_hex_before_digits(spark):
    _, t = _templ(
        spark, "https://x.org/s/deadbeef00c0ffee/item/42#frag"
    )
    # 16-char hex run -> {h}; remaining digits -> {d}; fragment dropped
    assert t == "/s/{h}/item/{d}"


def test_short_hex_is_not_collapsed_as_hex(spark):
    _, t = _templ(spark, "https://x.org/v/beef12")
    # 6 chars < 8: not a hex run; only the digit tail collapses
    assert t == "/v/beef{d}"


def test_no_scheme_means_empty_host(spark):
    host, t = _templ(spark, "not a url")
    assert host == ""
    assert t == ""


def test_trap_flag_thresholds(spark):
    rows = (
        # trap.test: 8 of 10 pages under one calendar template
        [(f"http://trap.test/cal/{d}",) for d in range(8)]
        + [("http://trap.test/about",), ("http://trap.test/contact",)]
        # ok.test: 4 pages over 2 templates, share 0.5 but n < min_pages
        + [(f"http://ok.test/p/{d}",) for d in range(2)]
        + [(f"http://ok.test/q/{d}",) for d in range(2)]
    )
    df = spark.createDataFrame(rows, "url string")
    got = {
        (r["host"], r["template"]): (
            r["n_urls"],
            r["host_pages"],
            r["is_trap"],
        )
        for r in detect_crawl_traps(df, min_pages=5, min_share=0.6).collect()
    }
    assert got[("trap.test", "/cal/{d}")] == (8, 10, True)
    assert got[("trap.test", "/about")] == (1, 10, False)
    assert got[("ok.test", "/p/{d}")] == (2, 4, False)


def test_share_sums_to_one_per_host(spark):
    rows = [(f"http://h.test/{chr(97 + d % 3)}/{d}",) for d in range(30)]
    df = spark.createDataFrame(rows, "url string")
    out = detect_crawl_traps(df).toPandas()
    sums = out.groupby("host")["share"].sum()
    # shares are individually rounded to 6 places, so the sum is 1
    # only up to one ulp-of-rounding per template
    assert ((sums - 1.0).abs() < 1e-5).all()


def test_plan_has_no_python_udf(spark):
    df = spark.createDataFrame([("http://h.test/1",)], "url string")
    plan = detect_crawl_traps(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.parametrize("bad", [0.0, 1.0])
def test_query_string_is_part_of_template(spark, bad):
    # same path, different query shape -> different templates
    df = spark.createDataFrame(
        [("http://h.test/p?a=1",), ("http://h.test/p?b=2",)], "url string"
    )
    ts = {r["template"] for r in url_templates(df).collect()}
    assert ts == {"/p?a={d}", "/p?b={d}"}
