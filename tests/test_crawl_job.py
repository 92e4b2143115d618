"""End-to-end crawl-plan job: PageRank priority + sitemap discovery +
robots enforcement + politeness waves, driven through plan_crawl (the
spark-submit body) on a small deterministic crawl."""

import argparse

from pyspark.sql import functions as F

from jobs.crawl_job import plan_crawl

ARGS = argparse.Namespace(
    cores=8,
    per_host=2,
    max_waves=3,
    site_block=5,
    damping=0.85,
    threshold=1e-8,
    max_rounds=30,
)


def _edges(spark):
    # 15 pages, 3 hosts of 5; ring + skip links
    n = 15
    rows = [(i, (i + 1) % n) for i in range(n)]
    rows += [(i, (3 * i + 7) % n) for i in range(n) if i % 3]
    return spark.createDataFrame(rows, "src long, dst long")


def _robots(spark):
    return spark.createDataFrame(
        [
            (0, "User-agent: *\nDisallow: /\n"),  # host 0 banned
            (1, "User-agent: *\nCrawl-delay: 2\n"),  # host 1 slowed
        ],
        "host long, robots_txt string",
    )


def _sitemaps(spark):
    return spark.createDataFrame(
        [
            (
                2,
                "<urlset>"
                "<url><loc>/doc/11</loc></url>"  # already crawled
                "<url><loc>/new/99</loc><priority>0.9</priority></url>"
                "</urlset>",
            )
        ],
        "host long, sitemap_xml string",
    )


def test_plan_crawl_full_pipeline(spark):
    schedule, discovered, report = plan_crawl(
        spark, _edges(spark), _robots(spark), _sitemaps(spark), ARGS
    )
    rows = schedule.collect()
    assert report["pagerank_converged"]
    assert report["n_crawled_urls"] == 15
    # only /new/99 is sitemap-only
    assert report["n_discovered"] == 1
    assert [r.loc for r in discovered.collect()] == ["/new/99"]
    # banned host 0 contributes nothing
    assert all(r.host != 0 for r in rows)
    # crawl-delay host 1: cap 2//2=1 per wave, 3 waves -> 3 urls max
    host1 = [r for r in rows if r.host == 1]
    assert len(host1) == 3 and sorted(r.wave for r in host1) == [0, 1, 2]
    # host 2 at full cap: 2 per wave
    host2 = [r for r in rows if r.host == 2]
    assert len(host2) == ARGS.per_host * ARGS.max_waves
    assert report["n_scheduled"] == len(rows)
    assert report["n_excluded"] == 15 + 1 - len(rows)
    # the discovered URL is in the schedule (host 2, known id)
    disc_id = spark.createDataFrame(
        [("/new/99",)], "loc string"
    ).select(F.xxhash64("loc").alias("id")).collect()[0].id
    assert any(r.id == disc_id for r in host2)


def test_plan_crawl_without_robots_or_sitemaps(spark):
    schedule, discovered, report = plan_crawl(
        spark, _edges(spark), None, None, ARGS
    )
    assert discovered is None
    assert report["n_discovered"] == 0
    # no rules: every host schedules all 5 of its URLs (under the
    # 2-per-wave x 3-wave = 6-slot politeness budget)
    rows = schedule.collect()
    assert {r.host for r in rows} == {0, 1, 2}
    for h in (0, 1, 2):
        by_wave = sorted(r.wave for r in rows if r.host == h)
        assert by_wave == [0, 0, 1, 1, 2]
