"""Crawl-trap detection via URL-template explosion per host.
[north_rule extension — no reference counterpart; dxa-pageRank ingests
a fixed edge list and has no crawl-ops layer at all (SURVEY.md §2.1).
Spider-trap detection is standard crawler hygiene (calendar pages,
session-id permutations, faceted-search blowups — the failure modes
Heritrix/Nutch operators filter by URL pattern): a host whose page
count is dominated by ONE numeric URL template is generating pages
faster than it is publishing content, and fetching it starves the
rest of the frontier.]

Rule (deterministic, engine-portable):

  1. host  = lowercase authority component of the url;
  2. path+query (fragment dropped) is rewritten to a TEMPLATE:
     hex runs of >= 8 chars -> ``{h}`` (session ids, content hashes),
     then digit runs -> ``{d}`` (calendar dates, page numbers, ids);
  3. per (host, template): n_urls; per host: host_pages;
  4. a template is a trap candidate when it has at least ``min_pages``
     urls AND covers at least ``min_share`` of its host's pages.

Everything is built-in column expressions (regexp_extract /
regexp_replace / groupBy) — no Python in the row path, so the scan
stays inside whole-stage codegen.

Plan shape at 100 TB: two key-reducing aggregations. The first
shuffle is by (host, template) — output cardinality is templates, not
urls, so partial (map-side) aggregation collapses each input split to
its distinct templates before the exchange. The per-host total is a
second tiny aggregation over the template table (already ~1e6x smaller
than the url table), joined back on host — host-keyed on both sides,
no re-shuffle of anything url-sized. No windows over the raw urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# authority component: scheme://HOST[/?#...]
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
# path+query, fragment excluded
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"
_HEX_RUN = "[0-9a-fA-F]{8,}"
_DIGIT_RUN = "[0-9]+"


def url_templates(
    urls: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Add ``host`` and ``template`` columns: lowercase authority and
    the hex/digit-collapsed path+query (see module docstring rules 1-2).
    Urls without a ``scheme://host`` prefix get host='' (kept — they
    group together and are visible in the report rather than dropped).
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    pathq = F.regexp_extract(u, _PATHQ_RE, 1)
    template = F.regexp_replace(
        F.regexp_replace(pathq, _HEX_RUN, "{h}"), _DIGIT_RUN, "{d}"
    )
    return urls.withColumn("host", host).withColumn("template", template)


def detect_crawl_traps(
    urls: DataFrame,
    url_col: str = "url",
    min_pages: int = 100,
    min_share: float = 0.5,
) -> DataFrame:
    """Score every (host, template) group and flag trap candidates ->
    (host, template, n_urls, host_pages, share, is_trap).

    ``share`` is n_urls/host_pages (exact integer inputs, one IEEE
    division — replayable bit-for-bit in any engine). ``is_trap``
    applies the two thresholds; callers filter or rank on it. Input
    urls are counted as given — canonicalize first
    (functions/urlnorm.py) if the crawl log contains spelling dupes.
    """
    t = url_templates(urls, url_col=url_col)
    per_template = t.groupBy("host", "template").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    per_host = per_template.groupBy("host").agg(
        F.sum("n_urls").alias("host_pages")
    )
    share = F.col("n_urls") / F.col("host_pages")
    return (
        per_template.join(per_host, "host")
        .select(
            "host",
            "template",
            "n_urls",
            "host_pages",
            F.round(share, 6).alias("share"),
            (
                (F.col("n_urls") >= F.lit(int(min_pages)))
                & (share >= F.lit(float(min_share)))
            ).alias("is_trap"),
        )
    )
