"""URL canonicalization for crawl processing.
[north_rule extension — no reference counterpart]

Crawls see the same page under many spellings: scheme/host case,
explicit default ports, fragments, tracking parameters, unsorted query
strings. Canonicalizing before url-keyed joins (dedup, link-graph
build, site rollup) collapses these — otherwise the "same" page
fragments into several vertices and dedup misses exact duplicates.

Rules (the common subset of public canonicalizers — e.g. the ones
documented for Common Crawl / nutch-style crawlers):

  1. lowercase scheme and host (path/query stay case-sensitive);
  2. strip an explicit default port (:80 for http, :443 for https);
  3. strip the fragment (#...);
  4. drop tracking parameters (utm_*, fbclid, gclid);
  5. sort surviving query parameters bytewise; drop the '?' when none
     survive;
  6. strip a trailing '/' from a bare-host url (https://a.com/ ->
     https://a.com).

Everything is JVM built-ins (regexp_replace / split / array_sort /
filter / concat) — whole-stage codegen, zero shuffles, and every rule
is mirrored 1:1 in the DuckDB oracle. Python's urllib is deliberately
NOT used: per-row Python is the slow path, and the column program IS
the specification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("fbclid", "gclid")


def _split3(url: Column):
    """(scheme_host_port, path_query) — fragment already stripped.
    scheme_host_port = up to the first '/' after '://' (or the whole
    string when there is no path)."""
    defrag = F.regexp_replace(url, r"#.*$", "")
    head = F.regexp_extract(defrag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(defrag, F.length(head) + 1, F.lit(1 << 30))
    return head, tail


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) url column."""
    head, tail = _split3(url)
    head = F.lower(head)
    # default ports: the scheme is already lowercased
    head = F.when(
        head.startswith("http://"), F.regexp_replace(head, ":80$", "")
    ).otherwise(head)
    head = F.when(
        head.startswith("https://"), F.regexp_replace(head, ":443$", "")
    ).otherwise(head)

    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))

    params = F.filter(
        F.when(query == "", F.array().cast("array<string>")).otherwise(
            F.split(query, "&")
        ),
        _param_kept,
    )
    new_query = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        head,
        path,
        F.when(new_query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), new_query)
        ),
    )
    # bare-host trailing slash: https://a.com/ -> https://a.com
    return F.regexp_replace(rebuilt, r"^([a-z][a-z0-9+.-]*://[^/?]+)/$", "$1")


def _param_kept(p: Column) -> Column:
    cond = F.lit(False)
    for pref in _TRACKING_PREFIXES:
        cond = cond | p.startswith(pref)
    for name in _TRACKING_EXACT:
        cond = cond | p.startswith(name + "=") | (p == name)
    return ~cond


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))
