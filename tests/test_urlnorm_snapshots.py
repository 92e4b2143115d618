"""Oracles for URL canonicalization and crawl-snapshot merging."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.snapshots import latest_snapshot
from dxa_pagerank_spark.functions.urlnorm import (
    _TRACKING_EXACT,
    _TRACKING_PREFIXES,
    canonicalize_urls,
)

URLS = [
    (0, "HTTP://Example.ORG:80/doc/7?utm_source=feed&b=9&a=1#top"),
    (1, "https://EXAMPLE.org:443/doc/8"),
    (2, "https://Example.org/?fbclid=abc"),
    (3, "http://example.org/A/B?z=26&y=25&x=3"),
    (4, "https://example.org:8080/keep/port"),  # non-default port kept
    (5, "https://a.com"),
    (6, "HTTPS://A.com:443#frag"),
    (7, "http://h.net/p?gclid=1&utm_campaign=x"),  # query dies entirely
    (8, "http://h.net/CaSe/Path?Utm_source=kept"),  # filter is case-sensitive
]


def _py_canonical(url: str) -> str:
    """Independent replica of the documented rules (stdlib parsing)."""
    from urllib.parse import urlsplit

    base = url.split("#", 1)[0]
    p = urlsplit(base)
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    params = [
        q
        for q in (p.query.split("&") if p.query else [])
        if not (
            any(q.startswith(pre) for pre in _TRACKING_PREFIXES)
            or any(q == n or q.startswith(n + "=") for n in _TRACKING_EXACT)
        )
    ]
    query = "&".join(sorted(params))
    out = f"{scheme}://{host}{p.path}" + (f"?{query}" if query else "")
    if out == f"{scheme}://{host}/":
        out = out[:-1]
    return out


def test_canonical_url_matches_stdlib_replica(spark):
    df = spark.createDataFrame(URLS, "i long, url string")
    got = {r["i"]: r["canonical_url"] for r in canonicalize_urls(df).collect()}
    for i, url in URLS:
        assert got[i] == _py_canonical(url), (i, url, got[i])
    # spot-check the interesting ones explicitly
    assert got[0] == "http://example.org/doc/7?a=1&b=9"
    assert got[2] == "https://example.org"
    assert got[3] == "http://example.org/A/B?x=3&y=25&z=26"
    assert got[4] == "https://example.org:8080/keep/port"
    assert got[6] == "https://a.com"
    assert got[7] == "http://h.net/p"
    assert got[8] == "http://h.net/CaSe/Path?Utm_source=kept"


def test_latest_snapshot_keeps_newest_and_counts(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("u1", t0, "v1"),
        ("u1", t0 + timedelta(days=1), "v2"),
        ("u1", t0 + timedelta(days=2), "v3"),
        ("u2", t0, "only"),
        ("u3", t0, "bbb"),  # same-ts tie: md5 asc decides, stable
        ("u3", t0, "aaa"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = {r["url"]: r for r in latest_snapshot(df).collect()}
    assert out["u1"]["text"] == "v3" and out["u1"]["n_snapshots"] == 3
    assert out["u2"]["text"] == "only" and out["u2"]["n_snapshots"] == 1
    import hashlib

    tie = min(["aaa", "bbb"], key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert out["u3"]["text"] == tie and out["u3"]["n_snapshots"] == 2


def test_latest_snapshot_plan_uses_group_limit(spark):
    df = spark.createDataFrame(
        [("u", datetime(2024, 1, 1), "x")],
        "url string, warc_ts timestamp, text string",
    )
    plan = latest_snapshot(df)._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        latest_snapshot(df)._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
