"""Property tests for URL canonicalization over a 300-url randomized
batch (seeded — deterministic): idempotence, stdlib-replica equality,
and rule-specific invariants, all checked in two Spark jobs."""

import numpy as np
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.urlnorm import canonical_url
from tests.test_urlnorm_snapshots import _py_canonical


def _random_urls(n=300, seed=13):
    rng = np.random.default_rng(seed)
    schemes = ["http", "HTTP", "https", "HTTPS", "hTtP"]
    hosts = ["example.org", "Example.ORG", "a.b.NET", "x.io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/doc/7", "/CaSe"]
    params = ["a=1", "b=2", "utm_source=x", "fbclid", "gclid=9", "Z=z", "utm_x"]
    frags = ["", "#f", "#frag/with?q"]
    out = []
    for _ in range(n):
        ps = rng.choice(params, size=rng.integers(0, 4), replace=False)
        q = "?" + "&".join(ps) if len(ps) else ""
        out.append(
            rng.choice(schemes)
            + "://"
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + q
            + rng.choice(frags)
        )
    return out


def test_canonicalization_properties(spark):
    urls = _random_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", canonical_url(F.col("url")).alias("c1")
    ).select("url", "c1", canonical_url(F.col("c1")).alias("c2"))
    rows = df.collect()
    assert len(rows) == len(urls)
    for r in rows:
        # matches the independent stdlib replica
        assert r["c1"] == _py_canonical(r["url"]), r["url"]
        # idempotent: canonicalizing a canonical url is a no-op
        assert r["c2"] == r["c1"], r["url"]
        # invariants
        c = r["c1"]
        assert "#" not in c
        host = c.split("://", 1)[1].split("/", 1)[0].split("?", 1)[0]
        if c.startswith("http://"):
            assert not host.endswith(":80")
        if c.startswith("https://"):
            assert not host.endswith(":443")
        if "?" in c:
            q = c.split("?", 1)[1].split("&")
            assert q == sorted(q) and q != [""]
            for p in q:
                assert not p.startswith("utm_")
                assert not (p == "fbclid" or p.startswith("fbclid="))
                assert not (p == "gclid" or p.startswith("gclid="))
