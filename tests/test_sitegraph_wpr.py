"""Anchor-text extraction, site-graph rollup, and weighted PageRank."""

import numpy as np
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.linkextract import extract_anchors, extract_links
from dxa_pagerank_spark.operators.sitegraph import site_rollup
from dxa_pagerank_spark.operators.wpagerank import weighted_pagerank


def test_extract_anchors_golden():
    html = (
        b'<html><body><a href="/a">one <b>bold</b> text</a>'
        b'<a name="noref">skip</a>'
        b'<a href="mailto:x@y">mail</a>'
        b'<a href="/b">outer <a href="/c">inner</a>'
        b'<a href="/a">one <b>bold</b> text</a></body></html>'
    )
    got = extract_anchors(html, "https://ex.org/p")
    # nested <a> restarts capture (browsers auto-close); mailto and
    # href-less anchors dropped; duplicates kept with their text
    assert got == [
        ("https://ex.org/a", "one bold text"),
        ("https://ex.org/b", "outer "),
        ("https://ex.org/c", "inner"),
        ("https://ex.org/a", "one bold text"),
    ]
    # href multiset/order must agree with the frozen link extractor
    assert [a for a, _ in got] == extract_links(html, "https://ex.org/p")
    assert extract_anchors(None, "https://ex.org/") == []


def test_page_anchors_matches_extract_links(spark):
    from dxa_pagerank_spark.datagen import make_pages, pages_to_spark
    from dxa_pagerank_spark.sources.pages import extract_page_links, page_anchors

    rows, _, _ = make_pages(40, mean_outdeg=3, seed=5)
    pages = pages_to_spark(spark, rows)
    a = sorted(
        (r["url"], r["pos"], r["link"])
        for r in page_anchors(pages).select("url", "pos", "link").collect()
    )
    b = sorted(
        (r["url"], r["pos"], r["link"])
        for r in extract_page_links(pages).collect()
    )
    assert a == b


def test_site_rollup_weights_and_self_loops(spark):
    edges = spark.createDataFrame(
        [(0, 26), (1, 27), (2, 3), (26, 0), (26, 1), (51, 0)],
        "src long, dst long",
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in site_rollup(edges, block_size=25).collect()
    }
    # (2,3) is an intra-site self-loop at block level -> dropped
    assert got == {(0, 1): 2.0, (1, 0): 2.0, (2, 0): 1.0}
    kept = site_rollup(edges, block_size=25, drop_self_loops=False)
    assert {
        (r["src"], r["dst"]): r["weight"] for r in kept.collect()
    } == {(0, 1): 2.0, (1, 0): 2.0, (2, 0): 1.0, (0, 0): 1.0}


def _np_weighted_pagerank(n, src, dst, w, damping=0.85, rounds=10):
    W = np.zeros(n)
    np.add.at(W, src, w)
    dang = W == 0
    r = np.full(n, 1.0 / n)
    for _ in range(rounds):
        dm = r[dang].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * (w / W[src]))
        r = (1.0 - damping) / n + damping * dm / n + damping * contrib
    return r


def _wpr_vec(spark, n, src, dst, w, rounds=10):
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst, "weight": w})
    )
    res = weighted_pagerank(
        spark, edges, num_vertices=n, rounds=rounds, num_partitions=4
    )
    got = {r["id"]: r["rank"] for r in res.collect()}
    return np.array([got[i] for i in range(n)])


def test_weighted_pagerank_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    n, m = 60, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 9, m).astype(float)
    # make some vertices dangling: drop all out-edges of ids 0..9
    keep = src >= 10
    src, dst, w = src[keep], dst[keep], w[keep]
    got = _wpr_vec(spark, n, src, dst, w)
    exp = _np_weighted_pagerank(n, src, dst, w)
    np.testing.assert_allclose(got, exp, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # mass conserved


def test_weighted_pagerank_uniform_weights_match_unweighted_form(spark):
    """With all weights equal, per-edge share = 1/out_deg: ranks must
    equal the uniform-split closed form (same dangling rule)."""
    rng = np.random.default_rng(11)
    n, m = 40, 160
    src = rng.integers(5, n, m)  # ids 0..4 dangling
    dst = rng.integers(0, n, m)
    w = np.full(m, 3.0)
    got = _wpr_vec(spark, n, src, dst, w)
    exp = _np_weighted_pagerank(n, src, dst, np.ones(m))
    np.testing.assert_allclose(got, exp, atol=1e-12)
