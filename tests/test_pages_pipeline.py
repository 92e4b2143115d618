"""pages -> text/links -> edges pipeline tests (FIXTURES.md F1,
BASELINE.json input_hint: byte-identical extraction per url)."""

import numpy as np
from pyspark.sql import functions as F

from dxa_pagerank_spark.datagen import make_pages, pages_to_spark
from dxa_pagerank_spark.functions.textextract import extract_text
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.sources.pages import (
    enrich_pages,
    extract_page_links,
    pages_to_edges,
)

GOLDEN_HTML = (
    b"<html><head><title>T&amp;1</title><style>p{x}</style>"
    b"<script>var s='<p>no</p>';</script></head>"
    b"<body>  <h1>Head\n\tline</h1><p>a  b</p>"
    b"<noscript>skip</noscript><!-- comment -->tail</body></html>"
)
GOLDEN_TEXT = "T&1\nHead line\na b\ntail"


def test_extract_text_golden_bytes():
    assert extract_text(GOLDEN_HTML) == GOLDEN_TEXT
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"\xff\xfe junk <p>ok</p>") .endswith("ok")


def test_pages_text_byte_identical(spark):
    rows, _, _ = make_pages(60)
    pages = pages_to_spark(spark, rows).withColumnRenamed("text", "expected")
    recomputed = enrich_pages(pages.select("url", "warc_ts", "html", "expected", "lang"))
    mismatches = recomputed.filter(F.col("text") != F.col("expected")).count()
    assert mismatches == 0
    assert recomputed.count() == 60


def test_pages_to_edges_join_mode_matches_ground_truth(spark):
    rows, e_src, e_dst = make_pages(80, mean_outdeg=3, seed=11)
    pages = pages_to_spark(spark, rows)
    url_ids = spark.createDataFrame(
        [(r["url"], i) for i, r in enumerate(rows)], "url string, id long"
    )
    edges = pages_to_edges(pages, id_mode="join", url_ids=url_ids)
    got = sorted((r["src"], r["dst"]) for r in edges.collect())
    expected = sorted(zip(e_src.tolist(), e_dst.tolist()))
    assert got == expected


def test_pages_to_edges_xxhash64_pagerank_equivalence(spark):
    """Hash-id edges are an id-relabeling of index-id edges: the rank
    multiset must be identical (allclose after sorting)."""
    rows, e_src, e_dst = make_pages(80, mean_outdeg=3, seed=11)
    pages = pages_to_spark(spark, rows)
    edges_h = pages_to_edges(pages, id_mode="xxhash64", restrict_to_corpus=True)
    assert edges_h.count() == len(e_src)  # all fixture links are internal

    from dxa_pagerank_spark.datagen import edges_to_spark
    from dxa_pagerank_spark.sources.pages import page_vertices

    r_idx = pagerank(
        spark, edges_to_spark(spark, e_src, e_dst), num_vertices=80,
        threshold=1e-9, max_rounds=80,
    )
    r_hash = pagerank(
        spark, edges_h, vertices=page_vertices(pages),
        threshold=1e-9, max_rounds=80,
    )
    a = np.sort(np.array([r["rank"] for r in r_idx.ranks.collect()]))
    b = np.sort(np.array([r["rank"] for r in r_hash.ranks.collect()]))
    assert r_idx.rounds == r_hash.rounds
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_link_extraction_document_order(spark):
    html = (
        b'<html><body><a href="/x">1</a><a href="http://other.example/y#frag">2</a>'
        b'<a href="mailto:a@b.c">no</a><a href="https://e.example/z">3</a>'
        b'<a name="anchor-no-href">no</a></body></html>'
    )
    pages = pages_to_spark(
        spark,
        [{"url": "https://site0.example/p/0", "warc_ts_epoch": 0, "html": html,
          "text": "", "lang": "en"}],
    )
    links = extract_page_links(pages).orderBy("pos").collect()
    assert [r["link"] for r in links] == [
        "https://site0.example/x",
        "http://other.example/y",
        "https://e.example/z",
    ]


def test_edgelist_roundtrip(spark, tmp_path):
    """write -> read of the reference format preserves multiplicity."""
    from dxa_pagerank_spark.datagen import (
        FIXTURE_GRAPHS,
        edges_to_spark,
        parse_in_edge_list,
    )
    from dxa_pagerank_spark.sources.edgelist import (
        read_in_edge_list,
        write_in_edge_list,
    )

    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS["g_dup"])
    path = str(tmp_path / "g_dup.txt")
    write_in_edge_list(edges_to_spark(spark, src, dst), n, path)
    edges2, n2 = read_in_edge_list(spark, path)
    assert n2 == n
    got = sorted((r["src"], r["dst"]) for r in edges2.collect())
    assert got == sorted(zip(src.tolist(), dst.tolist()))
