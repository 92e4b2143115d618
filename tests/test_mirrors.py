"""Mirror-site detection (functions/mirrors.py) vs a pure-Python
replica: signature law, resemblance math, the boilerplate cap, and a
constructed full-mirror pair."""

from __future__ import annotations

import hashlib

from dxa_pagerank_spark.functions.mirrors import (
    mirror_candidates,
    site_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fp(text, k=8):
    return hashlib.md5(
        " ".join(text.split(" ")[:k]).encode()
    ).hexdigest()


def test_signatures_match_replica(spark):
    rows = [
        (0, "a b c d e f g h tail one"),
        (1, "a b c d e f g h different tail"),  # same prefix as doc 0
        (25, "x y z"),  # short doc: prefix = whole text
    ]
    got = {
        (r.site, r.fp)
        for r in site_signatures(_docs(spark, rows), block_size=25).collect()
    }
    expect = {(d // 25, _fp(t)) for d, t in rows}
    assert got == expect
    # docs 0 and 1 collapsed to ONE distinct (site, fp) row
    assert len(got) == 2


def test_full_mirror_pair_resemblance_one(spark):
    # site 0 = docs 0..2, site 1 = docs 25..27 with identical prefixes
    texts = [f"page {i} body starts here with words w{i}" for i in range(3)]
    rows = [(i, texts[i]) for i in range(3)] + [
        (25 + i, texts[i] + " mirrored tail") for i in range(3)
    ]
    out = mirror_candidates(_docs(spark, rows), block_size=25).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.site_a, r.site_b) == (0, 1)
    assert r.n_common == 3 and r.size_a == 3 and r.size_b == 3
    assert r.resemblance == 1.0


def test_partial_overlap_resemblance(spark):
    shared = "common eight token prefix that both sites serve today"
    rows = [
        (0, shared),
        (1, "site zero only content here"),
        (25, shared + " tail"),
        (26, "site one distinct page body"),
        (27, "another distinct page on site one"),
    ]
    out = mirror_candidates(_docs(spark, rows), block_size=25).collect()
    assert len(out) == 1
    r = out[0]
    # |A|=2, |B|=3, |∩|=1 -> 1 / (2 + 3 - 1) = 0.25
    assert r.n_common == 1 and r.size_a == 2 and r.size_b == 3
    assert r.resemblance == 0.25


def test_boilerplate_cap_drops_ubiquitous_fingerprint(spark):
    # the same template prefix on every one of 5 sites: with
    # max_fp_sites below 5 it generates NO pairs
    rows = [(25 * s, "copyright template header shared by all") for s in range(5)]
    docs = _docs(spark, rows)
    assert mirror_candidates(docs, max_fp_sites=4).count() == 0
    assert mirror_candidates(docs, max_fp_sites=5).count() == 10  # C(5,2)
