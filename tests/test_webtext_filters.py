"""Oracles for the r03 webtext-pipeline additions: line-level
boilerplate removal, Gopher repetition stats, PII masking, and
quality-weighted sampling. Every test compares the Spark operator
against an independent pure-Python computation on the same rows."""

import re
from collections import Counter

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.boilerplate import (
    boilerplate_lines,
    remove_boilerplate,
)
from dxa_pagerank_spark.functions.pii import MASKS, mask_pii
from dxa_pagerank_spark.functions.repetition import (
    repetition_filter,
    repetition_stats,
)
from dxa_pagerank_spark.functions.sampling import (
    KNUTH,
    MOD,
    _FOLD,
    weighted_sample,
)

DOCS = [
    (0, "Home\nAbout\nreal content zero\nfooter (c) example"),
    (1, "Home\nAbout\nunique line one\nfooter (c) example"),
    (2, "Home\nsecond doc body\nfooter (c) example"),
    (3, "Home\nAbout\nfooter (c) example"),
    (4, "totally original document\nwith two lines"),
    (5, ""),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_line_freq():
    c = Counter()
    for _, text in DOCS:
        for line in set(text.split("\n")):
            c[line] += 1
    return c


def test_boilerplate_lines_matches_python_oracle(spark):
    got = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(
            _docs_df(spark), id_col="doc_id", max_doc_frac=0.5, min_docs=2
        ).collect()
    }
    n = len(DOCS)
    want = {
        line: cnt
        for line, cnt in _py_line_freq().items()
        if cnt >= 2 and cnt > 0.5 * n
    }
    assert got == want
    # the fixture is built so exactly Home + footer cross the 50% bar
    assert set(got) == {"Home", "footer (c) example"}


def test_remove_boilerplate_rebuilds_in_order(spark):
    out = {
        r["id"]: r
        for r in remove_boilerplate(
            _docs_df(spark), id_col="doc_id", max_doc_frac=0.5, min_docs=2
        ).collect()
    }
    boiler = {
        line
        for line, cnt in _py_line_freq().items()
        if cnt >= 2 and cnt > 0.5 * len(DOCS)
    }
    for doc_id, text in DOCS:
        kept = [ln for ln in text.split("\n") if ln not in boiler]
        row = out[doc_id]
        assert row["text"] == "\n".join(kept)
        assert row["n_lines_kept"] == len(kept)
        assert row["n_lines_dropped"] == len(text.split("\n")) - len(kept)
    # every-line-boilerplate doc is kept with empty text
    assert out[3]["text"] == "About"  # About is in 3/6 docs = 0.5, not > 0.5
    assert out[5]["n_lines_kept"] == 1 and out[5]["text"] == ""


REP_DOCS = [
    (0, "spam spam spam spam spam"),
    (1, "a b a b a b a b"),
    (2, "all tokens here are fully distinct words"),  # 6 bigrams, top frac 1/6 < 0.18
    (3, "x"),  # no bigrams, no trigrams
    (4, ""),
]


def _py_rep_stats(text, n):
    toks = [t for t in text.split(" ") if t]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return (0, 0, 0, 0.0, 0.0)
    c = Counter(grams)
    total = len(grams)
    top = max(c.values())
    return (
        total,
        len(c),
        top,
        round(top / total, 9),
        round((total - len(c)) / total, 9),
    )


def test_repetition_stats_matches_python_oracle(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    got = {
        (r["id"], r["n"]): (
            r["total_grams"],
            r["distinct_grams"],
            r["top_gram_count"],
            r["top_gram_frac"],
            r["dup_gram_frac"],
        )
        for r in repetition_stats(df).collect()
    }
    assert len(got) == len(REP_DOCS) * 2  # every doc reports both orders
    for doc_id, text in REP_DOCS:
        for n in (2, 3):
            assert got[(doc_id, n)] == _py_rep_stats(text, n), (doc_id, n)


def test_repetition_filter_drops_spam(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    kept = sorted(
        r["doc_id"] for r in repetition_filter(df, min_grams=1).collect()
    )
    # docs 0 and 1 are pure repetition (top bigram frac 1.0 / 0.57);
    # 2 is clean (top bigram frac 1/6); 3 and 4 have no grams at all
    # and must survive (a too-short doc is not a repetition failure).
    assert kept == [2, 3, 4]
    # default min_grams=20 exempts ALL these tiny docs — the gates
    # only fire above the length floor (pigeonhole: a 6-token doc can
    # never pass 0.18)
    kept_default = sorted(r["doc_id"] for r in repetition_filter(df).collect())
    assert kept_default == [0, 1, 2, 3, 4]


PII_DOCS = [
    (0, "reach me at alice.smith+spam@mail.example.co or 10.0.0.1 ok"),
    (1, "no pii here"),
    (2, "two mails a@b.io c@d.org one ip 192.168.255.3"),
    (3, "version 1.2.3.4.5 is not an ip boundary-wise: 1.2.3.4 is"),
]


def test_mask_pii_matches_python_re(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    out = {r["id"]: r for r in mask_pii(df).collect()}
    for doc_id, text in PII_DOCS:
        masked = text
        for pattern, token in MASKS:
            masked = re.sub(pattern, token, masked)
        n_emails = len(re.findall(MASKS[0][0], text))
        n_ips = len(re.findall(MASKS[1][0], text))
        assert out[doc_id]["text"] == masked, doc_id
        assert out[doc_id]["n_emails"] == n_emails
        assert out[doc_id]["n_ips"] == n_ips
    assert out[0]["text"] == "reach me at <EMAIL> or <IP> ok"


def test_weighted_sample_matches_arithmetic(spark):
    rows = [(i, (i % 10) / 10.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    for power in (1, 2):
        got = sorted(
            r["doc_id"]
            for r in weighted_sample(
                df, "doc_id", "w", power=power, salt=7
            ).collect()
        )
        want = [
            i
            for i, w in rows
            if float((((i + 7) % _FOLD) * KNUTH) % MOD) < (w**power) * float(MOD)
        ]
        assert got == want
        # sanity: higher weight keeps more rows
    w0 = weighted_sample(df, "doc_id", "w", power=1).filter(F.col("w") == 0.0)
    assert w0.count() == 0  # weight 0 keeps nothing


def test_weighted_sample_monotone_in_weight(spark):
    """Property: for a fixed key and salt, raising the weight can only
    ADD rows to the kept set (the hash is weight-independent, only the
    threshold moves)."""
    from dxa_pagerank_spark.functions.sampling import weighted_sample

    rows = [(i, 0.3, min(0.3 + (i % 7) / 10.0, 1.0)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lo double, hi double")
    kept_lo = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", "lo", power=2, salt=11).collect()
    }
    kept_hi = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", "hi", power=2, salt=11).collect()
    }
    assert kept_lo <= kept_hi
    assert len(kept_hi) > len(kept_lo)  # strictly more at higher weight
