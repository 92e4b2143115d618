"""diversity_report vs a pure-Python replica."""

import random

import pytest

from dxa_pagerank_spark.functions.terms import diversity_report


def _replica(docs, n):
    groups = {}
    for _, lang, text in docs:
        ts = [t for t in text.split(" ") if t]
        gs = (
            [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
            if len(ts) >= n
            else []
        )
        g = groups.setdefault(
            lang,
            {"docs": 0, "tok": 0, "tot": 0, "types": set(), "grams": set()},
        )
        g["docs"] += 1
        g["tok"] += len(ts)
        g["tot"] += len(gs)
        g["types"].update(ts)
        g["grams"].update(gs)
    out = {}
    for lang, g in groups.items():
        out[lang] = (
            g["docs"],
            g["tok"],
            len(g["types"]),
            round(len(g["types"]) / max(g["tok"], 1), 6),
            len(g["grams"]),
            g["tot"],
            round(len(g["grams"]) / max(g["tot"], 1), 6),
        )
    return out


def _check(spark, docs, n=2):
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["grp"]: (
            r["n_docs"],
            r["n_tokens"],
            r["n_types"],
            r["ttr"],
            r["distinct_ngrams"],
            r["total_ngrams"],
            r["distinct_ngram_ratio"],
        )
        for r in diversity_report(df, n=n).collect()
    }
    want = _replica(docs, n)
    assert set(got) == set(want)
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert a == pytest.approx(b, abs=1e-6)


def test_diversity_hand_corpus(spark):
    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the cat sat"),
        (2, "de", "der hund der hund der hund"),  # highly repetitive
        (3, "fr", ""),
        (4, "fr", "un"),
    ]
    _check(spark, docs)


def test_diversity_repetitive_group_scores_lower(spark):
    docs = [
        (0, "nat", "alpha beta gamma delta epsilon zeta"),
        (1, "spam", "buy now buy now buy now buy now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["grp"]: r for r in diversity_report(df).collect()}
    assert got["spam"]["distinct_ngram_ratio"] < got["nat"][
        "distinct_ngram_ratio"
    ]
    assert got["spam"]["ttr"] < got["nat"]["ttr"]


def test_diversity_random(spark):
    rng = random.Random(2)
    langs = ["en", "de", "fr"]
    docs = [
        (
            i,
            rng.choice(langs),
            " ".join(f"w{rng.randrange(15)}" for _ in range(rng.randrange(12))),
        )
        for i in range(40)
    ]
    _check(spark, docs, n=3)
