"""readability (functions/textstats.py): Python-re replica of the
Flesch / Flesch-Kincaid counting conventions."""

from __future__ import annotations

import re

import pytest

from dxa_pagerank_spark.functions.textstats import readability


def _replica(text):
    words = len(re.findall(r"[A-Za-z]+", text))
    sents = max(len(re.findall(r"[.!?]+", text)), 1)
    syls = len(re.findall(r"[aeiouyAEIOUY]+", text))
    if words == 0:
        return words, sents, syls, None, None
    wps = words / sents
    spw = syls / words
    return (
        words,
        sents,
        syls,
        206.835 - 1.015 * wps - 84.6 * spw,
        0.39 * wps + 11.8 * spw - 15.59,
    )


CASES = [
    "The cat sat. The dog ran!",
    "Incomprehensibility characterizes bureaucratic documentation.",
    "no terminal punctuation here",
    "brrr zzz... 123 456?!",
    "",
    "Why? Because... reasons!! Multiple.punct.runs",
]


def test_readability_matches_replica(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    for i, t in enumerate(CASES):
        w, s, sy, ease, grade = _replica(t)
        r = rows[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            w,
            s,
            sy,
        ), t
        if ease is None:
            assert r["flesch_ease"] is None and r["fk_grade"] is None
        else:
            assert r["flesch_ease"] == pytest.approx(ease, abs=1e-9)
            assert r["fk_grade"] == pytest.approx(grade, abs=1e-9)


def test_readability_orders_simple_before_dense(spark):
    df = spark.createDataFrame(
        [(0, CASES[0]), (1, CASES[1])], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    assert rows[0]["flesch_ease"] > rows[1]["flesch_ease"]
    assert rows[0]["fk_grade"] < rows[1]["fk_grade"]
