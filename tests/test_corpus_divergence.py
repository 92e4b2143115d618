"""corpus_divergence (functions/terms.py): Python replica of the
add-1-smoothed JSD, identical-corpora zero, bound, and guards."""

from __future__ import annotations

import math

import pytest

from dxa_pagerank_spark.functions.terms import corpus_divergence


def _replica(rows, ga, gb):
    tf = {}
    for g, text in rows:
        if g not in (ga, gb):
            continue
        for t in text.split(" "):
            if t:
                tf[(g, t)] = tf.get((g, t), 0) + 1
    vocab = sorted({t for _, t in tf})
    na = sum(c for (g, _), c in tf.items() if g == ga)
    nb = sum(c for (g, _), c in tf.items() if g == gb)
    v = len(vocab)
    jsd = 0.0
    for t in vocab:
        p = (tf.get((ga, t), 0) + 1) / (na + v)
        q = (tf.get((gb, t), 0) + 1) / (nb + v)
        m = (p + q) / 2
        jsd += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    return na, nb, v, jsd


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )


def test_jsd_matches_replica(spark):
    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "a dog ran far away"),
        ("de", "der hund lief weit weg"),
        ("de", "die katze sass auf der matte"),
        ("fr", "le chat ignore everything"),  # excluded group
    ]
    row = corpus_divergence(
        _df(spark, rows), "lang", "en", "de"
    ).collect()[0]
    na, nb, v, jsd = _replica(rows, "en", "de")
    assert (row["n_tokens_a"], row["n_tokens_b"], row["vocab_size"]) == (
        na,
        nb,
        v,
    )
    assert row["jsd"] == pytest.approx(jsd, abs=1e-12)
    # disjoint vocabularies diverge, bounded by ln 2 (add-1 smoothing
    # on a tiny corpus keeps the value modest but strictly positive)
    assert 0.0 < row["jsd"] < math.log(2)


def test_jsd_grows_as_counts_dominate_smoothing(spark):
    # same disjoint vocabularies, 60x the mass: the smoothed
    # distributions approach the true (disjoint) ones and jsd
    # approaches ln 2
    rows = [
        ("en", " ".join(["alpha beta gamma"] * 60)),
        ("de", " ".join(["delta epsilon zeta"] * 60)),
    ]
    big = corpus_divergence(
        _df(spark, rows), "lang", "en", "de"
    ).collect()[0]["jsd"]
    small = corpus_divergence(
        _df(spark, [("en", "alpha beta gamma"), ("de", "delta epsilon zeta")]),
        "lang",
        "en",
        "de",
    ).collect()[0]["jsd"]
    assert small < big < math.log(2)
    assert big > 0.5


def test_jsd_identical_corpora_is_zero(spark):
    rows = [("en", "same words here"), ("de", "same words here")]
    row = corpus_divergence(
        _df(spark, rows), "lang", "en", "de"
    ).collect()[0]
    assert row["jsd"] == pytest.approx(0.0, abs=1e-15)


def test_jsd_empty_group_raises(spark):
    rows = [("en", "only one side")]
    with pytest.raises(Exception):
        corpus_divergence(_df(spark, rows), "lang", "en", "de")
