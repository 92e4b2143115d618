"""best_snippets vs a pure-Python replica."""

import random

import pytest

from dxa_pagerank_spark.functions.snippets import best_snippets


def _replica(docs, terms, window):
    out = {}
    for did, text in docs:
        ts = [t for t in text.split(" ") if t]
        hits = [i for i, t in enumerate(ts) if t in terms]
        if not hits:
            continue
        best = None
        for s in hits:
            n = sum(1 for p in hits if s <= p < s + window)
            key = (-n, s)
            if best is None or key < best[0]:
                best = (key, s, n)
        _, s, n = best
        stop = min(s + window, len(ts))
        out[did] = (s, stop - 1, n, " ".join(ts[s:stop]))
    return out


def _check(spark, docs, terms, window):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (
            r["snip_start"],
            r["snip_end"],
            r["n_matches"],
            r["snippet"],
        )
        for r in best_snippets(df, terms, window=window).collect()
    }
    assert got == _replica(docs, set(terms), window)
    return got


def test_snippets_hand_cases(spark):
    docs = [
        # dense cluster late beats a lone early hit
        (0, "scan a b c d e f g h table scan table x"),
        (1, "no match here at all"),
        (2, "table"),  # window clamps at doc end
    ]
    got = _check(spark, docs, ["table", "scan"], window=4)
    assert got[0][2] == 3 and got[0][0] == 9
    assert 1 not in got
    assert got[2] == (0, 0, 1, "table")


def test_snippets_earliest_tie_break(spark):
    docs = [(0, "x table y y y y table z")]
    got = _check(spark, docs, ["table"], window=3)
    assert got[0][0] == 1  # both windows cover 1 match; earliest wins


def test_snippets_random(spark):
    rng = random.Random(17)
    vocab = ["table", "scan", "a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(0, 40))))
        for i in range(30)
    ]
    _check(spark, docs, ["table", "scan"], window=7)


def test_snippets_validates_args(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        best_snippets(df, [], window=5)
    with pytest.raises(ValueError):
        best_snippets(df, ["a"], window=0)


def test_phrase_matches_and_stats(spark):
    from dxa_pagerank_spark.functions.snippets import (
        phrase_matches,
        phrase_stats,
    )

    docs = [
        (0, "full table scan then another table scan here"),
        (1, "table only and scan apart table"),
        (2, "table scan"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["pos"])
        for r in phrase_matches(df, "table scan").collect()
    }
    assert got == {(0, 1), (0, 5), (2, 0)}
    stats = {
        r["id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_stats(df, "table scan").collect()
    }
    assert stats == {0: (2, 1), 2: (1, 0)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_matches(df, "  ")
