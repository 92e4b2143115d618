"""fuzzy_term_matches vs a brute-force Levenshtein replica."""

import random

from dxa_pagerank_spark.functions.fuzzy import fuzzy_term_matches


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _replica(vocab, queries):
    return {
        (q, t, _lev(q, t))
        for q in queries
        for t in vocab
        if _lev(q, t) <= 1
    }


def _check(spark, vocab, queries):
    vdf = spark.createDataFrame([(t,) for t in vocab], "term string")
    qdf = spark.createDataFrame([(q,) for q in queries], "q string")
    got = {
        (r["q"], r["term"], r["dist"])
        for r in fuzzy_term_matches(vdf, qdf).collect()
    }
    assert got == _replica(vocab, queries)
    return got


def test_fuzzy_edit_classes(spark):
    vocab = ["table", "scan", "spark", "stark", "tale"]
    # deletion, insertion, substitution, exact, and a no-match
    got = _check(
        spark, vocab, ["tble", "tables", "scon", "spark", "zzz"]
    )
    assert ("tble", "table", 1) in got
    assert ("tables", "table", 1) in got
    assert ("scon", "scan", 1) in got
    assert ("spark", "spark", 0) in got
    assert ("spark", "stark", 1) in got
    assert not any(q == "zzz" for q, _, _ in got)


def test_fuzzy_random_exhaustive(spark):
    rng = random.Random(27)
    alphabet = "abc"
    vocab = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 5)))
            for _ in range(30)
        }
    )
    queries = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 5)))
            for _ in range(15)
        }
    )
    _check(spark, vocab, queries)
