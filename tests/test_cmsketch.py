"""Count-Min sketch vs a pure-Python replica + the CM guarantees."""

import hashlib
import random
from collections import Counter

from dxa_pagerank_spark.functions.cmsketch import (
    A,
    B,
    P,
    cm_estimate,
    cm_sketch,
)


def _key(term):
    return int(hashlib.md5(term.encode()).hexdigest()[:12], 16)


def _cell(k, row, width):
    return ((A * ((k + B + row * 40503) % P)) % P) % width


def _replica_sketch(docs, width, depth):
    cells = Counter()
    for _, text in docs:
        for t in text.split(" "):
            if t:
                k = _key(t)
                for r in range(depth):
                    cells[(r, _cell(k, r, width))] += 1
    return cells


def _replica_estimate(docs, terms, width, depth):
    cells = _replica_sketch(docs, width, depth)
    return {
        t: min(cells.get((r, _cell(_key(t), r, width)), 0)
               for r in range(depth))
        for t in terms
    }


def test_sketch_cells_match_replica(spark):
    docs = [(0, "a b a c"), (1, "b b z"), (2, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cm_sketch(df, width=16, depth=3).collect()
    }
    assert got == dict(_replica_sketch(docs, 16, 3))


def test_estimate_never_undercounts_and_is_tight_when_wide(spark):
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(50)))
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    true = Counter(t for _, x in docs for t in x.split(" ") if t)
    terms = spark.createDataFrame([(t,) for t in vocab], "term string")
    # narrow sketch: estimates must match the replica and never be
    # below the true counts (the CM one-sided error guarantee)
    got = {
        r["term"]: r["est"]
        for r in cm_estimate(df, terms, width=32, depth=4).collect()
    }
    assert got == _replica_estimate(docs, vocab, 32, 4)
    assert all(got[t] >= true[t] for t in vocab)
    # wide sketch: few collisions -> estimates exact for most terms
    wide = {
        r["term"]: r["est"]
        for r in cm_estimate(df, terms, width=4096, depth=4).collect()
    }
    exact = sum(1 for t in vocab if wide[t] == true[t])
    assert exact >= int(0.9 * len(vocab))


def test_unknown_term_estimates_from_zero_cells(spark):
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    terms = spark.createDataFrame([("nosuch",)], "term string")
    got = cm_estimate(df, terms, width=4096, depth=4).collect()
    assert got[0]["est"] == 0
