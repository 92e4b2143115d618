"""Oracles for unigram LM scoring and benchmark decontamination."""

import math
from collections import Counter

from dxa_pagerank_spark.functions.lmscore import (
    contaminated_ids,
    decontaminate,
    unigram_logprob,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the the the the"),  # stuffed with the most common token -> LOW nll
    (2, "zyx wvu tsr"),  # rare tokens -> HIGH nll
    (3, "the cat ran"),
    (4, ""),
]


def _py_scores():
    toks = {i: [t for t in text.split(" ") if t] for i, text in DOCS}
    corpus = Counter(t for ts in toks.values() for t in ts)
    total = sum(corpus.values())
    out = {}
    for i, ts in toks.items():
        if not ts:
            out[i] = (0, 0.0)
            continue
        nll = sum(-math.log(corpus[t] / total) for t in ts)
        out[i] = (len(ts), round(nll / len(ts), 6))
    return out


def test_unigram_logprob_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["mean_neg_logprob"])
        for r in unigram_logprob(df).collect()
    }
    assert got == _py_scores()
    # orderings the filter relies on: stuffed < normal < gibberish
    assert got[1][1] < got[0][1] < got[2][1]


CONTAM_DOCS = [
    (0, "alpha beta gamma delta"),  # contains benchmark trigram
    (1, "beta gamma delta epsilon"),  # shares 'beta gamma delta'
    (2, "completely unrelated text here"),
    (3, "alpha beta unrelated"),  # bigram overlap only — NOT contaminated
    (4, "x"),
]
BENCH = [(100, "alpha beta gamma"), (101, "beta gamma delta")]


def test_decontamination_semi_join(spark):
    docs = spark.createDataFrame(CONTAM_DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    bad = sorted(r["id"] for r in contaminated_ids(docs, bench, n=3).collect())
    assert bad == [0, 1]
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()
    )
    assert kept == [2, 3, 4]
