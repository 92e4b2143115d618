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


BUCKET_DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the the the the", "en"),
    (2, "zyx wvu tsr", "en"),
    (3, "the cat ran", "en"),
    (4, "", "en"),
    (5, "the mat sat", "en"),
    (6, "cat cat cat", "en"),
    (7, "le chat noir", "fr"),
    (8, "le le le", "fr"),
    (9, "zut alors bizarre", "fr"),
    (10, "", "fr"),
]


def _quantile_cont(sorted_vals, p):
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = int(pos)
    frac = pos - lo
    if lo + 1 >= n:
        return sorted_vals[-1]
    return sorted_vals[lo] + (sorted_vals[lo + 1] - sorted_vals[lo]) * frac


def _py_buckets():
    import math
    from collections import Counter

    toks = {
        i: [t for t in text.split(" ") if t] for i, text, _ in BUCKET_DOCS
    }
    corpus = Counter(t for ts in toks.values() for t in ts)
    total = sum(corpus.values())
    scores, langs = {}, {}
    for i, _, lang in BUCKET_DOCS:
        langs[i] = lang
        ts = toks[i]
        scores[i] = (
            round(sum(-math.log(corpus[t] / total) for t in ts) / len(ts), 6)
            if ts
            else 0.0
        )
    cuts = {}
    for lang in set(langs.values()):
        vals = sorted(
            scores[i] for i in scores if langs[i] == lang and toks[i]
        )
        cuts[lang] = (
            round(_quantile_cont(vals, 1.0 / 3), 6),
            round(_quantile_cont(vals, 2.0 / 3), 6),
        )
    out = {}
    for i in scores:
        if not toks[i]:
            out[i] = "empty"
        elif scores[i] <= cuts[langs[i]][0]:
            out[i] = "head"
        elif scores[i] <= cuts[langs[i]][1]:
            out[i] = "middle"
        else:
            out[i] = "tail"
    return scores, out


def test_perplexity_buckets_match_python(spark):
    from dxa_pagerank_spark.functions.lmscore import perplexity_buckets

    df = spark.createDataFrame(
        BUCKET_DOCS, "doc_id long, text string, lang string"
    )
    got = {
        r["id"]: (r["score"], r["bucket"])
        for r in perplexity_buckets(df).collect()
    }
    want_scores, want_buckets = _py_buckets()
    assert {k: v[1] for k, v in got.items()} == want_buckets
    for i, s in want_scores.items():
        assert got[i][0] == s
    # every non-empty language band is populated
    bands = {v[1] for v in got.values()}
    assert {"head", "middle", "tail", "empty"} <= bands


def test_perplexity_buckets_plan_is_jvm_only(spark):
    from dxa_pagerank_spark.functions.lmscore import perplexity_buckets

    df = spark.createDataFrame(
        BUCKET_DOCS, "doc_id long, text string, lang string"
    )
    plan = (
        perplexity_buckets(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan
