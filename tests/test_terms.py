"""term_topk / tfidf_topk vs Counter+math.log oracles."""

import math
from collections import Counter

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.terms import term_topk, tfidf_topk

DOCS = [
    (0, "spark scan spark join join join"),
    (1, "scan scan scan merge"),
    (2, "join merge  window"),  # double space -> empty token dropped
    (3, "window window spark"),
    (4, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _tok(text):
    return [t for t in text.split(" ") if t]


def test_term_topk(spark):
    got = [
        (r["term"], r["tf"], r["df"])
        for r in term_topk(_df(spark), k=3).collect()
    ]
    tf = Counter(t for _, x in DOCS for t in _tok(x))
    df = Counter(t for _, x in DOCS for t in set(_tok(x)))
    exp = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == [(t, c, df[t]) for t, c in exp]


def test_term_topk_tie_break_is_term_asc(spark):
    docs = spark.createDataFrame(
        [(0, "b a"), (1, "a b")], "doc_id long, text string"
    )
    got = [r["term"] for r in term_topk(docs, k=2).collect()]
    assert got == ["a", "b"]


def test_tfidf_topk(spark):
    got = {
        (r["doc_id"], r["term_rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
        for r in tfidf_topk(_df(spark), k=2).collect()
    }
    n = len(DOCS)
    df = Counter(t for _, x in DOCS for t in set(_tok(x)))
    for doc_id, text in DOCS:
        tf = Counter(_tok(text))
        scored = sorted(
            (
                (-tf[t] * math.log(n / df[t]), t, tf[t], df[t])
                for t in tf
            ),
        )
        for rank, (neg, t, tfv, dfv) in enumerate(scored[:2], start=1):
            term, gtf, gdf, gtfidf = got[(doc_id, rank)]
            assert (term, gtf, gdf) == (t, tfv, dfv)
            assert abs(gtfidf - round(-neg, 6)) < 1e-9
    # no rows for the empty doc, none past k
    assert all(r <= 2 for _, r in got)
    assert not any(d == 4 for d, _ in got)


def test_tfidf_plan_is_jvm_only(spark):
    plan = tfidf_topk(_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
