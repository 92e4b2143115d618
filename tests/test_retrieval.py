"""BM25 retrieval (functions/retrieval.py) against a pure-Python
replica, plus ranking-shape properties."""

import math

import pytest

from dxa_pagerank_spark.functions.retrieval import bm25_topk

DOCS = [
    (0, "cat dog cat"),
    (1, "dog dog dog dog"),
    (2, "cat mouse"),
    (3, "bird"),
    (4, "cat cat cat dog mouse bird bird"),
]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {i: [t for t in s.split(" ") if t] for i, s in docs}
    n = len(toks)
    avg = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, qs in queries:
        scores = {}
        for term in qs.split(" "):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for i, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avg))
                scores[i] = scores.get(i, 0.0) + s
        out[qid] = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return out


def test_bm25_matches_python_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    queries = [(1, "cat dog"), (2, "mouse"), (3, "bird cat")]
    got = bm25_topk(df, queries, k=10).collect()
    ref = _py_bm25(DOCS, queries)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, expect in ref.items():
        rows = sorted(by_q[qid], key=lambda r: r["doc_rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in expect]
        for r, (_, s) in zip(rows, expect):
            assert r["score"] == pytest.approx(s, abs=1e-6)


def test_bm25_k_and_unmatched_query(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    rows = bm25_topk(df, [(1, "cat"), (2, "zebra")], k=2).collect()
    q1 = [r for r in rows if r["query_id"] == 1]
    assert len(q1) == 2 and [r["doc_rank"] for r in sorted(q1, key=lambda r: r["doc_rank"])] == [1, 2]
    # a query matching nothing returns no rows (not zero-score rows)
    assert [r for r in rows if r["query_id"] == 2] == []


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    plan = (
        bm25_topk(df, [(1, "cat dog")], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # top-k heap pushed into partials
    assert "BatchEvalPython" not in plan  # all JVM
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # query terms / idf reach the corpus as broadcasts
    assert plan.count("BroadcastHashJoin") >= 3
    # no second corpus shuffle for doc lengths: the only SortMergeJoin-
    # eligible join keys would be id; lengths ride the tf aggregate
    assert "SortMergeJoin" not in plan


def test_bm25_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, "doc_id INT, text STRING")
    # doc 2 is the only short doc containing both mouse (rare) hits
    rows = bm25_topk(df, [(1, "mouse")], k=1).collect()
    assert rows[0]["doc_id"] == 2  # tf equal (1), shorter doc wins
