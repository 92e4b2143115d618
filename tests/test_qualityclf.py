"""Hashed linear quality classifier vs a pure-Python replica."""

import math
import re

import pytest

from dxa_pagerank_spark.functions.qualityclf import (
    quality_classifier,
    standin_weights,
)
from dxa_pagerank_spark.functions.sampling import KNUTH

FNV_OFFSET = 2166136261
FNV_PRIME = 16777619
M32 = 1 << 32


def _fnv(tok: str) -> int:
    h = FNV_OFFSET
    for c in tok:
        h = ((h ^ ord(c)) * FNV_PRIME) % M32
    return h


def _feats(text: str, B: int):
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    grams = toks + [
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ]
    return [_fnv(g) % B for g in grams]


def _weight(bucket: int, salt: int = 97) -> float:
    return (((bucket + salt) % (1 << 31)) * KNUTH) % M32 / M32 - 0.5


def _oracle(docs, B, bias=0.0, salt=97):
    out = {}
    for doc_id, text in docs:
        buckets = _feats(text, B)
        score = bias + (
            sum(_weight(b, salt) for b in buckets) / len(buckets)
            if buckets
            else 0.0
        )
        prob = 1.0 / (1.0 + math.exp(-score))
        out[doc_id] = (len(buckets), score, prob, score >= 0)
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spam spam SPAM buy now!!! cheap cheap"),
    (3, ""),
    (4, "???!!!"),  # tokenizes to nothing
    (5, "a"),  # single token, no bigrams
    (6, "data pipelines need deterministic filters, not vibes."),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_classifier_matches_replica(spark):
    got = {
        r["id"]: (r["n_feats"], r["score"], r["prob"], r["keep"])
        for r in quality_classifier(_docs_df(spark), n_buckets=64).collect()
    }
    want = _oracle(DOCS, 64)
    assert set(got) == set(want)
    for k, (n, s, p, keep) in want.items():
        gn, gs, gp, gkeep = got[k]
        assert gn == n
        assert gs == pytest.approx(s, abs=1e-12)
        assert gp == pytest.approx(p, abs=1e-12)
        assert gkeep == keep


def test_zero_feature_doc_scores_bias(spark):
    rows = {
        r["id"]: r
        for r in quality_classifier(
            _docs_df(spark), n_buckets=32, bias=-1.5
        ).collect()
    }
    for empty_id in (3, 4):
        assert rows[empty_id]["n_feats"] == 0
        assert rows[empty_id]["score"] == pytest.approx(-1.5)
        assert rows[empty_id]["keep"] is False


def test_trained_weights_table_is_used(spark):
    # all-positive weights => every non-empty doc keeps; empty docs
    # sit exactly at bias
    B = 16
    w = spark.createDataFrame(
        [(b, 0.25) for b in range(B)], "bucket long, weight double"
    )
    rows = quality_classifier(_docs_df(spark), weights=w, n_buckets=B)
    for r in rows.collect():
        if r["n_feats"] > 0:
            assert r["score"] == pytest.approx(0.25, abs=1e-12)
            assert r["keep"] is True
        else:
            assert r["score"] == 0.0
            assert r["keep"] is True  # score 0 >= 0


def test_standin_weights_match_replica(spark):
    got = {
        r["bucket"]: r["weight"]
        for r in standin_weights(spark, 64).collect()
    }
    for b in range(64):
        assert got[b] == pytest.approx(_weight(b), abs=0)


def test_classifier_plan_is_jvm_only(spark):
    plan = (
        quality_classifier(_docs_df(spark), n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan
    assert "BroadcastHashJoin" in plan  # weight table is broadcast
