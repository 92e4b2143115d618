"""TextRank keyword extraction vs a pure-Python replica."""

import random
from collections import Counter

import pytest

from dxa_pagerank_spark.functions.textrank import (
    cooccurrence_edges,
    textrank_keywords,
)


def _replica_edges(docs, window):
    und = Counter()
    for _, text in docs:
        ts = [t for t in text.split(" ") if t]
        for i in range(len(ts)):
            for j in range(i + 1, min(i + window, len(ts) - 1) + 1):
                if ts[i] != ts[j]:
                    und[(min(ts[i], ts[j]), max(ts[i], ts[j]))] += 1
    return und


def _replica_scores(docs, window, damping, rounds):
    und = _replica_edges(docs, window)
    nbrs = {}
    sumw = Counter()
    for (u, v), w in und.items():
        nbrs.setdefault(u, []).append((v, w))
        nbrs.setdefault(v, []).append((u, w))
        sumw[u] += w
        sumw[v] += w
    scores = {t: 1.0 for t in nbrs}
    for _ in range(rounds):
        scores = {
            u: (1.0 - damping)
            + damping
            * sum(w / sumw[v] * scores[v] for v, w in nbrs[u])
            for u in nbrs
        }
    return {t: round(s, 6) for t, s in scores.items()}


def test_cooccurrence_edges(spark):
    docs = [(0, "a b c a"), (1, "b c"), (2, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["u"], r["v"]): r["w"]
        for r in cooccurrence_edges(df, window=2).collect()
    }
    assert got == dict(_replica_edges(docs, 2))
    # window 2 over "a b c a": (a,b) (a,c)x2 (b,c)x2 ... plus doc 1
    assert got[("a", "c")] == 2


def test_textrank_hand_corpus(spark):
    docs = [
        (0, "spark rank graph rank spark"),
        (1, "graph rank web graph"),
        (2, "web spark web"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["term"]: r["score"]
        for r in textrank_keywords(df, window=2, rounds=10, top_k=10).collect()
    }
    want = _replica_scores(docs, 2, 0.85, 10)
    assert set(got) == set(want)
    for t in got:
        assert got[t] == pytest.approx(want[t], abs=2e-6)


def test_textrank_top_k_order_and_truncation(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(20)))
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = textrank_keywords(df, window=3, rounds=6, top_k=5).collect()
    assert len(rows) == 5
    want = _replica_scores(docs, 3, 0.85, 6)
    ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["term"] for r in rows] == [t for t, _ in ordered]


def test_textrank_isolated_tokens_excluded(spark):
    # a single-token document contributes no vertices at all
    df = spark.createDataFrame(
        [(0, "alone"), (1, "x y")], "doc_id long, text string"
    )
    rows = textrank_keywords(df, window=2, rounds=3, top_k=10).collect()
    assert {r["term"] for r in rows} == {"x", "y"}


def test_pmi_neighbors_replica(spark):
    import math
    from collections import Counter

    from dxa_pagerank_spark.functions.textrank import pmi_neighbors

    docs = [
        (0, "a b a b c d"),
        (1, "a b c c d a b"),
        (2, "e f e f"),
    ]
    und = Counter()
    for _, t in docs:
        ts = t.split(" ")
        for i in range(len(ts)):
            for j in range(i + 1, min(i + 2, len(ts) - 1) + 1):
                if ts[i] != ts[j]:
                    und[(min(ts[i], ts[j]), max(ts[i], ts[j]))] += 1
    und = {k: w for k, w in und.items() if w >= 2}
    ed = {}
    for (u, v), w in und.items():
        ed[(u, v)] = w
        ed[(v, u)] = w
    sumw = Counter()
    for (u, _), w in ed.items():
        sumw[u] += w
    t = sum(ed.values())
    want = {}
    for (u, v), w in ed.items():
        want.setdefault(u, []).append(
            (v, w, round(math.log(w * t / (sumw[u] * sumw[v])), 6))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in pmi_neighbors(df, window=2, top_k=5, min_count=2).collect():
        got.setdefault(r["term"], []).append(
            (r["neighbor"], r["w"], r["pmi"], r["nbr_rank"])
        )
    assert set(got) == set(want)
    for u in want:
        ranked = sorted(want[u], key=lambda x: (-x[2], x[0]))[:5]
        got[u].sort(key=lambda x: x[3])
        assert [(v, w) for v, w, _, _ in got[u]] == [
            (v, w) for v, w, _ in ranked
        ]
