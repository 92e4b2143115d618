"""temperature_sample / vocab_overlap / degree_skew_report vs
pure-Python replicas."""

from __future__ import annotations

import math

import pytest

from dxa_pagerank_spark.functions.sampling import (
    KNUTH,
    MOD,
    _FOLD,
    temperature_sample,
)
from dxa_pagerank_spark.functions.terms import vocab_overlap
from dxa_pagerank_spark.operators.graphstats import degree_skew_report


def _hash(key: int, salt: int = 0) -> int:
    return (((key + salt) % _FOLD) * KNUTH) % MOD


# ---------------------------------------------------------------- mixing


def _docs(spark):
    # 3 groups with sizes 60 / 30 / 10
    rows = [(i, "en" if i < 60 else ("de" if i < 90 else "fr")) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _temp_replica(rows, alpha):
    from collections import Counter

    counts = Counter(g for _, g in rows)
    n_min = min(counts.values())
    kept = []
    for k, g in rows:
        r = (n_min / counts[g]) ** (1.0 - alpha) if alpha != 0.5 else math.sqrt(
            n_min / counts[g]
        )
        if _hash(k) < int(r * MOD):
            kept.append((k, g))
    return sorted(kept)


@pytest.mark.parametrize("alpha", [0.5, 0.3, 1.0])
def test_temperature_sample_matches_replica(spark, alpha):
    df = _docs(spark)
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in temperature_sample(df, "doc_id", "lang", alpha=alpha).collect()
    )
    rows = [(r["doc_id"], r["lang"]) for r in df.collect()]
    assert got == _temp_replica(rows, alpha)


def test_temperature_sample_flattens_towards_equal(spark):
    from collections import Counter

    df = _docs(spark)
    kept = Counter(
        r["lang"]
        for r in temperature_sample(df, "doc_id", "lang", alpha=0.5).collect()
    )
    # smallest group kept in full; ratios compressed toward sqrt law
    assert kept["fr"] == 10
    assert kept["en"] < 60  # downsampled
    # expected en ~ 60*sqrt(10/60) ~ 24.5 — allow hash noise
    assert 12 <= kept["en"] <= 38


def test_temperature_sample_alpha_one_keeps_everything(spark):
    df = _docs(spark)
    assert temperature_sample(df, "doc_id", "lang", alpha=1.0).count() == 100


# ----------------------------------------------------------- vocab overlap


def test_vocab_overlap_matches_bruteforce(spark):
    rows = [
        (0, "en", "the cat sat"),
        (1, "en", "the dog ran"),
        (2, "de", "die katze cat"),
        (3, "de", "der hund the"),
        (4, "fr", "le chat cat the"),
        (5, "fr", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    vocab = {}
    for _, g, t in rows:
        vocab.setdefault(g, set()).update(w for w in t.split(" ") if w)
    expect = {}
    for a in sorted(vocab):
        for b in sorted(vocab):
            if a < b and vocab[a] & vocab[b]:
                inter = len(vocab[a] & vocab[b])
                expect[(a, b)] = (
                    len(vocab[a]),
                    len(vocab[b]),
                    inter,
                    inter / len(vocab[a] | vocab[b]),
                )
    got = {
        (r["group_a"], r["group_b"]): (
            r["vocab_a"],
            r["vocab_b"],
            r["n_shared"],
            r["jaccard"],
        )
        for r in vocab_overlap(df).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][:3] == expect[k][:3]
        assert got[k][3] == pytest.approx(expect[k][3], abs=1e-12)


# --------------------------------------------------------- degree skew


def _skew_replica(edges, direction, top_k):
    d = {(u, v) for u, v in edges if u != v}
    verts = sorted({x for e in d for x in e})
    key = 1 if direction == "in" else 0
    cnt = {v: 0 for v in verts}
    for e in d:
        cnt[e[key]] += 1
    degs = sorted(cnt.values())
    n, sd = len(degs), sum(degs)
    si = sum((i + 1) * x for i, x in enumerate(degs))
    gini = 2.0 * si / (n * sd) - (n + 1.0) / n

    def q(pct):
        thresh = -(-n * pct // 100)
        return degs[thresh - 1]

    # top_k by (degree desc, id asc)
    byid = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    share = sum(v for _, v in byid) / sd
    return {
        "n_vertices": n,
        "n_edges": sd,
        "max_deg": degs[-1],
        "p50": q(50),
        "p90": q(90),
        "p99": q(99),
        "gini": round(gini, 6),
        "topk_share": round(share, 6),
    }


@pytest.mark.parametrize("direction", ["in", "out"])
def test_degree_skew_report_matches_replica(spark, direction):
    # skewed graph: vertex 0 is a hub, plus an LCG tail and duplicates
    edges = [(i, 0) for i in range(1, 30)] + [(0, i) for i in range(1, 6)]
    x = 99991
    for _ in range(120):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % 40
        x = (1103515245 * x + 12345) % (1 << 31)
        edges.append((u, x % 40))
    edges += [(1, 0), (1, 0), (5, 5)]  # dupes + self-loop
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_skew_report(spark, df, direction=direction, top_k=3).collect()[0]
    expect = _skew_replica(edges, direction, top_k=3)
    got = row.asDict()
    assert {k: got[k] for k in expect} == pytest.approx(expect)
