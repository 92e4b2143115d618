"""Reciprocal-rank fusion vs a pure-Python replica."""

import random

import pytest

from dxa_pagerank_spark.functions.fusion import rrf_fuse


def _replica(signals, k, top_m, n_out):
    ranks = {}
    for name, rows in signals:
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))[:top_m]
        ranks[name] = {doc: i + 1 for i, (doc, _) in enumerate(ordered)}
    ids = {d for r in ranks.values() for d in r}
    fused = []
    for d in ids:
        score = sum(
            1.0 / (k + ranks[n][d]) for n, _ in signals if d in ranks[n]
        )
        fused.append(
            (
                d,
                *(ranks[n].get(d, 0) for n, _ in signals),
                round(score, 6),
            )
        )
    fused.sort(key=lambda t: (-t[-1], t[0]))
    return fused[:n_out]


def _run(spark, signals, k=60, top_m=100, n_out=20):
    dfs = [
        (name, spark.createDataFrame(rows, "id long, score double"))
        for name, rows in signals
    ]
    got = [
        tuple(r) for r in rrf_fuse(dfs, k=k, top_m=top_m, n_out=n_out).collect()
    ]
    want = _replica(signals, k, top_m, n_out)
    assert got == want


def test_fusion_hand_case(spark):
    a = [(1, 0.9), (2, 0.8), (3, 0.7)]
    b = [(3, 5.0), (1, 4.0), (4, 3.0)]
    _run(spark, [("a", a), ("b", b)], k=60, top_m=10, n_out=10)


def test_fusion_truncation_drops_low_ranks(spark):
    # doc 9 is ranked only below top_m in signal a and absent from b ->
    # it must not appear in the fused output at all
    a = [(i, 100.0 - i) for i in range(10)]
    b = [(0, 1.0), (1, 0.5)]
    dfs = [
        ("a", spark.createDataFrame(a, "id long, score double")),
        ("b", spark.createDataFrame(b, "id long, score double")),
    ]
    out = rrf_fuse(dfs, k=60, top_m=5, n_out=20).collect()
    ids = {r["id"] for r in out}
    assert ids == {0, 1, 2, 3, 4}
    _run(spark, [("a", a), ("b", b)], top_m=5)


def test_fusion_tie_break_by_id(spark):
    # equal scores everywhere: ranks and fused order fall back to id
    a = [(5, 1.0), (3, 1.0), (7, 1.0)]
    _run(spark, [("a", a)], k=60, top_m=10, n_out=3)


def test_fusion_random(spark):
    rng = random.Random(4)
    sigs = []
    for name in ("x", "y", "z"):
        rows = [
            (i, round(rng.random(), 3))
            for i in rng.sample(range(60), 40)
        ]
        sigs.append((name, rows))
    _run(spark, sigs, k=60, top_m=25, n_out=15)


def test_fusion_empty_signals_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
