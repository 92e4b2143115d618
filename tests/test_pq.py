"""Product quantization vs a pure-Python replica of the deterministic
Lloyd + ADC contract."""

import random

import pytest

from dxa_pagerank_spark.functions.clustering import (
    pq_encode,
    pq_topk,
    pq_train,
)


def _kmeans_replica(vecs, k, iters):
    """vecs: {id: tuple}; replicates kmeans_assign's contract."""
    n = len(vecs)
    stride = max(n // k, 1)
    init_ids = sorted(
        i for i in vecs if i % stride == 0 and i < stride * k
    )
    cents = [list(vecs[i]) for i in init_ids]

    def assign(v):
        return min(
            range(len(cents)),
            key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(v, cents[c])),
                c,
            ),
        )

    for _ in range(iters):
        groups = {}
        for i, v in vecs.items():
            groups.setdefault(assign(v), []).append(v)
        cents = [
            [sum(col) / len(g) for col in zip(*g)] if (g := groups.get(c))
            else cents[c]
            for c in range(len(cents))
        ]
    return cents, assign


def _replica(vecs, m, k, iters, queries, topk):
    dim = len(next(iter(vecs.values())))
    d_sub = dim // m
    books, assigns = [], []
    for s in range(m):
        sub = {i: v[s * d_sub : (s + 1) * d_sub] for i, v in vecs.items()}
        cents, assign = _kmeans_replica(sub, k, iters)
        books.append(cents)
        assigns.append({i: assign(v) for i, v in sub.items()})
    out = {}
    for qid in queries:
        qv = vecs[qid]
        dists = []
        for i in vecs:
            d = 0.0
            for s in range(m):
                c = books[s][assigns[s][i]]
                qs = qv[s * d_sub : (s + 1) * d_sub]
                d = d + sum((a - b) ** 2 for a, b in zip(qs, c))
            dists.append((round(d, 6), i))
        dists.sort()
        out[qid] = dists[:topk]
    return books, assigns, out


def _vecs(seed, n=40, dim=8):
    rng = random.Random(seed)
    return {
        i: tuple(round(rng.uniform(-1, 1), 3) for _ in range(dim))
        for i in range(n)
    }


def test_pq_codebooks_and_codes_match_replica(spark):
    vecs = _vecs(1)
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(df, m=2, k=4, iters=2)
    want_books, want_assigns, _ = _replica(vecs, 2, 4, 2, [], 0)
    for s in range(2):
        for got_c, want_c in zip(books[s], want_books[s]):
            assert got_c == pytest.approx(want_c, abs=1e-12)
    codes = {
        r["id"]: (r["code_0"], r["code_1"])
        for r in pq_encode(df, books).collect()
    }
    for i in vecs:
        assert codes[i] == (want_assigns[0][i], want_assigns[1][i])


def test_pq_topk_matches_replica(spark):
    vecs = _vecs(2)
    df = spark.createDataFrame(
        [(i, list(v)) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(df, m=4, k=4, iters=2)
    queries = df.filter("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    got = {}
    for r in pq_topk(df, queries, books, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["adc_dist"], r["vec_id"])
        )
    _, _, want = _replica(vecs, 4, 4, 2, [0, 1, 2], 5)
    for qid in want:
        got[qid].sort()
        assert [v for _, v in got[qid]] == [v for _, v in want[qid]]
        for (gd, _), (wd, _) in zip(got[qid], want[qid]):
            assert gd == pytest.approx(wd, abs=1e-6)


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pq_train(df, m=2)
