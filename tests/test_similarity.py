"""Similarity-search tests vs NumPy oracles."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


def _emb_df(spark, vecs):
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    return spark.createDataFrame(pdf)


def _numpy_topk(vecs, query_ids, k):
    v = np.asarray(vecs)
    norms = np.linalg.norm(v, axis=1)
    out = {}
    for q in query_ids:
        cos = (v @ v[q]) / (norms * norms[q])
        order = sorted(range(len(v)), key=lambda i: (-cos[i], i))[:k]
        out[q] = [(i, round(float(cos[i]), 6)) for i in order]
    return out


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16))
    df = _emb_df(spark, vecs)
    queries = df.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id"
    )
    got = brute_force_topk(df, queries, k=5).collect()
    expected = _numpy_topk(vecs, [0, 1, 2], 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    for q in (0, 1, 2):
        assert [i for i, _ in by_q[q]] == [i for i, _ in expected[q]]
        np.testing.assert_allclose(
            [c for _, c in by_q[q]], [c for _, c in expected[q]], atol=2e-6
        )


def test_lsh_topk_recall(spark):
    rng = np.random.default_rng(11)
    # clustered data so LSH has structure to find
    centers = rng.standard_normal((10, 64)) * 3
    vecs = np.vstack([c + rng.standard_normal((30, 64)) * 0.5 for c in centers])
    df = _emb_df(spark, vecs)
    queries = df.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    exact = brute_force_topk(df, queries, k=10).collect()
    approx = lsh_topk(df, queries, k=10, dim=64, seed=7).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6  # deterministic given fixed seeds
    # every approx similarity value must be exact (re-ranked with true cosine)
    exact_all = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in brute_force_topk(df, df.withColumnRenamed("vec_id", "query_id")
                                  .filter(F.col("query_id") < 5), k=300).collect()
    }
    for r in approx:
        assert abs(exact_all[(r["query_id"], r["vec_id"])] - r["cos_sim"]) <= 1e-6


def test_embedding_near_dup_planted(spark):
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((100, 64))
    vecs = np.vstack([vecs, vecs[0], vecs[1] + rng.standard_normal(64) * 0.01])
    df = _emb_df(spark, vecs)
    got = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_dup_pairs(df, 0.95).collect()
    }
    assert (0, 100) in got  # exact copy, cosine 1.0
    assert (1, 101) in got  # tiny perturbation, cosine ~0.9999
    # verify no false positives vs numpy
    v = np.asarray(vecs)
    norms = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(norms, norms)
    truth = {
        (a, b)
        for a in range(len(v))
        for b in range(a + 1, len(v))
        if cos[a, b] >= 0.95
    }
    assert got <= truth
