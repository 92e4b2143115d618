"""k-means + SemDeDup (functions/clustering.py) vs NumPy replicas of
the deterministic contract (arithmetic init, fixed Lloyd iterations,
min-index ties, empty-cluster carry, keep-min-id pruning)."""

import numpy as np
import pytest

from dxa_pagerank_spark.functions.clustering import kmeans_assign, semdedup


def _mk(seed=3, n=60, dim=8):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, dim)) * 4
    vecs = np.vstack(
        [centers[i % 3] + rng.normal(size=dim) * 0.5 for i in range(n)]
    )
    return {i: vecs[i] for i in range(n)}


def _py_kmeans(vecs, k, iters):
    ids = sorted(vecs)
    n = len(ids)
    stride = max(n // k, 1)
    cents = [vecs[i].astype(float) for i in ids if i % stride == 0 and i < stride * k]

    def assign(c):
        out = {}
        for i in ids:
            d = [float(((vecs[i] - cj) ** 2).sum()) for cj in c]
            out[i] = int(np.argmin(d))  # np.argmin takes the first min
        return out

    for _ in range(iters):
        a = assign(cents)
        for j in range(k):
            members = [vecs[i] for i in ids if a[i] == j]
            if members:
                cents[j] = np.mean(members, axis=0)
    return assign(cents), cents


def _py_semdedup(vecs, assign, threshold):
    dup = set()
    ids = sorted(vecs)
    for i_pos, w in enumerate(ids):
        for u in ids[:i_pos]:
            if assign[u] != assign[w]:
                continue
            cos = float(
                vecs[u] @ vecs[w]
                / (np.linalg.norm(vecs[u]) * np.linalg.norm(vecs[w]))
            )
            if cos >= threshold:
                dup.add(w)
                break
    return dup


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )


def test_kmeans_matches_numpy_replica(spark):
    vecs = _mk()
    got, cents = kmeans_assign(_df(spark, vecs), k=3, iters=2)
    ref_assign, ref_cents = _py_kmeans(vecs, 3, 2)
    rows = {r["id"]: r["cluster"] for r in got.collect()}
    assert rows == ref_assign
    for c, rc in zip(cents, ref_cents):
        assert np.allclose(c, rc, atol=1e-9)


def test_kmeans_recovers_planted_clusters(spark):
    vecs = _mk(seed=11)
    got, _ = kmeans_assign(_df(spark, vecs), k=3, iters=3)
    rows = {r["id"]: r["cluster"] for r in got.collect()}
    # planted structure: ids congruent mod 3 share a center; the
    # cluster labels must be constant within each residue class
    for r in range(3):
        labels = {rows[i] for i in vecs if i % 3 == r}
        assert len(labels) == 1


def test_semdedup_matches_replica_and_marks_clones(spark):
    vecs = _mk(seed=5, n=45)
    vecs[40] = vecs[1].copy()  # exact clone -> cos 1.0 with id 1
    df = _df(spark, vecs)
    got = {r["id"]: (r["cluster"], r["is_dup"]) for r in
           semdedup(df, k=3, iters=2, threshold=0.95).collect()}
    ref_assign, _ = _py_kmeans(vecs, 3, 2)
    dup = _py_semdedup(vecs, ref_assign, 0.95)
    assert got[40][1] is True and 40 in dup
    assert {i for i, (_, d) in got.items() if d} == dup


def test_semdedup_max_cluster_guard(spark):
    vecs = _mk(seed=7, n=30)
    with pytest.raises(ValueError):
        semdedup(_df(spark, vecs), k=3, iters=1, max_cluster=5)
