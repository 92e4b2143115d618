"""fiedler_vector (operators/spectral.py): NumPy replica of the exact
trajectory, plus spectral ground truth (numpy.linalg.eigh) on a
planted two-cluster graph."""

from __future__ import annotations

import numpy as np
import pytest

from dxa_pagerank_spark.operators.spectral import fiedler_vector

_KNUTH = 2654435761
_M32 = 4294967296


def _replica(edge_list, rounds):
    und = sorted({(min(s, d), max(s, d)) for s, d in edge_list if s != d})
    verts = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    d = A.sum(axis=1)
    sigma = d.max() + 1.0
    x = np.array(
        [((_KNUTH * v) % _M32) / float(_M32) - 0.5 for v in verts]
    )
    for _ in range(rounds):
        y = (sigma - d) * x + A @ x
        y = y - y.sum() / n
        norm = np.sqrt((y * y).sum()) or 1.0
        x = y / norm
    return {v: x[idx[v]] for v in verts}, verts, A, d


def _two_cliques(bridge=True):
    edges = []
    for grp in (range(0, 6), range(10, 16)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i < j:
                    edges.append((i, j))
    if bridge:
        edges.append((5, 10))
    return edges


def test_fiedler_matches_replica(spark):
    edges = _two_cliques()
    got = {
        r["id"]: r["fiedler"]
        for r in fiedler_vector(
            spark,
            spark.createDataFrame(edges, "src long, dst long"),
            rounds=10,
        ).collect()
    }
    exp, _, _, _ = _replica(edges, 10)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9)


def test_fiedler_sign_splits_planted_clusters(spark):
    edges = _two_cliques()
    got = {
        r["id"]: r["fiedler"]
        for r in fiedler_vector(
            spark,
            spark.createDataFrame(edges, "src long, dst long"),
            rounds=30,
        ).collect()
    }
    left = {v for v, f in got.items() if f < 0}
    right = {v for v, f in got.items() if f >= 0}
    assert {frozenset(left), frozenset(right)} == {
        frozenset(range(0, 6)),
        frozenset(range(10, 16)),
    }


def test_fiedler_aligns_with_eigh_ground_truth(spark):
    edges = _two_cliques()
    _, verts, A, d = _replica(edges, 1)
    L = np.diag(d) - A
    w, V = np.linalg.eigh(L)
    truth = V[:, np.argsort(w)[1]]  # second-smallest eigenvalue
    got = {
        r["id"]: r["fiedler"]
        for r in fiedler_vector(
            spark,
            spark.createDataFrame(edges, "src long, dst long"),
            rounds=40,
        ).collect()
    }
    vec = np.array([got[v] for v in verts])
    corr = abs(float(vec @ truth) / (np.linalg.norm(vec) or 1.0))
    assert corr > 0.999


def test_fiedler_rejects_bad_rounds(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        fiedler_vector(spark, df, rounds=0)
