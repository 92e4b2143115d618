"""TrustRank / spam mass vs a NumPy replica (SURVEY.md §5.2)."""

import numpy as np
import pytest

from dxa_pagerank_spark.datagen import edges_to_spark, fast_synthetic_edges
from dxa_pagerank_spark.operators.ppr import personalized_pagerank
from dxa_pagerank_spark.operators.trustrank import spam_mass, trustrank


def _ppr_np(n, src, dst, seeds, d, rounds):
    """seeds=None -> uniform teleport over the edge-endpoint vertex
    set (operators/ppr.py semantics)."""
    verts = np.zeros(n, dtype=bool)
    verts[src] = True
    verts[dst] = True
    out_deg = np.bincount(src, minlength=n).astype(float)
    s = np.zeros(n)
    if seeds is None:
        s[verts] = 1.0 / verts.sum()
    else:
        s[list(seeds)] = 1.0 / len(seeds)
    p = s.copy()
    w = 1.0 / np.maximum(out_deg[src], 1.0)
    dang = (out_deg == 0) & verts
    for _ in range(rounds):
        m = p[dang].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, p[src] * w)
        p = (1 - d) * s + d * (contrib + m * s)
    return p, verts


def test_uniform_seeds_none_matches_oracle(spark):
    n = 200
    src, dst = fast_synthetic_edges(n, 3, seed=21)
    want, verts = _ppr_np(n, src, dst, None, 0.85, rounds=6)
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            spark, edges_to_spark(spark, src, dst), seeds=None, rounds=6
        ).collect()
    }
    assert set(got) == set(np.flatnonzero(verts))
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_uniform_mass_conservation(spark):
    src, dst = fast_synthetic_edges(150, 2, seed=8)
    res = personalized_pagerank(
        spark, edges_to_spark(spark, src, dst), seeds=None, rounds=8
    )
    total = sum(r["rank"] for r in res.collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_spam_mass_matches_oracle(spark):
    n = 200
    src, dst = fast_synthetic_edges(n, 3, seed=23)
    trusted = [1, 51, 101, 151]
    pr, verts = _ppr_np(n, src, dst, None, 0.85, rounds=8)
    tr, _ = _ppr_np(n, src, dst, trusted, 0.85, rounds=8)
    got = {
        r["id"]: r
        for r in spam_mass(
            spark, edges_to_spark(spark, src, dst), trusted, rounds=8
        ).collect()
    }
    assert set(got) == set(np.flatnonzero(verts))
    for i, row in got.items():
        assert row["pagerank"] == pytest.approx(pr[i], rel=1e-12)
        assert row["trustrank"] == pytest.approx(tr[i], rel=1e-12)
        assert row["spam_mass"] == pytest.approx(pr[i] - tr[i], abs=1e-12)
        assert row["rel_spam_mass"] == pytest.approx(
            (pr[i] - tr[i]) / pr[i], rel=1e-9
        )


def test_trustrank_seed_bias(spark):
    """A farm of pages linking only to each other earns spam mass; the
    trusted cluster doesn't."""
    # trusted cluster 0-2 interlinked; spam farm 3-5 interlinked
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    res = {
        r["id"]: r["rel_spam_mass"]
        for r in spam_mass(
            spark, edges_to_spark(spark, src, dst), trusted=[0], rounds=20
        ).collect()
    }
    assert max(res[i] for i in (0, 1, 2)) < 0.2
    assert min(res[i] for i in (3, 4, 5)) > 0.9


def test_trustrank_equals_ppr(spark):
    src, dst = fast_synthetic_edges(100, 2, seed=4)
    e = edges_to_spark(spark, src, dst)
    a = {r["id"]: r["rank"] for r in trustrank(spark, e, [1, 2], rounds=5).collect()}
    b = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(spark, e, [1, 2], rounds=5).collect()
    }
    assert a == b
