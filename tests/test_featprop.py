"""Feature propagation vs a pure-Python fold-order-exact replica."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.featprop import smooth_features


def _replica(edges, feats):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for vid, vec in feats.items():
        nbrs = sorted(
            u for u in adj.get(vid, ()) if u in feats
        )
        for pos, x in enumerate(vec):
            s = 0.0
            for u in nbrs:  # ascending-id left fold, like the engine
                s += feats[u][pos]
            out[(vid, pos)] = (x + s) / (1 + len(nbrs))
    return out


def test_smooth_features_matches_replica(spark):
    feats = {
        0: [1.0, 0.5, -2.0],
        1: [0.25, 0.125, 4.0],
        2: [3.0, -1.0, 0.0],
        3: [0.1, 0.2, 0.3],
        7: [9.0, 9.0, 9.0],  # isolated: unchanged
    }
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (5, 0), (0, 0), (1, 0)]
    # vertex 5 has no feature row -> excluded from 0's mean
    fdf = spark.createDataFrame(
        [(k, v) for k, v in sorted(feats.items())],
        "vec_id long, embedding array<double>",
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["id"], r["pos"]): r["value"]
        for r in smooth_features(edf, fdf).collect()
    }
    expect = _replica(edges, feats)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=0.0), k  # bit-exact


def test_smooth_features_mean_bounds(spark):
    # smoothing a constant field is identity
    fdf = spark.createDataFrame(
        [(i, [5.0, -1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    edf = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    for r in smooth_features(edf, fdf).collect():
        assert r["value"] == (5.0 if r["pos"] == 0 else -1.0)
