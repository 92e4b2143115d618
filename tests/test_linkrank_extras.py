"""HITS / k-core / personalized PageRank vs independent NumPy oracles
on fixture graphs (exact semantics, multiplicity / symmetrize rules)."""

import numpy as np

from dxa_pagerank_spark.datagen import (
    FIXTURE_GRAPHS,
    edges_to_spark,
    parse_in_edge_list,
    synthetic_edges,
)
from dxa_pagerank_spark.operators.hits import hits
from dxa_pagerank_spark.operators.kcore import k_core
from dxa_pagerank_spark.operators.ppr import personalized_pagerank


def _hits_oracle(n, src, dst, rounds):
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(rounds):
        a = np.zeros(n)
        np.add.at(a, dst, hub[src])
        a /= a.sum() or 1.0
        h = np.zeros(n)
        np.add.at(h, src, a[dst])
        h /= h.sum() or 1.0
        auth, hub = a, h
    return auth, hub


def _kcore_oracle(n, src, dst, k):
    pairs = {(u, v) for u, v in zip(src.tolist(), dst.tolist()) if u != v}
    pairs |= {(v, u) for u, v in pairs}
    alive = set(range(n))
    while True:
        deg = {u: 0 for u in alive}
        for u, v in pairs:
            if u in alive and v in alive:
                deg[u] += 1
        nxt = {u for u in alive if deg.get(u, 0) >= k}
        if nxt == alive:
            break
        alive = nxt
        if not alive:
            break
    return {
        u: sum(1 for (a, b) in pairs if a == u and b in alive)
        for u in alive
    }


def _ppr_oracle(n, src, dst, seeds, d, rounds):
    out_deg = np.bincount(src, minlength=n).astype(float)
    s = np.zeros(n)
    s[list(seeds)] = 1.0 / len(seeds)
    p = s.copy()
    w = np.zeros(len(src))
    w = 1.0 / out_deg[src]
    dang = out_deg == 0
    for _ in range(rounds):
        m = p[dang].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, p[src] * w)
        p = (1 - d) * s + d * (contrib + m * s)
    return p


def test_hits_matches_oracle(spark):
    for name in ("g7_readme", "g_dangling", "g_dup"):
        n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS[name])
        auth, hub = _hits_oracle(n, src, dst, rounds=5)
        got = {
            r["id"]: (r["auth"], r["hub"])
            for r in hits(
                spark, edges_to_spark(spark, src, dst), rounds=5,
                num_partitions=4,
            ).collect()
        }
        for i in range(n):
            a, h = got.get(i, (0.0, 0.0))
            assert abs(a - auth[i]) < 1e-9, (name, i)
            assert abs(h - hub[i]) < 1e-9, (name, i)


def test_hits_synthetic(spark):
    n = 500
    src, dst = synthetic_edges(n, 0.6, 5, 9, n_slaves=1)
    auth, hub = _hits_oracle(n, src, dst, rounds=4)
    got = {
        r["id"]: (r["auth"], r["hub"])
        for r in hits(
            spark, edges_to_spark(spark, src, dst), rounds=4, num_partitions=4
        ).collect()
    }
    for i in range(n):
        a, h = got.get(i, (0.0, 0.0))
        assert abs(a - auth[i]) < 1e-9
        assert abs(h - hub[i]) < 1e-9


def test_kcore_matches_oracle(spark):
    for name, k in (("g_triangles", 3), ("g_components", 2), ("g7_readme", 2)):
        n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS[name])
        want = _kcore_oracle(n, src, dst, k)
        got = {
            r["id"]: r["degree"]
            for r in k_core(
                spark, edges_to_spark(spark, src, dst), k=k, num_partitions=4
            ).collect()
        }
        assert got == want, name


def test_kcore_empty_when_too_dense_requirement(spark):
    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS["g7_readme"])
    got = k_core(spark, edges_to_spark(spark, src, dst), k=50).collect()
    assert got == []


def test_ppr_matches_oracle(spark):
    for name in ("g7_readme", "g_dangling", "g_dup"):
        n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS[name])
        seeds = [0, min(2, n - 1)]
        want = _ppr_oracle(n, src, dst, seeds, 0.85, rounds=5)
        got = {
            r["id"]: r["rank"]
            for r in personalized_pagerank(
                spark, edges_to_spark(spark, src, dst), seeds, rounds=5,
                num_partitions=4,
            ).collect()
        }
        for i in range(n):
            assert abs(got.get(i, 0.0) - want[i]) < 1e-12, (name, i)


def test_ppr_mass_conservation(spark):
    n = 300
    src, dst = synthetic_edges(n, 0.6, 5, 11, n_slaves=1)
    res = personalized_pagerank(
        spark, edges_to_spark(spark, src, dst), [1, 2, 3], rounds=6
    )
    total = sum(r["rank"] for r in res.collect())
    assert abs(total - 1.0) < 1e-9
