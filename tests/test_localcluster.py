"""ppr_sweep / best_sweep_cut (operators/localcluster.py): pure-Python
replica of the whole chain (seeded power iteration -> degree-normalized
order -> prefix conductance) on planted-community graphs.
"""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.operators.localcluster import (
    best_sweep_cut,
    ppr_sweep,
)


def _replica_ppr(edge_list, seeds, damping=0.85, rounds=5):
    verts = sorted({v for e in edge_list for v in e})
    out_deg = {}
    for s, _ in edge_list:
        out_deg[s] = out_deg.get(s, 0) + 1
    s_val = 1.0 / len(seeds)
    sv = {v: (s_val if v in seeds else 0.0) for v in verts}
    p = dict(sv)
    for _ in range(rounds):
        m = sum(p[v] for v in verts if v not in out_deg)
        contrib = {}
        for s, d in edge_list:
            contrib[d] = contrib.get(d, 0.0) + p[s] / out_deg[s]
        p = {
            v: (1 - damping) * sv[v]
            + damping * (contrib.get(v, 0.0) + m * sv[v])
            for v in verts
        }
    return p


def _replica_sweep(edge_list, seeds, rounds=5, top_m=50):
    p = _replica_ppr(edge_list, seeds, rounds=rounds)
    und = sorted({(min(s, d), max(s, d)) for s, d in edge_list if s != d})
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(
        deg, key=lambda v: (-round(p.get(v, 0.0) / deg[v], 12), v)
    )[:top_m]
    vol_total = sum(deg.values())
    rows = []
    prefix = set()
    vol = 0
    for t, v in enumerate(order, 1):
        prefix.add(v)
        vol += deg[v]
        e_in = sum(1 for a, b in und if a in prefix and b in prefix)
        cut = vol - 2 * e_in
        denom = min(vol, vol_total - vol)
        if denom > 0:
            rows.append((t, v, vol, cut, cut / denom))
    return rows


def _two_cliques():
    edges = []
    for grp in (range(0, 6), range(10, 16)):
        grp = list(grp)
        for i in grp:
            for j in grp:
                if i != j:
                    edges.append((i, j))
    edges += [(5, 10), (10, 5)]
    return edges


def test_sweep_matches_replica_and_finds_planted_community(spark):
    edges = _two_cliques()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [
        (r["t"], r["id"], r["vol"], r["cut"], r["conductance"])
        for r in ppr_sweep(spark, df, [0], top_m=12)
        .orderBy("t")
        .collect()
    ]
    exp = _replica_sweep(edges, {0}, top_m=12)
    assert [g[:2] for g in got] == [e[:2] for e in exp]
    assert [g[2:4] for g in got] == [e[2:4] for e in exp]
    for g, e in zip(got, exp):
        assert g[4] == pytest.approx(e[4], abs=1e-12)
    best = best_sweep_cut(
        ppr_sweep(spark, df, [0], top_m=12)
    ).collect()[0]
    # the planted 6-clique: cut = 1 bridge edge, vol = 2*15 + 1
    assert best["t"] == 6
    assert best["cut"] == 1
    assert best["vol"] == 31
    assert best["conductance"] == pytest.approx(1 / 31, abs=1e-12)


def test_sweep_drops_whole_graph_prefix_and_respects_top_m(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = ppr_sweep(spark, df, [0], top_m=10).orderBy("t").collect()
    # 3 vertices; the t=3 prefix is the whole graph (complement volume
    # 0) and must be absent
    assert [r["t"] for r in rows] == [1, 2]
    rows2 = ppr_sweep(spark, df, [0], top_m=1).collect()
    assert len(rows2) == 1


def test_sweep_rejects_bad_args(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ppr_sweep(spark, df, [0], top_m=0)
    with pytest.raises(ValueError):
        ppr_sweep(spark, df, [], top_m=5)
