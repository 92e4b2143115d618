"""Luby MIS + Jones–Plassmann coloring vs pure-Python replicas and
structural invariants."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.functions.sampling import KNUTH, MOD, _FOLD
from dxa_pagerank_spark.operators.mis import jp_coloring, luby_mis

_ID_BOUND = 1 << 31


def _pri(v: int) -> int:
    return ((v % _FOLD) * KNUTH) % MOD * _ID_BOUND + v


def _sym(edges):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _mis_replica(edges):
    adj = _sym(edges)
    verts = set(adj)
    und, out, r = set(verts), {}, 0
    while und:
        r += 1
        sel = {
            v
            for v in und
            if all(_pri(v) > _pri(w) for w in adj[v] if w in und)
        }
        for v in sel:
            out[v] = r
        und -= sel
        und -= {w for v in sel for w in adj[v]}
    return out  # id -> round for MIS members


def _coloring_replica(edges):
    adj = _sym(edges)
    und, out, r = set(adj), {}, 0
    while und:
        r += 1
        sel = {
            v
            for v in und
            if all(_pri(v) > _pri(w) for w in adj[v] if w in und)
        }
        for v in sel:
            out[v] = r
        und -= sel
    return out


def _lcg_graph(n=60, m=200, seed=777):
    x, out = seed, []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append((u, x % n))
    out += [(0, 0), (58, 59)]  # self-loop + fringe edge
    return out


def test_luby_mis_matches_replica(spark):
    edges = _lcg_graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: (r["in_mis"], r["mis_round"])
        for r in luby_mis(spark, df).collect()
    }
    expect = _mis_replica(edges)
    verts = {x for e in edges for x in e if e[0] != e[1] or True}
    adj = _sym(edges)
    assert set(got) == set(adj) | ({0} if (0, 0) in edges else set())
    for v, (in_mis, rnd) in got.items():
        if v in expect:
            assert in_mis and rnd == expect[v], v
        else:
            assert not in_mis and rnd == 0, v
    # structural: independent + maximal
    mis = {v for v, (m, _) in got.items() if m}
    for u, vs in adj.items():
        if u in mis:
            assert not (vs & mis), "not independent"
        else:
            assert vs & mis, "not maximal"
    del verts


def test_luby_mis_isolated_vertex_in_mis(spark):
    # vertex 5 only appears in a self-loop -> isolated in the simple
    # graph -> must be in the MIS, selected round 1
    df = spark.createDataFrame([(0, 1), (5, 5)], "src long, dst long")
    got = {r["id"]: (r["in_mis"], r["mis_round"]) for r in
           luby_mis(spark, df).collect()}
    assert got[5] == (True, 1)


def test_jp_coloring_matches_replica_and_is_proper(spark):
    edges = _lcg_graph(40, 140, seed=31)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["color"] for r in jp_coloring(spark, df).collect()}
    assert got == _coloring_replica(edges)
    adj = _sym(edges)
    for u, vs in adj.items():
        for v in vs:
            assert got[u] != got[v], (u, v)


def test_mis_id_bound_guard(spark):
    df = spark.createDataFrame([(1 << 32, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="2\\^31"):
        luby_mis(spark, df)


def test_mis_round_cap_raises(spark):
    # path 0-1-2-3-4-5: priorities select {1, 3} in round 1, leaving 5
    # undecided -> a 1-round cap must fail loudly
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        luby_mis(spark, df, max_rounds=1)
