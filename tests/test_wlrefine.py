"""wl_refinement / wl_class_sizes (operators/wlrefine.py): hashlib
replica on hand and seeded-random graphs, plus the classic WL
distinguishing/indistinguishability properties.
"""

from __future__ import annotations

import hashlib
import random

from dxa_pagerank_spark.operators.wlrefine import (
    wl_class_sizes,
    wl_refinement,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _replica(edge_list, rounds):
    e = {(s, d) for s, d in edge_list if s != d}
    verts = sorted({v for t in e for v in t})
    od, idg = {}, {}
    for s, d in e:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    lab = {
        v: _md5(f"{od.get(v, 0)}.{idg.get(v, 0)}") for v in verts
    }
    for _ in range(rounds):
        new = {}
        for v in verts:
            outs = ",".join(sorted(lab[d] for s, d in e if s == v))
            ins = ",".join(sorted(lab[s] for s, d in e if d == v))
            new[v] = _md5(f"{lab[v]}|O:{outs}|I:{ins}")
        lab = new
    return lab


def _run(spark, edge_list, rounds):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["id"]: r["wl_label"]
        for r in wl_refinement(df, rounds=rounds).collect()
    }


def test_wl_matches_replica_random(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    for rounds in (0, 1, 3):
        assert _run(spark, edges, rounds) == _replica(edges, rounds)


def test_wl_two_cycles_indistinguishable(spark):
    # two disjoint directed 4-cycles: every vertex is structurally
    # identical at any depth
    edges = [(i, (i + 1) % 4) for i in range(4)] + [
        (10 + i, 10 + (i + 1) % 4) for i in range(4)
    ]
    labs = _run(spark, edges, 3)
    assert len(set(labs.values())) == 1


def test_wl_distinguishes_beyond_degree(spark):
    # path a->b->c->d->e plus f->g: b and d share (1,1) degrees with g
    # at round 0 but separate from the ends' neighbors as rounds grow
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    l0 = _run(spark, edges, 0)
    assert l0[1] == l0[2] == l0[3]
    l2 = _run(spark, edges, 2)
    # c sees 2-hop-interior structure; b sees the source endpoint
    assert l2[1] != l2[2]
    # symmetric positions stay merged: the replica agrees everywhere
    assert l2 == _replica(edges, 2)


def test_wl_class_sizes(spark):
    edges = [(i, (i + 1) % 4) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wl_class_sizes(df, rounds=2).collect()
    assert len(rows) == 1 and rows[0]["n_vertices"] == 4


def test_wl_max_degree_cap_removes_hubs(spark):
    # star hub 0 with 10 spokes + a separate 2-cycle: capping at
    # degree 3 removes the hub AND its edges; the 2-cycle survives
    # and equals the uncapped refinement of the cycle alone
    edges = [(i, 0) for i in range(1, 11)] + [(20, 21), (21, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    capped = _run_df(spark, df, rounds=2, max_degree=3)
    assert set(capped) == {20, 21}
    cyc = spark.createDataFrame(
        [(20, 21), (21, 20)], "src long, dst long"
    )
    plain = _run_df(spark, cyc, rounds=2, max_degree=None)
    assert capped == plain


def _run_df(spark, df, rounds, max_degree):
    return {
        r["id"]: r["wl_label"]
        for r in wl_refinement(
            df, rounds=rounds, max_degree=max_degree
        ).collect()
    }
