"""rich_club (operators/graphstats.py): pure-Python replica on hand
and seeded-random graphs.

The replica brute-forces the definition — club(k) = vertices with
undirected simple degree > k, phi = 2 E_club / (N (N-1)) — so any
histogram/cumulative bookkeeping slip in the operator shows up as a
value mismatch, not just a shape change.
"""

from __future__ import annotations

import random

import pytest

from dxa_pagerank_spark.operators.graphstats import rich_club


def _replica(edge_list):
    und = set()
    for s, d in edge_list:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ks = sorted({0} | set(deg.values()))
    rows = {}
    for k in ks:
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e_in = sum(1 for a, b in und if a in club and b in club)
        n = len(club)
        rows[k] = (n, e_in, 2.0 * e_in / (n * (n - 1)))
    return rows


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {}
    for r in rich_club(df).collect():
        got[r["k"]] = (r["club_nodes"], r["club_edges"], r["phi"])
    return got


def test_rich_club_hub_clique(spark):
    # 4 hubs forming a clique, each hub with 3 private leaves: the
    # hub club (degree > 3) is a perfect rich club (phi = 1.0)
    edges = []
    hubs = [0, 1, 2, 3]
    for i in hubs:
        for j in hubs:
            if i < j:
                edges.append((i, j))
    nxt = 10
    for h in hubs:
        for _ in range(3):
            edges.append((h, nxt))
            nxt += 1
    exp = _replica(edges)
    got = _run(spark, edges)
    assert got == pytest.approx(exp)
    # hubs have degree 6, leaves 1: threshold k in {1..5} leaves only
    # the 4-hub clique
    assert got[1] == (4, 6, 1.0)
    assert 0 in got  # whole graph


def test_rich_club_ignores_loops_direction_multiplicity(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)]
    exp = _replica(edges)
    got = _run(spark, edges)
    assert got == pytest.approx(exp)
    assert got[0] == (3, 2, 2 * 2.0 / (3 * 2))


def test_rich_club_random_graph_matches_replica(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(300)
    ]
    exp = _replica(edges)
    got = _run(spark, edges)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:2] == exp[k][:2]
        assert got[k][2] == pytest.approx(exp[k][2], abs=1e-12)


def test_attribute_mixing_and_assortativity(spark):
    from dxa_pagerank_spark.operators.graphstats import (
        attribute_assortativity,
        attribute_mixing_matrix,
    )

    # two language islands + one cross link
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2), (1, 1)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de"), (3, "de")],
        "id long, label string",
    )
    m = {
        (r["label_src"], r["label_dst"]): (r["n_links"], r["share"])
        for r in attribute_mixing_matrix(edges, labels).collect()
    }
    # self-loop dropped: 5 links total
    assert m[("en", "en")][0] == 2
    assert m[("de", "de")][0] == 2
    assert m[("en", "de")][0] == 1
    assert abs(m[("en", "en")][1] - 2 / 5) < 1e-12
    row = attribute_assortativity(edges, labels).collect()[0]
    # e_ii = 4/5; a_en=3/5, b_en=2/5, a_de=2/5, b_de=3/5 ->
    # sum ab = 12/25; r = (4/5 - 12/25)/(1 - 12/25) = (8/25)/(13/25)
    assert row["n_links"] == 5
    assert abs(row["r"] - 8 / 13) < 1e-12


def test_attribute_assortativity_degenerate_single_label(spark):
    from dxa_pagerank_spark.operators.graphstats import (
        attribute_assortativity,
    )

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    labels = spark.createDataFrame(
        [(0, "en"), (1, "en")], "id long, label string"
    )
    row = attribute_assortativity(edges, labels).collect()[0]
    assert row["r"] is None
