"""Condensation DAG (SCC contraction + topological depth) vs a
pure-Python longest-path replica."""

import pytest

from dxa_pagerank_spark.operators.condensation import (
    condensation_edges,
    condensation_report,
    topological_levels,
)
from dxa_pagerank_spark.operators.scc import strongly_connected_components


def _replica_levels(comp_edges):
    """Longest path ending at each node of a DAG, by relaxation."""
    nodes = set()
    for s, d in comp_edges:
        nodes.update((s, d))
    lvl = {n: 0 for n in nodes}
    for _ in range(len(nodes) + 1):
        changed = False
        for s, d in comp_edges:
            if lvl[s] + 1 > lvl[d]:
                lvl[d] = lvl[s] + 1
                changed = True
        if not changed:
            return lvl
    raise AssertionError("replica given a cyclic graph")


# two cycles bridged, a tail chain, and an isolated vertex:
#   {1,2,3} -> {4,5} -> 7 -> 8      6 isolated
EDGES = [
    (1, 2), (2, 3), (3, 1),
    (4, 5), (5, 4),
    (3, 4),
    (5, 7), (7, 8),
]
VERTS = list(range(1, 9))


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in VERTS], "id long")
    labels = strongly_connected_components(spark, edges, vertices=verts)
    return edges, labels


def test_condensation_edges_contract_and_count(spark, graph):
    edges, labels = graph
    ce = {
        (r["src_scc"], r["dst_scc"]): r["n_edges"]
        for r in condensation_edges(edges, labels).collect()
    }
    assert ce == {(1, 4): 1, (4, 7): 1, (7, 8): 1}


def test_report_matches_replica(spark, graph):
    edges, labels = graph
    got = {
        r["scc"]: (r["level"], r["size"])
        for r in condensation_report(spark, edges, labels).collect()
    }
    lv = _replica_levels([(1, 4), (4, 7), (7, 8)])
    want = {
        1: (lv[1], 3),
        4: (lv[4], 2),
        6: (0, 1),  # isolated: root singleton
        7: (lv[7], 1),
        8: (lv[8], 1),
    }
    assert got == want


def test_diamond_takes_longest_path(spark):
    # 1 -> 2 -> 3 -> 5  and  1 -> 5 : level(5) must be 3, not 1
    ce = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 5, 1), (1, 5, 1)],
        "src_scc long, dst_scc long, n_edges long",
    )
    comps = spark.createDataFrame([(i,) for i in (1, 2, 3, 5)], "scc long")
    got = {
        r["scc"]: r["level"]
        for r in topological_levels(spark, ce, comps).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 5: 3}


def test_parallel_edges_counted(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 2)], "id long, scc long"
    )
    rows = condensation_edges(edges, labels).collect()
    assert len(rows) == 1 and rows[0]["n_edges"] == 3


def test_cycle_input_raises(spark):
    ce = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1)], "src_scc long, dst_scc long, n_edges long"
    )
    comps = spark.createDataFrame([(1,), (2,)], "scc long")
    with pytest.raises(RuntimeError, match="did not converge"):
        topological_levels(spark, ce, comps, max_rounds=5)
