"""Engine vs NumPy-oracle PageRank tests (SURVEY.md §5.2).

The oracle (dxa_pagerank_spark.oracle.pagerank_oracle) encodes the
reference's exact semantics incl. the round-1 danglingPR=1/N quirk,
frozen dangling vertices, non-dangling-only L1, edge multiplicity and
the final restore pass. The Spark engine must match it: per-round error
trajectory to ~1e-12 and final ranks to allclose 1e-6.
"""

import numpy as np
import pytest

from dxa_pagerank_spark.datagen import (
    FIXTURE_GRAPHS,
    edges_to_spark,
    hub_graph,
    parse_in_edge_list,
    synthetic_edges,
)
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.oracle import pagerank_oracle


def _run_both(spark, n, src, dst, damping=0.85, threshold=1e-3, max_rounds=50, **kw):
    oracle = pagerank_oracle(n, src, dst, damping, threshold, max_rounds)
    edges = edges_to_spark(spark, src, dst)
    res = pagerank(
        spark,
        edges,
        num_vertices=n,
        damping=damping,
        threshold=threshold,
        max_rounds=max_rounds,
        num_partitions=4,
        **kw,
    )
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    engine_ranks = np.array([got[i] for i in range(n)])
    return oracle, res, engine_ranks


@pytest.mark.parametrize("name", ["g7_readme", "g_dangling", "g_dup"])
def test_fixture_graphs_match_oracle(spark, name):
    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS[name])
    oracle, res, engine_ranks = _run_both(
        spark, n, src, dst, threshold=1e-10, max_rounds=100
    )
    assert res.rounds == oracle.rounds
    assert res.converged == oracle.converged
    np.testing.assert_allclose(
        np.array(res.errors), np.array(oracle.errors), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(engine_ranks, oracle.ranks, rtol=0, atol=1e-6)


def test_g7_readme_structure(spark):
    """Pin the README example facts: 14 edges, vertex 7 dangling."""
    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS["g7_readme"])
    assert n == 7
    assert len(src) == 14
    out_deg = np.bincount(src, minlength=n)
    assert out_deg[6] == 0  # vertex 7 (0-based 6) never in any in-list
    assert out_deg[3] == 3  # vertex 4 has out-deg 3 though no in-edges
    oracle, res, engine_ranks = _run_both(spark, n, src, dst, threshold=1e-10, max_rounds=100)
    assert res.converged
    # dangling vertex got a real (restored) rank, not the frozen 1/n
    assert abs(engine_ranks[6] - 1.0 / n) > 1e-4


def test_duplicate_edge_multiplicity(spark):
    """g_dup line 3 is '3 3 5': vertex 3 contributes twice to vertex 3's
    in-sum and its out_deg counts both mentions."""
    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS["g_dup"])
    out_deg = np.bincount(src, minlength=n)
    assert out_deg[2] == 3  # vertex 3: twice on line 1, once on line 4
    oracle, res, engine_ranks = _run_both(spark, n, src, dst, threshold=1e-10, max_rounds=100)
    np.testing.assert_allclose(engine_ranks, oracle.ranks, rtol=0, atol=1e-6)


def test_synthetic_parity_graph(spark):
    """FIXTURES.md F4 canonical instance (N=1000, locality .6, mean 6,
    seed 21, slaves 1) — generator parity + engine vs oracle."""
    n = 1000
    src, dst = synthetic_edges(n, 0.6, 6, 21, n_slaves=1)
    assert len(src) > 1000  # sanity: graph is non-trivial
    assert not np.any(src == dst)  # no local self-loops (single slave)
    oracle, res, engine_ranks = _run_both(
        spark, n, src, dst, threshold=1e-6, max_rounds=60
    )
    assert res.rounds == oracle.rounds
    np.testing.assert_allclose(engine_ranks, oracle.ranks, rtol=0, atol=1e-6)


def test_synthetic_multislave_placement():
    """S=2 replays the same global stream; edge count must match S=1 law
    in distribution and produce deterministic output."""
    src1, dst1 = synthetic_edges(200, 0.6, 4, 7, n_slaves=2)
    src2, dst2 = synthetic_edges(200, 0.6, 4, 7, n_slaves=2)
    assert np.array_equal(src1, src2) and np.array_equal(dst1, dst2)


def test_hub_graph_skew(spark):
    """Super-node fixture: 1000 in-edges into vertex 0."""
    n, src, dst = hub_graph(1001)
    oracle, res, engine_ranks = _run_both(
        spark, n, src, dst, threshold=1e-8, max_rounds=80
    )
    np.testing.assert_allclose(engine_ranks, oracle.ranks, rtol=0, atol=1e-6)
    assert engine_ranks[0] == engine_ranks.max()


def test_mass_conservation_matches_oracle(spark):
    n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS["g_dangling"])
    oracle, res, engine_ranks = _run_both(
        spark, n, src, dst, threshold=1e-10, max_rounds=100
    )
    assert abs(engine_ranks.sum() - oracle.ranks.sum()) < 1e-9
    assert (engine_ranks > 0).all()
