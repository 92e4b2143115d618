"""SALSA (operators/salsa.py) against a dense NumPy replay of the
degree-split L1-normalized iteration, plus multigraph/TKC semantics."""

import numpy as np
import pytest

from dxa_pagerank_spark.operators.salsa import salsa


def _numpy_salsa(edges, rounds):
    ids = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    od = np.zeros(n)
    idg = np.zeros(n)
    for u, v in edges:
        od[ix[u]] += 1
        idg[ix[v]] += 1
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(rounds):
        a = np.zeros(n)
        for u, v in edges:
            a[ix[v]] += hub[ix[u]] / od[ix[u]]
        auth = a / (a.sum() or 1.0)
        h = np.zeros(n)
        for u, v in edges:
            h[ix[u]] += auth[ix[v]] / idg[ix[v]]
        hub = h / (h.sum() or 1.0)
    return ids, auth, hub


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (5, 3), (3, 6),
    (6, 1), (2, 6), (1, 2),  # duplicate edge: multigraph weight
]


def test_salsa_matches_numpy_replay(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    got = {r["id"]: (r["auth"], r["hub"]) for r in salsa(spark, df, rounds=4).collect()}
    ids, auth, hub = _numpy_salsa(EDGES, 4)
    assert set(got) == set(ids)
    for v, i in ((v, i) for i, v in enumerate(ids)):
        assert got[v][0] == pytest.approx(auth[i], abs=1e-12)
        assert got[v][1] == pytest.approx(hub[i], abs=1e-12)


def test_salsa_damps_tkc_hub_vs_hits(spark):
    # vertex 100 links to 5 popular-but-mutually-linked targets; vertex
    # 200 links to 2 exclusive targets. Under the degree split, 100's
    # authority mass per target is diluted by the targets' in-degrees.
    edges = [(100, i) for i in (1, 2, 3, 4, 5)]
    edges += [(i, j) for i in (1, 2, 3, 4, 5) for j in (1, 2, 3, 4, 5) if i != j]
    edges += [(200, 10), (200, 11)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r["id"]: r["hub"] for r in salsa(spark, df, rounds=3).collect()}
    ids, _, hub = _numpy_salsa(edges, 3)
    ref = {v: hub[i] for i, v in enumerate(ids)}
    assert got[100] == pytest.approx(ref[100], abs=1e-12)
    assert got[200] == pytest.approx(ref[200], abs=1e-12)


def test_salsa_mass_conserved_and_normalized(spark):
    df = spark.createDataFrame(EDGES, "src LONG, dst LONG")
    rows = salsa(spark, df, rounds=2).collect()
    assert sum(r["auth"] for r in rows) == pytest.approx(1.0, abs=1e-12)
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-12)
