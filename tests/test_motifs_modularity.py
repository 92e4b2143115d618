"""Triad census + modularity vs brute-force pure-Python oracles."""

from __future__ import annotations

import itertools

import pytest

from dxa_pagerank_spark.operators.graphstats import modularity
from dxa_pagerank_spark.operators.motifs import triad_census


def _census_oracle(edges: list[tuple[int, int]]) -> dict[str, int]:
    """Brute-force triple enumeration, classifying by mutual-dyad count
    and orientation — the spec for operators.motifs.triad_census."""
    d = {(u, v) for u, v in edges if u != v}
    verts = sorted({x for e in d for x in e})
    und = {frozenset(e) for e in d}
    out: dict[str, int] = {}
    for t in itertools.combinations(verts, 3):
        v1, v2, v3 = t
        pairs = [(v1, v2), (v1, v3), (v2, v3)]
        if any(frozenset(p) not in und for p in pairs):
            continue
        mut = [p for p in pairs if (p in d and (p[1], p[0]) in d)]
        n_mut = len(mut)
        if n_mut == 3:
            cls = "300"
        elif n_mut == 2:
            cls = "210"
        elif n_mut == 0:
            cyc = ((v1, v2) in d and (v2, v3) in d and (v3, v1) in d) or (
                (v2, v1) in d and (v3, v2) in d and (v1, v3) in d
            )
            cls = "030C" if cyc else "030T"
        else:
            (a, b) = mut[0]
            w = next(x for x in t if x not in (a, b))
            out_w = int((w, a) in d) + int((w, b) in d)
            cls = {2: "120D", 0: "120U", 1: "120C"}[out_w]
        out[cls] = out.get(cls, 0) + 1
    return out


def _modularity_oracle(
    edges: list[tuple[int, int]], labels: dict[int, int]
) -> float:
    und = sorted(
        {(min(u, v), max(u, v)) for u, v in edges if u != v}
    )
    m = len(und)
    lab = lambda x: labels.get(x, -x - 1)  # noqa: E731
    comms = {lab(x) for e in und for x in e}
    q = 0.0
    for c in comms:
        mc = sum(1 for a, b in und if lab(a) == c and lab(b) == c)
        dc = sum((lab(a) == c) + (lab(b) == c) for a, b in und)
        q += mc / m - (dc / (2.0 * m)) ** 2
    return q


def _mixed_graph() -> list[tuple[int, int]]:
    """Deterministic directed graph hitting all 7 triangle classes."""
    e = [
        # 030T on (0,1,2); 030C on (3,4,5)
        (0, 1), (0, 2), (1, 2),
        (3, 4), (4, 5), (5, 3),
        # 120D on (6,7,8): 6<->7 mutual, 8 points at both
        (6, 7), (7, 6), (8, 6), (8, 7),
        # 120U on (9,10,11): 9<->10 mutual, both point at 11
        (9, 10), (10, 9), (9, 11), (10, 11),
        # 120C on (12,13,14): 12<->13 mutual, 13->14, 14->12
        (12, 13), (13, 12), (13, 14), (14, 12),
        # 210 on (15,16,17); 300 on (18,19,20)
        (15, 16), (16, 15), (16, 17), (17, 16), (15, 17),
        (18, 19), (19, 18), (18, 20), (20, 18), (19, 20), (20, 19),
        # noise: self-loop, duplicate, dangling edge, open wedge
        (0, 0), (0, 1), (21, 22), (23, 24), (23, 25),
    ]
    return e


def _lcg_graph(n: int = 40, m: int = 220) -> list[tuple[int, int]]:
    x, out = 1234567, []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % n
        x = (1103515245 * x + 12345) % (1 << 31)
        v = x % n
        out.append((u, v))
    return out


@pytest.mark.parametrize("graph", ["mixed", "lcg"])
def test_triad_census_matches_bruteforce(spark, graph):
    edges = _mixed_graph() if graph == "mixed" else _lcg_graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["triad_class"]: r["n"]
        for r in triad_census(spark, df).collect()
    }
    assert got == _census_oracle(edges)


def test_triad_census_mixed_graph_has_all_classes(spark):
    edges = _mixed_graph()
    got = {
        r["triad_class"]: r["n"]
        for r in triad_census(
            spark, spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == {
        "030T": 1, "030C": 1, "120D": 1, "120U": 1,
        "120C": 1, "210": 1, "300": 1,
    }


def test_modularity_matches_bruteforce(spark):
    edges = _lcg_graph(30, 120)
    labels = {i: i % 4 for i in range(25)}  # vertices 25+ unlabeled
    ldf = spark.createDataFrame(
        sorted(labels.items()), "id long, label long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    row = modularity(edf, ldf).collect()[0]
    assert row["modularity"] == pytest.approx(
        _modularity_oracle(edges, labels), abs=1e-12
    )
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    assert row["n_edges"] == len(und)


def test_modularity_perfect_partition_positive(spark):
    # two disjoint cliques labeled by clique -> high Q (0.5 exactly)
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(a + 10, b + 10) for a, b in edges]
    ldf = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i + 10, 1) for i in range(4)],
        "id long, label long",
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    row = modularity(edf, ldf).collect()[0]
    assert row["modularity"] == pytest.approx(0.5, abs=1e-12)
    assert row["n_communities"] == 2
