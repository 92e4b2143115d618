"""seeded_label_propagation (operators/labelprop.py): pure-Python
replica, planted two-region spreading, clamping and NULL laws."""

from __future__ import annotations

import random

from dxa_pagerank_spark.operators.labelprop import (
    seeded_label_propagation,
)


def _replica(edge_list, seed_map, rounds):
    und = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    verts = sorted({v for e in edge_list for v in e})
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lab = {v: seed_map.get(v) for v in verts}
    for _ in range(rounds):
        new = {}
        for v in verts:
            if v in seed_map:
                new[v] = seed_map[v]
                continue
            counts = {}
            for u in nbrs.get(v, ()):
                if lab[u] is not None:
                    counts[lab[u]] = counts.get(lab[u], 0) + 1
            if counts:
                new[v] = min(
                    counts, key=lambda c: (-counts[c], c)
                )
            else:
                new[v] = lab[v]
        lab = new
    return lab


def _run(spark, edge_list, seed_map, rounds):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    s = spark.createDataFrame(
        list(seed_map.items()), "id long, label long"
    )
    return {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            spark, e, s, rounds=rounds
        ).collect()
    }


def test_two_region_spread_and_null_island(spark):
    # path 0-1-2-3-4 with seeds at the ends + an unreachable pair
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    seeds = {0: 100, 4: 200}
    got = _run(spark, edges, seeds, rounds=6)
    exp = _replica(edges, seeds, 6)
    assert got == exp
    # clamped seeds spread inward; ties go to the smaller label, so
    # label 100 wins the middle AND (via the synchronous tie at
    # vertex 3, whose neighbors 2 and 4 disagree) invades up to the
    # clamped far seed — replica-confirmed semantics of the
    # deterministic tie rule
    assert got[0] == 100 and got[4] == 200
    assert got[1] == 100 and got[2] == 100 and got[3] == 100
    # the unseeded island never receives a label
    assert got[10] is None and got[11] is None


def test_matches_replica_random(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    seeds = {0: 7, 1: 9, 2: 7}
    for rounds in (0, 1, 5):
        assert _run(spark, edges, seeds, rounds) == _replica(
            edges, seeds, rounds
        )


def test_seed_clamp_beats_neighbor_majority(spark):
    # seed 0 surrounded by three vertices of the other class: it must
    # keep its own label (hard clamp)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (1, 3)]
    seeds = {0: 5, 1: 9, 2: 9, 3: 9}
    got = _run(spark, edges, seeds, rounds=4)
    assert got[0] == 5
