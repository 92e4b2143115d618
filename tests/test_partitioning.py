"""Partitioning-advisor oracles: edge cut, load imbalance, and ghost
replication against a pure-Python reference, plus the laws that make
the report trustworthy (perfect locality -> zero cut; ghost_factor is
exactly the per-round rank-exchange row count)."""

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.partitioning import (
    block_partitioner,
    hash_partitioner,
    partition_report,
)

EDGES = [
    (0, 1), (1, 2), (2, 0),          # triangle inside block 0 (ids 0-4)
    (5, 6), (6, 7),                  # chain inside block 1 (ids 5-9)
    (0, 5), (1, 6), (2, 7), (9, 0),  # cross-block edges
    (3, 3),                          # self-loop (never cut)
]


def _report_py(assign):
    ps = [(assign(s), assign(d), s, d) for s, d in EDGES]
    cut = sum(1 for a, b, _, _ in ps if a != b) / len(ps)
    loads = {}
    for a, _, _, _ in ps:
        loads[a] = loads.get(a, 0) + 1
    imbalance = max(loads.values()) / (sum(loads.values()) / len(loads))
    pairs = {(a, d) for a, _, _, d in ps}
    ghost = len(pairs) / len({d for _, d in EDGES})
    return cut, imbalance, ghost


def _got(spark, strategies):
    df = partition_report(
        spark.createDataFrame(EDGES, "src long, dst long"), strategies
    )
    return {
        r.strategy: (r.edge_cut_frac, r.load_imbalance, r.ghost_factor)
        for r in df.collect()
    }


def test_matches_reference(spark):
    got = _got(
        spark,
        {
            "hash4": hash_partitioner(4),
            "block5x2": block_partitioner(5, 2),
        },
    )
    want = {
        "hash4": _report_py(lambda v: v % 4),
        "block5x2": _report_py(lambda v: (v // 5) % 2),
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_perfect_locality_has_zero_cut_and_unit_ghosts(spark):
    intra = [(s, d) for s, d in EDGES if s // 5 == d // 5]
    df = partition_report(
        spark.createDataFrame(intra, "src long, dst long"),
        {"block": block_partitioner(5, 2)},
    )
    r = df.collect()[0]
    assert r.edge_cut_frac == 0.0
    assert r.ghost_factor == 1.0  # each dst needed by exactly 1 partition


def test_ghost_factor_counts_the_rank_exchange(spark):
    # ghost_factor * |distinct dst| must equal the distinct
    # (partition, dst) pairs — the rows a src-partitioned gather ships
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    r = partition_report(edges, {"hash4": hash_partitioner(4)}).collect()[0]
    part = F.pmod(F.col("src"), F.lit(4))
    exchange_rows = (
        edges.select(part.alias("p"), "dst").distinct().count()
    )
    n_dst = edges.select("dst").distinct().count()
    assert r.ghost_factor == pytest.approx(exchange_rows / n_dst, abs=1e-6)
