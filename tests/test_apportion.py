"""apportion_budget (Hamilton largest-remainder) vs a pure-Python
replica."""

import pytest

from dxa_pagerank_spark.functions.frontier import apportion_budget


def _replica(ws, budget):
    total = sum(w for _, w in ws)
    if total <= 0:
        return {i: 0 for i, _ in ws}
    fl = {i: budget * w // total for i, w in ws}
    rem = {i: (budget * w) % total for i, w in ws}
    left = budget - sum(fl.values())
    order = sorted(ws, key=lambda p: (-rem[p[0]], p[0]))
    winners = {i for i, _ in order[:left]}
    return {i: fl[i] + (1 if i in winners else 0) for i, _ in ws}


def _run(spark, ws, budget):
    df = spark.createDataFrame(ws, "id long, w long")
    return {
        r["id"]: r["alloc"]
        for r in apportion_budget(df, budget).collect()
    }


WEIGHTS = [
    (1, 7), (2, 7), (3, 100), (4, 0), (5, 13),
    (6, 999_999_937), (7, 1), (8, 1), (9, 42), (10, 0),
]


@pytest.mark.parametrize("budget", [0, 1, 10, 997, 10_000])
def test_matches_replica(spark, budget):
    got = _run(spark, WEIGHTS, budget)
    assert got == _replica(WEIGHTS, budget)


@pytest.mark.parametrize("budget", [997, 12_345])
def test_sums_to_budget_exactly(spark, budget):
    got = _run(spark, WEIGHTS, budget)
    assert sum(got.values()) == budget


def test_all_zero_weights_alloc_zero(spark):
    got = _run(spark, [(1, 0), (2, 0)], 100)
    assert got == {1: 0, 2: 0}


def test_remainder_tie_breaks_to_smaller_id(spark):
    # equal weights, budget not divisible: remainders all tie, the
    # leftover units must go to the smallest ids
    ws = [(i, 5) for i in range(1, 6)]
    got = _run(spark, ws, 7)
    assert got == {1: 2, 2: 2, 3: 1, 4: 1, 5: 1}


def test_negative_weight_raises(spark):
    df = spark.createDataFrame([(1, -3)], "id long, w long")
    with pytest.raises(ValueError, match="weights must be >= 0"):
        apportion_budget(df, 10)


def test_huge_weights_stay_exact(spark):
    # products budget*w far beyond 2^53 — decimal(38,0) must not round
    ws = [(1, 2**62 - 1), (2, 2**61), (3, 3)]
    got = _run(spark, ws, 1_000_000_007)
    assert got == _replica(ws, 1_000_000_007)
    assert sum(got.values()) == 1_000_000_007
