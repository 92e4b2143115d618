"""powerlaw_fit vs a pure-Python replica of the CSN eq. 3.7 MLE."""

import math
import random
from collections import Counter

import pytest

from dxa_pagerank_spark.operators.graphstats import powerlaw_fit


def _replica(edges, direction, dmin):
    key = 1 if direction == "in" else 0
    e = {(s, d) for s, d in edges if s != d}
    deg = Counter(t[key] for t in e)
    tail = [d for d in deg.values() if d >= dmin]
    n = len(tail)
    s = sum(math.log(d / (dmin - 0.5)) for d in tail)
    alpha = 1 + n / s
    return n, round(alpha, 6), round((n / s) / math.sqrt(n), 6)


def _run(spark, edges, direction="in", dmin=2):
    df = spark.createDataFrame(edges, "src long, dst long")
    row = powerlaw_fit(spark, df, direction=direction, dmin=dmin).collect()[0]
    n, alpha, sigma = _replica(edges, direction, dmin)
    assert row["dmin"] == dmin
    assert row["n_tail"] == n
    assert row["alpha"] == pytest.approx(alpha, abs=1e-6)
    assert row["sigma"] == pytest.approx(sigma, abs=1e-6)


def test_powerlaw_hand_graph(spark):
    # a hub with 5 in-edges, two mid vertices with 2, some degree-1
    edges = [(i, 0) for i in range(1, 6)]
    edges += [(1, 7), (2, 7), (3, 8), (4, 8), (5, 9)]
    _run(spark, edges, "in", dmin=2)


def test_powerlaw_random_graph_both_directions(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(50), rng.randrange(200)) for _ in range(600)]
    _run(spark, edges, "in", dmin=2)
    _run(spark, edges, "out", dmin=3)


def test_powerlaw_known_exponent_recovery(spark):
    # degrees drawn from a zeta-ish tail: alpha-hat should land near
    # the generating exponent (coarse check, deterministic seed)
    rng = random.Random(3)
    edges = []
    nxt = 0
    for v in range(400):
        d = 2
        while rng.random() < 2.0 ** (-1.1) and d < 200:  # alpha ~ 2.1
            d += 1
        for _ in range(d):
            edges.append((nxt, v))
            nxt += 1
    row = powerlaw_fit(
        spark,
        spark.createDataFrame(edges, "src long, dst long"),
        direction="in",
        dmin=2,
    ).collect()[0]
    assert 1.5 < row["alpha"] < 4.0
    _run(spark, edges, "in", dmin=2)


def test_powerlaw_empty_tail_raises(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    with pytest.raises(ValueError):
        powerlaw_fit(spark, df, direction="in", dmin=5)
    with pytest.raises(ValueError):
        powerlaw_fit(spark, df, direction="bad")
