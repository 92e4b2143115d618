"""convergence_certificate (operators/pagerank.py) and
leakage_safe_split (functions/splits.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.splits import leakage_safe_split
from dxa_pagerank_spark.operators.pagerank import (
    convergence_certificate,
    pagerank,
)


def test_certificate_matches_result_lists(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
    )
    res = pagerank(spark, edges, threshold=0.0, max_rounds=5)
    cert = convergence_certificate(spark, res, damping=0.85).collect()
    assert [r["round"] for r in cert] == [1, 2, 3, 4, 5]
    factor = 0.85 / 0.15
    for r, e, m in zip(cert, res.errors, res.dangling_mass):
        assert r["l1_delta"] == pytest.approx(e, rel=0, abs=0)
        assert r["mass_residual"] == pytest.approx(m, rel=0, abs=0)
        assert r["geo_bound"] == pytest.approx(e * factor, rel=1e-15)


def test_certificate_bound_actually_bounds(spark):
    """The contraction certificate must dominate the true remaining
    distance: run 3 rounds, compare the bound against the L1 distance
    to a much-longer run's ranks."""
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 30) for i in range(30)]
        + [(i, (i + 1) % 30) for i in range(30)],
        "src long, dst long",
    )
    short = pagerank(spark, edges, threshold=0.0, max_rounds=3)
    long = pagerank(spark, edges, threshold=1e-14, max_rounds=200)
    assert long.converged
    dist = (
        short.ranks.alias("a")
        .join(long.ranks.alias("b"), "id")
        .agg(
            F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
        )
        .collect()[0]["d"]
    )
    bound = convergence_certificate(spark, short).collect()[-1][
        "geo_bound"
    ]
    assert dist <= bound + 1e-12


def test_split_is_group_constant_and_complete(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(400)], "doc_id long, text string"
    )
    out = leakage_safe_split(
        docs, F.floor(F.col("doc_id") / 25)
    )
    rows = out.collect()
    assert len(rows) == 400  # every doc assigned
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    # the leakage guard: one split per group, never straddling
    assert all(len(s) == 1 for s in by_group.values())
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"}
    # with 16 groups the empirical mix should lean heavily train
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert n_train >= 200


def test_split_fraction_guard(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        leakage_safe_split(
            docs, F.col("doc_id"), train_pct=90, val_pct=10
        )
    # individually-invalid fractions that used to slip the sum check
    with pytest.raises(ValueError):
        leakage_safe_split(
            docs, F.col("doc_id"), train_pct=-10, val_pct=50
        )
    with pytest.raises(ValueError):
        leakage_safe_split(
            docs, F.col("doc_id"), train_pct=60, val_pct=-5
        )
    with pytest.raises(TypeError):
        leakage_safe_split(
            docs, F.col("doc_id"), train_pct=60.0, val_pct=10
        )


def test_split_negative_group_ids(spark):
    """Signed group keys (the docstring invites 'domain hash' ids,
    e.g. xxhash64 output) must bucket into [0, 100) and stay
    group-constant — this is the operator side of the sign-safe
    fmix32 SQL-mirror fix (ADVICE r04)."""
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    out = leakage_safe_split(
        docs, (F.col("doc_id") - 50), train_pct=80, val_pct=10
    ).collect()
    assert len(out) == 100
    assert all(0 <= r["bucket"] < 100 for r in out)
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())


def test_split_rejects_bool_percent(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(TypeError):
        leakage_safe_split(docs, F.col("doc_id"), train_pct=True, val_pct=10)
