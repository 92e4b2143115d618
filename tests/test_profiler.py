"""table_profile vs a pure-Python replica, incl. nulls and ties."""

from __future__ import annotations

from dxa_pagerank_spark.functions.profiler import table_profile


def _replica(rows, cols):
    out = {}
    for i, c in enumerate(cols):
        vals = [r[i] for r in rows]
        nn = [v for v in vals if v is not None]
        counts = {}
        for v in nn:
            counts[v] = counts.get(v, 0) + 1
        top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out[c] = {
            "n_rows": len(vals),
            "n_nulls": len(vals) - len(nn),
            "n_distinct": len(set(nn)),
            "min_value": str(min(nn)),
            "max_value": str(max(nn)),
            "top_value": str(top[0]),
            "top_count": top[1],
        }
    return out


def test_table_profile_matches_replica(spark):
    rows = [
        (1, "en", 10),
        (2, "en", 3),
        (3, "de", None),
        (4, None, 3),
        (5, "fr", 200),
        (6, "de", 3),
        (7, "en", 10),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, n long")
    got = {
        r["column"]: {k: r[k] for k in (
            "n_rows", "n_nulls", "n_distinct", "min_value",
            "max_value", "top_value", "top_count")}
        for r in table_profile(df).collect()
    }
    assert got == _replica(rows, ["id", "lang", "n"])


def test_table_profile_native_numeric_order(spark):
    # bigint min/max must use numeric order (2 < 10), not string order
    df = spark.createDataFrame([(2,), (10,)], "x long")
    row = table_profile(df).collect()[0]
    assert (row["min_value"], row["max_value"]) == ("2", "10")


def test_table_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    rows = table_profile(df, columns=["s"]).collect()
    assert [r["column"] for r in rows] == ["s"]


def test_signal_correlations_matches_numpy(spark):
    import numpy as np
    import pytest as _pytest

    from dxa_pagerank_spark.functions.profiler import signal_correlations

    rng = np.random.RandomState(9)
    x = rng.rand(80)
    rows = [
        (float(x[i]), float(2 * x[i] + 0.1 * rng.rand()), float(rng.rand()))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["signal_a"], r["signal_b"]): (r["n"], r["r"])
        for r in signal_correlations(df, ["a", "b", "c"]).collect()
    }
    arr = np.array(rows)
    for (i, a), (j, b) in [((0, "a"), (1, "b")), ((0, "a"), (2, "c")),
                           ((1, "b"), (2, "c"))]:
        exp = float(np.corrcoef(arr[:, i], arr[:, j])[0, 1])
        assert got[(a, b)][0] == 80
        assert got[(a, b)][1] == _pytest.approx(exp, abs=1e-9)
    # near-collinear pair flagged as such
    assert got[("a", "b")][1] > 0.99


def test_signal_correlations_null_rows_and_constant(spark):
    import pytest as _pytest

    from dxa_pagerank_spark.functions.profiler import signal_correlations

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (None, 1.0), (3.0, 5.0)],
        "a double, b double",
    )
    rows = signal_correlations(df, ["a", "b"]).collect()
    assert rows[0]["n"] == 3  # the NULL row is dropped from support
    assert rows[0]["r"] is None  # b has zero variance
    with _pytest.raises(ValueError):
        signal_correlations(df, ["a"])
