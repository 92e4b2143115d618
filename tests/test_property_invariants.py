"""Property-based invariants (hypothesis) for core engine laws.

Each property round-trips Spark per example, so example counts are
deliberately small — these hunt structural edge cases (empty inputs,
adjacent/overlapping intervals, degenerate graphs) that hand-picked
fixtures miss, not statistical coverage."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dxa_pagerank_spark.functions.spandedup import _merge_islands
from dxa_pagerank_spark.operators.components import (
    connected_components,
    incremental_components,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _windows(draw):
    n = draw(st.integers(0, 12))
    return [
        (
            draw(st.integers(0, 2)),               # doc id
            (s := draw(st.integers(0, 20))),        # start
            s + draw(st.integers(0, 5)),            # end >= start
        )
        for _ in range(n)
    ]


def _union_islands(rows):
    out = {}
    by_id = {}
    for i, s, e in rows:
        by_id.setdefault(i, []).append((s, e))
    for i, spans in by_id.items():
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        out[i] = merged
    return {
        (i, s, e, e - s + 1) for i, ms in out.items() for s, e in ms
    }


@given(_windows())
@settings(**_SETTINGS)
def test_island_merge_is_interval_union(spark, rows):
    df = spark.createDataFrame(
        rows or [(0, 0, 0)][:0], "id long, s long, e long"
    ) if rows else spark.createDataFrame([], "id long, s long, e long")
    got = {
        (r["id"], r["span_start"], r["span_end"], r["span_len"])
        for r in _merge_islands(df).collect()
    }
    assert got == _union_islands(rows)


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 24),
)
@settings(**{**_SETTINGS, "max_examples": 6})
def test_incremental_cc_equals_cold_for_any_growth(spark, edges, cut):
    cut = min(cut, len(edges))
    yesterday = edges[:cut]
    e_old = spark.createDataFrame(yesterday, "src long, dst long")
    e_all = spark.createDataFrame(edges, "src long, dst long")
    prior = connected_components(spark, e_old)
    warm = {
        (r["id"], r["component"])
        for r in incremental_components(spark, e_all, prior).collect()
    }
    cold = {
        (r["id"], r["component"])
        for r in connected_components(spark, e_all).collect()
    }
    assert warm == cold


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fmix32_three_way_parity_any_int64(spark, vals):
    """fmix32 must agree across (a) the Spark column expression, (b)
    the DuckDB SQL mirror used by every oracle, and (c) the plain
    python model — for ARBITRARY signed int64 keys. This pins the
    sign-safe double-mod fold (ADVICE r04): DuckDB % keeps the
    dividend's sign, F.pmod does not, and hypothesis hunts the
    boundary cases (INT64_MIN, -1, 2^31 multiples) a fixture list
    misses. Batched: one Spark/DuckDB round-trip per example."""
    import duckdb

    from __spark_entry__ import _fmix32_stages_sql
    from dxa_pagerank_spark.operators.anf import fmix32
    from pyspark.sql import functions as F

    def model(v):
        def mul32(h, c):
            lo, hi = h & 0xFFFF, h >> 16
            return ((lo * c) + ((hi * c & 0xFFFF) << 16)) & 0xFFFFFFFF

        h = v % 2**31
        h ^= h >> 16
        h = mul32(h, 0x85EBCA6B)
        h ^= h >> 13
        h = mul32(h, 0xC2B2AE35)
        return h ^ (h >> 16)

    rows = [(i, v) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(rows, "i long, v long")
    got_spark = {
        r["i"]: r["h"]
        for r in sdf.select("i", fmix32(F.col("v")).alias("h")).collect()
    }
    sql = (
        "WITH g AS (SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST({v} AS BIGINT))" for i, v in rows)
        + ") t(i, v)),\n"
        + _fmix32_stages_sql("g", "i", "v")
        + "\nSELECT i, h FROM fx"
    )
    got_duck = {int(i): int(h) for i, h in duckdb.sql(sql).fetchall()}
    want = {i: model(v) for i, v in rows}
    assert got_spark == want
    assert got_duck == want
