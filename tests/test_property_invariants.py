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
