"""Gap-encoded adjacency costing (plans/compression.py) vs a
pure-Python replica of the Elias code lengths."""

from dxa_pagerank_spark.plans.compression import (
    adjacency_gap_costs,
    compression_summary,
)


def _blen(x):
    return x.bit_length()


def _gamma(x):
    return 2 * _blen(x) - 1


def _delta(x):
    return _blen(x) - 1 + _gamma(_blen(x))


def _replica(edges):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    out = {}
    for s, ds in adj.items():
        ds.sort()
        gaps = [ds[0] + 1] + [b - a for a, b in zip(ds, ds[1:])]
        out[s] = (
            len(ds),
            sum(_gamma(g) for g in gaps),
            sum(_delta(g) for g in gaps),
        )
    return out


EDGES = [
    (0, 5), (0, 6), (0, 7), (0, 1000),
    (1, 0),                      # dst 0: first gap = 1
    (2, 3), (2, 3),              # duplicate edge must collapse
    (7, 1), (7, 2), (7, 4), (7, 8), (7, 16), (7, 17),
]


def test_per_src_costs_match_replica(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["src"]: (r["deg"], r["gamma_bits"], r["delta_bits"])
        for r in adjacency_gap_costs(df).collect()
    }
    assert got == _replica(EDGES)


def test_dense_run_costs_one_bit_per_edge(spark):
    # successors 0..99: first gap 1, then all gaps 1 -> gamma = 1 bit
    df = spark.createDataFrame(
        [(42, d) for d in range(100)], "src long, dst long"
    )
    row = adjacency_gap_costs(df).collect()[0]
    assert row["deg"] == 100
    assert row["gamma_bits"] == 100


def test_summary_totals_and_ratio(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    rep = _replica(EDGES)
    row = compression_summary(df).collect()[0]
    n_edges = sum(v[0] for v in rep.values())
    g = sum(v[1] for v in rep.values())
    assert row["n_sources"] == len(rep)
    assert row["n_edges"] == n_edges
    assert row["gamma_bits"] == g
    assert row["delta_bits"] == sum(v[2] for v in rep.values())
    assert row["raw_bits"] == 64 * n_edges
    assert row["gamma_ratio"] == round(64 * n_edges / g, 6)


def test_assume_distinct_skips_dedup_but_same_on_unique_input(spark):
    uniq = list(set(EDGES))
    df = spark.createDataFrame(uniq, "src long, dst long")
    a = {tuple(r) for r in adjacency_gap_costs(df).collect()}
    b = {
        tuple(r)
        for r in adjacency_gap_costs(df, assume_distinct=True).collect()
    }
    assert a == b


def test_plan_is_jvm_only_single_window(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    plan = (
        compression_summary(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
