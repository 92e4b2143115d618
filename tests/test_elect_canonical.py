"""elect_canonical (functions/dedup.py): rank-weighted canonical per
dup cluster, exact integer tie rules."""

from dxa_pagerank_spark.functions.dedup import elect_canonical


def _run(spark, groups, weights):
    g = spark.createDataFrame(groups, "doc_id long, group_id long")
    w = spark.createDataFrame(weights, "doc_id long, w long")
    return {
        r["doc_id"]: (
            r["group_id"],
            r["canonical_id"],
            r["is_canonical"],
            r["group_size"],
        )
        for r in elect_canonical(g, w).collect()
    }


def test_max_weight_wins(spark):
    got = _run(
        spark,
        [(1, 1), (2, 1), (3, 1), (9, 9)],
        [(1, 10), (2, 99), (3, 5), (9, 0)],
    )
    assert got[1] == (1, 2, False, 3)
    assert got[2] == (1, 2, True, 3)
    assert got[3] == (1, 2, False, 3)
    # singleton group: its only member is canonical even at weight 0
    assert got[9] == (9, 9, True, 1)


def test_tie_breaks_to_smaller_id(spark):
    got = _run(spark, [(5, 1), (3, 1), (7, 1)], [(5, 4), (3, 4), (7, 4)])
    assert got[3] == (1, 3, True, 3)
    assert got[5][1] == 3 and got[7][1] == 3


def test_exactly_one_canonical_per_group(spark):
    groups = [(d, d % 4) for d in range(40)]
    weights = [(d, (d * 7) % 11) for d in range(40)]
    got = _run(spark, groups, weights)
    per_group = {}
    for doc, (g, canon, is_c, size) in got.items():
        per_group.setdefault(g, []).append((doc, canon, is_c, size))
    for g, members in per_group.items():
        assert sum(1 for _, _, c, _ in members if c) == 1
        assert len({canon for _, canon, _, _ in members}) == 1
        assert all(size == len(members) for _, _, _, size in members)


def test_plan_has_no_window_over_members(spark):
    g = spark.createDataFrame([(1, 1)], "doc_id long, group_id long")
    w = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    plan = (
        elect_canonical(g, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
