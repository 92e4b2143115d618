"""schedule_frontier vs a pure-Python replica + the politeness law."""

import random
from collections import Counter

import pytest

from dxa_pagerank_spark.functions.frontier import schedule_frontier


def _replica(rows, per_host, max_waves):
    by_host = {}
    for i, h, p in rows:
        by_host.setdefault(h, []).append((i, p))
    out = []
    for h, items in by_host.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for r, (i, _) in enumerate(items, start=1):
            if max_waves is not None and r > per_host * max_waves:
                continue
            out.append((i, h, r, (r - 1) // per_host))
    return sorted(out)


def _run(spark, rows, per_host, max_waves=None):
    df = spark.createDataFrame(
        rows, "id long, host long, priority double"
    )
    got = sorted(
        tuple(r)
        for r in schedule_frontier(
            df, per_host=per_host, max_waves=max_waves
        ).collect()
    )
    assert got == _replica(rows, per_host, max_waves)
    return got


def test_frontier_hand_case(spark):
    rows = [
        (1, 0, 0.9),
        (2, 0, 0.5),
        (3, 0, 0.7),
        (4, 1, 0.6),
        (5, 1, 0.6),  # tie -> id order
    ]
    got = _run(spark, rows, per_host=2)
    waves = {i: w for i, _, _, w in got}
    assert waves == {1: 0, 3: 0, 2: 1, 4: 0, 5: 0}


def test_frontier_politeness_law(spark):
    rng = random.Random(23)
    rows = [
        (i, rng.randrange(6), round(rng.random(), 3)) for i in range(200)
    ]
    got = _run(spark, rows, per_host=3)
    per_wave_host = Counter((h, w) for _, h, _, w in got)
    assert max(per_wave_host.values()) <= 3


def test_frontier_max_waves_truncates(spark):
    rows = [(i, 0, float(100 - i)) for i in range(20)]
    got = _run(spark, rows, per_host=2, max_waves=3)
    assert len(got) == 6
    assert {w for _, _, _, w in got} == {0, 1, 2}


def test_frontier_rejects_bad_per_host(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0)], "id long, host long, priority double"
    )
    with pytest.raises(ValueError):
        schedule_frontier(df, per_host=0)


def test_frontier_capped_plan_uses_window_group_limit(spark):
    # with max_waves the rank filter must push a map-side per-host
    # top-K below the exchange (WindowGroupLimit), so a mega-host
    # never ships its full URL set
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "id long, host long, priority double",
    )
    out = schedule_frontier(df, per_host=2, max_waves=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan
