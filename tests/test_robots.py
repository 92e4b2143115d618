"""Robots-exclusion oracles: the declarative robots.txt parser and the
robots-constrained politeness schedule against pure-Python references
(REP semantics restricted to User-agent / Disallow / Crawl-delay)."""

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.robots import apply_robots, parse_robots

ROBOTS = [
    (0, "User-agent: *\nDisallow: /\n"),
    (1, "user-agent: *\ncrawl-delay: 2\nDisallow:\n"),  # case + empty allow
    (2, "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /doc/1\nDisallow: /tmp\n"),
    (3, "User-agent: *\n"),  # group with no directives
    (5, "User-agent: badbot\nDisallow: /\n"),  # no * group at all
]
# host 4 has no robots.txt: default allow

FRONTIER = [
    # (id, host, path, priority)
    *[(h * 100 + i, h, f"/doc/{i}", (7 * i) % 11) for h in range(6)
      for i in range(8)],
    # highest-priority URL on host 2, robots-blocked by the /tmp prefix:
    # must never consume a politeness rank slot
    (999, 2, "/tmp/cache", 99),
]


def _dfs(spark):
    robots = spark.createDataFrame(ROBOTS, "host long, robots_txt string")
    frontier = spark.createDataFrame(
        FRONTIER, "id long, host long, path string, priority long"
    )
    return robots, frontier


def test_parse_rules(spark):
    robots, _ = _dfs(spark)
    rules = {
        r.host: (r.disallow_all, r.crawl_delay, list(r.prefixes))
        for r in parse_robots(robots).collect()
    }
    assert rules == {
        0: (True, 1, []),
        1: (False, 2, []),
        2: (False, 1, ["/doc/1", "/tmp"]),
        3: (False, 1, []),
        # host 5's file has no User-agent: * group -> no rules row
    }


def test_parse_honours_requested_agent(spark):
    robots, _ = _dfs(spark)
    rules = {
        r.host: r.disallow_all
        for r in parse_robots(robots, agent="badbot").collect()
    }
    assert rules == {2: True, 5: True}


def _schedule_py(per_host, max_waves):
    rules = {
        0: (True, 1, []),
        1: (False, 2, []),
        2: (False, 1, ["/doc/1", "/tmp"]),
        3: (False, 1, []),
    }
    out = []
    for h in range(6):
        dis_all, delay, prefixes = rules.get(h, (False, 1, []))
        if dis_all:
            continue
        rows = [
            (i, p, pr) for (i, hh, p, pr) in FRONTIER
            if hh == h and not any(p.startswith(x) for x in prefixes)
        ]
        rows.sort(key=lambda r: (-r[2], r[0]))
        cap = max(1, per_host // delay)
        for rank0, (i, _, _) in enumerate(rows):
            wave = rank0 // cap
            if wave < max_waves:
                out.append((i, h, rank0 + 1, wave))
    return sorted(out)


def test_schedule_matches_reference(spark):
    robots, frontier = _dfs(spark)
    got = sorted(
        (r.id, r.host, r.host_rank, r.wave)
        for r in apply_robots(
            frontier, parse_robots(robots), per_host=3, max_waves=2
        ).collect()
    )
    assert got == _schedule_py(3, 2)
    # banned host gone entirely; blocked paths never consume rank slots
    assert all(h != 0 for (_, h, _, _) in got)
    host2_ids = [i for (i, h, _, _) in got if h == 2]
    assert host2_ids and 201 not in host2_ids  # /doc/1 prefix-blocked
    assert 999 not in host2_ids  # /tmp-blocked despite top priority
    # crawl-delay host fetches 1 URL per wave instead of 3
    host1 = [(rk, w) for (i, h, rk, w) in got if h == 1]
    assert sorted(host1) == [(1, 0), (2, 1)]


def test_schedule_plan_is_jvm_only(spark):
    robots, frontier = _dfs(spark)
    df = apply_robots(frontier, parse_robots(robots), 3, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
