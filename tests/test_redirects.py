"""resolve_redirects vs a pure-Python chain walker."""

import random

from dxa_pagerank_spark.operators.redirects import resolve_redirects


def _replica(pairs):
    rd = {}
    for s, d in pairs:
        if s == d:
            continue
        rd[s] = min(d, rd.get(s, d))
    out = {}
    for s in rd:
        cur, hops, seen = rd[s], 1, {s}
        while cur in rd:
            if cur in seen:
                out[s] = (-1, 0, True)
                break
            seen.add(cur)
            cur, hops = rd[cur], hops + 1
        else:
            out[s] = (cur, hops, False)
    return out


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["src"]: (r["final"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(spark, df, **kw).collect()
    }
    assert got == _replica(pairs)
    return got


def test_redirects_chain_and_terminal(spark):
    # 1 -> 2 -> 3 -> 9 (terminal), plus a direct hop
    _run(spark, [(1, 2), (2, 3), (3, 9), (7, 9)])


def test_redirects_cycle_and_feeder(spark):
    # 5 <-> 6 loop; 4 feeds into it; 1 -> 2 resolves normally
    got = _run(spark, [(5, 6), (6, 5), (4, 5), (1, 2)])
    assert got[5] == (-1, 0, True)
    assert got[6] == (-1, 0, True)
    assert got[4] == (-1, 0, True)
    assert got[1] == (2, 1, False)


def test_redirects_duplicate_src_takes_min_dst(spark):
    got = _run(spark, [(1, 8), (1, 3), (3, 9)])
    assert got[1] == (9, 2, False)


def test_redirects_long_chain_exact_hops(spark):
    # 100-hop chain: pointer doubling must report exact distances
    pairs = [(i, i + 1) for i in range(100)]
    got = _run(spark, pairs)
    assert got[0] == (100, 100, False)
    assert got[99] == (100, 1, False)


def test_redirects_random_functional_graph(spark):
    rng = random.Random(13)
    pairs = [(i, rng.randrange(60)) for i in rng.sample(range(60), 40)]
    _run(spark, pairs)
