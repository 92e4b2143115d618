"""Skip-gram pair extraction and PMI vs a pure-Python replica."""

import math
import random
from collections import Counter

from dxa_pagerank_spark.operators.walks import (
    A,
    B,
    C,
    P,
    random_walks,
    skipgram_cooccurrence,
    skipgram_pairs,
)


def _score(d, v, t):
    return (A * ((d + B * (v + C * t)) % P)) % P


def _walks(edges, seeds, length):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    out = {}
    for seed in seeds:
        v = seed
        walk = [v]
        for t in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = min(nbrs, key=lambda d: _score(d, v, t))
            walk.append(v)
        out[seed] = walk
    return out


def _replica_pairs(edges, seeds, length, window):
    pairs = Counter()
    for _, walk in _walks(edges, seeds, length).items():
        for i, c in enumerate(walk):
            for j, x in enumerate(walk):
                if i != j and abs(i - j) <= window:
                    pairs[(c, x)] += 1
    return pairs


def _replica_pmi(pairs):
    t = sum(pairs.values())
    cm, xm = Counter(), Counter()
    for (c, x), n in pairs.items():
        cm[c] += n
        xm[x] += n
    return {
        (c, x): round(math.log(n * t / (cm[c] * xm[x])), 6)
        for (c, x), n in pairs.items()
    }


def _dfs(spark, edges, seeds, length, window):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    w = random_walks(e, s, length=length)
    return (
        skipgram_pairs(w, window=window),
        skipgram_cooccurrence(w, window=window),
    )


def _check(spark, edges, seeds, length=4, window=2):
    pdf, cdf = _dfs(spark, edges, seeds, length, window)
    want = _replica_pairs(edges, seeds, length, window)
    got_raw = Counter(
        (r["center"], r["context"]) for r in pdf.collect()
    )
    assert got_raw == want
    want_pmi = _replica_pmi(want)
    got = {
        (r["center"], r["context"]): (r["n_cooc"], r["pmi"])
        for r in cdf.collect()
    }
    assert set(got) == set(want)
    for k, (n, pmi) in got.items():
        assert n == want[k]
        assert pmi == want_pmi[k]


def test_skipgrams_hand_graph(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 3)]
    _check(spark, edges, [0, 3])


def test_skipgrams_offsets_and_window(spark):
    # a pure chain: walk from 0 is 0-1-2-3-4; window 1 keeps only
    # adjacent pairs, and offsets are exactly ±1
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    pdf, _ = _dfs(spark, edges, [0], length=4, window=1)
    rows = {(r["center"], r["context"], r["offset"]) for r in pdf.collect()}
    want = set()
    for i in range(4):
        want.add((i, i + 1, 1))
        want.add((i + 1, i, -1))
    assert rows == want


def test_skipgrams_random_graph(spark):
    rng = random.Random(31)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    seeds = list(range(0, 30, 5))
    _check(spark, edges, seeds, length=5, window=3)


def test_skipgram_dangling_seed_yields_no_pairs(spark):
    # a seed with no out-edges walks zero steps -> no pairs at all
    edges = [(1, 2)]
    pdf, cdf = _dfs(spark, edges, [0], length=4, window=2)
    assert pdf.count() == 0 and cdf.count() == 0
