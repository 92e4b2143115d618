"""Bloom gate vs a pure-Python replica + the no-false-negative law."""

import hashlib
import random

from dxa_pagerank_spark.functions.bloom import bloom_build, bloom_probe
from dxa_pagerank_spark.functions.cmsketch import A, B, P


def _key(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _cell(h, r, m):
    return ((A * ((h + B + r * 40503) % P)) % P) % m


def _replica(block, probes, m, k):
    bits = {
        _cell(_key(b), r, m) for b in block for r in range(k)
    }
    out = {}
    for p in probes:
        hits = sum(1 for r in range(k) if _cell(_key(p), r, m) in bits)
        out[p] = (hits, hits == k)
    return out


def _run(spark, block, probes, m, k):
    bdf = spark.createDataFrame([(x,) for x in block], "key string")
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    bits = bloom_build(bdf, m=m, k=k)
    got = {
        r["key"]: (r["hits"], r["member"])
        for r in bloom_probe(pdf, bits, m=m, k=k).collect()
    }
    assert got == _replica(block, probes, m, k)
    return got


def test_bloom_matches_replica_and_never_misses(spark):
    block = [f"bad{i}" for i in range(30)]
    probes = block + [f"ok{i}" for i in range(50)]
    got = _run(spark, block, sorted(set(probes)), m=1024, k=4)
    # no false negatives, ever
    assert all(got[b] == (4, True) for b in block)


def test_bloom_fp_rate_small_when_wide(spark):
    rng = random.Random(12)
    block = [f"u{rng.randrange(10**9)}" for _ in range(50)]
    clean = [f"c{i}" for i in range(300)]
    got = _run(spark, sorted(set(block)), clean, m=8192, k=4)
    fps = sum(1 for c in clean if got[c][1])
    assert fps <= 3  # expected ~0 at n=50, m=8192


def test_bloom_tiny_filter_saturates_honestly(spark):
    # m=8 with 30 keys: nearly every probe becomes a (reproducible)
    # false positive — the structure degrades predictably, not wrongly
    block = [f"x{i}" for i in range(30)]
    got = _run(spark, block, ["zzz-not-blocked"], m=8, k=3)
    assert got["zzz-not-blocked"][0] <= 3
