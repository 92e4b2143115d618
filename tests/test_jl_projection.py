"""JL projection vs a pure-Python replica + the distance-preservation
property the sketch exists for."""

import math
import random

import pytest

from dxa_pagerank_spark.functions.projection import A, B, C, P, jl_project


def _sign(i, j, seed):
    return 1.0 if ((A * ((i * C + j + B + seed) % P)) % P) % 2 == 0 else -1.0


def _replica(vecs, out_dim, seed):
    out = {}
    for vid, v in vecs.items():
        for j in range(out_dim):
            s = 0.0
            for i, x in enumerate(v):
                s = s + x * _sign(i, j, seed)
            out[(vid, j)] = round(s / math.sqrt(out_dim), 6)
    return out


def _vecs(seed, n, dim):
    rng = random.Random(seed)
    return {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        for i in range(n)
    }


def _run(spark, vecs, out_dim, seed):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id"], r["dim"]): r["value"]
        for r in jl_project(df, out_dim=out_dim, seed=seed).collect()
    }
    want = _replica(vecs, out_dim, seed)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    return got


def test_jl_matches_replica(spark):
    _run(spark, _vecs(3, n=12, dim=16), out_dim=4, seed=7)


def test_jl_seed_changes_sketch(spark):
    vecs = _vecs(4, n=3, dim=8)
    a = _run(spark, vecs, out_dim=4, seed=0)
    b = _run(spark, vecs, out_dim=4, seed=1)
    assert a != b


def test_jl_preserves_pairwise_distances(spark):
    # the JL property: with k=32 output dims, squared distances are
    # preserved within a modest distortion on a random sample
    vecs = _vecs(5, n=20, dim=64)
    got = _run(spark, vecs, out_dim=32, seed=2)
    proj = {
        i: [got[(i, j)] for j in range(32)] for i in vecs
    }
    rng = random.Random(6)
    ratios = []
    for _ in range(30):
        a, b = rng.sample(sorted(vecs), 2)
        d_orig = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
        d_proj = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        # with ±1/sqrt(k) entries, E[d_proj] = d_orig exactly
        ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.4


def test_jl_rejects_bad_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        jl_project(df, out_dim=0)
