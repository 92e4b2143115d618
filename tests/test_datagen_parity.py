"""Vectorized draw-parity generator must reproduce the pure-Python
reference replica (datagen.synthetic_edges) EXACTLY — same edges in the
same draw order — across graph shapes that force every rare code path:
HashSet duplicate re-attempts, self-loop redraw loops (including the
cross-batch window growth they cause), nextInt rejection skips, and the
cross-slave locality branch."""

import numpy as np
import pytest

from dxa_pagerank_spark.datagen import synthetic_edges
from dxa_pagerank_spark.datagen_parity import (
    indegree_stream,
    parity_synthetic_edges,
    raw_states,
    synthetic_edges_distributed,
)
from dxa_pagerank_spark.javarandom import JavaRandom


def test_raw_states_bit_exact():
    r = JavaRandom(123456789)
    ref = []
    for _ in range(10_000):
        r._next(31)
        ref.append(r._seed)
    assert (raw_states(123456789, 10_000) == np.array(ref, dtype=np.uint64)).all()


def test_indegree_stream_matches_scalar():
    import math

    n, mean, seed = 5_000, 6, 21
    rng = JavaRandom(seed + 1)
    inv = math.pow(mean, -1)
    ref = []
    for _ in range(n):
        u = rng.next_double()
        ref.append(min(int(math.log(1 - u) / -inv), n - 1))
    assert (indegree_stream(n, mean, seed) == np.array(ref)).all()


@pytest.mark.parametrize(
    "n,loc,mean,seed,S",
    [
        (40, 0.5, 15, 7, 1),      # dense dups + self-loops, single slave
        (40, 0.5, 15, 7, 2),      # + cross-slave branch
        (64, 0.8, 20, 21, 2),     # coupon-collector regime (dup storms)
        (1000, 0.6, 6, 21, 1),    # the README example law at S=1
        (1000, 0.8, 6, 42, 2),    # the published run's law, small
        (1000, 0.3, 6, 99, 4),    # low locality, 4 slaves
        (997, 0.6, 6, 5, 1),      # odd n (nextInt rejections possible)
        (30, 0.2, 25, 11, 3),     # tiny + extreme density
    ],
)
def test_parity_vs_pure_python(n, loc, mean, seed, S):
    s1, d1 = synthetic_edges(n, loc, mean, seed, n_slaves=S)
    s2, d2 = parity_synthetic_edges(n, loc, mean, seed, n_slaves=S)
    assert len(s1) == len(s2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)


def test_parity_unequal_counts_fast_path():
    """n % S != 0 takes the per-slave block fast path (bound tables per
    distinct ceil/floor count) and stays draw-parity exact."""
    for n, S, loc, mean, seed in [
        (101, 2, 0.7, 5, 13),
        (1001, 3, 0.6, 4, 42),
        (505, 4, 0.3, 6, 11),
        (101, 2, 1.0, 4, 5),  # locality 1: no cross draws at all
    ]:
        s1, d1 = synthetic_edges(n, loc, mean, seed, n_slaves=S)
        s2, d2 = parity_synthetic_edges(n, loc, mean, seed, n_slaves=S)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(d1, d2)


def test_parity_unequal_counts_medium_scale():
    """(N=1e5+1, S=2) parity vs the pure replica (VERDICT r02 item 8)."""
    n = 100_001
    s1, d1 = synthetic_edges(n, 0.6, 4, 5, n_slaves=2)
    s2, d2 = parity_synthetic_edges(n, 0.6, 4, 5, n_slaves=2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)


def test_only_slave_partitions_unequal_counts():
    n, S = 1001, 3
    s_all, d_all = parity_synthetic_edges(n, 0.7, 5, 9, n_slaves=S)
    parts = [
        parity_synthetic_edges(n, 0.7, 5, 9, n_slaves=S, only_slave=i)
        for i in range(S)
    ]
    # ceil/floor block bounds
    counts = [334, 334, 333]
    off = [0, 334, 668]
    for i, (s_i, d_i) in enumerate(parts):
        assert ((d_i >= off[i]) & (d_i < off[i] + counts[i])).all()
    got = np.concatenate([p[0] * n + p[1] for p in parts])
    want = s_all * n + d_all
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_only_slave_partitions_the_edge_set():
    n, S = 1000, 2
    s_all, d_all = parity_synthetic_edges(n, 0.8, 6, 42, n_slaves=S)
    parts = [
        parity_synthetic_edges(n, 0.8, 6, 42, n_slaves=S, only_slave=i)
        for i in range(S)
    ]
    c = n // S
    for i, (s_i, d_i) in enumerate(parts):
        assert ((d_i >= i * c) & (d_i < (i + 1) * c)).all()
    assert sum(len(p[0]) for p in parts) == len(s_all)
    # concatenating the slave blocks in slave order != draw order, so
    # compare as multisets of (src, dst) pairs
    got = np.concatenate([p[0] * n + p[1] for p in parts])
    want = s_all * n + d_all
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_parity_medium_scale():
    """1e5-vertex parity vs the pure replica (VERDICT r01 item 6)."""
    n = 100_000
    s1, d1 = synthetic_edges(n, 0.8, 6, 42, n_slaves=2)
    s2, d2 = parity_synthetic_edges(n, 0.8, 6, 42, n_slaves=2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)


def test_distributed_generator_matches(spark):
    n, S = 2000, 2
    s1, d1 = parity_synthetic_edges(n, 0.8, 6, 42, n_slaves=S)
    df = synthetic_edges_distributed(spark, n, 0.8, 6, 42, n_slaves=S)
    pdf = df.toPandas()
    got = np.sort(pdf["src"].to_numpy() * n + pdf["dst"].to_numpy())
    want = np.sort(s1 * n + d1)
    np.testing.assert_array_equal(got, want)


def test_rmat_spark_matches_numpy(spark):
    """The Spark column-program R-MAT generator must regenerate the
    numpy form edge-for-edge, and the degree tail must be heavy."""
    from collections import Counter

    import numpy as np

    from dxa_pagerank_spark.datagen import rmat_edges, rmat_edges_df

    src, dst = rmat_edges(scale=8, n_edges=2048, seed=3)
    got = rmat_edges_df(spark, scale=8, n_edges=2048, seed=3).collect()
    got_pairs = sorted((r["src"], r["dst"]) for r in got)
    assert got_pairs == sorted(zip(src.tolist(), dst.tolist()))
    # heavy tail: the max in-degree dwarfs the mean (R-MAT property)
    deg = Counter(dst.tolist())
    assert max(deg.values()) > 5 * (len(dst) / len(deg))
    assert src.max() < 2**8 and dst.max() < 2**8 and src.min() >= 0


def test_rmat_xxhash_mode_skewed_in_range_shuffle_free(spark):
    """hash_fn='xxhash64' (the unbounded bench-input draw): ids stay in
    range, the tail stays heavy, and the plan stays a shuffle-free pure
    column program."""
    from dxa_pagerank_spark.datagen import rmat_edges_df

    df = rmat_edges_df(spark, scale=10, n_edges=8192, hash_fn="xxhash64")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    pdf = df.toPandas()
    n = 1 << 10
    assert pdf["src"].between(0, n - 1).all()
    assert pdf["dst"].between(0, n - 1).all()
    deg = pdf.groupby("src").size()
    assert deg.max() > 5 * deg.mean()


def test_rmat_portable_overflow_guard_and_bad_hash_fn(spark):
    import pytest

    from dxa_pagerank_spark.datagen import rmat_edges_df

    with pytest.raises(ValueError, match="overflows int64"):
        rmat_edges_df(spark, scale=33, n_edges=1 << 33)
    with pytest.raises(ValueError, match="unknown hash_fn"):
        rmat_edges_df(spark, scale=4, n_edges=16, hash_fn="md5")
