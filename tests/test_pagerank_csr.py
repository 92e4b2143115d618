"""CSR/Arrow PageRank variant: must match the oracle AND the DataFrame
implementation trajectory-exactly."""

import numpy as np

from dxa_pagerank_spark.datagen import (
    FIXTURE_GRAPHS,
    edges_to_spark,
    parse_in_edge_list,
    synthetic_edges,
)
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.operators.pagerank_csr import pagerank_csr
from dxa_pagerank_spark.oracle import pagerank_oracle


def _vec(res, n):
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    return np.array([got[i] for i in range(n)])


def test_csr_matches_oracle_fixtures(spark):
    for name in ("g7_readme", "g_dangling", "g_dup"):
        n, src, dst = parse_in_edge_list(FIXTURE_GRAPHS[name])
        oracle = pagerank_oracle(n, src, dst, 0.85, 1e-10, 100)
        res = pagerank_csr(
            spark, edges_to_spark(spark, src, dst), num_vertices=n,
            threshold=1e-10, max_rounds=100, num_partitions=4,
        )
        assert res.rounds == oracle.rounds, name
        np.testing.assert_allclose(
            np.array(res.errors), np.array(oracle.errors), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(_vec(res, n), oracle.ranks, atol=1e-9)


def test_csr_matches_dataframe_impl(spark):
    n = 1000
    src, dst = synthetic_edges(n, 0.6, 6, 21, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    a = pagerank(spark, edges, num_vertices=n, threshold=1e-8,
                 max_rounds=60, num_partitions=4)
    b = pagerank_csr(spark, edges, num_vertices=n, threshold=1e-8,
                     max_rounds=60, num_partitions=4)
    assert a.rounds == b.rounds
    np.testing.assert_allclose(_vec(a, n), _vec(b, n), atol=1e-10)
    np.testing.assert_allclose(np.array(a.errors), np.array(b.errors), atol=1e-12)


def test_sweep_stale_workdirs(tmp_path, monkeypatch):
    """A SIGKILLed driver leaks its tmpfs workdir; the sweep reclaims
    dirs whose owner pid is dead (or whose pidfile is missing and the
    dir is over an hour old) and leaves live/recent ones alone."""
    import os
    import time

    import dxa_pagerank_spark.operators.pagerank_csr as mod

    monkeypatch.setattr(mod, "_SHM_DIR", str(tmp_path))

    def mk(name, pid=None, age=0.0):
        d = tmp_path / name
        d.mkdir()
        if pid is not None:
            (d / "owner.pid").write_text(str(pid))
        if age:
            t = time.time() - age
            os.utime(d, (t, t))
        return d

    dead_pid = 2**31 - 1  # above pid_max on linux: never a live process
    stale = mk("dxa_csr_stale", pid=dead_pid)
    live = mk("dxa_csr_live", pid=os.getpid())
    fresh_nopid = mk("dxa_csr_fresh", pid=None)          # racing startup
    old_nopid = mk("dxa_csr_old", pid=None, age=7200.0)  # garbled+old
    other = mk("not_ours", pid=dead_pid)                 # wrong prefix

    mod._sweep_stale_workdirs()

    assert not stale.exists()
    assert not old_nopid.exists()
    assert live.exists() and fresh_nopid.exists() and other.exists()


def test_csr_batch_boundary_merge(spark, monkeypatch):
    """Force many tiny Arrow batches per partition so dst segments
    straddle batch boundaries — covers the in-kernel merge that the
    driver's scatter-assemble relies on (operators/pagerank_csr.py)."""
    import dxa_pagerank_spark.operators.pagerank_csr as mod

    monkeypatch.setattr(mod, "_ARROW_BATCH_ROWS", 16)
    n = 300
    src, dst = synthetic_edges(n, 0.6, 6, 7, n_slaves=1)
    oracle = pagerank_oracle(n, src, dst, 0.85, 1e-10, 100)
    res = pagerank_csr(
        spark, edges_to_spark(spark, src, dst), num_vertices=n,
        threshold=1e-10, max_rounds=100, num_partitions=2,
    )
    assert res.rounds == oracle.rounds
    np.testing.assert_allclose(_vec(res, n), oracle.ranks, atol=1e-9)


def test_auto_mode_falls_back_to_broadcast_on_oversized_partitions(spark):
    """ADVICE r02: exchange='auto' with num_partitions > available slots
    must fall back to the broadcast exchange (correct at any partition
    count) instead of raising; the hard error stays for explicit 'shm'."""
    import pytest

    n = 300
    src, dst = synthetic_edges(n, 0.6, 4, 5, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    too_many = spark.sparkContext.defaultParallelism + 7
    res = pagerank_csr(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=40,
        num_partitions=too_many, exchange="auto",
    )
    assert res.converged
    ref = pagerank_csr(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=40,
        exchange="broadcast",
    )
    a = {r["id"]: r["rank"] for r in res.ranks.collect()}
    b = {r["id"]: r["rank"] for r in ref.ranks.collect()}
    assert all(abs(a[i] - b[i]) < 1e-12 for i in a)
    with pytest.raises(ValueError, match="barrier gang"):
        pagerank_csr(
            spark, edges, num_vertices=n, threshold=1e-8, max_rounds=5,
            num_partitions=too_many, exchange="shm",
        )


def test_broadcast_exchange_vertex_cap_guard(spark):
    """VERDICT r04 #4: the broadcast exchange materializes the degree
    table and rank vector on the driver, so an over-cap num_vertices
    must fail loudly (pointing at the df loop) BEFORE any job runs,
    and the cap must be overridable."""
    import pytest

    n = 50
    src, dst = synthetic_edges(n, 0.6, 4, 5, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    with pytest.raises(ValueError, match="operators.pagerank"):
        pagerank_csr(
            spark, edges, num_vertices=n, threshold=1e-8, max_rounds=5,
            exchange="broadcast", max_broadcast_vertices=10,
        )
    # raising the cap explicitly re-enables the run
    res = pagerank_csr(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=40,
        exchange="broadcast", max_broadcast_vertices=n,
    )
    assert res.converged
