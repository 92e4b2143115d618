"""Checkpoint/resume property tests (FIXTURES.md F6, SURVEY.md §5.2.4):
a run killed mid-iteration and resumed must reproduce the uninterrupted
run — same iteration count, same trajectory, same final scores.
"""

import numpy as np

from dxa_pagerank_spark.datagen import edges_to_spark, synthetic_edges
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.plans.checkpoint import CheckpointManager


def _ranks_vec(res, n):
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    return np.array([got[i] for i in range(n)])


def test_resume_matches_uninterrupted(spark, tmp_path):
    n = 1000
    src, dst = synthetic_edges(n, 0.6, 6, 21, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)

    full = pagerank(
        spark, edges, num_vertices=n, threshold=1e-10, max_rounds=25,
        num_partitions=4,
    )

    # "killed at iteration 7": checkpoint every 3 rounds, stop after 7.
    cm = CheckpointManager(str(tmp_path / "ckpt"), run_id="t_resume")
    partial = pagerank(
        spark, edges, num_vertices=n, threshold=1e-10, max_rounds=7,
        num_partitions=4, checkpoint_manager=cm, checkpoint_interval=3,
    )
    assert partial.rounds == 7 and not partial.converged

    cm2 = CheckpointManager(str(tmp_path / "ckpt"), run_id="t_resume")
    resumed = pagerank(
        spark, edges, num_vertices=n, threshold=1e-10, max_rounds=25,
        num_partitions=4, checkpoint_manager=cm2, checkpoint_interval=3,
        resume=True,
    )

    assert resumed.rounds == full.rounds
    assert resumed.converged == full.converged
    # resumed trajectory: rounds 1..6 restored from metrics, 7.. recomputed
    np.testing.assert_allclose(
        np.array(resumed.errors), np.array(full.errors), rtol=1e-9, atol=1e-13
    )
    np.testing.assert_allclose(
        _ranks_vec(resumed, n), _ranks_vec(full, n), rtol=0, atol=1e-12
    )


def test_resume_from_converged_checkpoint(spark, tmp_path):
    """Resume after the run already converged: no extra iterations."""
    n = 200
    src, dst = synthetic_edges(n, 0.6, 4, 5, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    cm = CheckpointManager(str(tmp_path / "c2"), run_id="t_conv")
    first = pagerank(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=60,
        num_partitions=4, checkpoint_manager=cm, checkpoint_interval=5,
    )
    assert first.converged
    cm2 = CheckpointManager(str(tmp_path / "c2"), run_id="t_conv")
    resumed = pagerank(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=60,
        num_partitions=4, checkpoint_manager=cm2, resume=True,
    )
    assert resumed.rounds == first.rounds
    np.testing.assert_allclose(
        _ranks_vec(resumed, n), _ranks_vec(first, n), atol=1e-12
    )


def test_metrics_table(spark, tmp_path):
    n = 200
    src, dst = synthetic_edges(n, 0.6, 4, 5, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    cm = CheckpointManager(str(tmp_path / "c3"), run_id="t_metrics")
    res = pagerank(
        spark, edges, num_vertices=n, threshold=1e-8, max_rounds=60,
        num_partitions=4, checkpoint_manager=cm, checkpoint_interval=2,
    )
    mdf = cm.metrics_df(spark)
    rows = {r["iteration"]: r for r in mdf.collect()}
    assert max(rows) == res.rounds
    last = rows[max(rows)]
    assert abs(last["l1_err"] - res.errors[-1]) < 1e-15
    assert abs(last["dangling_mass"] - res.dangling_mass[-1]) < 1e-15
    assert last["run_id"] == "t_metrics"


def test_resave_same_iteration_latest_save_wins(spark, tmp_path):
    """Metrics are append-only; a crash-resume that re-saves an
    iteration appends a second row for it. The surviving row must be
    the LAST save (max save_seq), deterministically — not an arbitrary
    dropDuplicates pick."""
    import pandas as pd

    cm = CheckpointManager(str(tmp_path / "c4"), run_id="t_resave")
    ranks = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1], "rank": [0.5, 0.5]})
    )
    cm.save(ranks, iteration=3, l1_err=0.5, pr_sum=1.0,
            dangling_mass=0.1, wall_ms=111)
    cm.save(ranks, iteration=3, l1_err=0.25, pr_sum=1.0,
            dangling_mass=0.2, wall_ms=222)
    _, meta = cm.latest(spark)
    assert meta["iteration"] == 3
    assert meta["wall_ms"] == 222
    assert abs(meta["l1_err"] - 0.25) < 1e-15
    assert abs(meta["dangling_mass"] - 0.2) < 1e-15
    # metrics_df view also deduplicates to the surviving row
    mrows = cm.metrics_df(spark).filter("iteration = 3").collect()
    assert len(mrows) == 1
    assert abs(mrows[0]["l1_err"] - 0.25) < 1e-15
