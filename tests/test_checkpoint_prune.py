"""Checkpoint retention (CheckpointManager.prune): old rank snapshots
drop, the newest survive, resume still works, metrics history intact."""

import os

import pytest

from dxa_pagerank_spark.datagen import edges_to_spark, synthetic_edges
from dxa_pagerank_spark.operators.pagerank import pagerank
from dxa_pagerank_spark.plans.checkpoint import CheckpointManager


def _run_with_ckpt(spark, root, run_id, rounds):
    n = 300
    src, dst = synthetic_edges(n, 0.6, 6, 21, n_slaves=1)
    edges = edges_to_spark(spark, src, dst)
    cm = CheckpointManager(str(root), run_id=run_id)
    pagerank(
        spark, edges, num_vertices=n, threshold=1e-12, max_rounds=rounds,
        num_partitions=4, checkpoint_manager=cm, checkpoint_interval=2,
    )
    return cm, edges, n


def _snapshot_iters(root, run_id):
    base = os.path.join(root, "ranks_ckpt", f"run_id={run_id}")
    if not os.path.isdir(base):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith("iteration=")
    )


def test_prune_keeps_newest_and_metrics(spark, tmp_path):
    root = tmp_path / "ckpt"
    cm, _, _ = _run_with_ckpt(spark, root, "t_prune", rounds=9)
    before = _snapshot_iters(str(root), "t_prune")
    assert len(before) >= 4  # interval 2, 9 rounds

    dropped = cm.prune(spark, keep_last=2)
    assert dropped == before[:-2]
    assert _snapshot_iters(str(root), "t_prune") == before[-2:]

    # metrics history is untouched (full trajectory still reported)
    assert cm.metrics_df(spark).count() == len(before)

    # pruning again is a no-op
    assert cm.prune(spark, keep_last=2) == []


def test_resume_after_prune_matches_uninterrupted(spark, tmp_path):
    import numpy as np

    root = tmp_path / "ckpt"
    cm, edges, n = _run_with_ckpt(spark, root, "t_prune_resume", rounds=7)
    cm.prune(spark, keep_last=1)

    full = pagerank(
        spark, edges, num_vertices=n, threshold=1e-12, max_rounds=20,
        num_partitions=4,
    )
    cm2 = CheckpointManager(str(root), run_id="t_prune_resume")
    resumed = pagerank(
        spark, edges, num_vertices=n, threshold=1e-12, max_rounds=20,
        num_partitions=4, checkpoint_manager=cm2, checkpoint_interval=2,
        resume=True,
    )
    assert resumed.rounds == full.rounds
    got_f = {r["id"]: r["rank"] for r in full.ranks.collect()}
    got_r = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    np.testing.assert_allclose(
        np.array([got_r[i] for i in range(n)]),
        np.array([got_f[i] for i in range(n)]),
        rtol=0,
        atol=1e-12,
    )


def test_prune_does_not_touch_other_runs(spark, tmp_path):
    root = tmp_path / "ckpt"
    cm_a, _, _ = _run_with_ckpt(spark, root, "run_a", rounds=7)
    cm_b, _, _ = _run_with_ckpt(spark, root, "run_b", rounds=7)
    b_before = _snapshot_iters(str(root), "run_b")
    cm_a.prune(spark, keep_last=1)
    assert _snapshot_iters(str(root), "run_b") == b_before


def test_keep_last_must_be_positive(spark, tmp_path):
    cm = CheckpointManager(str(tmp_path / "c"), run_id="x")
    with pytest.raises(ValueError):
        cm.prune(spark, keep_last=0)
