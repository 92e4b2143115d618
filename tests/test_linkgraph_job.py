"""End-to-end link-graph analytics job (jobs/linkgraph_job.py):
in-process pipeline over the sf0.001 fixture plus one CLI subprocess
run producing all artifacts."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINEITEM = "/root/testdata/sf0.001/lineitem.parquet"


def _edges(spark):
    return spark.read.parquet(LINEITEM).select(
        F.col("l_orderkey").cast("long").alias("src"),
        F.col("l_suppkey").cast("long").alias("dst"),
    )


def test_run_analytics_report_shape(spark):
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import linkgraph_job

    args = linkgraph_job.argparse.Namespace(
        cores=8, damping=0.85, threshold=1e-6, max_rounds=40,
        site_block=25, top_k=10,
    )
    ranks, comps, site_ranks, report = linkgraph_job.run_analytics(
        spark, _edges(spark), args
    )
    assert report["pagerank_converged"]
    assert report["n_vertices"] == ranks.count() > 0
    assert report["n_components"] >= 1
    assert report["n_sites"] == site_ranks.count() > 0
    assert 0.0 <= report["reciprocity"]["reciprocity"] <= 1.0
    assert -1.0 <= report["assortativity"]["assortativity"] <= 1.0
    assert report["in_degree_skew"]["gini"] > 0
    # probability mass conserved
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_cli_subprocess_writes_artifacts(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    out = str(tmp_path / "lg_out")
    # feed the job an edges parquet derived from lineitem
    import duckdb

    edges_path = str(tmp_path / "edges.parquet")
    duckdb.connect().execute(
        f"COPY (SELECT l_orderkey::BIGINT AS src, l_suppkey::BIGINT AS dst "
        f"FROM read_parquet('{LINEITEM}')) TO '{edges_path}' (FORMAT PARQUET)"
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "linkgraph_job.py"),
            edges_path,
            "--out", out,
            "--cores", "8",
            "--threshold", "1e-6",
            "--max-rounds", "30",
            "--top-k", "5",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.load(open(os.path.join(out, "report.json")))
    assert report["n_edges"] > 0 and report["n_vertices"] > 0
    top = json.load(open(os.path.join(out, "top_ranks.json")))
    assert len(top) == 5
    assert top == sorted(top, key=lambda r: (-r["rank"], r["id"]))
    for sub in ("ranks", "components", "site_ranks"):
        assert os.path.isdir(os.path.join(out, sub))
