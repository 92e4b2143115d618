"""Convergence evidence for the BASELINE.json metric, at the
reference's own scale: run PageRank to L1 < 1e-10 (the north rule's
stopping criterion, not the reference README's 1e-3) on the N=1e7
draw-parity graph with BOTH independent loop implementations, then
report rounds, wall, edges/s per superstep, and the cross-
implementation max |rank_csr - rank_df| (the "scores allclose 1e-6"
leg, checked between two independently-coded executions of the same
semantics rather than against the unrunnable DXRAM original).

Usage: python scripts/convergence_check.py [N] [out.json]
Appends one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "bench_runs/convergence-1e7.jsonl"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
THRESHOLD = 1e-10


def main() -> None:
    from pyspark.sql import functions as F

    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.operators.pagerank_csr import pagerank_csr
    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="convergence", cores=CPUS, shuffle_partitions=CPUS)
    cache = f"/tmp/dxa_bench_edges_n{N}"
    if not os.path.exists(cache):
        import pandas as pd

        from dxa_pagerank_spark.datagen import fast_synthetic_edges

        src, dst = fast_synthetic_edges(N, 6, seed=42)
        pdf = pd.DataFrame({"src": src, "dst": dst})
        tmp = cache + ".tmp"
        spark.createDataFrame(pdf).repartition(CPUS).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, cache)
    edges = spark.read.parquet(cache)
    n_edges = edges.count()

    t0 = time.monotonic()
    csr = pagerank_csr(
        spark, edges, num_vertices=N, damping=0.85,
        threshold=THRESHOLD, max_rounds=200, num_partitions=CPUS,
    )
    csr_wall = time.monotonic() - t0
    csr_ranks = csr.ranks.persist()
    csr_ranks.count()

    t0 = time.monotonic()
    df_res = pagerank(
        spark, edges, num_vertices=N, damping=0.85, threshold=THRESHOLD,
        max_rounds=200, num_partitions=CPUS,
    )
    df_wall = time.monotonic() - t0
    df_ranks = df_res.ranks.persist()
    df_ranks.count()

    # cross-implementation agreement: max abs and max rel difference
    joined = csr_ranks.select("id", F.col("rank").alias("a")).join(
        df_ranks.select("id", F.col("rank").alias("b")), "id", "full"
    )
    # numpy.allclose(rtol=1e-6, atol=1e-8) semantics: |a-b| <= atol + rtol*|b|
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a").isNull() | F.col("b").isNull(), 1).otherwise(0)).alias("missing"),
        F.max(F.abs(F.col("a") - F.col("b"))).alias("max_abs"),
        F.max(F.abs(F.col("a") - F.col("b")) / F.abs(F.col("b"))).alias("max_rel"),
        F.sum(
            F.when(
                F.abs(F.col("a") - F.col("b"))
                > 1e-8 + 1e-6 * F.abs(F.col("b")),
                1,
            ).otherwise(0)
        ).alias("n_outside"),
    ).collect()[0]

    rec = {
        "n_vertices": N,
        "n_edges": int(n_edges),
        "threshold": THRESHOLD,
        "cores": CPUS,
        "csr": {
            "rounds": csr.rounds,
            "converged": csr.converged,
            "wall_s": round(csr_wall, 2),
            "sec_per_round_mean": round(csr_wall / max(csr.rounds, 1), 3),
            "edges_per_sec_per_superstep": round(
                n_edges / (csr_wall / max(csr.rounds, 1))
            ),
        },
        "df": {
            "rounds": df_res.rounds,
            "converged": df_res.converged,
            "wall_s": round(df_wall, 2),
            "sec_per_round_mean": round(df_wall / max(df_res.rounds, 1), 3),
            "edges_per_sec_per_superstep": round(
                n_edges / (df_wall / max(df_res.rounds, 1))
            ),
        },
        "cross_check": {
            "n_joined": int(row["n"]),
            "missing": int(row["missing"]),
            "max_abs_diff": float(row["max_abs"]),
            "max_rel_diff": float(row["max_rel"]),
            "n_outside_tolerance": int(row["n_outside"]),
            "allclose_1e6": bool(
                row["missing"] == 0 and row["n_outside"] == 0
            ),
        },
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
