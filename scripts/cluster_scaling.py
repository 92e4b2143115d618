"""True multi-executor scaling evidence: spark-submit onto local-cluster[E,c,m].

Every other scaling harness in this repo varies THREAD count inside one
JVM (`local[C]`). The BASELINE.json criterion is phrased in EXECUTORS
("throughput scaling efficiency >= 0.8 from N to 4N executors"), and the
north_rule demands "spark-submit --py-files on a multi-executor cluster
at two cluster sizes". Spark's `local-cluster[E, c, mem]` master spawns
E REAL standalone-mode executor JVMs (separate processes, separate
heaps, BlockManager shuffle + torrent broadcast between them) on one
box — the closest realization of "N and 4N executors" this sandbox
permits. This harness:

  * zips the package and launches each leg through the actual
    `spark-submit --py-files dxa_pagerank_spark.zip` binary with a
    scrubbed PYTHONPATH (the code can only resolve from the zip, as on
    a real cluster),
  * runs the IDENTICAL df PageRank job (the general cluster path; the
    csr/shm loop is the documented single-box accelerator) on the
    IDENTICAL cached edge table at E = 1, 2, 4, 8 executors x 2 cores,
  * reports median + min steady-state s/round per leg (same estimator
    conventions as scripts/scaling_bench.py), the two N->4N pairs
    (1->4 and 2->8 executors), and
  * asserts per-vertex determinism ACROSS cluster sizes: every leg
    prints its rank sum, a vertex-weighted checksum, and the top-5
    (vertex, rank) pairs; the orchestrator fails if any leg disagrees
    (north_rule: scores allclose across cluster sizes).

What one box can and cannot prove: the E executor JVMs here still
share one socket's DRAM bandwidth, where a real cluster adds memory
channels, NICs, and disks with every node — so the absolute ceilings of
BENCH.md's strong-scaling sections still apply. What this harness adds
over `local[C]` legs is the REAL multi-executor execution path:
cross-JVM shuffle blocks, torrent broadcast of the dangling scalar and
join sides, per-executor Python worker pools, and per-executor heaps
(no shared-JVM GC coupling between executors).

Graph: the reference generator's law (mean in-degree 6) via the fast
same-law generator at N=10M vertices / ~55M edges — the reference's
published scale (BASELINE.md).

Usage:
  python scripts/cluster_scaling.py            # orchestrate all legs
  CLUSTER_EXECUTORS=2,8 python scripts/cluster_scaling.py
  (internal) spark-submit ... cluster_scaling.py --worker E c rounds n path

Rows append to bench_runs/sessionC-cluster.jsonl; fold results into
BENCH.md by hand (never --report; BENCH.md is hand-extended).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("CLUSTER_N", "10000000"))
ROUNDS = int(os.environ.get("CLUSTER_ROUNDS", "12"))
EXECUTORS = [
    int(e) for e in os.environ.get("CLUSTER_EXECUTORS", "1,2,4,8").split(",")
]
CORES_PER = int(os.environ.get("CLUSTER_CORES_PER", "2"))
EXEC_MB = int(os.environ.get("CLUSTER_EXEC_MB", "6144"))
LOOPS = os.environ.get("CLUSTER_LOOPS", "df").split(",")
# graph law: "ref" = the reference generator's near-uniform degrees
# (fast same-law generator); "rmat" = Graph500 power-law hubs — the
# skew x executors cell of the evidence matrix (N must be a power of
# two; edge count = CLUSTER_EF * N). Cache paths match
# scripts/scaling_bench.py so the graphs are shared between harnesses.
GRAPH = os.environ.get("CLUSTER_GRAPH", "ref")
EDGE_FACTOR = int(os.environ.get("CLUSTER_EF", "16"))
OUT = os.path.join(REPO, "bench_runs", "sessionC-cluster.jsonl")
CACHE = (
    f"/tmp/dxa_bench_edges_rmat{EDGE_FACTOR}_n{N}"
    if GRAPH == "rmat"
    else f"/tmp/dxa_cluster_edges_fast_n{N}"
)


def ensure_cache() -> None:
    if os.path.exists(CACHE):
        return
    sys.path.insert(0, REPO)
    import pandas as pd

    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="cluster_gen", cores=32, shuffle_partitions=32)
    if GRAPH == "rmat":
        from dxa_pagerank_spark.datagen import rmat_edges_df

        scale = N.bit_length() - 1
        if (1 << scale) != N:
            raise SystemExit("CLUSTER_GRAPH=rmat needs power-of-two CLUSTER_N")
        edges = rmat_edges_df(
            spark, scale, EDGE_FACTOR * N, seed=42, num_partitions=96
        )
    else:
        from dxa_pagerank_spark.datagen import fast_synthetic_edges

        src, dst = fast_synthetic_edges(N, 6, seed=42)
        edges = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
    tmp = CACHE + ".tmp"
    edges.repartition(96).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, CACHE)
    spark.stop()


def build_zip(dest_dir: str) -> str:
    """Package zip exactly as a deploy step would (no repo leakage)."""
    pkg = os.path.join(REPO, "dxa_pagerank_spark")
    zip_path = os.path.join(dest_dir, "dxa_pagerank_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in files:
                if name.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def worker(
    loop: str, execs: int, cores: int, rounds: int, n: int, path: str
) -> None:
    # Under spark-submit the master/memory come from the launcher; the
    # SQL confs below are runtime-settable and mirror session.get_spark.
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    total = execs * cores
    spark = (
        SparkSession.builder.appName(f"cluster_scaling_{loop}_{execs}x{cores}")
        .config("spark.sql.shuffle.partitions", str(total))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    edges = spark.read.parquet(path)
    n_edges = edges.count()
    if loop == "csr":
        # the Arrow-CSR accelerator's any-master exchange: torrent-
        # broadcast ranks out, driver scatter-assembly back (the
        # documented Amdahl floor — reported, not hidden)
        from dxa_pagerank_spark.operators.pagerank_csr import pagerank_csr

        res = pagerank_csr(
            spark, edges, num_vertices=n, damping=0.85, threshold=1e-15,
            max_rounds=rounds, num_partitions=total, exchange="broadcast",
        )
    else:
        from dxa_pagerank_spark.operators.pagerank import pagerank

        res = pagerank(
            spark, edges, damping=0.85, threshold=1e-15, max_rounds=rounds,
            num_partitions=total,
        )
    steady = res.round_ms[3:] if len(res.round_ms) > 3 else res.round_ms[-1:]
    sec_med = statistics.median(steady) / 1000.0
    sec_min = min(steady) / 1000.0
    # Cross-cluster-size determinism fingerprint (north_rule allclose):
    # rank mass, a vertex-weighted checksum, and the top-5 vertices.
    agg = res.ranks.agg(
        F.sum("rank").alias("s"),
        F.sum(F.col("rank") * F.pmod(F.col("id") * 2654435761, F.lit(2**31))).alias("c"),
    ).collect()[0]
    top = [
        (int(r["id"]), round(float(r["rank"]), 12))
        for r in res.ranks.orderBy(F.desc("rank"), "id").limit(5).collect()
    ]
    print(
        "ROW"
        + json.dumps(
            {
                "loop": loop,
                "executors": execs,
                "cores_per_executor": cores,
                "total_cores": total,
                "n_vertices": n,
                "n_edges": n_edges,
                "rounds": res.rounds,
                "sec_per_round_steady": round(sec_med, 3),
                "sec_per_round_min": round(sec_min, 3),
                "edges_per_sec": round(n_edges / sec_med),
                "edges_per_sec_min": round(n_edges / sec_min),
                "round_ms": res.round_ms,
                "rank_sum": float(agg["s"]),
                "rank_checksum": float(agg["c"]),
                "top5": top,
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
            int(sys.argv[5]), int(sys.argv[6]), sys.argv[7],
        )
        return

    ensure_cache()
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    import tempfile

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = build_zip(tmp)
        job_copy = os.path.join(tmp, "cluster_scaling.py")
        shutil.copy(os.path.abspath(__file__), job_copy)
        env = {
            k: v
            for k, v in os.environ.items()
            # the package must resolve from --py-files only
            if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
        }
        for loop in LOOPS:
          for execs in EXECUTORS:
            proc = subprocess.run(
                [
                    spark_submit,
                    "--master", f"local-cluster[{execs},{CORES_PER},{EXEC_MB}]",
                    "--driver-memory", "8g",
                    # the bracket arg is the WORKER's capacity; executors
                    # still default to 1g heap without this conf
                    "--conf", f"spark.executor.memory={EXEC_MB}m",
                    "--py-files", zip_path,
                    job_copy,
                    "--worker", loop, str(execs), str(CORES_PER),
                    str(ROUNDS), str(N), CACHE,
                ],
                capture_output=True, text=True, timeout=3600, env=env, cwd=tmp,
            )
            lines = [
                ln[3:] for ln in proc.stdout.splitlines() if ln.startswith("ROW{")
            ]
            if proc.returncode != 0 or not lines:
                print(proc.stdout[-2000:], proc.stderr[-3000:], file=sys.stderr)
                raise SystemExit(f"leg {loop} executors={execs} failed")
            row = json.loads(lines[-1])
            rows.append(row)
            print(json.dumps(row))
            with open(OUT, "a") as f:
                f.write(json.dumps(row) + "\n")

    # determinism across cluster sizes (north_rule: allclose 1e-6; the
    # engine is deterministic well past that)
    # Scalar sums over 10^7 doubles pick up partition-order float noise
    # (~1e-10..1e-8 relative); the north_rule bar is allclose 1e-6. The
    # per-vertex top-5 check below stays at 1e-9 (few-term sums).
    by_loop: dict[str, list[dict]] = {}
    for r in rows:
        by_loop.setdefault(r["loop"], []).append(r)
    for loop_rows in by_loop.values():
      base = loop_rows[0]
      for r in loop_rows[1:]:
        assert abs(r["rank_sum"] - base["rank_sum"]) < 1e-6, (base, r)
        assert abs(r["rank_checksum"] - base["rank_checksum"]) / abs(
            base["rank_checksum"]
        ) < 1e-6, (base, r)
        assert [t[0] for t in r["top5"]] == [t[0] for t in base["top5"]], (base, r)
        for (va, ra), (vb, rb) in zip(base["top5"], r["top5"]):
            assert abs(ra - rb) < 1e-9, (va, ra, vb, rb)
    print("determinism across cluster sizes: OK (per loop)")

    for loop, loop_rows in by_loop.items():
        by_e = {r["executors"]: r for r in loop_rows}
        for lo, hi in [(lo, hi) for lo in by_e for hi in by_e if hi == 4 * lo]:
            a, b = by_e[lo], by_e[hi]
            eff_med = a["sec_per_round_steady"] / (b["sec_per_round_steady"] * 4)
            eff_min = a["sec_per_round_min"] / (b["sec_per_round_min"] * 4)
            print(
                f"{loop} executors {lo} -> {hi}: eff(median)={eff_med:.3f} "
                f"eff(min)={eff_min:.3f}"
            )


if __name__ == "__main__":
    main()
