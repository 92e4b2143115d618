"""Two-cluster-size scaling evidence (BASELINE.json: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction we
run the IDENTICAL PageRank job on the IDENTICAL input at local[8] and
local[32] (separate JVMs, one per parallelism) and report both
throughputs plus eff = (thr_32 / thr_8) / 4. Results go to BENCH.md.

Usage:
  python scripts/scaling_bench.py                  # full run -> BENCH.md
  python scripts/scaling_bench.py --worker C N R   # internal: one JVM
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SCALING_N", "10000000"))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "5"))
CACHE = f"/tmp/dxa_bench_edges_n{N}"


def ensure_cache() -> None:
    if os.path.exists(CACHE):
        return
    import pandas as pd

    from dxa_pagerank_spark.datagen import fast_synthetic_edges
    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="scaling_gen", cores=32, shuffle_partitions=32)
    src, dst = fast_synthetic_edges(N, 6, seed=42)
    pdf = pd.DataFrame({"src": src, "dst": dst})
    tmp = CACHE + ".tmp"
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, CACHE)
    spark.stop()


def worker(cores: int, n: int, rounds: int) -> None:
    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=cores
    )
    edges = spark.read.parquet(CACHE)
    n_edges = edges.count()
    res = pagerank(
        spark, edges, damping=0.85, threshold=1e-15, max_rounds=rounds,
        num_partitions=cores,
    )
    # steady-state: drop round 1 (includes adjacency build + first shuffle)
    steady = res.round_ms[1:] if len(res.round_ms) > 1 else res.round_ms
    sec_per_round = sum(steady) / 1000.0 / len(steady)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_vertices": n,
                "n_edges": n_edges,
                "rounds": res.rounds,
                "sec_per_round_steady": round(sec_per_round, 3),
                "edges_per_sec": round(n_edges / sec_per_round),
                "round_ms": res.round_ms,
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return

    ensure_cache()
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores), str(N), str(ROUNDS)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    thr8 = results[8]["edges_per_sec"]
    thr32 = results[32]["edges_per_sec"]
    eff = thr32 / thr8 / 4.0
    report = {
        "job": "power-iteration PageRank superstep (steady-state, rounds 2..5)",
        "input": {"n_vertices": N, "n_edges": results[32]["n_edges"],
                  "generator": "fast_synthetic_edges(N, mean_indeg=6, seed=42)"},
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report))

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling (this engine)

Hot-loop metric (BASELINE.json): **edges/sec per PageRank superstep**,
measured on the deterministic seeded synthetic graph
(N={N:,} vertices, {results[32]['n_edges']:,} edges, meanInDeg 6, seed 42),
identical input + identical job at two parallelism levels (separate JVMs).
Steady-state = mean of rounds 2..{ROUNDS} (round 1 pays the adjacency
build + first shuffle).

| config | sec/superstep (steady) | edges/sec per superstep |
|---|---|---|
| local[8]  | {results[8]['sec_per_round_steady']} | {results[8]['edges_per_sec']:,} |
| local[32] | {results[32]['sec_per_round_steady']} | {results[32]['edges_per_sec']:,} |

**Scaling efficiency (8 -> 32 cores, i.e. N -> 4N):**
`eff = (thr_32 / thr_8) / 4 = {eff:.3f}` (target >= 0.8)

Reference baseline (BASELINE.md): 8.4e5 edges/s per superstep
(10M vertices / 55.1M edges, 2 DXRAM peers, 65.73 s/round).
This engine at local[32] on the same graph size: {results[32]['edges_per_sec']:,} edges/s
({results[32]['edges_per_sec']/8.4e5:.1f}x the published reference throughput).

Raw per-round ms: local[8]={results[8]['round_ms']}, local[32]={results[32]['round_ms']}.

Reproduce: `python scripts/scaling_bench.py` (env: SCALING_N, SCALING_ROUNDS).
"""
        )
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
