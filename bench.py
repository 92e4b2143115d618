"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "edges_per_sec_per_superstep": ..., "synth": {...}}

The BASELINE.json target metric is edges/sec per superstep on the
PageRank hot loop; measured here on a deterministic seeded synthetic
graph (N=1e7 = the reference's published scale, meanInDeg 6 => ~55M
unique edges — the reference's law,
CreateSyntheticGraphSeed.java:145-147) over fixed supersteps with the
CSR-in-Arrow kernel (median + min of post-warm-up rounds; the general
df loop is timed alongside in its own fresh JVM), plus the sf-dir
relational/graph suite. Scaling evidence (2/8/32 cores, weak scaling,
R-MAT skew, and N->4N real executors via local-cluster) is produced by
scripts/scaling_bench.py, scripts/weak_scaling.py, and
scripts/cluster_scaling.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 1e7 = the reference's published scale; the shm-exchange CSR loop
# finishes a 1e6 round inside the fixed per-job floor, so the smaller
# graph would measure scheduling, not the dataflow.
SYNTH_N = int(os.environ.get("BENCH_SYNTH_N", "10000000"))
SYNTH_ROUNDS = int(os.environ.get("BENCH_SYNTH_ROUNDS", "8"))
# the df loop is ~40-100x slower per round at this scale; 5 rounds
# (3 warm-up + 2 steady) keeps the suite under budget — the thorough
# df measurement lives in scripts/scaling_bench.py -> BENCH.md
DF_ROUNDS = int(os.environ.get("BENCH_DF_ROUNDS", "5"))
SYNTH_CACHE = os.environ.get(
    "BENCH_SYNTH_CACHE", f"/tmp/dxa_bench_edges_n{SYNTH_N}"
)


def _synth_edges_parquet(spark):
    """Deterministic synthetic edge table, cached as parquet."""
    import numpy as np

    if not os.path.exists(SYNTH_CACHE):
        from dxa_pagerank_spark.datagen import fast_synthetic_edges

        src, dst = fast_synthetic_edges(SYNTH_N, 6, seed=42)
        import pandas as pd

        pdf = pd.DataFrame({"src": src, "dst": dst})
        tmp = SYNTH_CACHE + ".tmp"
        spark.createDataFrame(pdf).repartition(CPUS).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(tmp, SYNTH_CACHE)
    return spark.read.parquet(SYNTH_CACHE)


def _df_synth_worker() -> None:
    """One fresh JVM for the df synth leg (invoked as a subprocess).

    Measured cause (BENCH.md "df-loop checkpoint storage" + the r03
    bench runs): after the sf suite + the csr loop have churned the
    shared JVM's heap, df rounds degrade 2-4x within the leg
    (round_ms rising monotonically), while a fresh JVM at local[32]
    holds ~5-6 s/round (sessionM). Every scaling session in BENCH.md
    already measures one JVM per leg; this applies the same
    methodology to the bench suite's df leg.
    """
    import statistics

    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(
        app_name="dxa_bench_df_synth", cores=CPUS, shuffle_partitions=CPUS
    )
    synth = spark.read.parquet(SYNTH_CACHE)
    t0 = time.monotonic()
    res = pagerank(
        spark, synth, num_vertices=SYNTH_N, damping=0.85, threshold=1e-15,
        max_rounds=DF_ROUNDS, num_partitions=CPUS,
    )
    wall = time.monotonic() - t0
    print(
        "DFROW"
        + json.dumps({"wall": round(wall, 3), "round_ms": res.round_ms})
    )
    spark.stop()


def main() -> None:
    from pyspark.sql import functions as F

    from dxa_pagerank_spark.operators.components import connected_components
    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.operators.triangles import triangle_count
    from dxa_pagerank_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dxa_bench", cores=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}

    # --- df synth leg FIRST, in its own fresh JVM (see
    # _df_synth_worker). The r05 runs showed the leg reads ~2x slower
    # when it runs after the suite (page-cache + shuffle-file litter,
    # occasional 1.6x straggler rounds); at the head of the run it
    # measures the same 5-6 s/round a standalone fresh JVM does. The
    # parent session sits idle while the subprocess owns the box.
    # Cold-cache caveat: on a machine without the /tmp edge cache, the
    # parent generates the 55M-row graph here (driver-side numpy ->
    # parquet) before pagerank_sf is timed — a one-time-per-machine
    # heap event of the kind BENCH.md §7 documents. The r05 warm-cache
    # A/B showed the sf suite unaffected by the subprocess itself
    # (pagerank_sf 26.8 df-last vs 26.6 df-first).
    # Falls back to an in-process measurement if the subprocess fails
    # for any reason — the bench must always print its JSON line.
    _synth_edges_parquet(spark)
    df_wall = None
    df_round_ms: list[int] = []
    try:
        import subprocess

        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--df-synth-worker"],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ),
        )
        for ln in proc.stdout.splitlines():
            if ln.startswith("DFROW{"):
                row = json.loads(ln[5:])
                df_wall = float(row["wall"])
                df_round_ms = list(row["round_ms"])
    except Exception:
        pass

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # --- sf-dir suite FIRST (BENCH_r02 ran the 10x-bigger 1e7 synth
    # loops before it in the same JVM, and the 40-round iterative
    # pagerank_sf regressed 33.7 -> 62.9 s from the hot heap/GC state
    # they leave behind; the one-shot queries were unaffected or
    # improved. Running sf before synth restores a fresh-JVM-equivalent
    # measurement — root-cause note in BENCH.md §7.) ---
    from dxa_pagerank_spark.operators.ktruss import k_truss

    sf_edges = entrymod._edges(spark, SF_DIR)

    timed(
        "pagerank_sf",
        lambda: pagerank(
            spark, sf_edges, threshold=1e-8, max_rounds=40, num_partitions=CPUS
        ).ranks.count(),
    )
    timed(
        "connected_components_sf",
        lambda: connected_components(spark, sf_edges).agg(
            F.countDistinct("component")
        ).collect(),
    )
    timed("triangle_count_sf", lambda: triangle_count(spark, sf_edges))
    # the sampled scale path beside the exact count: same plan on a
    # 1/2-rate hash-thinned edge set (wedge work ~1/4, output ~1/8)
    from dxa_pagerank_spark.operators.triangles import triangle_count_sampled

    timed(
        "triangle_doulion_sf",
        lambda: triangle_count_sampled(spark, sf_edges, p_inv=2, seed=7).collect(),
    )
    timed(
        "k_truss_sf",
        lambda: k_truss(spark, sf_edges, k=4).count(),
    )
    timed(
        "minhash_dedup_sf",
        lambda: entrymod.q_minhash_dedup(spark, SF_DIR).count(),
    )
    timed("ann_topk_sf", lambda: entrymod.q_ann_topk(spark, SF_DIR).count())
    timed(
        "doc_stats_sf",
        lambda: entrymod.q_doc_stats(spark, SF_DIR).agg(
            F.sum("n_tokens")
        ).collect(),
    )
    timed(
        "events_window_sf",
        lambda: entrymod.q_events_window_agg(spark, SF_DIR).count(),
    )
    timed(
        "line_dedup_sf",
        lambda: entrymod.q_web_line_dedup(spark, SF_DIR).agg(
            F.sum("n_lines_dropped")
        ).collect(),
    )
    timed(
        "ann_topk_ivf_sf",
        lambda: entrymod.q_ann_topk_ivf(spark, SF_DIR).count(),
    )
    timed(
        "substring_dedup_sf",
        lambda: entrymod.q_substring_dedup_stats(spark, SF_DIR).agg(
            F.sum("dup_tokens")
        ).collect(),
    )
    timed(
        "salsa_sf",
        lambda: entrymod.q_web_salsa(spark, SF_DIR).count(),
    )
    timed(
        "bm25_sf",
        lambda: entrymod.q_bm25_topk(spark, SF_DIR).count(),
    )
    timed(
        "bpe_train_sf",
        lambda: entrymod.q_bpe_merges(spark, SF_DIR).count(),
    )
    timed(
        "semdedup_sf",
        lambda: entrymod.q_semdedup_prune(spark, SF_DIR).filter(
            F.col("is_dup")
        ).count(),
    )
    timed(
        "betweenness_sf",
        lambda: entrymod.q_site_betweenness(spark, SF_DIR).count(),
    )
    timed(
        "skipgrams_sf",
        lambda: entrymod.q_walk_skipgrams(spark, SF_DIR).count(),
    )
    timed(
        "contamination_sf",
        lambda: entrymod.q_benchmark_contamination(spark, SF_DIR).agg(
            F.sum("contaminated_tokens")
        ).collect(),
    )
    timed(
        "louvain_sf",
        lambda: entrymod.q_web_louvain(spark, SF_DIR).agg(
            F.countDistinct("community")
        ).collect(),
    )
    # r04 operators as cheap legs so regressions in them stay visible
    # (VERDICT r04 #7)
    timed(
        "hyperball_sf",
        lambda: entrymod.q_hyperball_anf(spark, SF_DIR).agg(
            F.sum("est")
        ).collect(),
    )
    timed(
        "encoding_quality_sf",
        lambda: entrymod.q_encoding_quality(spark, SF_DIR).agg(
            F.sum("n_mojibake")
        ).collect(),
    )
    timed(
        "convergence_cert_sf",
        lambda: entrymod.q_convergence_certificate(spark, SF_DIR).count(),
    )
    timed(
        "leakage_split_sf",
        lambda: entrymod.q_leakage_split(spark, SF_DIR).agg(
            F.countDistinct("split")
        ).collect(),
    )

    # --- synthetic PageRank hot loop: the BASELINE.json metric ---
    # csr (the north_star kernel) is the headline; the general df loop
    # is timed alongside. Steady-state = min of rounds 4.. (first 3 are
    # warm-up; this host is shared, see BENCH.md for the methodology).
    from dxa_pagerank_spark.operators.pagerank_csr import pagerank_csr

    synth = _synth_edges_parquet(spark)
    n_edges = synth.count()
    t0 = time.monotonic()
    res = pagerank_csr(
        spark, synth, num_vertices=SYNTH_N, damping=0.85,
        threshold=1e-15,  # never converges in SYNTH_ROUNDS
        max_rounds=SYNTH_ROUNDS, num_partitions=CPUS,
    )
    synth_total = time.monotonic() - t0
    steady = res.round_ms[3:] if len(res.round_ms) > 3 else res.round_ms[-1:]
    # Two explicitly-named estimators (ADVICE r01): median = typical
    # observed round on this shared host, min = uncontended floor. The
    # headline edges_per_sec_per_superstep is the MEDIAN.
    import statistics

    per_round_med = statistics.median(steady) / 1000.0
    per_round_min = min(steady) / 1000.0
    timings["pagerank_csr_synth"] = round(synth_total, 3)

    # df leg fallback (the subprocess measurement ran at the head of
    # main(); only if it failed do we measure in-process here)
    if df_wall is None:
        t0 = time.monotonic()
        df_res = pagerank(
            spark, synth, num_vertices=SYNTH_N, damping=0.85, threshold=1e-15,
            max_rounds=DF_ROUNDS, num_partitions=CPUS,
        )
        df_wall = time.monotonic() - t0
        df_round_ms = df_res.round_ms
    timings["pagerank_df_synth"] = round(df_wall, 3)
    df_steady = df_round_ms[3:] if len(df_round_ms) > 3 else df_round_ms[-1:]

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (pagerank hot loop + graph + "
                "dedup/ann/text suite); see edges_per_sec_per_superstep",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "edges_per_sec_per_superstep": round(n_edges / per_round_med),
                "estimator": "median of steady-state rounds (see *_min keys "
                "for the uncontended-floor estimator; shared host)",
                "synth": {
                    "n_vertices": SYNTH_N,
                    "n_edges": int(n_edges),
                    "rounds": res.rounds,
                    "sec_per_round_median": round(per_round_med, 3),
                    "sec_per_round_min": round(per_round_min, 3),
                    "cores": CPUS,
                    "csr_edges_per_sec_median": round(n_edges / per_round_med),
                    "csr_edges_per_sec_min": round(n_edges / per_round_min),
                    "csr_round_ms": res.round_ms,
                    "df_round_ms": df_round_ms,
                    "df_edges_per_sec_median": round(
                        n_edges / (statistics.median(df_steady) / 1000.0)
                    ),
                    "df_edges_per_sec_min": round(
                        n_edges / (min(df_steady) / 1000.0)
                    ),
                },
            }
        )
    )


if __name__ == "__main__" and "--df-synth-worker" in sys.argv:
    _df_synth_worker()
elif __name__ == "__main__":
    main()
