"""spark-submit entry point with the reference's CLI contract.

Reference invocation (README.md:43-47):
  apprun de.hhu.bsinfo.dxapp.MainPR N damping threshold maxRounds printPR \
         (graphfile | locality meanInDeg seed)

Ours:
  spark-submit --py-files dxa_pagerank_spark.zip jobs/pagerank_job.py \
      N damping threshold maxRounds printPR (graphfile | locality meanInDeg seed) \
      [--out DIR] [--impl dataframe|csr] [--cores C] [--fast-gen]

Outputs (format parity with PRInfoTask.java:52-97 / PrStatisticsJob.java:50-95):
  <out>/pageRank/part-*.pageRank  — "name rank" lines (1-based names,
                                    plain decimal, space separated)
  <out>/statistics.out            — NUM_SLAVES/NUM_VERTICES/... + per-
                                    round error/time table
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("vertexCnt", type=int)
    ap.add_argument("damping", type=float)
    ap.add_argument("threshold", type=float)
    ap.add_argument("maxRounds", type=int)
    ap.add_argument("printPR", type=lambda s: s.lower() == "true")
    ap.add_argument("source", nargs="+",
                    help="graphfile | locality meanInDeg seed")
    ap.add_argument("--out", default=None)
    ap.add_argument("--impl", choices=["dataframe", "csr"], default="dataframe")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--fast-gen", action="store_true",
                    help="NumPy generator (same law, not draw-parity) for large N")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dxa_pagerank_spark.datagen import (
        edges_to_spark,
        fast_synthetic_edges,
        synthetic_edges,
    )
    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.operators.pagerank_csr import pagerank_csr
    from dxa_pagerank_spark.session import get_spark
    from dxa_pagerank_spark.sources.edgelist import read_in_edge_list

    spark = get_spark(app_name="dxa_pagerank_job", cores=args.cores)

    t0 = time.monotonic()
    synthetic = len(args.source) == 3
    locality, mean_indeg = 0.0, 0
    if synthetic:
        locality = float(args.source[0])
        mean_indeg = int(args.source[1])
        seed = int(args.source[2])
        if args.fast_gen:
            src, dst = fast_synthetic_edges(args.vertexCnt, mean_indeg, seed)
        else:
            src, dst = synthetic_edges(
                args.vertexCnt, locality, mean_indeg, seed, n_slaves=1
            )
        edges = edges_to_spark(spark, src, dst, partitions=args.cores)
        filename = "SYNTHETIC"
    else:
        filename = args.source[0]
        edges, n_file = read_in_edge_list(spark, filename)
        if n_file != args.vertexCnt:
            print(f"WARN: file has {n_file} lines, vertexCnt={args.vertexCnt}")
    input_time = time.monotonic() - t0

    runner = pagerank_csr if args.impl == "csr" else pagerank
    t0 = time.monotonic()
    res = runner(
        spark, edges, num_vertices=args.vertexCnt, damping=args.damping,
        threshold=args.threshold, max_rounds=args.maxRounds,
        num_partitions=args.cores,
    )
    exec_time = time.monotonic() - t0

    out = args.out or os.path.expanduser(
        "~/dxa-pageRank_out/pageRank_"
        + datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(out, exist_ok=True)

    if args.printPR:
        # "name rank" text lines, 1-based names, plain decimal
        (
            res.ranks.select(
                F.concat_ws(
                    " ",
                    (F.col("id") + 1).cast("string"),
                    F.format_number(F.col("rank"), 12),
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(os.path.join(out, "pageRank"))
        )

    with open(os.path.join(out, "statistics.out"), "w") as f:
        f.write(f"NUM_SLAVES\t{args.cores}\n")
        f.write(f"NUM_VERTICES\t{args.vertexCnt}\n")
        f.write(f"NUM_EDGES\t{res.num_edges}\n")
        f.write(f"DAMPING_VAL\t{args.damping}\n")
        f.write(f"THRESHOLD\t{args.threshold}\n")
        if synthetic:
            f.write(f"LOCALITY\t{locality}\n")
            f.write(f"MEAN_INDEG\t{mean_indeg}\n")
        else:
            f.write(f"GRAPH_FILE\t{filename}\n")
        f.write(f"NUM_ROUNDS\t{res.rounds}\n")
        f.write(f"INPUT_TIME\t{input_time:.4f}s\n")
        f.write(f"EXECUTION_TIME\t{exec_time:.4f}s\n\n")
        f.write("--------ROUNDS--------\n")
        f.write("Round\tError\tTime\n")
        for i, (err, ms) in enumerate(zip(res.errors, res.round_ms), 1):
            f.write(f"{i}\t{err:.12f}\t{ms / 1000:.4f}s\n")

    print(f"converged={res.converged} rounds={res.rounds} out={out}")


if __name__ == "__main__":
    main()
