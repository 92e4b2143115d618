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


def main(argv: list[str] | None = None) -> None:
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
    ap.add_argument("--slaves", type=int, default=1,
                    help="reference NUM_SLAVES: synthetic graph block "
                         "placement + generator locality law, file-input "
                         "round-robin placement, per-slave output files")
    ap.add_argument("--fast-gen", action="store_true",
                    help="NumPy generator (same law, not draw-parity) for large N")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from dxa_pagerank_spark.datagen import edges_to_spark, fast_synthetic_edges
    from dxa_pagerank_spark.datagen_parity import synthetic_edges_distributed
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
            edges = edges_to_spark(spark, src, dst, partitions=args.cores)
        else:
            # draw-parity generator, one task per slave (the reference's
            # every-peer-replays-the-global-streams model)
            edges = synthetic_edges_distributed(
                spark, args.vertexCnt, locality, mean_indeg, seed,
                n_slaves=args.slaves,
            ).repartition(args.cores, "src").localCheckpoint(eager=True)
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
        # "name rank" text lines, plain decimal (never scientific, never
        # locale-grouped — format parity with BigDecimal.toPlainString,
        # PRInfoTask.java:83-86; VERDICT r01 #6). Name column parity
        # (PRInfoTask.java:83-86): file input writes the vertex's 1-based
        # name; synthetic input (name==0 in the reference) writes the hex
        # ChunkID `0x` + 16 uppercase hex digits of (nodeID<<48)|LID,
        # where vertices get LIDs 1..cnt per slave in creation order
        # (CreateSyntheticGraphSeed.java:109 creates all vertices first;
        # MainPR.java:111 puts the MetaChunk at LID cnt+1). DXRAM node
        # IDs are runtime-assigned and unreproducible, so the 0-based
        # slave index stands in deterministically.
        # One output directory per slave, mirroring the reference's
        # "$NodeID$.pageRank" per-peer files: file input places vertex
        # v (1-based) on slave (v-1) % S (ReadLumpInEdgeListTask.java:59),
        # synthetic uses contiguous blocks (CreateSyntheticGraphSeed
        # .java:51-53, balanced ceil/floor counts MainPR.java:241-248).
        slave_col = _slave_of(F.col("id"), args.vertexCnt, args.slaves, synthetic)
        if synthetic:
            lid = _local_pos_of(F.col("id"), slave_col, args.vertexCnt,
                                args.slaves) + 1
            name_col = F.format_string(
                "0x%016X",
                (slave_col.cast("long") * F.lit(1 << 48)) + lid.cast("long"),
            )
        else:
            name_col = (F.col("id") + 1).cast("string")
        ranks_out = res.ranks.select(
            F.col("id"),
            F.concat_ws(
                " ",
                name_col,
                F.format_string("%.12f", F.col("rank")),
            ).alias("value"),
        ).withColumn("slave", slave_col)
        (
            ranks_out.select("slave", "value")
            .repartition("slave")
            .write.mode("overwrite")
            .partitionBy("slave")
            .text(os.path.join(out, "pageRank"))
        )
        _rename_rank_parts(os.path.join(out, "pageRank"))

    write_statistics(
        os.path.join(out, "statistics.out"),
        out_dir=out,
        graph_input=filename,
        num_slaves=args.slaves,
        vertex_cnt=args.vertexCnt,
        num_edges=res.num_edges,
        damping=args.damping,
        threshold=args.threshold,
        locality=locality,
        mean_indeg=mean_indeg,
        input_time_s=input_time,
        mem_usage_mb=_jvm_heap_used_mb(spark),
        errors=res.errors,
        round_ms=res.round_ms,
    )

    print(f"converged={res.converged} rounds={res.rounds} out={out}")


def _rename_rank_parts(pr_dir: str) -> None:
    """Rename Spark's part-*.txt outputs to the reference's per-peer
    `$NodeID$.pageRank` naming (PRInfoTask.java:52-60: one file per
    peer named by its node ID). Each slave=S dir holds that slave's
    single text partition; concatenate (sorted, for the multi-part
    edge case) into `S.pageRank` and drop the .crc sidecars."""
    if not os.path.isdir(pr_dir):
        return
    for slave_dir in os.listdir(pr_dir):
        full = os.path.join(pr_dir, slave_dir)
        if not os.path.isdir(full) or "=" not in slave_dir:
            continue
        slave = slave_dir.split("=", 1)[1]
        parts = sorted(
            p for p in os.listdir(full)
            if p.startswith("part-") and p.endswith(".txt")
        )
        dest = os.path.join(full, f"{slave}.pageRank")
        if len(parts) == 1:
            os.rename(os.path.join(full, parts[0]), dest)
        elif parts:
            with open(dest, "w") as w:
                for p in parts:
                    with open(os.path.join(full, p)) as r:
                        w.write(r.read())
                    os.remove(os.path.join(full, p))
        for p in os.listdir(full):
            if p.endswith(".crc"):
                os.remove(os.path.join(full, p))


def _slave_of(id_col, n: int, n_slaves: int, synthetic: bool):
    """Column expr: which slave owns 0-based vertex id. File input is
    round-robin (ReadLumpInEdgeListTask.java:59, 142-147); synthetic is
    block placement over balanced ceil/floor counts
    (CreateSyntheticGraphSeed.java:51-53, MainPR.java:241-248)."""
    from pyspark.sql import functions as F

    if n_slaves <= 1:
        return F.lit(0)
    if not synthetic:
        return (id_col % n_slaves).cast("int")
    import math

    mod = n % n_slaves
    hi = int(math.ceil(n / n_slaves))
    lo_cnt = int(math.floor(n / n_slaves))
    split = mod * hi  # first `mod` slaves hold ceil-sized blocks
    return F.when(id_col < split, (id_col / hi).cast("int")).otherwise(
        (F.lit(mod) + (id_col - split) / F.lit(max(lo_cnt, 1))).cast("int")
    )


def _local_pos_of(id_col, slave_col, n: int, n_slaves: int):
    """Column expr: 0-based position of vertex `id` within its slave's
    contiguous synthetic block (block starts per the balanced ceil/floor
    law, CreateSyntheticGraphSeed.java:149-163)."""
    import math

    from pyspark.sql import functions as F

    if n_slaves <= 1:
        return id_col
    mod = n % n_slaves
    hi = int(math.ceil(n / n_slaves))
    lo = int(math.floor(n / n_slaves))
    # block start of slave s: s*hi for s < mod, mod*hi + (s-mod)*lo after
    start = F.when(slave_col < mod, slave_col * hi).otherwise(
        F.lit(mod * hi) + (slave_col - mod) * lo
    )
    return id_col - start


def _jvm_heap_used_mb(spark) -> float:
    """Driver-JVM heap in MB — the MetaChunk m_memUsage analogue
    (PrStatisticsJob.java publishes slave heap used, MainPR.java:117)."""
    try:
        rt = spark._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
        return (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
    except Exception:
        return 0.0


def write_statistics(
    path: str,
    out_dir: str,
    graph_input: str,
    num_slaves: int,
    vertex_cnt: int,
    num_edges: int,
    damping: float,
    threshold: float,
    locality: float,
    mean_indeg: int,
    input_time_s: float,
    mem_usage_mb: float,
    errors: list,
    round_ms: list,
) -> None:
    """statistics.out with the reference's exact line layout
    (PrStatisticsJob.java:66-92): header comment, key\\tvalue block,
    MEM_USAGE, then the ROUNDS table with no separating blank line."""
    exec_time_s = sum(round_ms) / 1000.0
    with open(path, "w") as f:
        f.write(f"#Statistics for PageRank Run {out_dir} | {graph_input}\n\n")
        f.write(f"NUM_SLAVES\t{num_slaves}\n")
        f.write(f"NUM_VERTICES\t{vertex_cnt}\n")
        f.write(f"NUM_EDGES\t{num_edges}\n")
        f.write(f"DAMPING_VAL\t{damping}\n")
        f.write(f"THRESHOLD\t{threshold}\n")
        if graph_input == "SYNTHETIC":
            f.write(f"LOCALITY\t{locality}\n")
            f.write(f"MEAN_INDEG\t{mean_indeg}\n")
        f.write(f"NUM_ROUNDS\t{len(round_ms)}\n")
        f.write(f"INPUT_TIME\t{input_time_s:.4f}s\n")
        f.write(f"EXECUTION_TIME\t{exec_time_s:.4f}s\n")
        f.write(f"MEM_USAGE\t{mem_usage_mb:.4f}MB\n")
        f.write("--------ROUNDS--------\n")
        f.write("Round\tError\tTime\n")
        for i, (err, ms) in enumerate(zip(errors, round_ms), 1):
            f.write(f"{i}\t{err:.12f}\t{ms / 1000:.4f}s\n")


if __name__ == "__main__":
    main()
