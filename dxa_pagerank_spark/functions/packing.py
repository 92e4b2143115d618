"""Sequence packing for LLM pretraining batches (concat-and-chop).

Beyond-reference training-pipeline operator (task spec): pretraining
data loaders concatenate documents in a deterministic order and chop
the token stream into fixed-length windows; the mapping doc ->
window(s) is what a data lead audits (which docs straddle windows,
how many windows a mix yields).  Semantics here: documents ordered by
``id_col``, token stream positions are the running sum of per-doc
token counts, window w covers positions [w*L, (w+1)*L).

The naive Spark formulation — one global window
``sum(tokens).over(Window.orderBy(id))`` — collapses to a SINGLE
partition (Catalyst plans an all-to-one Exchange for an unpartitioned
window): correct at test scale, dead at 100 TB.  This implementation
is the distributed two-pass prefix sum:

  1. ``repartitionByRange(P, id)`` + ``sortWithinPartitions(id)`` —
     partitions are disjoint ordered id ranges, so partition-local
     order is global order.
  2. per-partition token subtotals (one P-row aggregate, collected),
     exclusive-prefix-summed on the driver — O(P) scalars, the same
     MetaChunk-style reduction as the PageRank loop
     (reference RunLumpPrRoundTask.java:84-96 reduces per-slave
     scalars the same way).
  3. partition offset broadcast-joined back, window cumsum
     ``partitionBy(pid)`` — every partition computes independently,
     no single-partition stage, all JVM (no Python anywhere).

Everything downstream (window ids, straddle flags) is plain column
arithmetic on the global end offset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def token_count_col(text_col) -> Column:
    """The corpus token law shared with q_token_counts: whitespace-run
    count (portable: Java regexp_count == DuckDB regexp_extract_all)."""
    return F.regexp_count(text_col, F.lit(r"\S+")).cast("long")


def pack_documents(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, n_tokens, start_offset, pack_first, pack_last, n_packs)
    per document: its token span [start_offset, start_offset+n_tokens)
    in the concatenated stream and the L-token windows it lands in.
    Zero-token documents sit at a point: pack_last = pack_first,
    n_packs = 0.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    spark = docs.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism

    d = (
        docs.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("n_tokens"))
        .repartitionByRange(P, "id")
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        subtotals = {
            r["pid"]: r["s"]
            for r in d.groupBy("pid")
            .agg(F.sum("n_tokens").alias("s"))
            .collect()
        }
        offsets, acc = [], 0
        for pid in sorted(subtotals):
            offsets.append((pid, acc))
            acc += int(subtotals[pid])
        off = F.broadcast(
            spark.createDataFrame(offsets or [(0, 0)], "pid int, part_off long")
        )

        w = Window.partitionBy("pid").orderBy("id")
        L = F.lit(int(max_tokens))
        end = (F.col("part_off") + F.sum("n_tokens").over(w)).alias("end_off")
        spans = d.join(off, "pid").select("id", "n_tokens", end)
        start = F.col("end_off") - F.col("n_tokens")
        pack_first = F.floor(start / L)
        # last position of the doc; empty docs collapse to the start
        last_pos = F.greatest(F.col("end_off") - 1, start)
        pack_last = F.floor(last_pos / L)
        return spans.select(
            "id",
            "n_tokens",
            start.alias("start_offset"),
            pack_first.alias("pack_first"),
            pack_last.alias("pack_last"),
            F.when(F.col("n_tokens") == 0, F.lit(0))
            .otherwise(pack_last - pack_first + 1)
            .cast("long")
            .alias("n_packs"),
        ).localCheckpoint(eager=True)
    finally:
        d.unpersist()


def packing_report(packed: DataFrame, max_tokens: int) -> DataFrame:
    """-> 1-row summary: total docs/tokens, number of L-token windows,
    docs straddling a window boundary, fill ratio of the final window."""
    L = int(max_tokens)
    totals = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(
            F.when(
                (F.col("n_tokens") > 0) & (F.col("pack_last") > F.col("pack_first")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_straddling"),
    )
    # integer div keeps window counts exact past double precision
    n_windows = F.expr(f"CASE WHEN n_tokens = 0 THEN 0 "
                       f"ELSE (n_tokens - 1) DIV {L} + 1 END").cast("long")
    # divide as DOUBLE: a {L}.0 literal would be DECIMAL and the
    # result column would surface as Python Decimal, not float
    fill = F.expr(
        f"CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE ((n_tokens - 1) % {L} + 1) / CAST({L} AS DOUBLE) END"
    )
    return totals.select(
        "n_docs",
        "n_tokens",
        n_windows.alias("n_windows"),
        "n_straddling",
        F.round(fill, 6).alias("last_window_fill"),
    )
