"""Stats-resetting lineage cut for iterative loops.

`DataFrame.localCheckpoint` truncates the RDD lineage but COPIES the
origin plan's size estimate into the resulting `LogicalRDD`
(`LogicalRDD.fromDataset` passes `optimizedPlan.stats` through). For
loops whose per-round plan joins several tables all derived from the
previous round's state — Louvain's move round joins the label table
with itself-derived `kin`/`tot`/`vstate` — Catalyst's size-only
estimator multiplies those inherited estimates (`visitJoin` in
`SizeInBytesOnlyStatsPlanVisitor`), so the checkpointed `sizeInBytes`
is CUBED every round. The estimate is an arbitrary-precision
BigInteger: its digit count doubles per round and after ~20 rounds
every `df.queryExecution().optimizedPlan().stats()` call inside
planning spends minutes in BigInteger Toom-Cook multiplication.
Measured on the Louvain diagnostic: round times 1.3 s -> 2.5 -> 6.0 ->
14.6 -> 49.5 s on a 49-edge coarse graph, with the checkpointed
sizeInBytes bit length 256 -> 637 -> 1399 -> 2924 -> 5974 over five
rounds. (PageRank-shaped loops are immune: their one join per round
multiplies a CONSTANT adjacency estimate in, so digits grow linearly
and stay tiny over any realistic round count.)

`cut_lineage` checkpoints as usual, then rebuilds the DataFrame from
the checkpointed `RDD[InternalRow]` via
`SparkSession.internalCreateDataFrame`, producing a `LogicalRDD`
WITHOUT inherited stats — it reports the session default
(`spark.sql.defaultSizeInBytes`, effectively Long.MaxValue), which is
constant, so per-round stats work is O(1) forever. Consequences are
benign for our loops: state tables should never be auto-broadcast
anyway (explicit `F.broadcast` is used where a small side is known
small), and AQE re-plans from true runtime sizes at every shuffle
boundary regardless of the compile-time estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint + drop inherited plan statistics.

    Falls back to plain `localCheckpoint` if the JVM private surface
    is unavailable (e.g. Spark Connect), where the stats copy cannot
    be severed but correctness is unaffected.
    """
    ck = df.localCheckpoint(eager=eager)
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        njdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(njdf, spark)
    except Exception:
        return ck
