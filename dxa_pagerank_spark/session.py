"""SparkSession factory.

One place for every config knob so tests / bench / driver smoke all get
the same tuned session. Local mode here; on a real cluster the same
builder args apply (minus master) via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dxa_pagerank_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    - AQE on (coalescing, skew-join): runtime re-plan is our backstop for
      graph skew (hub vertices) on top of explicit salting.
    - Arrow on: every Python-side kernel is a vectorized pandas UDF.
    - shuffle.partitions defaults to the core count: the iterative graph
      loops re-shuffle small rank tables every superstep, and 200 tiny
      tasks per superstep is pure scheduler overhead at local scale. On a
      1000-executor cluster this is instead sized to ~2-3x total cores via
      extra_conf / spark-submit.
    - UTC session timezone so DuckDB oracle comparisons are stable.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    builder = SparkSession.builder
    # Master resolution, in precedence order:
    #   1. SPARK_GRAFT_MASTER env — explicit override (tests/bench legs);
    #   2. the spark-submit launcher's --master: when the driver runs
    #      under spark-submit, PythonRunner exports PYSPARK_GATEWAY_PORT
    #      and the launcher JVM already holds spark.master — forcing
    #      local[cores] here would silently turn a cluster submit
    #      (e.g. --master local-cluster[4,2,6144] or a real standalone/
    #      YARN URL) back into a single-JVM run;
    #   3. default local[cores] for in-process sessions.
    master_env = os.environ.get("SPARK_GRAFT_MASTER")
    if master_env:
        builder = builder.master(master_env)
    elif "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Iterative gather joins probe a large CACHED adjacency against a
        # small per-round rank table: sort-merge would re-sort the cached
        # 10^8-row side every superstep. Shuffled-hash streams it and
        # builds the hash map on the small side instead (plan-asserted in
        # tests/test_plans.py; per-round timings in BENCH.md).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Big Arrow batches: the CSR gather kernel is a vectorized NumPy
        # segment-sum — per-batch fixed overhead dominates at the default
        # 10k rows, and 1M-row batches are still only ~8-16 MB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory or "48g")
        # iterative jobs launch one tiny barrier job per superstep: don't
        # let tasks sit in the locality-wait queue, and don't burn driver
        # cycles redrawing a console progress bar every 200ms
        .config("spark.locality.wait", "0s")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
