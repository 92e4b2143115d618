"""All StructType schemas in one module (the reference hard-codes its
serialization layout in Vertex.java:84-103 / MetaChunk.java:48-60; our
single source of schema truth is this file).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common-Crawl-style pages (BASELINE.json input_hint)
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Canonical edge table (directed; duplicates allowed and meaningful —
# file-ingest multiplicity semantics, ReadLumpInEdgeListTask.java:69-71)
EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

VERTICES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("out_deg", T.LongType(), False),
    ]
)

RANKS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("rank", T.DoubleType(), False),
    ]
)

LABELS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
    ]
)

COMPONENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("component", T.LongType(), False),
    ]
)

# Per-superstep convergence/checkpoint metrics (the MetaChunk analogue,
# MetaChunk.java:11-21, plus lineage fields for resume — FIXTURES.md F6)
METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("iteration", T.IntegerType(), False),
        T.StructField("l1_err", T.DoubleType(), True),
        T.StructField("pr_sum", T.DoubleType(), True),
        T.StructField("dangling_mass", T.DoubleType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("n_partitions", T.IntegerType(), True),
        T.StructField("snapshot_ref", T.StringType(), True),
    ]
)
