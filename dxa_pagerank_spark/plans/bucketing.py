"""Bucketed storage: shuffle-free equi-joins across job runs.

The df PageRank loop already partitions the adjacency once per RUN and
reuses it every round (operators/pagerank.py). Bucketing moves that
idea into STORAGE: write a table hash-bucketed (and sorted) by its join
key, and every future job's equi-join on that key starts from
co-located, pre-sorted buckets — Catalyst plans a sort-merge join with
NO Exchange (and no Sort when sortBy matched), so the per-run startup
shuffle of a 100-TB adjacency disappears entirely. Two tables bucketed
the same way (same key, same bucket count) join with zero data
movement.

This is the parquet/catalog form of the same law the Iceberg backend
(plans/tableio.py) expresses with a bucket partition transform; Spark's
native bucketing needs the catalog (``saveAsTable``) because bucket
metadata lives in the table definition, not the files. ``path`` makes
the table external so tests and jobs control the storage location.

When to bucket (SCALE.md): any table joined repeatedly on a stable key
at a scale where the shuffle dominates — adjacency (src), inverted
lists (centroid/bucket id), per-url page tables (url hash). Bucket
count rule of thumb: total size / target partition size (128-256 MB),
rounded to a power of two so downstream engines can split or merge
bucket sets evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table hash-bucketed by ``key`` into
    ``num_buckets`` buckets, sorted within buckets by ``key`` when
    ``sort`` (lets the bucketed SMJ skip its Sort too)."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key, same-bucket-count tables on ``key``. With
    bucketing metadata present this plans as an exchange-free
    sort-merge join; the plan assertion lives in
    tests/test_bucketing.py (no Exchange node on either side)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
