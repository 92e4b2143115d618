"""Leakage-safe train/val/test splitting for training corpora.
[north_rule extension — webtext payload; no reference counterpart]

Splitting documents uniformly at random leaks: near-duplicate pages of
one site land on both sides of the train/test fence and evaluation
overstates generalization. The standard guard is GROUP-level
assignment — hash the leakage unit (site/domain), not the document, so
every page of a site lands in the same split (Dodge et al. C4 audit;
the same rule dedup pipelines use for cluster-level holdout).

Deterministic and SQL-replayable: bucket = fmix32(group) mod 100 (the
murmur3 finalizer from operators/anf.py — avalanche matters here too,
a multiplicative-only hash would stripe consecutive site ids across
buckets in lockstep), then split by cumulative fraction thresholds.

100-TB shape: a pure projection — no shuffle, no Python; the split
column composes with any downstream groupBy (per-split counts arrive
via ordinary map-side-combinable aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.anf import fmix32


def leakage_safe_split(
    documents: DataFrame,
    group_col,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """-> (doc_id, group_id, bucket, split): every row of one group
    shares one split. `group_col` is the leakage unit (site id, domain
    hash...); fractions are integer percents (test = remainder)."""
    for name, v in (("train_pct", train_pct), ("val_pct", val_pct)):
        # bool is an int subclass — reject it explicitly, else
        # train_pct=True validates and yields a silent 1%-train split
        if isinstance(v, bool) or not isinstance(v, int):
            raise TypeError(f"{name} must be an integer, got {v!r}")
    if train_pct <= 0 or val_pct < 0:
        raise ValueError("need train_pct > 0 and val_pct >= 0")
    if not 0 < train_pct + val_pct < 100:
        raise ValueError("train_pct + val_pct must be in (0, 100)")
    g = group_col.cast("long")
    bucket = F.pmod(fmix32(g), F.lit(100))
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        g.alias("group_id"),
        bucket.cast("long").alias("bucket"),
        split.alias("split"),
    )
