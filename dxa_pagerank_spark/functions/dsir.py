"""DSIR-style data selection via importance resampling.

Beyond-reference training-pipeline operator, from the published method
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public literature): score every raw
document by how much it looks like a TARGET distribution (e.g. a
high-quality seed corpus) under hashed n-gram bag models, then sample
by the importance weights.

Pipeline (all JVM column expressions — the hash is the same portable
FNV-1a-32 as the dedup stack, functions/dedup.py:fnv1a32_col):

  1. features(doc)  = unigrams + space-joined bigrams of the
     lowercase [a-z0-9] tokenization, hashed into B buckets.
  2. bucket models  p (target subset), q (full corpus source), add-1
     smoothed:  p_b = (c^t_b + 1) / (T_t + B).
  3. log importance weight
     log w(doc) = sum over feature occurrences (ln p_b - ln q_b)
     — a per-doc sum over its own tokens: explode -> count per
     (doc, bucket) -> BROADCAST join the B-row ratio table -> sum.
     The corpus is never shuffled by anything wider than doc_id.
  4. Gumbel top-k resampling, derandomized: u(doc) from the Knuth
     multiplicative hash (functions/sampling.py:hash_bucket), noise
     g = -ln(-ln u), keep the k largest (log w + g) — distributed
     weighted sampling without replacement (Efraimidis-Spirakis via
     Gumbel keys), bit-replayable in SQL.

At 100 TB: the ratio table is B rows (B ~ 2^10..2^20) — always
broadcast; the two model fits are partial-aggregated counts; selection
is a top-k (TakeOrderedAndProject), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.dedup import fnv1a32_col
from dxa_pagerank_spark.functions.sampling import MOD, hash_bucket

FNV_OFFSET = 2166136261  # standard FNV-1a-32 offset basis


def _tokens(text_col) -> Column:
    """Lowercase [a-z0-9]+ runs — the corpus tokenizer shared with the
    shingle/dedup stack (and its DuckDB oracles)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, bucket, n) hashed uni+bigram counts per document."""
    toks = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("t")
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.slice("t", 1, F.size("t") - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at("t", i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        "id", F.explode(F.concat("t", bigrams)).alias("feat")
    )
    bucket = F.pmod(fnv1a32_col(F.col("feat"), FNV_OFFSET), F.lit(n_buckets))
    return feats.select("id", bucket.alias("bucket")).groupBy(
        "id", "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_feats, log_w) per document.

    ``target_pred`` selects the target subset (rows where it is true);
    the source model is the full ``docs``. Documents with zero
    features get log_w = 0 (uninformative, neither up- nor
    down-weighted).
    """
    B = int(n_buckets)
    feats = hashed_features(docs, B, id_col, text_col)
    tgt_ids = docs.filter(target_pred).select(F.col(id_col).alias("id"))

    src_counts = feats.groupBy("bucket").agg(F.sum("n").alias("c_src"))
    tgt_counts = (
        feats.join(tgt_ids, "id", "left_semi")
        .groupBy("bucket")
        .agg(F.sum("n").alias("c_tgt"))
    )
    totals = (
        src_counts.agg(F.sum("c_src")).collect()[0][0] or 0,
        tgt_counts.agg(F.sum("c_tgt")).collect()[0][0] or 0,
    )
    t_src, t_tgt = float(totals[0]), float(totals[1])
    ratio = (
        src_counts.join(tgt_counts, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("c_tgt", F.lit(0)) + F.lit(1.0))
                    / F.lit(t_tgt + B)
                )
                - F.log((F.col("c_src") + F.lit(1.0)) / F.lit(t_src + B))
            ).alias("log_ratio"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("log_ratio")).alias("log_w"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """-> the k documents with the largest Gumbel-perturbed importance
    weights: score = log_w + g(id), g = -ln(-ln u), u from the Knuth
    hash of id — deterministic weighted sampling without replacement."""
    lw = dsir_log_weights(docs, target_pred, n_buckets, id_col, text_col)
    u = (hash_bucket(F.col("id"), salt) + F.lit(0.5)) / F.lit(float(MOD))
    score = F.col("log_w") - F.log(-F.log(u))
    return (
        lw.select("id", "n_feats", "log_w", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(int(k))
    )
