"""fastText-style hashed linear quality classifier.

Beyond-reference training-pipeline operator, from the published method
(Joulin et al., "Bag of Tricks for Efficient Text Classification",
2016 — the classifier family behind the GPT-3 / LLaMA / CCNet
"model-based quality filtering" stage): score every document with a
linear model over hashed bag-of-n-gram features and keep the ones the
model calls high-quality.

    features(doc) = unigrams + bigrams of the lowercase [a-z0-9]
                    tokenization, hashed into B buckets
                    (functions/dsir.py:hashed_features — the shared
                    hashed-feature front end)
    score(doc)    = bias + (Σ_feat n·w[bucket(feat)]) / Σ_feat n
    prob(doc)     = sigmoid(score);  keep = score >= 0

The weight table is the model: production passes a TRAINED (bucket,
weight) DataFrame (B rows — fastText's hashing trick means the model
IS this table plus a bias). When none is given, deterministic stand-in
weights are derived from the bucket id via the repo's engine-portable
Knuth multiplicative hash (functions/sampling.py:hash_bucket), i.e.
w(b) = knuth(b)/2^32 − 1/2 ∈ [−0.5, 0.5) — arbitrary but fixed, so the
whole pipeline (hashing, lookup, mean, sigmoid, verdict) is exercised
end-to-end and bit-replayable by the SQL oracle. Swapping in a real
model changes ONE input table, not the plan.

100-TB shape: the weight table is B rows (2^10..2^21) — always
broadcast; the corpus is touched by one explode → (id, bucket)
partial-aggregated count → broadcast join → per-doc sum. Nothing wider
than doc_id is ever a shuffle key, and there is no Python anywhere.
The keep verdict thresholds the PRE-sigmoid score at 0 (equivalent to
prob >= 0.5 but free of libm), so the decision is exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.dsir import hashed_features
from dxa_pagerank_spark.functions.sampling import MOD, hash_bucket


def standin_weights(
    spark: SparkSession, n_buckets: int, salt: int = 97
) -> DataFrame:
    """-> (bucket, weight): deterministic placeholder model,
    w(b) = knuth(b + salt)/2^32 − 0.5."""
    return spark.range(int(n_buckets)).select(
        F.col("id").cast("long").alias("bucket"),
        (
            hash_bucket(F.col("id"), salt) / F.lit(float(MOD)) - F.lit(0.5)
        ).alias("weight"),
    )


def quality_classifier(
    docs: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = 1024,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 97,
) -> DataFrame:
    """-> (id, n_feats, score, prob, keep) for every document.

    ``weights``: trained (bucket, weight) model table; stand-in
    Knuth-hash weights when omitted. Zero-feature documents score
    exactly ``bias``.
    """
    B = int(n_buckets)
    if weights is None:
        weights = standin_weights(
            SparkSession.getActiveSession(), B, salt=salt
        )
    feats = hashed_features(docs, B, id_col, text_col)
    per_doc = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("weight")).alias("wsum"),
        )
    )
    # null n_feats (doc emitted no features) falls to the otherwise
    # branch, so zero-feature documents score exactly `bias`
    score = F.lit(float(bias)) + F.when(
        F.col("n_feats") > 0, F.col("wsum") / F.col("n_feats")
    ).otherwise(F.lit(0.0))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            score.alias("score"),
        )
        .select(
            "id",
            "n_feats",
            "score",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))).alias(
                "prob"
            ),
            (F.col("score") >= 0).alias("keep"),
        )
    )
