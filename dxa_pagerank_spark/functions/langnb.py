"""Multinomial Naive Bayes language identification over character
n-grams (the Cavnar-Trenkle n-gram family with the standard NB
formulation; Manning-Raghavan-Schuetze IR ch. 13) — the TRAINED
counterpart of the heuristic lang_id (functions/textstats.py): given
a labeled corpus, learn per-language char-trigram log-probabilities
with add-1 smoothing and classify by

    pred(d) = argmax_l  ln prior(l) + sum_g c_d(g) * ln p(g | l)

with p(g|l) = (c_l(g) + 1) / (N_l + V) over the GLOBAL trigram
vocabulary V (unseen (label, gram) pairs get the smoothed floor
1 / (N_l + V) — that's what makes the scores proper log-likelihoods).
Ties break to the lexicographically smaller label. Everything is
exact integer counts feeding per-term float logs, so a SQL oracle
replays training AND classification term-for-term.

Gram law (fixed for replay): raw-text character trigrams, positions
1..len-2, no lowercasing or padding; docs shorter than 3 chars carry
no grams and classify by prior alone.

100-TB shape: training = one (label, gram) explode-shuffle with
map-side combine; the model lives on the (labels x gram-vocab) domain
and is broadcast back. Classification = one (doc, gram) explode, a
small labels crossJoin (L rows per gram — L is the language count,
single digits), a broadcast model join, one per-(doc, label) sum and
a max-struct argmax. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _char_trigrams(text_col):
    t = F.col(text_col)
    pos = F.when(
        F.length(t) >= 3,
        F.sequence(F.lit(1), F.length(t) - F.lit(2)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(pos, lambda i: t.substr(i, F.lit(3)))


def nb_train(
    documents: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
):
    """-> (model, label_stats): model(label, gram, logp) for SEEN
    pairs; label_stats(label, log_prior, log_floor) where log_floor =
    ln(1/(N_l + V)) is the smoothed score of an unseen gram."""
    grams = documents.select(
        F.col(label_col).alias("label"),
        F.explode(_char_trigrams(text_col)).alias("gram"),
    )
    counts = grams.groupBy("label", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    v = counts.select("gram").distinct().count()
    totals = counts.groupBy("label").agg(F.sum("c").alias("n_l"))
    model = counts.join(F.broadcast(totals), "label").select(
        "label",
        "gram",
        F.log(
            (F.col("c") + F.lit(1))
            / (F.col("n_l") + F.lit(v)).cast("double")
        ).alias("logp"),
    )
    n_docs = documents.count()
    label_stats = (
        documents.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs_l"))
        .join(F.broadcast(totals), "label")
        .select(
            "label",
            F.log(
                F.col("n_docs_l") / F.lit(float(n_docs))
            ).alias("log_prior"),
            F.log(
                F.lit(1.0)
                / (F.col("n_l") + F.lit(v)).cast("double")
            ).alias("log_floor"),
        )
    )
    return model, label_stats


def nb_classify(
    documents: DataFrame,
    model: DataFrame,
    label_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, label_pred, score): argmax label per document under
    the trained model (ties to the smaller label); score is the
    winning log-likelihood."""
    doc_grams = (
        documents.select(
            F.col(id_col).alias("id"),
            F.explode(_char_trigrams(text_col)).alias("gram"),
        )
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    labeled = doc_grams.crossJoin(
        F.broadcast(label_stats.select("label", "log_floor"))
    ).join(F.broadcast(model), ["label", "gram"], "left")
    per_label = labeled.groupBy("id", "label").agg(
        F.sum(
            F.col("c") * F.coalesce("logp", F.col("log_floor"))
        ).alias("gram_ll")
    )
    # every doc scores EVERY label (prior-only when the doc has no
    # grams): start from the doc x label frame
    base = documents.select(F.col(id_col).alias("id")).crossJoin(
        F.broadcast(label_stats.select("label", "log_prior"))
    )
    scored = base.join(per_label, ["id", "label"], "left").select(
        "id",
        "label",
        (
            F.col("log_prior") + F.coalesce("gram_ll", F.lit(0.0))
        ).alias("score"),
    )
    # argmax via a per-doc rank window (L rows per doc — the window
    # input is labels-sized per key); ties to the smaller label
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("label")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", F.col("label").alias("label_pred"), "score")
    )
