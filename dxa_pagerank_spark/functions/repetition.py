"""Repetition-based quality signals (Gopher-style n-gram filters).
[north_rule extension — no reference counterpart]

Rae et al. 2021 (Gopher, arXiv:2112.11446, Table A1) filter web
documents by (a) the fraction of the document covered by its single
most frequent n-gram and (b) the fraction of n-gram occurrences that
are duplicates. Both are per-document aggregates over the token
stream; machine-generated / template spam scores high on either.

Plan shape at 100 TB: tokens and n-grams are built as array column
expressions (split + transform over sequence — JVM, whole-stage
codegen, no explode for construction); the ONLY shuffle is the
groupBy(doc_id, gram) occurrence count, which combines map-side (same
shape as functions/terms.py, audited in PLANS.md). The second-level
per-doc aggregate runs on (doc, distinct-gram) rows — far smaller.
Both n-gram orders share one explode pass via a tagged union column,
so the document text is scanned once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_array(text_col: Column) -> Column:
    """Split on single spaces, drop empties (the corpus tokenization
    rule shared with functions/terms.tokens)."""
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def ngram_array(text_col: Column, n: int) -> Column:
    """Array of space-joined n-grams of the token stream (empty array
    when the document has fewer than n tokens)."""
    toks = _token_array(text_col)
    if n == 1:
        return toks
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """-> (id, n, total_grams, distinct_grams, top_gram_count,
    top_gram_frac, dup_gram_frac): one row per document per n-gram
    order.

    top_gram_frac = occurrences of the most frequent n-gram / total
    n-gram occurrences; dup_gram_frac = (total - distinct) / total.
    Documents with zero n-grams of an order report that order with
    total_grams = 0 and zero fractions (a too-short doc is its own
    quality signal; silently dropping the row would hide it).
    Fractions are rounded to 9 places.
    """
    grams = None
    for n in ns:
        g = documents.select(
            F.col(id_col).alias("id"),
            F.lit(n).alias("n"),
            F.explode_outer(ngram_array(F.col(text_col), n)).alias("gram"),
        )
        grams = g if grams is None else grams.unionByName(g)

    per_gram = grams.groupBy("id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # explode_outer emits gram=NULL for gram-less docs; count its row so
    # the doc keeps a result row, but score it zero.
    real = F.col("gram").isNotNull()
    out = per_gram.groupBy("id", "n").agg(
        F.sum(F.when(real, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("total_grams"),
        F.sum(F.when(real, 1).otherwise(0)).cast("long").alias("distinct_grams"),
        F.max(F.when(real, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top_gram_count"),
    )
    tot = F.col("total_grams")
    return out.select(
        "id",
        "n",
        "total_grams",
        "distinct_grams",
        "top_gram_count",
        F.round(
            F.when(tot > 0, F.col("top_gram_count") / tot).otherwise(0.0), 9
        ).alias("top_gram_frac"),
        F.round(
            F.when(tot > 0, (tot - F.col("distinct_grams")) / tot).otherwise(
                0.0
            ),
            9,
        ).alias("dup_gram_frac"),
    )


def repetition_filter(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.18,
    max_dup_trigram_frac: float = 0.30,
    min_grams: int = 20,
) -> DataFrame:
    """Documents passing the Gopher repetition gates (thresholds are
    the published Table A1 values for 2-/3-grams). Returns the input
    columns unchanged — composable with functions/curation.py.

    ``min_grams``: gates only apply to documents with at least this
    many n-grams of the order being tested. A 6-token page has 5
    bigrams, so its top bigram covers >= 20% by pigeonhole and the
    0.18 threshold would reject ALL short documents — the published
    filters likewise apply above a length floor. Short docs are length
    -filtered elsewhere (quality_col's length band), not here."""
    stats = repetition_stats(documents, id_col, text_col, ns=(2, 3))
    long_enough = F.col("total_grams") >= min_grams
    bad = stats.filter(
        long_enough
        & (
            ((F.col("n") == 2) & (F.col("top_gram_frac") > max_top_bigram_frac))
            | (
                (F.col("n") == 3)
                & (F.col("dup_gram_frac") > max_dup_trigram_frac)
            )
        )
    ).select(F.col("id").alias(id_col)).distinct()
    return documents.join(F.broadcast(bad), id_col, "left_anti")
