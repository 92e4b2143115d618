"""Fuzzy (edit-distance-1) term matching via a deletion index.
[north_rule extension — no reference code; the deletion-variant
inverted index is the SymSpell construction (public domain, Garbe
2012): two strings within edit distance 1 always share a member of
{s} ∪ del1(s), so candidate generation is an equi-join on deletion
keys — |vocab| × (len+1) index rows — instead of a quadratic
Levenshtein cross-product. The standard typo-tolerant lookup for
query processing and label normalization at scale.]

Candidates from the key join are verified with the real Levenshtein
distance — a built-in in both engines, so the SQL oracle replays
generation AND verification exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del_keys(term_col):
    """array of the term itself plus every single-character deletion."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(term_col)),
        lambda i: F.concat(
            F.substring(term_col, F.lit(1), i - 1),
            F.substring(term_col, i + 1, F.length(term_col)),
        ),
    )
    return F.array_union(F.array(term_col), deletions)


def fuzzy_term_matches(
    vocab: DataFrame,
    queries: DataFrame,
    vocab_col: str = "term",
    query_col: str = "q",
) -> DataFrame:
    """-> (q, term, dist): every (query, vocabulary) pair within
    Levenshtein distance 1 (dist in {0, 1}; exact matches included).
    Both sides explode to deletion keys, candidates come from the key
    equi-join, and the Levenshtein verify runs on candidates only."""
    # explode via withColumn, join via qualified aliases: a
    # select-with-alias over a Generate child whose own lineage already
    # contains a Generate trips Spark 4.1's lateral-column-alias
    # resolver (INTERNAL_ERROR: LateralColumnAliasReference); the
    # withColumn form resolves cleanly
    vk = (
        vocab.select(F.col(vocab_col).alias("term"))
        .withColumn("k", F.explode(_del_keys(F.col("term"))))
        .distinct()
    )
    qk = (
        queries.select(F.col(query_col).alias("q"))
        .withColumn("k", F.explode(_del_keys(F.col("q"))))
        .distinct()
    )
    cand = (
        qk.alias("a")
        .join(vk.alias("b"), F.col("a.k") == F.col("b.k"))
        .select(F.col("a.q").alias("q"), F.col("b.term").alias("term"))
        .distinct()
    )
    return cand.select(
        "q", "term", F.levenshtein(F.col("q"), F.col("term")).alias("dist")
    ).filter(F.col("dist") <= 1)
