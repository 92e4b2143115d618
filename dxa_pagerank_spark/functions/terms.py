"""Corpus term analytics: heavy hitters and TF-IDF.
[north_rule extension — no reference code; dxa-pageRank has no text
operators at all (SURVEY.md §2.1: string functions limited to split)]

Training-data curation over a web corpus needs vocabulary-level
signals: corpus-wide heavy hitters (boilerplate detection, stopword
discovery) and per-document salient terms (TF-IDF — topic tagging,
quality filtering). Both are pure JVM column programs:

  tokens  = explode(split(text, ' '))           -- no Python, codegen
  tf      = groupBy(doc, term).count()          -- map-side combine
  df      = tf.groupBy(term).count()            -- tiny (vocabulary)
  tfidf   = tf * ln(N / df)                     -- broadcast df join

100-TB shape: the only large shuffle is groupBy(doc_id, term) over the
exploded tokens; everything after operates on the vocabulary (orders of
magnitude smaller) or per-doc top-k (window over doc_id partitions,
rank pushed into the sort via WindowGroupLimit). The df table is
broadcast into the tf join. Top-k over the corpus is orderBy+limit =
TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (doc_id, term): one row per token occurrence, split on single
    spaces (the corpus tokenization rule; empty tokens dropped)."""
    return documents.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")


def term_topk(
    documents: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus heavy hitters -> (term, tf, df) — top-k terms by total
    occurrence count, ties broken by term asc. tf = total occurrences,
    df = number of distinct documents containing the term."""
    t = tokens(documents, text_col)
    per_doc = t.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf_d")
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("tf_d").alias("tf"), F.count(F.lit(1)).alias("df")
    )
    return stats.orderBy(F.desc("tf"), F.asc("term")).limit(k)


def tfidf_topk(
    documents: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document top-k terms by TF-IDF -> (doc_id, term, tf, df,
    tfidf, term_rank).

    tfidf = tf(term, doc) * ln(N / df(term)) with N = corpus size.
    Ordering within a doc: tfidf desc, term asc — exact ties in tfidf
    can only come from equal (tf, df) pairs (integer inputs), where
    both engines compute the identical double, so the rank (and hence
    the row set) is engine-independent.
    """
    n_docs = documents.count()
    t = tokens(documents, text_col)
    per_doc = t.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tbl = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = per_doc.join(F.broadcast(df_tbl), "term").withColumn(
        "tfidf",
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("tfidf", 6).alias("tfidf"),
            "term_rank",
        )
    )


def vocab_overlap(
    documents: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between document groups ->
    (group_a, group_b, vocab_a, vocab_b, n_shared, jaccard), one row
    per unordered group pair with at least one shared term
    (group_a < group_b lexically).

    Corpus-composition analytic: how much surface vocabulary two
    languages / sources share (script detection, contamination triage,
    mixture design). Vocabulary = distinct tokens under the corpus
    tokenization rule (single-space split, empty dropped).

    100-TB shape: distinct(group, term) is one shuffle keyed by term;
    the pair join explodes each term into at most G^2 rows with G = the
    number of groups (languages — bounded, tiny), so no term can
    explode the join regardless of its document frequency. Sizes and
    the final Jaccard operate on the vocabulary table, orders of
    magnitude smaller than the corpus.
    """
    t = documents.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    v = t.distinct().localCheckpoint(eager=True)
    sizes = v.groupBy("g").agg(F.count(F.lit(1)).alias("vocab"))
    a = v.select(F.col("g").alias("group_a"), "term")
    b = v.select(F.col("g").alias("group_b"), "term")
    shared = (
        a.join(b, "term")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("g").alias("group_a"), F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("g").alias("group_b"), F.col("vocab").alias("vocab_b"))
    return (
        shared.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            "vocab_a",
            "vocab_b",
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


def diversity_report(
    documents: DataFrame,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """-> one row per group: (group, n_docs, n_tokens, n_types, ttr,
    distinct_ngrams, total_ngrams, distinct_ngram_ratio) — lexical
    diversity of each sub-corpus (type-token ratio + distinct-n ratio,
    the standard repetitiveness/diversity gauges a mixture design
    reads before weighting a source up; low distinct-n = template
    spam, near-1 = natural text). All counts are exact integers; the
    two ratios are single divisions, so the SQL oracle matches
    exactly.

    100-TB shape: one explode per granularity, each groupBy partially
    aggregated map-side; every post-aggregate table is vocabulary- or
    group-sized."""
    from .repetition import ngram_array

    base = documents.select(
        F.col(group_col).alias("grp"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias(
            "ts"
        ),
        ngram_array(F.col(text_col), n).alias("gs"),
    )
    docs = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ts")).alias("n_tokens"),
        F.sum(F.size("gs")).alias("total_ngrams"),
    )
    types = (
        base.select("grp", F.explode("ts").alias("term"))
        .distinct()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_types"))
    )
    grams = (
        base.select("grp", F.explode("gs").alias("gram"))
        .distinct()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("distinct_ngrams"))
    )
    return (
        docs.join(types, "grp", "left")
        .join(grams, "grp", "left")
        .select(
            F.col("grp").alias("grp"),
            "n_docs",
            "n_tokens",
            F.coalesce("n_types", F.lit(0)).alias("n_types"),
            F.round(
                F.coalesce("n_types", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("ttr"),
            F.coalesce("distinct_ngrams", F.lit(0)).alias("distinct_ngrams"),
            "total_ngrams",
            F.round(
                F.coalesce("distinct_ngrams", F.lit(0))
                / F.greatest(F.col("total_ngrams"), F.lit(1)),
                6,
            ).alias("distinct_ngram_ratio"),
        )
    )


def corpus_divergence(
    documents: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
) -> DataFrame:
    """1-row Jensen-Shannon divergence between two sub-corpora's
    add-1-smoothed unigram distributions (Lin, IEEE-IT 1991) — the
    domain-shift gauge a mixture designer reads before reweighting
    sources (the distributional premise behind DSIR, functions/dsir.py,
    made explicit as a single scalar):

        p(t) = (c_a(t) + 1) / (N_a + V)      over the UNION vocabulary
        JSD  = 0.5 KL(p || m) + 0.5 KL(q || m),   m = (p + q) / 2

    JSD is symmetric, bounded by ln 2, and the smoothing makes every
    term's contribution finite. Exact-integer counts feed per-term
    float contributions (identical expression tree in SQL).

    Output: (n_tokens_a, n_tokens_b, vocab_size, jsd).

    100-TB shape: one (group, term) explode-shuffle with map-side
    combine (the term_topk envelope restricted to two groups), then
    every reduction runs on the VOCABULARY domain; the result is one
    row. Raises if either group has no tokens."""
    tf = (
        documents.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wide = tf.groupBy("term").agg(
        F.sum(F.when(F.col("g") == group_a, F.col("c")).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("g") == group_b, F.col("c")).otherwise(0)).alias(
            "cb"
        ),
    )
    totals = wide.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    na, nb, v = int(totals["na"]), int(totals["nb"]), int(totals["v"])
    if na == 0 or nb == 0:
        raise ValueError("both groups need at least one token")
    p = (F.col("ca") + F.lit(1)) / F.lit(float(na + v))
    q = (F.col("cb") + F.lit(1)) / F.lit(float(nb + v))
    m = (p + q) / F.lit(2.0)
    contrib = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(
        q / m
    )
    out = wide.agg(F.sum(contrib).alias("jsd"))
    return out.select(
        F.lit(na).alias("n_tokens_a"),
        F.lit(nb).alias("n_tokens_b"),
        F.lit(v).alias("vocab_size"),
        "jsd",
    )
