"""BM25 ranked retrieval over the document corpus.
[north_rule extension — no reference counterpart; dxa-pageRank has no
text operators (SURVEY.md §2.1)]

The classic probabilistic ranking function (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond"), with the
+1-smoothed IDF (non-negative for any df, the Lucene convention):

    idf(t)      = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    score(q, d) = sum over t in q of
                  idf(t) * tf_td * (k1 + 1)
                  / (tf_td + k1 * (1 - b + b * len_d / avg_len))

Plan shape at 100 TB (the query set is tiny; the corpus is not):

  qterms   = exploded query strings                 -- driver-sized
  tf       = tokens explode -> groupBy(doc, term)   -- THE corpus
             SEMI-JOINED to broadcast(qterms) FIRST -- shuffle, but
             so only matching terms shuffle;           only rows whose
             map-side partial agg                      term is queried
  lens     = one avg-length scalar                  -- piggybacks the
                                                       same scan; the
                                                       per-doc length
                                                       rides the
                                                       exploded rows
                                                       into tf (no
                                                       second corpus
                                                       shuffle on id)
  df/idf   = count per query term over tf           -- query-sized agg
  scores   = tf x broadcast(qterms + idf)           -- no corpus-side
             groupBy(query, doc) sum                   shuffle widening
  topk     = per-query row_number window            -- WindowGroupLimit
             (score desc, doc asc)                     pushes the k-heap
                                                       into partials

Float determinism note for the oracle pairing: per-(query, doc) the
score is a sum over the query's matched terms; summation order is
engine-dependent, so oracle-paired driver queries keep queries at <= 2
terms (a two-operand double sum is order-exact). The operator itself
takes any length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (query_id, doc_id, score, doc_rank): top-k BM25 docs per
    query. `queries` is [(query_id, "term term ...")]; matching is
    exact-token (same whitespace tokenization as the rest of the text
    suite). Ties break by doc id ascending; score rounded to 6 for
    engine-portable comparison (ranking uses the unrounded value)."""
    spark = docs.sparkSession
    qrows = [
        (int(qid), t)
        for qid, qs in queries
        for t in qs.split(" ")
        if t != ""
    ]
    qterms = spark.createDataFrame(qrows, "query_id INT, term STRING")

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("ts"),
    )
    lens = toks.select("id", F.size("ts").alias("dl"))
    n_docs, avg_len = lens.agg(
        F.count(F.lit(1)), F.avg("dl")
    ).collect()[0]

    # corpus side: explode once, keep only queried terms (broadcast
    # semi-join BEFORE the tf aggregate), then per-(doc, term) counts.
    # The doc length rides the exploded rows (8 bytes each) and folds
    # into the same aggregate — cheaper at corpus scale than a second
    # shuffle joining a per-doc length table back on id.
    tf = (
        toks.select("id", F.size("ts").alias("dl"), F.explode("ts").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # df/idf over the matched tf table: query-vocabulary-sized
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = idf.select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .select(
            "query_id",
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.lit(float(avg_len)))
                )
            ).alias("s"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("s").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("doc_rank", F.row_number().over(w))
        .filter(F.col("doc_rank") <= int(k))
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            "doc_rank",
        )
    )


def bm25f_topk(
    fields: list[tuple[str, DataFrame, float]],
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25F fielded retrieval (Robertson & Zaragoza 2009 §3.3 — the
    web-search form where anchor text carries its own weight): field
    term frequencies and lengths fold with field weights BEFORE the
    saturation,

        tf~(t,d)  = sum_f w_f * tf_{f,t,d}
        len~(d)   = sum_f w_f * len_f(d)
        score     = sum_t idf(t) * tf~ * (k1+1)
                    / (tf~ + k1 * (1 - b + b * len~/avg_len~))

    `fields` is an ordered [(name, df(doc_id, text), weight)]; the
    per-doc folds run left-to-right in that order (fixed float
    association, SQL-replayable). idf uses the combined document
    frequency (docs matching in ANY field). Same plan envelope as
    bm25_topk per field: broadcast query-term semi-join BEFORE the tf
    aggregate, then field tables combine via (id, term)- and id-keyed
    outer joins — all query- or matched-doc-sized. Oracle-paired
    driver queries keep <= 2 query terms and <= 2 fields (order-exact
    two-operand sums); the operator itself takes any number."""
    if not fields:
        raise ValueError("bm25f_topk needs at least one field")
    spark = fields[0][1].sparkSession
    qrows = [
        (int(qid), t)
        for qid, qs in queries
        for t in qs.split(" ")
        if t != ""
    ]
    qterms = spark.createDataFrame(qrows, "query_id INT, term STRING")
    qdist = qterms.select("term").distinct()

    tfw = None
    lens = None
    for _, fdf, w in fields:
        toks = fdf.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(F.col(text_col), " "), lambda t: t != ""
            ).alias("ts"),
        )
        len_f = toks.select(
            "id", (F.size("ts") * F.lit(float(w))).alias("dl")
        )
        tf_f = (
            toks.select("id", F.explode("ts").alias("term"))
            .join(F.broadcast(qdist), "term")
            .groupBy("id", "term")
            .agg((F.count(F.lit(1)) * F.lit(float(w))).alias("tf"))
        )
        if tfw is None:
            tfw, lens = tf_f, len_f
        else:
            tfw = (
                tfw.withColumnRenamed("tf", "tf_a")
                .join(
                    tf_f.withColumnRenamed("tf", "tf_b"),
                    ["id", "term"],
                    "full_outer",
                )
                .select(
                    "id",
                    "term",
                    (
                        F.coalesce("tf_a", F.lit(0.0))
                        + F.coalesce("tf_b", F.lit(0.0))
                    ).alias("tf"),
                )
            )
            lens = (
                lens.withColumnRenamed("dl", "dl_a")
                .join(
                    len_f.withColumnRenamed("dl", "dl_b"), "id", "full_outer"
                )
                .select(
                    "id",
                    (
                        F.coalesce("dl_a", F.lit(0.0))
                        + F.coalesce("dl_b", F.lit(0.0))
                    ).alias("dl"),
                )
            )
    n_docs, avg_len = lens.agg(F.count(F.lit(1)), F.avg("dl")).collect()[0]

    idf = tfw.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = idf.select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        ).alias("idf"),
    )
    scored = (
        tfw.join(lens, "id")
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .select(
            "query_id",
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.lit(float(avg_len)))
                )
            ).alias("s"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("s").alias("score"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("id")
    )
    return (
        scored.withColumn("doc_rank", F.row_number().over(w_rank))
        .filter(F.col("doc_rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            "doc_rank",
        )
    )
