"""Statistical language-model quality scoring and benchmark
decontamination. [north_rule extension — no reference counterpart]

Two corpus-level text signals every LLM data pipeline runs:

* **Unigram log-probability scoring** — the deterministic core of
  CCNet-style LM filtering (Wenzek et al. 2019 use a KenLM 5-gram; the
  unigram MLE over the corpus itself is the engine-native, oracle-exact
  form): score(doc) = mean over tokens of -ln p(token), with
  p = corpus_count(token) / corpus_total. Template spam and
  keyword-stuffed pages score LOW (their tokens are over-represented);
  rare-token gibberish scores HIGH; both tails get cut.

* **Decontamination** — drop training documents that share any n-gram
  with a benchmark/eval set (the published recipe in GPT-3/Gopher/Llama
  reports; they use 8-13-grams, parameterized here). Implemented as a
  semi-/anti-join of the document n-gram stream against the (small)
  benchmark n-gram set.

100-TB shape: scoring is the terms.py envelope — one (doc, term)
explode shuffle with map-side combine, the vocabulary table broadcast
back. Decontamination's benchmark n-gram set is benchmark-sized
(thousands of docs), so it broadcasts; the corpus side streams its
n-grams through a broadcast semi-join probe — no corpus shuffle at
all when only the verdict per doc is needed (aggregate to doc ids,
then anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .repetition import ngram_array


def unigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_tokens, mean_neg_logprob): per-document mean unigram
    negative log-probability under the corpus's own MLE unigram model.
    Deterministic: p is a ratio of exact counts; the per-doc mean sums
    token -ln(p) values ordered by groupBy — engine parity is kept by
    rounding to 6 places AND by summing ln(p) of per-(doc, term) pairs
    as count * ln(p) (one float product per distinct pair, identical
    association in SQL). Documents with no tokens report 0 tokens and
    a 0.0 score."""
    toks = documents.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term"),
    )
    per_doc = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus totals: term counts and the grand total (both exact longs)
    vocab = per_doc.filter(F.col("term").isNotNull()).groupBy("term").agg(
        F.sum("tf").alias("ctf")
    )
    total = (
        vocab.agg(F.sum("ctf").alias("t")).collect()[0]["t"] or 0
    )
    scored = per_doc.join(F.broadcast(vocab), "term", "left").groupBy(
        "id"
    ).agg(
        F.sum(F.when(F.col("term").isNotNull(), F.col("tf")).otherwise(0))
        .cast("long")
        .alias("n_tokens"),
        F.sum(
            F.when(
                F.col("term").isNotNull(),
                F.col("tf")
                * -F.log(F.col("ctf") / F.lit(float(max(total, 1)))),
            ).otherwise(0.0)
        ).alias("nll_sum"),
    )
    return scored.select(
        "id",
        "n_tokens",
        F.round(
            F.when(
                F.col("n_tokens") > 0, F.col("nll_sum") / F.col("n_tokens")
            ).otherwise(0.0),
            6,
        ).alias("mean_neg_logprob"),
    )


def bigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_bigrams, mean_neg_logprob): per-document mean bigram
    conditional negative log-probability under the corpus's own MLE
    bigram model, p(w2|w1) = c(w1 w2) / c(w1 ·) with c(w1 ·) = corpus
    occurrences of w1 in non-final position — the conditional
    counterpart of unigram_logprob (one step toward the KenLM n-gram
    CCNet actually ships; no smoothing needed because every scored
    bigram is by construction observed in the corpus, so p > 0).
    Catches locally-incoherent token salads that unigram scoring
    misses (common words in impossible orders score HIGH). Documents
    with fewer than 2 tokens report 0 bigrams and a 0.0 score.

    100-TB shape and determinism contract match unigram_logprob: one
    (doc, bigram) explode shuffle with map-side combine; the bigram
    vocabulary and its left-marginal are corpus-level aggregates
    broadcast back; the per-doc sum multiplies each distinct pair's
    float ln once by its exact integer count (identical association in
    SQL), rounded to 6 places."""
    grams = documents.select(
        F.col(id_col).alias("id"),
        F.explode_outer(ngram_array(F.col(text_col), 2)).alias("gram"),
    )
    per_doc = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        per_doc.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.sum("tf").alias("cbg"))
    )
    # left marginal c(w1 ·): sum of bigram counts sharing the left
    # token — exactly the occurrences of w1 in non-final position
    left = vocab.groupBy(
        F.substring_index(F.col("gram"), " ", 1).alias("w1")
    ).agg(F.sum("cbg").alias("cleft"))
    model = vocab.select(
        "gram",
        F.substring_index(F.col("gram"), " ", 1).alias("w1"),
        "cbg",
    ).join(F.broadcast(left), "w1")
    scored = (
        per_doc.join(F.broadcast(model), "gram", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("gram").isNotNull(), F.col("tf")).otherwise(0)
            )
            .cast("long")
            .alias("n_bigrams"),
            F.sum(
                F.when(
                    F.col("gram").isNotNull(),
                    F.col("tf") * -F.log(F.col("cbg") / F.col("cleft")),
                ).otherwise(0.0)
            ).alias("nll_sum"),
        )
    )
    return scored.select(
        "id",
        "n_bigrams",
        F.round(
            F.when(
                F.col("n_bigrams") > 0, F.col("nll_sum") / F.col("n_bigrams")
            ).otherwise(0.0),
            6,
        ).alias("mean_neg_logprob"),
    )


def contaminated_ids(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> (id): documents sharing at least one n-gram with the
    benchmark set. The benchmark n-gram set is distinct-collected and
    broadcast; the corpus n-gram stream probes it with a semi-join."""
    bench_grams = (
        benchmark.select(
            F.explode(ngram_array(F.col(bench_text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = documents.select(
        F.col(id_col).alias("id"),
        F.explode(ngram_array(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("id")
        .distinct()
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Documents with every benchmark-overlapping doc removed (columns
    unchanged — composable with the curation chain)."""
    bad = contaminated_ids(
        documents, benchmark, n, id_col, text_col, bench_text_col
    ).withColumnRenamed("id", id_col)
    return documents.join(F.broadcast(bad), id_col, "left_anti")


def perplexity_buckets(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """-> (id, lang, n_tokens, score, bucket): CCNet's head/middle/
    tail split (Wenzek et al. 2019) — per-language tertile cutoffs
    over the unigram LM scores; lower score = more probable text =
    'head'. Zero-token documents are tagged 'empty' and excluded from
    the cutoff fit.

    Determinism contract: scores are the 6-dp-rounded
    ``unigram_logprob`` output; cutoffs are linear-interpolated exact
    percentiles of those rounded scores, themselves rounded to 6
    places before the band comparison — so engine and oracle compare
    identical 6-dp values. The cutoff table is |langs| x 2 and
    broadcast back. At 100 TB the exact ``percentile`` (one sort per
    language partition) is the oracle form; swap in
    ``approx_percentile`` for the sketch path — the plan shape
    (aggregate -> broadcast join -> CASE projection) is unchanged.
    """
    scored = unigram_logprob(documents, id_col, text_col)
    langs = documents.select(
        F.col(id_col).alias("id"), F.col(lang_col).alias("lang")
    )
    s = scored.join(langs, "id")
    cuts = (
        s.filter(F.col("n_tokens") > 0)
        .groupBy("lang")
        .agg(
            F.round(
                F.percentile(F.col("mean_neg_logprob"), F.lit(1.0 / 3)), 6
            ).alias("c1"),
            F.round(
                F.percentile(F.col("mean_neg_logprob"), F.lit(2.0 / 3)), 6
            ).alias("c2"),
        )
    )
    return s.join(F.broadcast(cuts), "lang", "left").select(
        "id",
        "lang",
        "n_tokens",
        F.col("mean_neg_logprob").alias("score"),
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("mean_neg_logprob") <= F.col("c1"), F.lit("head"))
        .when(F.col("mean_neg_logprob") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def kneser_ney_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """-> (id, n_bigrams, mean_neg_logprob): per-document mean bigram
    negative log-probability under interpolated Kneser-Ney smoothing
    (Kneser & Ney, ICASSP 1995; Chen & Goodman 1998's interpolated
    form with a single fixed discount D):

        P(w2|w1) = (c(w1 w2) - D) / c(w1 .)
                   + lambda(w1) * P_cont(w2)
        lambda(w1) = D * N1+(w1 .) / c(w1 .)
        P_cont(w2) = N1+(. w2) / N1+(. .)

    where N1+ are distinct-bigram-type counts. This is the smoothing
    KenLM ships and CCNet's perplexity filter actually runs —
    upgrading bigram_logprob's MLE: frequent-but-unversatile tokens
    ("Francisco", boilerplate tails) stop looking cheap because
    continuation probability counts TYPES, not occurrences. Scoring
    the corpus against itself keeps every numerator positive (c >= 1
    > D), so no max(., 0) clamp is needed — documented invariant.

    100-TB shape matches bigram_logprob: one (doc, bigram) explode
    shuffle; the model (bigram types + three marginals) lives on the
    VOCABULARY domain and is broadcast back; each distinct pair's
    float ln is computed once and multiplied by its exact integer tf
    (identical association in SQL). Docs with < 2 tokens score 0.0
    over 0 bigrams."""
    grams = documents.select(
        F.col(id_col).alias("id"),
        F.explode_outer(ngram_array(F.col(text_col), 2)).alias("gram"),
    )
    per_doc = grams.groupBy("id", "gram").agg(
        F.count(F.lit(1)).alias("tf")
    )
    vocab = (
        per_doc.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.sum("tf").alias("cbg"))
    )
    w1 = F.substring_index(F.col("gram"), " ", 1)
    w2 = F.substring_index(F.col("gram"), " ", -1)
    left = vocab.groupBy(w1.alias("w1")).agg(
        F.sum("cbg").alias("cleft"),
        F.count(F.lit(1)).alias("n1w1"),  # N1+(w1 .)
    )
    right = vocab.groupBy(w2.alias("w2")).agg(
        F.count(F.lit(1)).alias("n1r")  # N1+(. w2)
    )
    types_total = vocab.agg(
        F.count(F.lit(1)).alias("tt")  # N1+(. .)
    )
    model = (
        vocab.select("gram", w1.alias("w1"), w2.alias("w2"), "cbg")
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(types_total))
        .select(
            "gram",
            (
                (F.col("cbg") - F.lit(discount)) / F.col("cleft")
                + (F.lit(discount) * F.col("n1w1") / F.col("cleft"))
                * (F.col("n1r") / F.col("tt"))
            ).alias("p"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(model), "gram", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("gram").isNotNull(), F.col("tf")).otherwise(0)
            )
            .cast("long")
            .alias("n_bigrams"),
            F.sum(
                F.when(
                    F.col("gram").isNotNull(),
                    F.col("tf") * -F.log(F.col("p")),
                ).otherwise(0.0)
            ).alias("nll_sum"),
        )
    )
    return scored.select(
        "id",
        "n_bigrams",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("nll_sum") / F.col("n_bigrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_neg_logprob"),
    )
