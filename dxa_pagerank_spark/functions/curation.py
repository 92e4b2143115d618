"""End-to-end corpus curation: the composed filter chain a training-data
pipeline runs over a raw crawl before tokenization.

Stages (each an existing audited operator, composed declaratively so
Catalyst fuses the filters into one scan):

  1. exact dedup — keep the min-id representative per content hash
     (functions/dedup.exact_dedup);
  2. language allow-list (the table's lang column — upstream of this
     engine that column is produced by functions/textstats.lang_id);
  3. quality floor (functions/textstats.quality_score composite);
  4. token-count band (drop fragments and mega-docs).

At 100 TB this is one scan + one dedup shuffle: filters 2-4 are pure
column predicates (pushdown-eligible, whole-stage codegen), and the
only exchange is the md5 groupBy inside exact_dedup — which runs FIRST
on purpose: its semi-join keep-set is decided globally, so filtering
before it would change which representative survives. A pipeline that
prefers cheapest-first can flip the order when it accepts
representative drift.

No reference counterpart; LLM-data-pipeline surface per the north_rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .textstats import quality_col, token_count


def curate_corpus(
    documents: DataFrame,
    langs: tuple[str, ...] = ("en", "de"),
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """documents -> curated subset (same columns + n_tokens, quality).

    Deterministic: dedup keeps min doc_id per md5(text); all thresholds
    are inclusive.
    """
    kept = exact_dedup(documents)
    scored = kept.withColumn("quality", quality_col(F.col("text"))).withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return scored.filter(
        F.col("lang").isin(*langs)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )


def curation_report(
    documents: DataFrame,
    langs: tuple[str, ...] = ("en", "de"),
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Per-language yield of the curated corpus: docs kept, tokens
    kept, mean quality — the numbers a data lead reads before a
    training run. One groupBy over the curated subset."""
    cur = curate_corpus(documents, langs, min_quality, min_tokens, max_tokens)
    return cur.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )
