"""Streaming exact deduplication of a document feed.
[north_rule extension — the reference is batch-BSP only]

A crawl is a stream: pages arrive continuously and the corpus wants
first-seen-wins exact dedup without re-scanning history. Spark's
``dropDuplicatesWithinWatermark`` keys the state store by content hash
and expires state once the watermark passes, so memory is bounded by
(dedup horizon x arrival rate), not corpus size — the standard design
for continuous ingestion dedup.

One rule, two modes (same pattern as streaming/events.py and
streaming/sessions.py):

* batch: first-seen-wins = min event-time row per content hash
  (deterministic tie-break on doc_id) — SQL-oracle-friendly;
* streaming: state-store dedup with a watermark horizon. Within the
  horizon the streams semantics match batch first-seen-wins for any
  arrival order the watermark admits; the parity test feeds the batch
  input through the file source and asserts the KEY SETS and kept
  payloads agree.

At 100 TB-scale ingestion the state key is 16 bytes (md5) per doc in
the horizon; the exchange per microbatch is (hash -> partition), the
streaming analogue of exact_dedup's one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_key(text_col) -> "F.Column":
    """Content key shared by both modes: md5 of the text bytes."""
    return F.md5(text_col)


def dedup_batch(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-seen-wins exact dedup over a batch feed -> one row per
    content hash (earliest ts; ties by min id). Adds ``content_hash``."""
    keyed = docs.withColumn("content_hash", dedup_key(F.col(text_col)))
    w_cols = [F.asc(ts_col), F.asc(id_col)]
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy(*w_cols)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per content hash
    within the watermark horizon (state expires after it)."""
    keyed = docs.withColumn("content_hash", dedup_key(F.col(text_col)))
    return keyed.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
