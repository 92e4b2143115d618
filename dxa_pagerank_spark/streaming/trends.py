"""Trending terms over a timestamped document/page stream.

The classic streaming-analytics companion to the batch term statistics
(functions/terms.py): per tumbling event-time window, the occurrence
count of every token — feeding a top-k "trending now" readout. The
transformation is defined ONCE (windowed_term_counts) and runs in both
modes, like streaming/events.py:

  * batch: plain groupBy(window, term) — exact, SQL-oracle-checkable;
  * streaming: the same column program under readStream with a
    watermark bounding state (late pages beyond the watermark are
    dropped, the standard trade).

Top-k per window is NOT folded into the streaming aggregation (rank
needs a sort, which append/update-mode streaming cannot do
incrementally); it is a trivial batch window-function over the
streamed-out counts — ``top_terms_per_window`` — run at read time.
That split (heavy distributed count in the stream, tiny rank at read)
is the 100-TB shape: state per window is one long per live term, the
shuffle is keyed by (window, term), and map-side partial aggregation
absorbs the token explosion before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def windowed_term_counts(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """-> (window_start long, term string, n long): token occurrence
    counts per tumbling window (single-space tokenization, the corpus
    rule). Streaming inputs get an event-time watermark so state is
    bounded."""
    src = pages
    if pages.isStreaming:
        src = pages.withWatermark(ts_col, watermark)
    toks = src.select(
        F.col(ts_col).alias("ts"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy(F.window("ts", window).alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "term",
            "n",
        )
    )


def top_terms_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch rank over the (streamed-out or batch) counts table ->
    (window_start, term, n, term_rank <= k); ties broken by term asc so
    the row set is engine-independent."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("term")
    )
    return (
        counts.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
    )


def stream_pages_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet directory of pages files."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
