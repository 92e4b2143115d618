"""Content-defined chunking (CDC) deduplication. [north_rule
extension — no reference code; content-defined chunking is the
standard storage/corpus dedup primitive (Muthitacharoen et al. LBFS
SOSP'01; FastCDC ATC'16), here at token granularity so it is exact,
engine-portable, and SQL-replayable.]

Fixed-size chunking breaks on any insertion (every later chunk
shifts); CDC instead cuts wherever a rolling window hash satisfies a
content-derived condition, so shared passages re-align to identical
chunks no matter where they sit in a document. This module cuts after
token p whenever the md5 of the `width`-token window ENDING at p
starts with one of the first 16/divisor hex digits — P(cut) =
1/divisor per position, expected chunk length ~= divisor tokens. The
rule inspects only the hash STRING, so DuckDB replays it verbatim
(no 128-bit integer arithmetic needed).

Plan shape: token_window_hashes (no join, hashes computed inside one
per-document codegen'd transform) -> per-token chunk assignment via a
per-document running count of prior cuts (window sort bounded by doc
length) -> one groupBy (doc, chunk) building the chunk hash from
position-ordered tokens -> one groupBy (chunk hash) for corpus-wide
multiplicity. No corpus-scale sort anywhere; the only shuffles are
the per-doc window and the two aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spandedup import _tokens, token_window_hashes

_HEX = "0123456789abcdef"


def _cut_prefixes(divisor: int) -> list[str]:
    if divisor < 1 or 16 % divisor != 0:
        raise ValueError(
            f"divisor must divide 16 (1,2,4,8,16), got {divisor}"
        )
    return list(_HEX[: 16 // divisor])


def cdc_chunks(
    documents: DataFrame,
    width: int = 4,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, chunk, start, end, n_tokens, chunk_hash): content-
    defined chunks per document (0-based inclusive token ranges;
    expected chunk ~= divisor tokens; documents shorter than `width`
    form one whole-document chunk; empty documents emit nothing)."""
    prefixes = _cut_prefixes(divisor)
    toks = _tokens(documents, id_col, text_col).select(
        "id", F.posexplode("ts").alias("pos", "term")
    )
    # cut AFTER token p iff the window ending at p hashes into the cut
    # class; the window at start q ends at q + width - 1
    cuts = (
        token_window_hashes(documents, id_col, text_col, width)
        .filter(F.substring("h", 1, 1).isin(prefixes))
        .select("id", (F.col("pos") + width - 1).alias("cut_pos"))
    )
    flagged = toks.join(
        cuts,
        (toks.id == cuts.id) & (toks.pos == cuts.cut_pos),
        "left",
    ).select(
        toks.id.alias("id"),
        "pos",
        "term",
        F.col("cut_pos").isNotNull().cast("long").alias("cut"),
    )
    byid = Window.partitionBy("id").orderBy("pos")
    chunked = flagged.select(
        "id",
        "pos",
        "term",
        F.coalesce(
            F.sum("cut").over(
                byid.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("chunk"),
    )
    return chunked.groupBy("id", "chunk").agg(
        F.min("pos").alias("start"),
        F.max("pos").alias("end"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "term"))
                    ),
                    lambda s: s.term,
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_hash"),
    )


def cdc_dedup_stats(
    documents: DataFrame,
    width: int = 4,
    divisor: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> one row per document: (id, n_tokens, n_chunks, dup_chunks,
    dup_tokens, dup_token_frac) where a chunk is `dup` when its
    content hash occurs in >= 2 chunks corpus-wide — the audit table
    for CDC-level storage savings / near-dup triage. Zero rows for
    clean docs report zeros."""
    chunks = cdc_chunks(documents, width, divisor, id_col, text_col)
    multi = (
        chunks.groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("chunk_hash")
    )
    flagged = chunks.join(
        F.broadcast(multi), "chunk_hash", "left_semi"
    ).groupBy("id").agg(
        F.count(F.lit(1)).alias("dup_chunks"),
        F.sum("n_tokens").alias("dup_tokens"),
    )
    per_doc = chunks.groupBy("id").agg(
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    universe = documents.select(F.col(id_col).alias("id"))
    return (
        universe.join(per_doc, "id", "left")
        .join(flagged, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("dup_chunks", F.lit(0)).alias("dup_chunks"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )
