"""Count-Min sketch term counting. [north_rule extension — no
reference code; the Count-Min sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) is the standard fixed-memory frequency summary a
corpus pipeline keeps when the exact vocabulary no longer fits — the
sketch is depth*width integers regardless of corpus size, estimates
overcount by at most eps*N with probability 1-delta.]

Everything here is deterministic and additive: row hashes are the
engine's arithmetic LCG mix over (md5 of the term, row), and sketch
cells are plain sums — no order dependence anywhere — so the SQL
oracle rebuilds the identical sketch cell-for-cell. The md5-prefix
term key keeps the hash engine-portable (no 128-bit math: 12 hex
chars = 48 bits < 2^53 exact in a double, parsed as int64 in both
engines).

Plan shape: one token explode -> depth rows per token -> ONE
map-side-combinable groupBy (row, col). The sketch result is
depth*width rows — broadcast-sized by construction. Point estimates
join the (tiny) sketch per queried term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647
A = 1103515245
B = 12345


def _term_key(term_col):
    """48-bit integer key of a term: first 12 hex chars of md5 —
    engine-portable (conv in Spark, hex-parse in DuckDB)."""
    return F.conv(
        F.substring(F.md5(term_col.cast("binary")), 1, 12), 16, 10
    ).cast("long")


def _cell(key_col, row: int, width: int):
    inner = (key_col + F.lit(B + row * 40503)) % F.lit(P)
    return ((F.lit(A) * inner) % F.lit(P)) % F.lit(width)


def cm_sketch(
    documents: DataFrame,
    width: int = 256,
    depth: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """-> (row, col, cnt): the Count-Min sketch of the corpus token
    stream (single-space tokenization, empties dropped). depth*width
    cells; absent cells are implicit zeros."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    toks = documents.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term")
    ).select(_term_key(F.col("term")).alias("k"))
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(F.col("k"), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc")
    )
    return rows.select("rc.row", "rc.col").groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_estimate(
    documents: DataFrame,
    terms: DataFrame,
    width: int = 256,
    depth: int = 4,
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """-> (term, est): the Count-Min point estimate (min over rows of
    the term's cells; always >= the true count) for each queried
    term. The sketch is depth*width rows and broadcasts into the
    lookup join."""
    sk = cm_sketch(documents, width, depth, text_col)
    probes = terms.select(
        F.col(term_col).alias("term"),
        _term_key(F.col(term_col)).alias("k"),
    ).select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(F.col("k"), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("term", "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sk), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
