"""Fixed-size overlapping document chunking. [north_rule extension —
no reference code; sliding fixed-token windows with overlap are the
standard retrieval/RAG corpus preparation (split long documents into
size-bounded, stride-spaced passages), the deterministic counterpart
of functions/cdc.py's content-defined form and functions/packing.py's
concat-and-chop.]

chunk i of a document covers tokens [i*stride, i*stride + size) —
clamped at the document end; the last chunk starts at the last stride
position that still adds new tokens, so every token is covered and
consecutive chunks share exactly (size - stride) tokens. Everything
is a per-document array expression (one transform + posexplode — no
join, no shuffle beyond whatever scan feeds it), replayed verbatim in
SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spandedup import _tokens


def fixed_chunks(
    documents: DataFrame,
    size: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, chunk, start, end, n_tokens, chunk_text): stride-spaced
    token windows of up to `size` tokens (0-based inclusive token
    range; empty documents emit nothing; a document shorter than
    `size` is one whole chunk)."""
    if size < 1 or stride < 1 or stride > size:
        raise ValueError("need 1 <= stride <= size")
    toks = _tokens(documents, id_col, text_col).filter(F.size("ts") > 0)
    # number of chunks: 1 + ceil(max(len - size, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.size("ts") - size, F.lit(0)) / F.lit(stride)
    ).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("start"),
            F.least(i * stride + size, F.size("ts")).alias("stop"),
            F.array_join(
                F.slice(
                    F.col("ts"),
                    i * stride + 1,
                    F.least(
                        F.lit(size), F.size("ts") - i * stride
                    ),
                ),
                " ",
            ).alias("txt"),
        ),
    )
    return toks.select(
        "id", F.posexplode(chunks).alias("chunk", "c")
    ).select(
        "id",
        "chunk",
        F.col("c.start").alias("start"),
        (F.col("c.stop") - 1).alias("end"),
        (F.col("c.stop") - F.col("c.start")).alias("n_tokens"),
        F.col("c.txt").alias("chunk_text"),
    )
