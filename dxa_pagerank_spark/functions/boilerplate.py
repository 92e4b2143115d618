"""Line-level boilerplate removal (CCNet-style line dedup).
[north_rule extension — no reference counterpart; dxa-pageRank has no
text operators (SURVEY.md §2.1)]

Web pages share navigation/footer lines ("mail", cookie banners, menu
items) that poison a training corpus; the standard fix (CCNet, Wenzek
et al. 2019, arXiv:1911.00359) drops every line that appears in more
than a threshold share of documents, then keeps documents whose
remaining text is non-empty.

Plan shape at 100 TB:

  lines   = posexplode(split(text, '\n'))      -- JVM, codegen
  freq    = lines.distinct-per-doc.groupBy(line).count()
                                               -- 1 shuffle, map-side
                                                  partial agg
  boiler  = freq.filter(doc_frac > threshold)  -- tiny (shared lines
                                                  are, by definition,
                                                  few distinct strings)
  cleaned = lines ANTI JOIN broadcast(boiler)  -- no shuffle
            .groupBy(doc).agg(rebuild text)    -- 1 shuffle

Two shuffles total; the boilerplate table is broadcast (a line kept by
the filter appears in > threshold x n_docs documents, so there can be
at most 1/threshold distinct such lines times the mean lines-per-doc —
vocabulary-sized, not corpus-sized). The rebuild keeps line order via
array_sort over (pos, line) structs — no window, one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(
    df: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """-> (id, pos, line): one row per physical line, 0-based position.
    Empty lines are kept (they carry position information for the
    rebuild and can themselves be boilerplate)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide shared-line table -> (line, n_docs, doc_frac).

    A line is boilerplate when it occurs in more than
    ``max_doc_frac`` of all documents (strictly greater) and in at
    least ``min_docs`` documents. doc_frac is rounded to 9 places for
    engine-portable comparison output; the FILTER uses the unrounded
    ratio.
    """
    lines = doc_lines(df, id_col, text_col)
    n_docs = df.count()
    per_line = (
        lines.select("id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return per_line.filter(
        (F.col("n_docs") >= min_docs)
        & (F.col("n_docs") > F.lit(max_doc_frac) * F.lit(float(n_docs)))
    ).select(
        "line",
        "n_docs",
        F.round(F.col("n_docs") / F.lit(float(n_docs)), 9).alias("doc_frac"),
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    max_doc_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """-> (id, text, n_lines_kept, n_lines_dropped): per-document text
    with boilerplate lines removed (original line order preserved,
    remaining lines re-joined with '\\n'). Documents whose every line
    was boilerplate are KEPT with empty text and n_lines_kept = 0 —
    dropping them is a one-filter policy decision left to the caller
    (and a row the curation report wants to count).
    """
    lines = doc_lines(df, id_col, text_col)
    boiler = boilerplate_lines(df, id_col, text_col, max_doc_frac, min_docs)
    flagged = lines.join(
        F.broadcast(boiler.select("line", F.lit(True).alias("is_boiler"))),
        "line",
        "left",
    )
    kept_struct = F.when(
        F.col("is_boiler").isNull(), F.struct("pos", "line")
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(kept_struct)).alias("kept"),
            F.sum(F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_lines_dropped"),
        )
        .select(
            "id",
            F.array_join(
                F.transform(F.col("kept"), lambda s: s["line"]), "\n"
            ).alias("text"),
            F.size("kept").cast("long").alias("n_lines_kept"),
            "n_lines_dropped",
        )
    )
