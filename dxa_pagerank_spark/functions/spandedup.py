"""Exact substring-span deduplication (ExactSubstr, suffix-free form).
[north_rule extension — no reference counterpart; dxa-pageRank has no
text operators (SURVEY.md §2.1)]

Training corpora repeat long verbatim passages across documents
(mirrors, quotations, syndication); Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499) remove
every repeated span of >= 50 tokens, keeping one occurrence. Their
single-node tool builds a suffix array; a suffix array is not a
distributed-friendly structure, but the *detection* problem has an
exact sliding-window reformulation this module uses instead:

    a maximal repeated span of length L >= W contributes exactly
    L - W + 1 matching W-token windows, and the union of those
    windows, merged per document into islands, recovers the span.

So: hash every W-token window, keep hashes occurring >= min_count
times corpus-wide, drop the globally-first occurrence of each
(keep-one semantics), merge the surviving windows per document into
maximal [span_start, span_end] token islands. Windows are keyed by
md5 of the window text (128-bit: collision-free in practice and
bit-identical across engines, so the SQL oracle can replay it).

Plan shape at 100 TB:

  win   = per-doc higher-order transform -> posexplode      -- no join;
          rows carry only (id, pos, 16-byte hash), never the
          token array (the transform computes all hashes
          inside one codegen'd expression per document)
  agg   = groupBy(h).agg(count, min(struct(id,pos)))        -- 1 shuffle,
          map-side partial agg on BOTH count and min: this is
          why keep-one is an aggregate, not a row_number
          window (a global per-hash sort would forbid partial
          aggregation and sort corpus-scale data)
  dupw  = win JOIN agg.filter(cnt >= min_count)             -- shuffle
          join on h; the dup side is corpus-duplication-
          sized, usually small enough for AQE to broadcast
  spans = per-doc island merge via running-max window       -- 1 shuffle
          by id; the window sort is per-document (bounded by
          doc length), never corpus-wide

Removal (``remove_duplicate_spans``) rebuilds text from the kept
token positions with one aggregate — same shape as the CCNet line
rebuild (boilerplate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, ts): whitespace tokens, empties dropped (consistent with
    textstats.py / terms.py tokenization)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("ts"),
    )


def token_window_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
) -> DataFrame:
    """-> (id, pos, h): md5 hex of every `width`-token window at every
    0-based token position. Documents shorter than `width` tokens emit
    nothing. The token array never leaves the per-document expression:
    the transform emits the hash list, posexplode unrolls it."""
    w = int(width)
    if w < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    return (
        _tokens(df, id_col, text_col)
        .filter(F.size("ts") >= w)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(ts) - {w}),"
                    f" i -> md5(array_join(slice(ts, i + 1, {w}), ' ')))"
                )
            ).alias("pos", "h"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """-> (id, span_start, span_end, span_len): maximal duplicated
    token spans per document (token indices, inclusive).

    keep_first=True (ExactSubstr semantics): the globally first
    occurrence of each duplicated window — min (id, pos) — is exempt,
    so one copy of every repeated passage survives removal.
    keep_first=False marks every occurrence (the audit/stats form).
    Windows closer than 2 tokens apart (overlapping or adjacent) merge
    into one span."""
    w = int(width)
    win = token_window_hashes(df, id_col, text_col, w)
    agg = win.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col("id").alias("d"), F.col("pos").alias("p"))).alias(
            "first"
        ),
    )
    dupw = win.join(agg.filter(F.col("cnt") >= int(min_count)), "h")
    if keep_first:
        dupw = dupw.filter(
            ~((F.col("id") == F.col("first.d")) & (F.col("pos") == F.col("first.p")))
        )
    dupw = dupw.select(
        "id", F.col("pos").alias("s"), (F.col("pos") + w - 1).alias("e")
    )
    return _merge_islands(dupw)


def _merge_islands(dupw: DataFrame) -> DataFrame:
    """(id, s, e) window set -> maximal merged (id, span_start,
    span_end, span_len) islands per id: a window starts a new span iff
    it begins more than one past the furthest end seen so far in this
    document. Shared by the dedup and decontamination paths."""
    byid = Window.partitionBy("id").orderBy("s")
    prev_max_e = F.max("e").over(
        byid.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dupw.withColumn(
        "brk",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-2)) + 1, 1).otherwise(0),
    )
    grp = marked.withColumn(
        "g", F.sum("brk").over(byid.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grp.groupBy("id", "g")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
            (F.max("e") - F.min("s") + 1).alias("span_len"),
        )
        .drop("g")
    )


def contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    width: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> (id, span_start, span_end, span_len): maximal corpus token
    spans that appear VERBATIM in the benchmark — span-level
    decontamination (the GPT-3 report's 13-gram collision filter,
    Brown et al. 2020 App. C, applied at span rather than document
    granularity; functions/lmscore.decontaminate is the doc-level
    form). A length-L shared passage matches L - W + 1 windows whose
    island merge recovers the span exactly, as in ExactSubstr dedup.

    Plan shape: benchmark window hashes are DISTINCT and broadcast
    (benchmarks are tiny next to the corpus); the corpus side is one
    projection + semi-join — the corpus text never shuffles, and the
    only window sort is per-document."""
    w = int(width)
    cw = token_window_hashes(corpus, id_col, text_col, w)
    bench = benchmark.select(
        F.lit(0).alias("bid"), F.col(bench_text_col).alias("btext")
    )
    bw = token_window_hashes(bench, "bid", "btext", w).select("h").distinct()
    hits = cw.join(F.broadcast(bw), "h", "left_semi").select(
        "id", F.col("pos").alias("s"), (F.col("pos") + w - 1).alias("e")
    )
    return _merge_islands(hits)


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    width: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> one row per corpus doc: (id, n_tokens, contaminated_tokens,
    contaminated_frac, n_spans) — the audit table a decontamination
    threshold is chosen from. Docs with no contamination report
    zeros."""
    spans = contaminated_spans(
        corpus, benchmark, width, id_col, text_col, bench_text_col
    )
    per_doc = spans.groupBy("id").agg(
        F.sum("span_len").alias("contaminated_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    toks = _tokens(corpus, id_col, text_col).select(
        "id", F.size("ts").alias("n_tokens")
    )
    return (
        toks.join(per_doc, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("contaminated_tokens", F.lit(0)).alias(
                "contaminated_tokens"
            ),
            F.round(
                F.coalesce("contaminated_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("contaminated_frac"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
    )


def substring_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """-> (id, n_tokens, n_spans, dup_tokens, dup_frac) per document —
    every input document appears, zero-filled when nothing repeats."""
    toks = _tokens(df, id_col, text_col).select(
        "id", F.size("ts").alias("n_tokens")
    )
    spans = duplicate_spans(df, id_col, text_col, width, min_count, keep_first)
    per = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("dup_tokens"),
    )
    return toks.join(per, "id", "left").select(
        "id",
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """-> (id, text): documents with every duplicated span removed,
    first occurrence kept (keep_first is forced: removing all copies
    would delete the passage from the corpus entirely). Token order is
    preserved; removed spans close up to a single space. Documents
    whose every token is duplicated come back with empty text."""
    spans = duplicate_spans(df, id_col, text_col, width, min_count, True)
    covered = spans.select(
        "id", F.explode(F.expr("sequence(span_start, span_end)")).alias("pos")
    )
    toks_pos = _tokens(df, id_col, text_col).select(
        "id", F.posexplode("ts").alias("pos", "term")
    )
    kept = toks_pos.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("text")
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(rebuilt, "id", "left").select(
        "id", F.coalesce("text", F.lit("")).alias("text")
    )
