"""Query-biased snippet extraction. [north_rule extension — no
reference code; the query-biased summary (Tombros & Sanderson,
SIGIR'98) is the standard search-result feature: show each hit's best
window of text for the query actually asked.]

Semantics (deterministic, SQL-replayable): candidate windows are the
`window`-token spans anchored at each query-term hit — WLOG for
max-coverage, since any optimal fixed-width window shifts right until
its first match sits at the left edge — scored by the number of
query-term occurrences inside; the winner is the highest count with
the earliest start as tie-break. Documents with no hits emit nothing.

Plan shape: one position explode filtered to query terms (the hit set
is query-selectivity-sized, not corpus-sized), one window-bounded
equi-self-join on doc id over HITS only, one argmax window per doc,
and a final join back to the (pre-filtered) docs to slice the snippet
text. Run it post-retrieval on the top-k docs — the join inputs are
then k-sized."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spandedup import _tokens


def best_snippets(
    documents: DataFrame,
    query_terms: list[str],
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, snip_start, snip_end, n_matches, snippet): the earliest
    max-coverage `window`-token span per document (inclusive 0-based
    token range, clamped at the document end)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if not query_terms:
        raise ValueError("need at least one query term")
    toks = _tokens(documents, id_col, text_col)
    pos = toks.select(
        "id", F.posexplode("ts").alias("pos", "term")
    )
    hits = pos.filter(F.col("term").isin(list(query_terms))).select(
        "id", "pos"
    )
    a = hits.select("id", F.col("pos").alias("s"))
    b = hits.select("id", F.col("pos").alias("p"))
    scored = (
        a.join(b, "id")
        .where(
            (F.col("p") >= F.col("s"))
            & (F.col("p") < F.col("s") + window)
        )
        .groupBy("id", "s")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("n_matches"), F.asc("s")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(toks, "id")
        .select(
            "id",
            F.col("s").alias("snip_start"),
            F.least(
                F.col("s") + window, F.size("ts")
            ).alias("stop"),
            "n_matches",
            F.array_join(
                F.slice(
                    F.col("ts"),
                    F.col("s") + 1,
                    F.least(F.lit(window), F.size("ts") - F.col("s")),
                ),
                " ",
            ).alias("snippet"),
        )
        .select(
            "id",
            "snip_start",
            (F.col("stop") - 1).alias("snip_end"),
            "n_matches",
            "snippet",
        )
    )


def phrase_matches(
    documents: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, pos): every exact token-phrase occurrence (0-based
    start position). The phrase windows are built inside one
    per-document transform (the token_window machinery without the
    hash) — a pure column program, no join or shuffle; the classic
    positional-index phrase query, here as a scan-side filter. Combine
    with best_snippets for phrase-centered summaries."""
    terms = [t for t in phrase.split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    n = len(terms)
    lit = " ".join(terms)
    toks = _tokens(documents, id_col, text_col).filter(
        F.size("ts") >= n
    )
    return toks.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - n),
                lambda i: F.array_join(F.slice(F.col("ts"), i + 1, n), " "),
            )
        ).alias("pos", "w"),
    ).filter(F.col("w") == lit).select("id", "pos")


def phrase_stats(
    documents: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_hits, first_pos): per-document phrase occurrence
    counts (docs with zero hits omitted — the positional-index
    posting list shape)."""
    return (
        phrase_matches(documents, phrase, id_col, text_col)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pos").alias("first_pos"),
        )
    )
