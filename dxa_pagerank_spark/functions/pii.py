"""PII detection and masking for training-data pipelines.
[north_rule extension — no reference counterpart]

Before web text enters a training corpus, personally identifiable
strings are replaced with typed placeholder tokens (the convention in
public pipelines such as BigCode/The-Stack and Dolma). This module
implements the two pattern families whose regexes are portable across
Java regex (Spark) and RE2 (DuckDB/Go) byte-for-byte — email addresses
and IPv4 literals — as pure JVM column expressions: regexp_replace /
regexp_count, whole-stage codegen, zero shuffles, pushdown-safe.

A production deployment adds locale-specific patterns (phone formats,
national id numbers) and an NER model pass for names; those are
pattern-table extensions of `MASKS` and a mapInPandas stage
respectively — the operator shape here (per-row column transform)
does not change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern, placeholder. Order matters: emails are masked before IPv4 so
# a digits-and-dots local-part cannot be half-rewritten by the IP rule.
MASKS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
)


def mask_pii_col(text_col: Column) -> Column:
    """Masked text column: every MASKS pattern replaced globally."""
    out = text_col
    for pattern, token in MASKS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text_col: Column) -> list[Column]:
    """One count column per pattern family: n_emails, n_ips.
    Counted on the ORIGINAL text, before masking."""
    return [
        F.regexp_count(text_col, F.lit(MASKS[0][0])).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(text_col, F.lit(MASKS[1][0])).cast("long").alias(
            "n_ips"
        ),
    ]


def mask_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, text, n_emails, n_ips): masked text plus per-family hit
    counts (counts let the pipeline monitor PII density per source and
    alert on regressions without diffing text)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        mask_pii_col(c).alias("text"),
        *pii_counts(c),
    )
