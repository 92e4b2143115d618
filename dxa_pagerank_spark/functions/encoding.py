"""Encoding-quality / mojibake scoring for crawled text.
[north_rule extension — webtext payload; no reference counterpart]

A Common-Crawl-scale corpus is full of decode accidents: U+FFFD
replacement characters from lossy decodes, UTF-8-read-as-Latin-1
mojibake ("â€™" where an apostrophe should be, "Ã©" for é), and stray
C0 control bytes from binary sniffing. Downstream LLM training wants
these flagged before tokenization — a doc full of replacement chars is
noise regardless of its other quality signals.

Three counters + a verdict, all pure JVM column expressions
(regexp_count over literal patterns — no Python, no shuffle; the
operator is a projection and composes with any scan):

* n_replacement — U+FFFD occurrences (hard decode failures)
* n_mojibake    — occurrences of the classic UTF-8-as-cp1252 digraph
                  family (â€™ â€œ â€ â€“ â€” â€¦ Ã© Ã¨ Ã¼ Ã± Ã¤ Ã¶ Â°
                  plus the bare "Â " no-break-space artifact)
* n_ctrl        — C0 control chars other than tab/newline/CR
* verdict       — 'bad' (any replacement or control char),
                  'suspect' (mojibake only), else 'clean'

The pattern list is intentionally the short, high-precision core set —
the point is a deterministic, SQL-replayable signal, not a full
ftfy-style fixer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# UTF-8 bytes of ' " " – — … decoded as cp1252, plus common Latin-1
# doublings and the no-break-space artifact. Kept alternation-simple:
# every branch is a literal, so the regex engine runs in linear time.
MOJIBAKE_PATTERNS = [
    "â€™",  # â€™  (')
    "â€œ",  # â€œ  (")
    "â€",  # â€?  (")
    "â€“",  # â€“  (–)
    "â€”",  # â€”  (—)
    "â€¦",  # â€¦  (…)
    "Ã©",  # Ã©  (é)
    "Ã¨",  # Ã¨  (è)
    "Ã¼",  # Ã¼  (ü)
    "Ã±",  # Ã±  (ñ)
    "Ã¤",  # Ã¤  (ä)
    "Ã¶",  # Ã¶  (ö)
    "Â°",  # Â°  (°)
    "Â ",  # Â + NBSP
]

_MOJIBAKE_RE = "|".join(MOJIBAKE_PATTERNS)
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_REPLACEMENT = "�"


def encoding_quality(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_replacement, n_mojibake, n_ctrl, verdict)."""
    n_rep = F.regexp_count(F.col(text_col), F.lit(_REPLACEMENT))
    n_moj = F.regexp_count(F.col(text_col), F.lit(_MOJIBAKE_RE))
    n_ctl = F.regexp_count(F.col(text_col), F.lit(_CTRL_RE))
    verdict = (
        F.when((n_rep > 0) | (n_ctl > 0), F.lit("bad"))
        .when(n_moj > 0, F.lit("suspect"))
        .otherwise(F.lit("clean"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        n_rep.cast("long").alias("n_replacement"),
        n_moj.cast("long").alias("n_mojibake"),
        n_ctl.cast("long").alias("n_ctrl"),
        verdict.alias("verdict"),
    )
