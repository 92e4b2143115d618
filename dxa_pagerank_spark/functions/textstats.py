"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All hot-path expressions are JVM-side built-ins (regexp_count, length,
split) — whole-stage-codegen friendly at 100 TB. Only language ID needs
Python, and it is a vectorized pandas UDF over Arrow batches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WORD_RE = r"[A-Za-z]+"


def token_count(col) -> Column:
    """Whitespace-ish token count: number of alphabetic word runs."""
    return F.regexp_count(col, F.lit(WORD_RE)).cast("long")


def alpha_ratio(col) -> Column:
    """Share of characters that are [A-Za-z ] — a cheap quality signal."""
    cleaned = F.length(F.regexp_replace(col, "[^A-Za-z ]", ""))
    return cleaned.cast("double") / F.greatest(F.length(col), F.lit(1)).cast(
        "double"
    )


def avg_token_len(col) -> Column:
    alpha_chars = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    return alpha_chars.cast("double") / F.greatest(
        token_count(col), F.lit(1)
    ).cast("double")


def doc_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame (SQL-oracle-friendly: deterministic,
    built-ins only, rounded)."""
    c = F.col(text_col)
    return documents.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars"),
        token_count(c).alias("n_tokens"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        F.round(avg_token_len(c), 6).alias("avg_token_len"),
    )


def quality_col(col) -> Column:
    """Composite [0,1] quality expression: length band + alpha ratio +
    mean-token-length band. Deterministic, built-ins only."""
    len_band = F.when(F.length(col).between(200, 20000), 1.0).otherwise(
        F.least(F.length(col).cast("double") / 200.0, F.lit(1.0))
    )
    tok_band = F.when(avg_token_len(col).between(3.0, 10.0), 1.0).otherwise(0.5)
    return F.round((len_band + tok_band + alpha_ratio(col)) / 3.0, 6)


def quality_score(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document composite quality frame (see quality_col)."""
    return documents.select(
        "doc_id", quality_col(F.col(text_col)).alias("quality")
    )


# --- language ID (n-gram heuristic; pandas UDF — no SQL oracle) -----------

# Tiny per-language marker sets: function words + characteristic n-grams.
# Deterministic heuristic, not a trained model; accuracy is asserted on
# synthetic fixtures in tests (the sf documents' text is synthetic word
# salad, so its lang column is a label, not evidence).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "des"),
    "es": ("el", "la", "los", "que", "es", "una", "por", "con"),
}


def _lang_id_one(text: str | None) -> str:
    if not text:
        return "und"
    # CJK codepoint share wins outright
    cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
    if cjk > 0 and cjk / max(len(text[:2000]), 1) > 0.05:
        return "zh"
    words = re.findall(r"[a-zA-Zäöüéèêàçñ]+", text.lower()[:2000])
    if not words:
        return "und"
    counts = {
        lang: sum(1 for w in words if w in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    best = max(sorted(counts), key=lambda k: counts[k])
    return best if counts[best] > 0 else "und"


def lang_id_udf():
    @F.pandas_udf(T.StringType())
    def _lang(text: pd.Series) -> pd.Series:
        return text.map(_lang_id_one)

    return _lang


def with_lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    return documents.withColumn("lang_pred", lang_id_udf()(F.col(text_col)))


# --- document fingerprint (polynomial rolling hash) ------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


# Explicit ASCII whitespace class (== RE2's \s) instead of Python's
# unicode-aware \S so the engine and the DuckDB oracle tokenize
# identically on any input, not just ASCII (ADVICE r01).
_FP_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


def _fingerprint_one(text: str | None) -> int:
    """Deterministic 61-bit polynomial hash of the UTF-8 token-byte
    stream (a content fingerprint robust to whitespace layout)."""
    if not text:
        return 0
    h = 0
    for tok in _FP_TOKEN_RE.findall(text):
        for b in tok.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        h = (h * _FP_BASE + 0x20) % _FP_MOD
    return h


def fingerprint_udf():
    @F.pandas_udf(T.LongType())
    def _fp(text: pd.Series) -> pd.Series:
        return text.map(_fingerprint_one)

    return _fp


def with_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    return documents.withColumn("fingerprint", fingerprint_udf()(F.col(text_col)))


def readability(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Flesch Reading Ease + Flesch-Kincaid grade level
    (Flesch 1948; Kincaid et al. 1975) — the classic length-vs-
    complexity readability pair used as a document-quality signal in
    web-corpus curation.

    Counting conventions (fixed so a SQL oracle replays them
    exactly; both engines use the same RE2-safe patterns):
      words      = maximal [A-Za-z]+ runs (the WORD_RE token law)
      sentences  = maximal [.!?]+ runs, floored at 1
      syllables  = maximal [aeiouyAEIOUY]+ vowel runs — the standard
                   cheap syllable estimate; a vowel run always lies
                   inside a letter run, so this is a per-word sum.
                   (No min-1-per-word adjustment: all-consonant
                   tokens contribute 0 — documented variant.)

        ease  = 206.835 - 1.015*(words/sentences)
                        - 84.6*(syllables/words)
        grade = 0.39*(words/sentences) + 11.8*(syllables/words)
                - 15.59

    Pure column program: three regexp counts per row (JVM codegen, no
    shuffle, no Python); integer counts exact, the two ratios and the
    affine formulas are the only float math. Docs with zero words get
    NULL scores rather than a division blowup.
    """
    words = F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0))
    sents = F.greatest(
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)
        ),
        F.lit(1),
    )
    syls = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[aeiouyAEIOUY]+"), 0
        )
    )
    wps = words.cast("double") / sents.cast("double")
    spw = F.when(
        words > 0, syls.cast("double") / words.cast("double")
    )
    return documents.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
        F.when(
            words > 0,
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
        ).alias("flesch_ease"),
        F.when(
            words > 0,
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
        ).alias("fk_grade"),
    )
