"""HTML -> visible-text extraction.

``extract_text`` IS the spec (BASELINE.json input_hint: extraction must
be byte-identical per url to a pure-Python oracle — the oracle and the
engine UDF share this one frozen implementation; golden-byte tests in
tests/test_textextract.py pin it against regressions).

Rules (frozen):
  * decode input bytes as UTF-8 with replacement;
  * drop everything inside <script>, <style>, <template>, <noscript>
    and comments;
  * each text node is whitespace-collapsed (any run of whitespace -> one
    space) and stripped; empty nodes are dropped;
  * surviving nodes are joined with a single "\n" (document order, title
    first if present since <title> precedes body text).

The Spark-side operator is a vectorized pandas UDF (Arrow batches); no
per-row Python UDF anywhere (input_hint).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

_WS = re.compile(r"\s+")
_SKIP_TAGS = {"script", "style", "template", "noscript"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        collapsed = _WS.sub(" ", data).strip()
        if collapsed:
            self.chunks.append(collapsed)


def extract_text(html: bytes | str | None) -> str:
    """Frozen HTML->text extraction (see module docstring)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # extraction is best-effort but deterministic
    return "\n".join(parser.chunks)


def extract_text_udf():
    """Vectorized pandas UDF: html binary column -> extracted text."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _extract


def with_extracted_text(pages_df, html_col: str = "html", out_col: str = "text"):
    """pages(html binary, ...) -> same DF with extracted text column."""
    return pages_df.withColumn(out_col, extract_text_udf()(pages_df[html_col]))
