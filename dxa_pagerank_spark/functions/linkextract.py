"""<a href> link extraction from HTML. [north_rule — no reference code]

The reference ingests a ready-made in-edge-list file
(ReadLumpInEdgeListTask.java); the north_rule replaces that with
Common-Crawl-style pages, so the edge table is *derived*: parse anchors
out of the html, resolve each href against the page url, keep
http(s)-absolute results.

Frozen extraction rules (shared by the engine UDF and test oracles):
  * anchors in document order; every <a> with a non-empty href attr;
  * href resolved against the page url (urllib.parse.urljoin);
  * only http/https schemes survive; fragments are stripped;
  * duplicates are kept — multiplicity is meaningful downstream
    (file-ingest semantics, SURVEY.md §2.3 item 6).

Spark side: one vectorized pandas UDF producing array<string>, then
posexplode — no per-row Python (input_hint).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

import pandas as pd


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        for name, value in attrs:
            if name == "href" and value:
                self.hrefs.append(value)
                break


def extract_links(html: bytes | str | None, base_url: str) -> list[str]:
    """Frozen link extraction (see module docstring)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _LinkExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    out: list[str] = []
    for href in parser.hrefs:
        try:
            resolved = urldefrag(urljoin(base_url, href.strip()))[0]
        except ValueError:
            continue
        if re.match(r"^https?://", resolved):
            out.append(resolved)
    return out


def extract_links_udf():
    """Vectorized pandas UDF: (html binary, url string) -> array<string>."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _links(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links(h, u) for h, u in zip(html, url)]
        )

    return _links


class _AnchorExtractor(HTMLParser):
    """Like _LinkExtractor but also captures each anchor's text: the
    concatenated character data between <a href=...> and the matching
    </a> (nested non-anchor markup contributes its text; nested <a>
    restarts capture, matching how browsers auto-close anchors)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []  # (href, text)
        self._href: str | None = None
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            self.anchors.append((self._href, "".join(self._buf)))
        self._href, self._buf = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        self._flush()
        for name, value in attrs:
            if name == "href" and value:
                self._href = value
                break

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def extract_anchors(html: bytes | str | None, base_url: str) -> list[tuple[str, str]]:
    """Frozen anchor extraction: [(resolved_url, anchor_text)] in document
    order, same resolution/filter rules as extract_links (urljoin,
    urldefrag, http(s)-only, duplicates kept)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _AnchorExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    out: list[tuple[str, str]] = []
    for href, text in parser.anchors:
        try:
            resolved = urldefrag(urljoin(base_url, href.strip()))[0]
        except ValueError:
            continue
        if re.match(r"^https?://", resolved):
            out.append((resolved, text))
    return out


def extract_anchors_udf():
    """Vectorized pandas UDF: (html binary, url string) ->
    array<struct<link string, text string>>."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("link", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        )
    )

    @F.pandas_udf(schema)
    def _anchors(html: pd.Series, url: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [{"link": a, "text": t} for a, t in extract_anchors(h, u)]
                for h, u in zip(html, url)
            ]
        )

    return _anchors
