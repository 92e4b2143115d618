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
