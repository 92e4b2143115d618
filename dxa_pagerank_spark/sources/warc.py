"""WARC ingestion: Common-Crawl archive files -> pages(url, warc_ts, html).

The reference consumes a pre-built edge list
(ReadLumpInEdgeListTask.java:41-140); BASELINE.json's north_star derives
the graph from Common-Crawl-style pages instead.  Common Crawl ships
pages as WARC files (ISO 28500): a sequence of records, each a
``WARC/1.0`` header block (CRLF lines, blank-line terminated) followed
by exactly ``Content-Length`` payload bytes and a CRLF CRLF separator.
For ``response`` records the payload is an HTTP/1.1 message whose own
header block precedes the html bytes.

Reader (the 100-TB path)
    ``read_warc`` lists the archive with Spark's ``binaryFile`` source —
    one task per file, the natural WARC unit since real archives are
    per-file gzip streams that cannot be split mid-member — and walks
    records by ``Content-Length`` inside an Arrow-batched
    ``mapInPandas``.  Nothing about record boundaries is guessed from
    payload content, so html that itself contains ``WARC/1.0`` lines or
    blank lines parses correctly (tests/test_warc.py pins this).
    Parallelism = number of archive files (Common Crawl publishes ~72k
    x ~1 GB files per snapshot), and the (url, warc_ts, html) rows feed
    sources/pages.py unchanged.

Writer (fixture-only)
    No external data exists in this sandbox, so ``write_warc_fixture``
    materialises a deterministic archive wrapping the exact synthetic
    pages of sources/pages_synth.py — byte-stable across runs, so the
    SQL oracles can regenerate every record's html by string
    concatenation.  Real deployments read archives they did not write;
    the writer exists to prove the reader, not to ship data.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = "\r\n"
_WARC_VERSION = "WARC/1.0"
_EPOCH = 1704067200  # 2024-01-01T00:00:00Z, = pages_synth._EPOCH


def _iso(ts_s: int) -> str:
    """Seconds since epoch -> WARC-Date (UTC, second resolution)."""
    days, rem = divmod(ts_s - _EPOCH, 86400)
    if not 0 <= days <= 30:
        # fixture timestamps are _EPOCH + doc_id seconds, always inside
        # 2024-01; a civil-date library would be dead code here
        raise ValueError(f"fixture timestamp outside 2024-01: {ts_s}")
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    return f"2024-01-{1 + days:02d}T{h:02d}:{m:02d}:{s:02d}Z"


def _record(headers: dict[str, str], payload: bytes) -> bytes:
    head = _WARC_VERSION + _CRLF
    head += "".join(f"{k}: {v}{_CRLF}" for k, v in headers.items())
    head += f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
    return head.encode("ascii") + payload + (_CRLF + _CRLF).encode("ascii")


def _response_record(url: str, ts_s: int, html: bytes) -> bytes:
    http = (
        "HTTP/1.1 200 OK" + _CRLF + "Content-Type: text/html; charset=UTF-8"
        + _CRLF + f"Content-Length: {len(html)}" + _CRLF + _CRLF
    ).encode("ascii") + html
    return _record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": url,
            "WARC-Date": _iso(ts_s),
        },
        http,
    )


def _warcinfo_record(filename: str) -> bytes:
    body = ("software: dxa_pagerank_spark fixture writer" + _CRLF).encode()
    return _record({"WARC-Type": "warcinfo", "WARC-Filename": filename}, body)


def write_warc_fixture(
    pages: Iterator[tuple[int, str, int, bytes]], out_dir: str, n_files: int
) -> None:
    """Deterministic archive: page (doc_id, url, ts_s, html) goes to file
    ``doc_id % n_files``, ascending doc_id within a file, one warcinfo
    record leading each file.  Byte-stable, so oracles are closed-form.
    """
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    names = [f"part-{i:04d}.warc" for i in range(n_files)]
    handles = [open(os.path.join(tmp, n), "wb") for n in names]
    try:
        for i, name in enumerate(names):
            handles[i].write(_warcinfo_record(name))
        for doc_id, url, ts_s, html in sorted(pages):
            handles[doc_id % n_files].write(_response_record(url, ts_s, html))
    finally:
        for h in handles:
            h.close()
    try:
        os.rename(tmp, out_dir)  # atomic publish: readers never see a partial dir
    except OSError:
        if not os.path.isdir(out_dir):  # real failure, not a lost race
            raise


_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _parse_warc_bytes(content: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Walk one archive's records by Content-Length (never by payload
    sniffing).  Yields (url, warc_date, html) per response record."""
    pos, n = 0, len(content)
    while pos < n:
        if content[pos : pos + 5] != b"WARC/":
            raise ValueError(f"malformed WARC record at byte {pos}")
        hdr_end = content.index(b"\r\n\r\n", pos)
        headers = {}
        for line in content[pos:hdr_end].decode("utf-8").split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        clen = int(headers["Content-Length"])
        payload = content[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # payload + record separator CRLFCRLF
        if headers.get("WARC-Type") != "response":
            continue
        # payload is an HTTP message: html starts after its header block
        body = payload[payload.index(b"\r\n\r\n") + 4 :]
        yield headers["WARC-Target-URI"], headers["WARC-Date"], body


def parse_warc_files(files: DataFrame) -> DataFrame:
    """(content binary, ...) file rows -> pages(url, warc_ts, html).

    Shared by the batch reader and the streaming ingest: the parse is a
    stateless Arrow-batched projection, so the identical code object
    runs under ``read`` and ``readStream`` (stream == batch parity is
    pinned in tests, like every other streaming operator here)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for url, date, html in _parse_warc_bytes(bytes(content)):
                    rows.append(
                        (url, pd.Timestamp(date.rstrip("Z")), bytearray(html))
                    )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.select("content").mapInPandas(parse, _PAGES_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Archive directory -> pages(url, warc_ts, html).

    ``binaryFile`` deliberately: WARC members are not splittable, so the
    unit of parallelism is the file, exactly like production Common
    Crawl jobs; the parse runs Arrow-batched with the (path, bytes) row
    as the only shuffle-free input and html bytes never re-encoded.
    """
    return parse_warc_files(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
    )


# binaryFile's fixed schema, needed explicitly by readStream file sources
BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def synth_warc_fixture(spark, docs: DataFrame, out_dir: str, n_files: int = 8):
    """Materialise the pages_synth corpus as a WARC archive at
    ``out_dir`` (idempotent: keyed on the atomic directory rename in
    write_warc_fixture).  Fixture-scale only — the html rows are
    collected to the driver to produce byte-stable files."""
    if os.path.isdir(out_dir):
        return
    from .pages_synth import synth_pages

    n = docs.count()
    pdf = (
        synth_pages(docs, n)
        .select(
            F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
            "url",
            F.unix_timestamp("warc_ts").alias("ts_s"),
            "html",
        )
        .toPandas()
    )
    pages = (
        (int(r.doc_id), r.url, int(r.ts_s), bytes(r.html))
        for r in pdf.itertuples()
    )
    write_warc_fixture(pages, out_dir, n_files)
