"""Span-level benchmark contamination vs a pure-Python window replica."""

from __future__ import annotations

import pytest

from dxa_pagerank_spark.functions.spandedup import (
    contaminated_spans,
    contamination_stats,
)


def _replica_spans(corpus, bench_texts, w):
    bh = set()
    for t in bench_texts:
        ts = [x for x in t.split(" ") if x]
        for i in range(len(ts) - w + 1):
            bh.add(" ".join(ts[i : i + w]))
    out = {}
    for did, t in corpus:
        ts = [x for x in t.split(" ") if x]
        wins = [
            i
            for i in range(len(ts) - w + 1)
            if " ".join(ts[i : i + w]) in bh
        ]
        spans, cur = [], None
        for i in wins:
            s, e = i, i + w - 1
            if cur and s <= cur[1] + 1:
                cur[1] = max(cur[1], e)
            else:
                if cur:
                    spans.append(tuple(cur))
                cur = [s, e]
        if cur:
            spans.append(tuple(cur))
        for s, e in spans:
            out[(did, s, e)] = e - s + 1
    return out


def _fixture():
    bench = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs",
    ]
    corpus = [
        # contains a long verbatim benchmark passage mid-document
        (0, "intro words here the quick brown fox jumps over the lazy "
            "dog tonight and more trailing prose follows now"),
        # clean document
        (1, "completely original text with no overlap at all in it whatsoever "
            "and it keeps going for a while longer"),
        # exactly one window of overlap
        (2, "pack my box with five dozen liquor jugs"),
        # too short to form any window
        (3, "tiny doc"),
    ]
    return corpus, bench


@pytest.mark.parametrize("w", [4, 8])
def test_contaminated_spans_match_replica(spark, w):
    corpus, bench = _fixture()
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    got = {
        (r["id"], r["span_start"], r["span_end"]): r["span_len"]
        for r in contaminated_spans(cdf, bdf, width=w).collect()
    }
    assert got == _replica_spans(corpus, bench, w)
    assert any(k[0] == 0 for k in got)  # doc 0 is flagged


def test_contamination_stats_shape(spark):
    corpus, bench = _fixture()
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    got = {
        r["id"]: (
            r["n_tokens"],
            r["contaminated_tokens"],
            r["contaminated_frac"],
            r["n_spans"],
        )
        for r in contamination_stats(cdf, bdf, width=8).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[1][1] == 0 and got[1][3] == 0  # clean doc reports zeros
    assert got[2][1] == got[2][0]  # fully contaminated doc
    assert got[2][2] == pytest.approx(1.0)
    assert got[0][1] >= 8 and 0 < got[0][2] < 1
    assert got[3] == (2, 0, 0.0, 0)
