"""Property test for ExactSubstr span dedup: a seeded 80-doc corpus
over a 6-word vocabulary (dense repeats) checked span-for-span against
a pure-Python replica, plus structural invariants."""

import numpy as np

from dxa_pagerank_spark.functions.spandedup import (
    duplicate_spans,
    substring_dedup_stats,
)

VOCAB = ["a", "b", "c", "d", "e", "f"]


def _random_docs(n=80, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        length = int(rng.integers(0, 14))
        docs.append((i, " ".join(rng.choice(VOCAB, size=length))))
    return docs


def _py_spans(docs, width, min_count=2):
    wins = {}  # window tuple -> [(doc, pos)...] in (doc, pos) order
    toks = {i: [t for t in s.split(" ") if t] for i, s in docs}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - width + 1):
            wins.setdefault(tuple(ts[p : p + width]), []).append((i, p))
    marked = {}
    for occs in wins.values():
        if len(occs) >= min_count:
            for d, p in occs[1:]:  # keep the globally first (min (d,p))
                marked.setdefault(d, []).append((p, p + width - 1))
    spans = []
    for d, ivals in marked.items():
        ivals.sort()
        cs, ce = ivals[0]
        for s, e in ivals[1:]:
            if s <= ce + 1:
                ce = max(ce, e)
            else:
                spans.append((d, cs, ce))
                cs, ce = s, e
        spans.append((d, cs, ce))
    return sorted(spans)


def test_spans_match_python_replica_and_invariants(spark):
    docs = _random_docs()
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    got = sorted(
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, width=3).collect()
    )
    assert got == _py_spans(docs, 3)
    # invariants: spans in bounds, non-overlapping with >= 1 token gaps,
    # and the stats roll up exactly
    lens = {i: len([t for t in s.split(" ") if t]) for i, s in docs}
    by_doc = {}
    for d, s, e in got:
        assert 0 <= s <= e < lens[d]
        by_doc.setdefault(d, []).append((s, e))
    for d, ivals in by_doc.items():
        for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
            assert s2 > e1 + 1  # merged islands cannot touch
    stats = {
        r["id"]: (r["n_spans"], r["dup_tokens"])
        for r in substring_dedup_stats(df, width=3).collect()
    }
    for d in lens:
        ivals = by_doc.get(d, [])
        assert stats[d] == (len(ivals), sum(e - s + 1 for s, e in ivals))
