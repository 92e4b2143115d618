"""bm25f_topk vs a pure-Python replica + the anchor-boost property."""

import math

import pytest

from dxa_pagerank_spark.functions.retrieval import bm25f_topk


def _replica(fields, queries, k, k1=1.2, b=0.75):
    # fields: [(name, {doc: text}, weight)]
    tfw, lens = {}, {}
    for _, docs, w in fields:
        for d, text in docs.items():
            ts = [t for t in text.split(" ") if t]
            lens[d] = lens.get(d, 0.0) + w * len(ts)
            for t in ts:
                tfw[(d, t)] = tfw.get((d, t), 0.0) + w
    n = len(lens)
    avg = sum(lens.values()) / n
    df = {}
    for (d, t), _ in tfw.items():
        df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qs in queries:
        scores = {}
        for t in qs.split(" "):
            if t not in df:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            for d in lens:
                tf = tfw.get((d, t), 0.0)
                if tf:
                    s = idf * (tf * (k1 + 1)) / (
                        tf + k1 * (1 - b + b * lens[d] / avg)
                    )
                    scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [
            (d, round(s, 6), i + 1) for i, (d, s) in enumerate(ranked)
        ]
    return out


def _fields(spark, body, anchor):
    bdf = spark.createDataFrame(
        list(body.items()), "doc_id long, text string"
    )
    adf = spark.createDataFrame(
        list(anchor.items()), "doc_id long, text string"
    )
    return [("body", bdf, 1.0), ("anchor", adf, 2.0)]


def test_bm25f_matches_replica(spark):
    body = {
        0: "spark table scan fast",
        1: "table table merge",
        2: "totally unrelated words",
        3: "scan scan scan",
    }
    anchor = {2: "table", 3: "table table"}
    queries = [(0, "table scan"), (1, "merge")]
    got = {}
    for r in bm25f_topk(
        _fields(spark, body, anchor), queries, k=4
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["doc_rank"])
        )
    want = _replica(
        [("body", body, 1.0), ("anchor", anchor, 2.0)], queries, 4
    )
    for qid in want:
        got[qid].sort(key=lambda x: x[2])
        assert [x[0] for x in got[qid]] == [x[0] for x in want[qid]]
        for (gd, gs, gr), (wd, ws, wr) in zip(got[qid], want[qid]):
            assert gs == pytest.approx(ws, abs=1e-6) and gr == wr


def test_anchor_weight_outranks_body_only_match(spark):
    # doc 9 never says "guide" itself, but two weighted anchors do;
    # doc 1 mentions it once in a long body — anchor evidence must win
    body = {
        1: "guide " + " ".join(f"f{i}" for i in range(60)),
        9: "completely different content here",
    }
    anchor = {9: "guide guide"}
    rows = bm25f_topk(
        _fields(spark, body, anchor), [(0, "guide")], k=2
    ).collect()
    top = min(rows, key=lambda r: r["doc_rank"])
    assert top["doc_id"] == 9


def test_bm25f_rejects_empty_fields(spark):
    with pytest.raises(ValueError):
        bm25f_topk([], [(0, "x")])
