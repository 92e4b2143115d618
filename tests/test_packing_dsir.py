"""Sequence packing + DSIR importance resampling vs pure-Python
oracles (SURVEY.md §5.2)."""

import math
import re

import pytest
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.dsir import (
    FNV_OFFSET,
    dsir_log_weights,
    dsir_sample,
)
from dxa_pagerank_spark.functions.packing import (
    pack_documents,
    packing_report,
    token_count_col,
)
from dxa_pagerank_spark.functions.sampling import KNUTH, MOD


def _pack_oracle(items, L):
    """items: [(id, n_tokens)] — sequential concat-and-chop replay."""
    out = {}
    pos = 0
    for i, n in sorted(items):
        start = pos
        pos += n
        first = start // L
        last = max(pos - 1, start) // L
        out[i] = (n, start, first, last, 0 if n == 0 else last - first + 1)
    return out


def _mk_docs(spark, items):
    return spark.createDataFrame(
        [(i, n) for i, n in items], "doc_id long, n_tokens long"
    )


def test_packing_fixture(spark):
    items = [(0, 3), (1, 5), (2, 0), (3, 9), (4, 2), (5, 8)]
    L = 8
    expected = _pack_oracle(items, L)
    got = {
        r["id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["pack_first"],
            r["pack_last"],
            r["n_packs"],
        )
        for r in pack_documents(
            _mk_docs(spark, items), L, tokens_col="n_tokens"
        ).collect()
    }
    assert got == expected


def test_packing_many_partitions(spark):
    """Prefix sums must stay exact when docs cross partition
    boundaries: 400 docs forced through 7 range partitions."""
    items = [(i, (i * 37) % 23) for i in range(400)]
    L = 64
    expected = _pack_oracle(items, L)
    got = {
        r["id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["pack_first"],
            r["pack_last"],
            r["n_packs"],
        )
        for r in pack_documents(
            _mk_docs(spark, items), L, tokens_col="n_tokens", num_partitions=7
        ).collect()
    }
    assert got == expected


def test_packing_report(spark):
    items = [(i, 10) for i in range(10)]  # 100 tokens, L=25
    rep = packing_report(
        pack_documents(_mk_docs(spark, items), 25, tokens_col="n_tokens"), 25
    ).collect()[0]
    assert rep["n_docs"] == 10
    assert rep["n_tokens"] == 100
    assert rep["n_windows"] == 4
    # spans [20,30) and [70,80) cross the boundaries at 25 and 75
    assert rep["n_straddling"] == 2
    assert rep["last_window_fill"] == pytest.approx(1.0, abs=1e-6)


def test_packing_no_single_partition_exchange(spark):
    """The scale claim: no global-window all-to-one Exchange."""
    items = [(i, i % 5) for i in range(100)]
    df = pack_documents(_mk_docs(spark, items), 16, tokens_col="n_tokens")
    # pack_documents materializes via localCheckpoint, so inspect the
    # physical plan it executed via the SQL listener instead: rebuild
    # the same shape unmaterialized and check the window is partitioned.
    from dxa_pagerank_spark.functions import packing as _p

    d = (
        _mk_docs(spark, items)
        .repartitionByRange(4, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("pid").orderBy("doc_id")
    spans = d.select("doc_id", F.sum("n_tokens").over(w).alias("cum"))
    plan = spans._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        spans._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan
    assert df.count() == 100


def test_token_count_col(spark):
    df = spark.createDataFrame(
        [(0, "a b  c"), (1, ""), (2, "  x "), (3, "one,two three")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", token_count_col(F.col("text")).alias("n")).collect()
    }
    assert got == {0: 3, 1: 0, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

_TOK_RE = re.compile(r"[a-z0-9]+")


def _fnv32(s: str) -> int:
    h = FNV_OFFSET
    for ch in s:
        h = ((h ^ ord(ch)) * 16777619) % (1 << 32)
    return h


def _dsir_oracle(rows, target_ids, B):
    """rows: [(id, text)] -> {id: (n_feats, log_w)} replaying
    functions/dsir.py feature hashing + add-1 bucket models."""
    feats = {}
    for i, text in rows:
        toks = _TOK_RE.findall(text.lower())
        fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats[i] = [(_fnv32(f) % B) for f in fs]
    c_src, c_tgt = {}, {}
    for i, bs in feats.items():
        for b in bs:
            c_src[b] = c_src.get(b, 0) + 1
            if i in target_ids:
                c_tgt[b] = c_tgt.get(b, 0) + 1
    t_src = sum(c_src.values())
    t_tgt = sum(c_tgt.values())
    out = {}
    for i, bs in feats.items():
        lw = sum(
            math.log((c_tgt.get(b, 0) + 1.0) / (t_tgt + B))
            - math.log((c_src[b] + 1.0) / (t_src + B))
            for b in bs
        )
        out[i] = (len(bs), lw)
    return out


_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the quick brown fox naps"),
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "the lazy dog naps too"),
    (5, "five dozen boxes of foxes"),
    (6, ""),
    (7, "dog dog dog dog"),
]


def test_dsir_log_weights(spark):
    B = 64
    target = {0, 2, 4}
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    expected = _dsir_oracle(_DOCS, target, B)
    got = {
        r["id"]: (r["n_feats"], r["log_w"])
        for r in dsir_log_weights(
            df, F.col("doc_id").isin(*target), n_buckets=B
        ).collect()
    }
    assert got.keys() == expected.keys()
    for i, (n, lw) in expected.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lw, rel=1e-12, abs=1e-12)


def test_dsir_sample_prefers_target_like(spark):
    """Docs sharing the target's vocabulary should outrank the rest in
    expectation — check the pure log_w ordering (no Gumbel)."""
    B = 64
    target = {0, 2, 4}
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    lw = {
        r["id"]: r["log_w"]
        for r in dsir_log_weights(
            df, F.col("doc_id").isin(*target), n_buckets=B
        ).collect()
    }
    # per-token average weight: target-vocab docs beat the off-topic one
    assert lw[2] / 5 > lw[3] / 11  # doc 3 = lorem ipsum (6 toks, 11 feats)


def test_dsir_sample_deterministic_topk(spark):
    B = 64
    target = {0, 2, 4}
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    expected_lw = _dsir_oracle(_DOCS, target, B)

    def gumbel(i):
        u = (((i % (1 << 31)) * KNUTH) % MOD + 0.5) / MOD
        return -math.log(-math.log(u))

    scores = sorted(
        ((expected_lw[i][1] + gumbel(i), i) for i, _ in _DOCS),
        key=lambda t: (-t[0], t[1]),
    )
    expected_ids = [i for _, i in scores[:3]]
    got = [
        r["id"]
        for r in dsir_sample(
            df, F.col("doc_id").isin(*target), k=3, n_buckets=B
        ).collect()
    ]
    assert got == expected_ids
