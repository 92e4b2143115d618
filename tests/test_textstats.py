"""Text-analysis operator tests vs pure-Python oracles."""

import re

import pandas as pd
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.textstats import (
    _fingerprint_one,
    doc_stats,
    quality_score,
    with_fingerprint,
    with_lang_id,
)


def test_doc_stats_matches_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = doc_stats(docs).toPandas().set_index("doc_id").sort_index()
    raw = docs.select("doc_id", "text").toPandas().set_index("doc_id").sort_index()
    for doc_id, row in raw.iterrows():
        t = row["text"]
        assert got.loc[doc_id, "n_chars"] == len(t)
        assert got.loc[doc_id, "n_tokens"] == len(re.findall(r"[A-Za-z]+", t))
        alpha = len(re.sub(r"[^A-Za-z ]", "", t)) / max(len(t), 1)
        assert abs(got.loc[doc_id, "alpha_ratio"] - round(alpha, 6)) < 1e-9


def test_quality_scores_bounded(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = quality_score(docs).toPandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()


def test_lang_id_on_multilingual_snippets(spark):
    samples = [
        (0, "the cat sat on the mat and looked at the dog with interest", "en"),
        (1, "der Hund und die Katze sind nicht in das Haus gegangen", "de"),
        (2, "le chat est sur la table et les enfants sont dans le jardin", "fr"),
        (3, "el perro y la casa son grandes pero es una buena idea", "es"),
        (4, "这是一个中文句子用来测试语言识别功能是否正常工作", "zh"),
        (5, "", "und"),
        (6, "12345 67890 !!!", "und"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(samples, columns=["doc_id", "text", "expected"])
    )
    got = with_lang_id(df).select("doc_id", "lang_pred", "expected").collect()
    for r in got:
        assert r["lang_pred"] == r["expected"], r


def test_fingerprint_whitespace_invariant(spark):
    a = "hello world foo bar"
    b = "hello   world\n\tfoo  bar"
    c = "hello world foo baz"
    assert _fingerprint_one(a) == _fingerprint_one(b)
    assert _fingerprint_one(a) != _fingerprint_one(c)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [a, b, c]})
    )
    got = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]
    assert got[0] == _fingerprint_one(a)  # UDF == oracle
