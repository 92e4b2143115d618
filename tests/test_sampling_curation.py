"""Deterministic sampling, graph statistics, and corpus curation."""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.curation import curate_corpus, curation_report
from dxa_pagerank_spark.functions.sampling import (
    MOD,
    hash_sample,
    sample_sql_predicate,
    stratified_sample,
)
from dxa_pagerank_spark.operators.graphstats import (
    degree_assortativity,
    reciprocity,
)


def test_hash_sample_partitioning_invariant(spark):
    """The sample is keyed on the row, not the partition: any
    repartitioning yields the identical id set (the property
    df.sample() lacks)."""
    base = spark.range(10_000)
    a = {r["id"] for r in hash_sample(base.repartition(3), "id", 0.2).collect()}
    b = {r["id"] for r in hash_sample(base.repartition(17), "id", 0.2).collect()}
    assert a == b
    assert 0.15 < len(a) / 10_000 < 0.25  # Bernoulli(0.2) within 5 sigma


def test_hash_sample_matches_sql_predicate(spark):
    """The DuckDB-side mirror predicate selects the same keys."""
    got = {
        r["id"]
        for r in hash_sample(spark.range(5_000), "id", 0.3, salt=7).collect()
    }
    exp = {
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT i FROM range(5000) t(i) WHERE "
            + sample_sql_predicate("i", 0.3, salt=7)
        )
        .fetchall()
    }
    assert got == exp


def test_stratified_sample_rates_and_default(spark):
    df = spark.range(30_000).select(
        "id", (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_sample(
        df, key="id", stratum="s", rates={"0": 0.5, "1": 0.05}, default_rate=0.0
    )
    frac = {
        r["s"]: r["n"] / 10_000
        for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.45 < frac["0"] < 0.55
    assert 0.03 < frac["1"] < 0.07
    assert "2" not in frac  # default rate 0 drops the whole stratum

    # rate 1.0 keeps every row (threshold == 2^32 > any bucket)
    full = stratified_sample(
        df, key="id", stratum="s", rates={"0": 1.0}, default_rate=0.0
    )
    assert full.count() == 10_000
    assert MOD == 1 << 32


def test_reciprocity_hand_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 5), (1, 2)],
        "src long, dst long",
    )
    row = reciprocity(edges).collect()[0]
    # distinct non-loop: (1,2),(2,1),(1,3),(3,4),(4,3) — 4 of 5 reciprocal
    assert (row["n_edges"], row["n_reciprocal"]) == (5, 4)
    assert abs(row["reciprocity"] - 0.8) < 1e-12


def test_degree_assortativity_matches_numpy(spark):
    rng = np.random.default_rng(13)
    m = 400
    src = rng.integers(0, 50, m)
    dst = rng.integers(0, 50, m)
    keep = src != dst
    pdf = pd.DataFrame({"src": src[keep], "dst": dst[keep]}).drop_duplicates()
    got = degree_assortativity(spark.createDataFrame(pdf)).collect()[0]

    out_deg = pdf.groupby("src").size()
    in_deg = pdf.groupby("dst").size()
    x = pdf["src"].map(out_deg).to_numpy(dtype=float)
    y = pdf["dst"].map(in_deg).to_numpy(dtype=float)
    exp = np.corrcoef(x, y)[0, 1]
    assert got["n"] == len(pdf)
    assert abs(got["assortativity"] - exp) < 1e-9


def _docs_fixture(spark):
    good = "The quick brown fox jumps over the lazy dog. " * 10  # 450 chars
    rows = [
        (0, good, "en", "s0"),          # kept
        (1, good, "en", "s0"),          # exact dup of 0 -> dropped
        (2, good + "x", "de", "s1"),    # kept
        (3, good, "fr", "s0"),          # dup of 0 (dropped before lang filter)
        (4, "short", "en", "s1"),       # fails token band + length
        (5, good + "y", "zh", "s1"),    # lang not allowed
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_curate_corpus_chain(spark):
    cur = curate_corpus(_docs_fixture(spark), langs=("en", "de"))
    assert {r["doc_id"] for r in cur.select("doc_id").collect()} == {0, 2}

    rep = curation_report(_docs_fixture(spark), langs=("en", "de"))
    got = {r["lang"]: (r["n_docs"], r["n_tokens"]) for r in rep.collect()}
    assert got == {"en": (1, 90), "de": (1, 91)}  # 9 words x 10 reps (+'x')


def test_weighted_reservoir_matches_replica_and_is_stable(spark):
    import math

    from dxa_pagerank_spark.functions.sampling import (
        KNUTH,
        MOD,
        weighted_reservoir,
    )

    rows = [
        (i, ["en", "de", "fr"][i % 3], float(1 + (i * 7) % 13))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")

    def replica(salt, k):
        by_g = {}
        for i, g, w in rows:
            u = (((i + salt) * KNUTH) % MOD + 1.0) / MOD
            e = -math.log(u) / w
            by_g.setdefault(g, []).append((e, i))
        keep = set()
        for g, lst in by_g.items():
            for e, i in sorted(lst)[:k]:
                keep.add(i)
        return keep

    for salt, k in ((0, 5), (3, 2), (9, 50)):
        got = {
            r["doc_id"]
            for r in weighted_reservoir(
                df, "lang", F.col("doc_id"), F.col("w"), k, salt=salt
            ).collect()
        }
        assert got == replica(salt, k), (salt, k)

    # reproducible under repartitioning
    got_a = {
        r["doc_id"]
        for r in weighted_reservoir(
            df.repartition(13), "lang", F.col("doc_id"), F.col("w"), 4
        ).collect()
    }
    got_b = {
        r["doc_id"]
        for r in weighted_reservoir(
            df.coalesce(1), "lang", F.col("doc_id"), F.col("w"), 4
        ).collect()
    }
    assert got_a == got_b


def test_weighted_reservoir_prefers_heavy_rows(spark):
    from dxa_pagerank_spark.functions.sampling import weighted_reservoir

    # one heavy row (w=50) vs 49 light rows (w=1) in one group: across
    # 40 salts the heavy row must be drawn far more often than any
    # fixed light row would be on average
    rows = [(i, "g", 50.0 if i == 0 else 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    hits = 0
    for salt in range(40):
        got = {
            r["doc_id"]
            for r in weighted_reservoir(
                df, "lang", F.col("doc_id"), F.col("w"), 1, salt=salt
            ).collect()
        }
        hits += 0 in got
    # P(heavy wins one draw) = 50/99; expect ~20/40, light rows ~0.4
    assert hits >= 10


def test_weighted_reservoir_guards(spark):
    import pytest as _pytest

    from dxa_pagerank_spark.functions.sampling import weighted_reservoir

    df = spark.createDataFrame(
        [(0, "g", 1.0), (1, "g", 0.0), (2, "g", -2.0)],
        "doc_id long, lang string, w double",
    )
    with _pytest.raises(ValueError):
        weighted_reservoir(df, "lang", F.col("doc_id"), F.col("w"), 0)
    got = weighted_reservoir(
        df, "lang", F.col("doc_id"), F.col("w"), 10
    ).collect()
    # zero/negative-weight rows can never be drawn
    assert {r["doc_id"] for r in got} == {0}
