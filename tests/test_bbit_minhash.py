"""b-bit minwise hashing (functions/dedup.py bbit_*): low-bit
truncation law, bias correction vs the raw match fraction, and
pipeline equivalence with the full-width verify on a separating
corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.dedup import (
    bbit_estimate,
    bbit_minhash_dedup_pairs,
    bbit_signatures,
    minhash_dedup_pairs,
    minhash_signatures,
    shingles,
)


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    for i in range(8):
        rows.append((i, base + f"variant {i} " + "filler words " * 6))
    # near-dup of doc 0 (one token changed)
    rows.append((100, base + "variant 0 " + "filler words " * 6 + "x"))
    # unrelated doc
    rows.append((200, "completely different content about spark " * 8))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bbit_truncation_matches_low_bits(spark):
    docs = _corpus(spark)
    sigs = minhash_signatures(shingles(docs), num_hashes=16)
    full = {r["doc_id"]: r["sig"] for r in sigs.collect()}
    bs = {
        r["doc_id"]: r["bsig"]
        for r in bbit_signatures(sigs, b=4).collect()
    }
    for d, sig in full.items():
        assert bs[d] == [v % 16 for v in sig]


def test_bbit_correction_reduces_bias(spark):
    docs = _corpus(spark)
    sh = shingles(docs)
    sigs = minhash_signatures(sh, num_hashes=128)
    # all candidate pairs among the 8 base variants + the unrelated doc
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b],
        "doc_a long, doc_b long",
    )
    # true jaccard per pair from the shingle sets
    ex = sh.select("doc_id", "sh").collect()
    sets = {}
    for r in ex:
        sets.setdefault(r["doc_id"], set()).add(r["sh"])
    est = {
        (r["doc_a"], r["doc_b"]): (r["p_match"], r["r_est"])
        for r in bbit_estimate(
            bbit_signatures(sigs, b=2), pairs, b=2, num_hashes=128
        ).collect()
    }
    raw_err = corr_err = 0.0
    n = 0
    for (a, b), (p, rhat) in est.items():
        t = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        raw_err += abs(p - t)
        corr_err += abs(rhat - t)
        n += 1
    # at b=2 the chance-collision floor is 0.25: the raw match
    # fraction is badly biased upward, the corrected estimate is not
    assert corr_err / n < raw_err / n
    assert corr_err / n < 0.12


def test_bbit_pipeline_matches_full_verify(spark):
    docs = _corpus(spark)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(docs, threshold=0.8).collect()
    }
    bbit = {
        (r["doc_a"], r["doc_b"])
        for r in bbit_minhash_dedup_pairs(
            docs, b=4, screen=0.5, threshold=0.8
        ).collect()
    }
    assert bbit == full
    assert (0, 100) in full  # the planted near-dup survives


def test_bbit_guards(spark):
    docs = _corpus(spark)
    sigs = minhash_signatures(shingles(docs), num_hashes=8)
    with pytest.raises(ValueError):
        bbit_signatures(sigs, b=0)
    with pytest.raises(ValueError):
        bbit_estimate(sigs, None, b=40)


def test_bbit_screen_margin_on_driver_corpus(spark, sf0001_documents):
    """q_bbit_minhash_dedup's oracle equality is PROBABILISTIC: it
    holds because every true pair's r_est sits far above the 0.5
    screen (ADVICE r03). Pin that precondition: on the driver corpus
    (sf0.001 documents, same n/num_hashes/bands/b as the query) the
    minimum r_est over true pairs must clear the screen by >= 4 sigma
    of the b-bit match fraction, so a fixture change eroding the slack
    fails loudly HERE instead of as a driver hash-mismatch."""
    import math

    from dxa_pagerank_spark.functions.dedup import (
        jaccard_verify,
        lsh_candidate_edges_capped,
    )

    docs = spark.read.parquet(sf0001_documents)
    sh = shingles(docs, "doc_id", "text", 3).persist()
    sigs = minhash_signatures(sh, 32)
    cands = lsh_candidate_edges_capped(sigs, 8, 4, 64)
    true_pairs = jaccard_verify(sh, cands, 0.8).select("doc_a", "doc_b")
    est = bbit_estimate(bbit_signatures(sigs, 4), true_pairs, 4, 32)
    row = est.agg(
        F.min("r_est").alias("mn"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert row["n"] > 0  # corpus must actually contain near-dups
    screen, b, k = 0.5, 4, 32
    c = 2.0 ** -b
    # sigma of p_match at the screen boundary, mapped through the
    # bias correction: sqrt(p(1-p)/k) / (1-c) with p at the boundary
    p_at_screen = screen * (1 - c) + c
    sigma = math.sqrt(p_at_screen * (1 - p_at_screen) / k) / (1 - c)
    assert row["mn"] >= screen + 4 * sigma, (
        f"min r_est {row['mn']:.3f} within 4 sigma ({sigma:.3f}) of the "
        f"0.5 screen - q_bbit_minhash_dedup's oracle contract is at risk"
    )
