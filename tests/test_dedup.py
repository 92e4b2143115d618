"""Dedup operator tests vs brute-force oracles (planted duplicates)."""

import itertools
import random

import pandas as pd
from pyspark.sql import functions as F

from dxa_pagerank_spark.functions.dedup import (
    exact_dedup,
    exact_dup_stats,
    minhash_dedup_pairs,
    shingles,
    simhash_near_dup_pairs,
    simhash_signatures,
)


def _word_salad(rng: random.Random, n_words: int) -> str:
    vocab = [f"w{i}" for i in range(400)]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


def _corpus(spark):
    """60 base docs + exact dups + near dups (seeded, deterministic)."""
    rng = random.Random(1234)
    rows = []
    for i in range(60):
        rows.append((i, _word_salad(rng, 120)))
    # exact duplicates of docs 0..4
    for j in range(5):
        rows.append((100 + j, rows[j][1]))
    # near duplicates of docs 10..14: perturb 3 words out of 120
    for j in range(5):
        words = rows[10 + j][1].split()
        for k in (7, 50, 99):
            words[k] = "zz" + words[k]
        rows.append((200 + j, " ".join(words)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_exact_dedup(spark):
    docs = _corpus(spark)
    stats = exact_dup_stats(docs).collect()[0]
    assert stats["n_docs"] == 70
    assert stats["n_dup"] == 5
    kept = exact_dedup(docs)
    assert kept.count() == 65
    # min-id representative survives
    assert kept.filter(F.col("doc_id").isin([100, 101, 102, 103, 104])).count() == 0


def _brute_force_jaccard(spark, docs, threshold):
    sh = shingles(docs).toPandas()
    sets = {d: set(g["sh"]) for d, g in sh.groupby("doc_id")}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


def test_minhash_dedup_no_false_positives_and_planted_found(spark):
    docs = _corpus(spark)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(docs, threshold=0.8).collect()
    }
    truth = _brute_force_jaccard(spark, docs, 0.8)
    # verification step makes false positives impossible
    assert got <= truth
    # exact dups (jaccard 1.0) and 3-word perturbations (j ~ 0.9) are
    # near-certain LSH catches; corpus is seeded so this is deterministic
    for j in range(5):
        assert (j, 100 + j) in got
        assert (10 + j, 200 + j) in got
    # recall on this corpus is total
    assert got == truth


def _union_find_clusters(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_minhash_groups_match_exact_clusters(spark):
    """Star-collapsed candidates + verify + CC == union-find over the
    brute-force exact-Jaccard pair graph on the planted corpus."""
    from dxa_pagerank_spark.functions.dedup import minhash_dedup_groups

    docs = _corpus(spark)
    truth_pairs = _brute_force_jaccard(spark, docs, 0.8)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    truth = _union_find_clusters(ids, truth_pairs)
    got = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups(spark, docs, threshold=0.8).collect()
    }
    assert got == truth


def test_star_candidates_bound_identical_doc_megacluster(spark):
    """3k identical docs: the star-collapsed candidate set stays at
    n-1 edges (vs ~n^2/2 = 4.5M for the all-pairs bucket join) and the
    groups API assigns everyone to the min-id rep. This is the
    100-TB guard for boilerplate-heavy web corpora (VERDICT r01 #3)."""
    from dxa_pagerank_spark.functions.dedup import (
        lsh_candidate_edges_capped,
        minhash_signatures,
        simhash_dedup_groups,
    )

    n = 3000
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["common boilerplate page body text here"] * n,
            }
        )
    )
    sigs = minhash_signatures(shingles(docs), num_hashes=32)
    cands = lsh_candidate_edges_capped(sigs, bands=8, rows_per_band=4)
    assert cands.count() == n - 1  # one star edge per non-rep doc
    assert cands.agg(F.max("doc_a")).collect()[0][0] == 0  # rep = min id

    groups = simhash_dedup_groups(spark, docs, max_hamming=3)
    assert groups.filter(F.col("group_id") != 0).count() == 0


def test_simhash_block_join_equals_bruteforce(spark):
    docs = _corpus(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    # 4x16-bit block pigeonhole is exhaustive for hamming <= 3
    assert got == truth
    for j in range(5):
        assert (j, 100 + j) in got  # exact dups: hamming 0
