"""incremental_near_dups (cross-crawl LSH dedup) vs a pure-Python
exact cross-Jaccard replica.

The replica is the exact answer; the operator's LSH stage is
deterministic (xxhash64), and the fixture's near-dup pairs sit at
J >= 0.9 where the per-pair deterministic miss probability of the
(8 bands x 4 rows) scheme is < 1e-9 — so set equality is required,
not just recall-bounded overlap.
"""

import re

import pytest

from dxa_pagerank_spark.functions.dedup import (
    incremental_near_dups,
    minhash_band_index,
)


def _shingle_set(text, n=3):
    ts = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    if len(ts) >= n:
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
    return {" ".join(ts)}


def _cross_replica(prior, new, threshold=0.8, n=3):
    out = {}
    psets = {d: _shingle_set(t, n) for d, t in prior}
    nsets = {d: _shingle_set(t, n) for d, t in new}
    for nd, ns in nsets.items():
        for pd_, ps in psets.items():
            inter = len(ns & ps)
            if inter == 0:
                continue
            j = inter / (len(ns) + len(ps) - inter)
            if j >= threshold:
                out[(nd, pd_)] = round(j, 6)
    return out


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sleepy badgers watch from the mossy riverbank and count the "
    "silver fish drifting slowly past the old wooden bridge near "
    "the abandoned mill where swallows nest every single summer"
)
OTHER = (
    "completely different content about spark physical plans and "
    "shuffle partitions and adaptive query execution with skew join "
    "handling plus broadcast thresholds and whole stage codegen over "
    "columnar parquet scans feeding vectorized expression pipelines"
)


@pytest.fixture(scope="module")
def corpus():
    prior = [
        (1, BASE),
        (2, OTHER),
        (3, "tiny unrelated note"),
        (4, BASE + " with a small trailing edit"),
    ]
    new = [
        (101, BASE),  # exact dup of 1, near-dup of 4
        (102, OTHER + " appended tail"),  # near-dup of 2
        (103, "fresh page about entirely new topics nobody wrote before"),
    ]
    return prior, new


def _run(spark, prior, new, **kw):
    pdf = spark.createDataFrame(prior, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    got = incremental_near_dups(pdf, ndf, **kw)
    return {
        (r["new_id"], r["prior_id"]): r["jaccard"] for r in got.collect()
    }


def test_matches_exact_cross_replica(spark, corpus):
    prior, new = corpus
    got = _run(spark, prior, new)
    want = _cross_replica(prior, new)
    assert got == want
    # sanity: the fixture actually exercises matches
    assert (101, 1) in want and (102, 2) in want


def test_never_pairs_new_with_new_or_prior_with_prior(spark, corpus):
    prior, new = corpus
    got = _run(spark, prior, new)
    prior_ids = {d for d, _ in prior}
    new_ids = {d for d, _ in new}
    for nd, pd_ in got:
        assert nd in new_ids and pd_ in prior_ids


def test_prebuilt_index_path_identical(spark, corpus):
    prior, new = corpus
    pdf = spark.createDataFrame(prior, "doc_id long, text string")
    idx = minhash_band_index(pdf).localCheckpoint(eager=True)
    got_idx = _run(spark, prior, new, prior_index=idx)
    got_fresh = _run(spark, prior, new)
    assert got_idx == got_fresh


def test_mega_bucket_cap_drops_candidates(spark, corpus):
    prior, new = corpus
    assert _run(spark, prior, new, max_bucket=0) == {}


def test_plan_has_no_cartesian(spark, corpus):
    prior, new = corpus
    pdf = spark.createDataFrame(prior, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    plan = (
        incremental_near_dups(pdf, ndf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
