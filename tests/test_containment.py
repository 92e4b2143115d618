"""containment_pairs vs a pure-Python shingle replica."""

import re

import pytest

from dxa_pagerank_spark.functions.dedup import containment_pairs


def _shingle_set(text, n):
    ts = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    if len(ts) >= n:
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
    return {" ".join(ts)}


def _replica(docs, n, min_common, max_gram_df):
    sets = {d: _shingle_set(t, n) for d, t in docs}
    if max_gram_df is not None:
        from collections import Counter

        df = Counter(g for s in sets.values() for g in s)
        sets = {
            d: {g for g in s if df[g] <= max_gram_df}
            for d, s in sets.items()
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter >= min_common:
                sa, sb = len(sets[a]), len(sets[b])
                out[(a, b)] = (
                    inter,
                    sa,
                    sb,
                    round(inter / sa, 6),
                    round(inter / sb, 6),
                    round(inter / (sa + sb - inter), 6),
                )
    return out


def _check(spark, docs, n=3, min_common=3, max_gram_df=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"],
            r["sz_a"],
            r["sz_b"],
            r["containment_a"],
            r["containment_b"],
            r["jaccard"],
        )
        for r in containment_pairs(
            df, n=n, min_common=min_common, max_gram_df=max_gram_df
        ).collect()
    }
    want = _replica(docs, n, min_common, max_gram_df)
    assert set(got) == set(want)
    for k in want:
        for x, y in zip(got[k], want[k]):
            assert x == pytest.approx(y, abs=1e-6)
    return got


def test_containment_subset_detected(spark):
    # doc 1 is a verbatim passage of doc 0 padded with noise either
    # side in doc 0 -> containment of 1-in-0 is high while jaccard is
    # low (the case symmetric dedup misses)
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (0, "n1 n2 n3 n4 n5 " + passage + " m1 m2 m3 m4 m5 m6 m7 m8"),
        (1, passage),
    ]
    got = _check(spark, docs, n=3, min_common=3)
    (_, _, _, _, c_b, jac) = got[(0, 1)]
    assert c_b == 1.0  # every shingle of the passage is inside doc 0
    assert jac < 0.5


def test_containment_df_cap_drops_boilerplate(spark):
    # a gram shared by every doc is capped away, so docs sharing ONLY
    # the boilerplate produce no pair
    boiler = "copyright footer text"
    docs = [(i, f"unique{i} body{i} words{i} " + boiler) for i in range(6)]
    got = _check(spark, docs, n=3, min_common=1, max_gram_df=3)
    assert got == {}


def test_containment_random(spark):
    import random

    rng = random.Random(41)
    vocab = [f"v{i}" for i in range(20)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 25))))
        for i in range(15)
    ]
    _check(spark, docs, n=2, min_common=2)
    _check(spark, docs, n=2, min_common=2, max_gram_df=6)
