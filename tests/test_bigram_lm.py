"""bigram_logprob vs a pure-Python replica of the MLE bigram model."""

import math
import random
from collections import Counter

import pytest

from dxa_pagerank_spark.functions.lmscore import bigram_logprob


def _replica(docs):
    grams_per_doc = {}
    cbg = Counter()
    for did, text in docs:
        ts = [t for t in text.split(" ") if t]
        grams = [f"{ts[i]} {ts[i + 1]}" for i in range(len(ts) - 1)]
        grams_per_doc[did] = grams
        cbg.update(grams)
    cleft = Counter()
    for g, c in cbg.items():
        cleft[g.split(" ")[0]] += c
    out = {}
    for did, grams in grams_per_doc.items():
        if not grams:
            out[did] = (0, 0.0)
            continue
        per_gram = Counter(grams)
        nll = sum(
            tf * -math.log(cbg[g] / cleft[g.split(" ")[0]])
            for g, tf in per_gram.items()
        )
        out[did] = (len(grams), round(nll / len(grams), 6))
    return out


def _check(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["mean_neg_logprob"])
        for r in bigram_logprob(df).collect()
    }
    want = _replica(docs)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)


def test_bigram_hand_corpus(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "mat the on sat cat the"),  # same unigrams, scrambled order
        (3, "single"),
        (4, ""),
    ]
    _check(spark, docs)


def test_bigram_scrambled_scores_worse_than_natural(spark):
    # repeat a natural phrase so its bigrams are corpus-frequent; the
    # scrambled doc reuses the same tokens in rare orders and must get
    # a strictly higher (= less probable) conditional score
    docs = [(i, "the quick brown fox jumps") for i in range(5)]
    docs.append((10, "fox the jumps quick brown"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scores = {
        r["id"]: r["mean_neg_logprob"] for r in bigram_logprob(df).collect()
    }
    assert scores[10] > scores[0]


def test_bigram_random_corpus(spark):
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(25)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(40)
    ]
    _check(spark, docs)


def test_kneser_ney_matches_replica(spark):
    import math

    from dxa_pagerank_spark.functions.lmscore import kneser_ney_logprob

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "san francisco san francisco san francisco"),
        (3, "the francisco"),  # unusual context for a frequent token
        (4, "solo"),
        (5, ""),
    ]
    D = 0.75

    def replica():
        bgs = {}
        per_doc = {}
        for i, t in docs:
            ts = [x for x in t.split(" ") if x]
            pd = {}
            for a, b in zip(ts, ts[1:]):
                g = f"{a} {b}"
                pd[g] = pd.get(g, 0) + 1
            per_doc[i] = pd
            for g, c in pd.items():
                bgs[g] = bgs.get(g, 0) + c
        cleft, n1w1, n1r = {}, {}, {}
        for g, c in bgs.items():
            a, b = g.split(" ")
            cleft[a] = cleft.get(a, 0) + c
            n1w1[a] = n1w1.get(a, 0) + 1
            n1r[b] = n1r.get(b, 0) + 1
        tt = len(bgs)
        out = {}
        for i, pd in per_doc.items():
            n = sum(pd.values())
            nll = 0.0
            for g, tf in pd.items():
                a, b = g.split(" ")
                p = (bgs[g] - D) / cleft[a] + (D * n1w1[a] / cleft[a]) * (
                    n1r[b] / tt
                )
                nll += tf * -math.log(p)
            out[i] = (n, nll / n if n else 0.0)
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["mean_neg_logprob"])
        for r in kneser_ney_logprob(df).collect()
    }
    exp = replica()
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-9

    # the Kneser-Ney effect: "san francisco" repeats (MLE would make
    # it nearly free) but "francisco" follows only "san"/"the", so its
    # continuation mass stays small and doc 2 is NOT scored near 0
    assert got[2][1] > 0.05
