"""Naive Bayes language ID (functions/langnb.py): pure-Python replica
of training and classification, plus end-to-end accuracy on separable
synthetic languages."""

from __future__ import annotations

import math

import pytest

from dxa_pagerank_spark.functions.langnb import nb_classify, nb_train

DOCS = [
    (0, "en", "the cat and the dog and the bird"),
    (1, "en", "the dogs chase the cats there"),
    (2, "de", "der hund und die katze und der vogel"),
    (3, "de", "die hunde jagen die katzen dort"),
    (4, "en", "birds there chase the dog"),
    (5, "de", "ab"),  # too short for a trigram: prior-only
]


def _replica(docs):
    tri = lambda t: [t[i : i + 3] for i in range(len(t) - 2)]  # noqa: E731
    counts, totals, docs_l = {}, {}, {}
    for _, lab, text in docs:
        docs_l[lab] = docs_l.get(lab, 0) + 1
        for g in tri(text):
            counts[(lab, g)] = counts.get((lab, g), 0) + 1
            totals[lab] = totals.get(lab, 0) + 1
    vocab = {g for _, g in counts}
    v = len(vocab)
    n_docs = len(docs)
    out = {}
    for i, _, text in docs:
        best = None
        for lab in sorted(docs_l):
            s = math.log(docs_l[lab] / n_docs)
            for g in tri(text):
                c = counts.get((lab, g), 0)
                s += math.log((c + 1) / (totals[lab] + v))
            if best is None or s > best[0] + 0 or (
                s == best[0] and lab < best[1]
            ):
                if best is None or s > best[0]:
                    best = (s, lab)
        out[i] = best
    return out


def test_nb_matches_replica_and_separates(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, lang string, text string"
    )
    model, stats = nb_train(df)
    got = {
        r["id"]: (r["label_pred"], r["score"])
        for r in nb_classify(df, model, stats).collect()
    }
    exp = _replica(DOCS)
    for i, (s, lab) in exp.items():
        assert got[i][0] == lab, i
        assert got[i][1] == pytest.approx(s, abs=1e-9), i
    # training docs classify to their own language (separable corpora)
    for i, lab, _ in DOCS[:5]:
        assert got[i][0] == lab
    # the trigram-less doc falls back to the prior argmax (en and de
    # tie at 3 docs each -> smaller label 'de' wins)
    assert got[5][0] == "de"


def test_nb_unseen_gram_floor(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, lang string, text string"
    )
    model, stats = nb_train(df)
    probe = spark.createDataFrame(
        [(99, "zzz qqq xxx")], "doc_id long, text string"
    )
    rows = nb_classify(probe, model, stats).collect()
    # fully-unseen text still classifies (finite smoothed score)
    assert len(rows) == 1 and rows[0]["score"] < 0
