"""BPE training + application (functions/bpe.py) vs a pure-Python
list-greedy replica: merge order, tie-breaks, run-merging semantics,
and corpus token frequencies."""

import collections

from dxa_pagerank_spark.functions.bpe import (
    apply_bpe,
    bpe_token_frequencies,
    train_bpe,
)


def _py_train(texts, n_merges):
    words = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (x, y), n = best
        merges.append((x, y, n))
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):  # leftmost-greedy, same as replace-all
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _py_apply(word, merges):
    s = list(word)
    for x, y, *_ in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide low",
    "abab ababab aaaa",
]


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )


def test_training_matches_replica(spark):
    got = train_bpe(_docs(spark), n_merges=6)
    ref, _ = _py_train(TEXTS, 6)
    assert got == ref


def test_application_matches_replica_including_runs(spark):
    merges = train_bpe(_docs(spark), n_merges=6)
    toks = apply_bpe(_docs(spark), merges).collect()
    by_doc = collections.defaultdict(list)
    for r in toks:
        by_doc[r["id"]].append(r["token"])
    for i, t in enumerate(TEXTS):
        expect = [tok for w in t.split(" ") if w for tok in _py_apply(w, merges)]
        assert sorted(by_doc[i]) == sorted(expect), i


def test_run_merge_semantics_one_pass():
    # 'abab' with merge (a,b) must become [ab, ab] (shared-boundary
    # pairs both merge), 'aaaa' with (a,a) -> [aa, aa]
    assert _py_apply("abab", [("a", "b", 0)]) == ["ab", "ab"]
    assert _py_apply("aaaa", [("a", "a", 0)]) == ["aa", "aa"]


def test_spark_run_merge_matches(spark):
    df = spark.createDataFrame([(0, "abab aaaa aba")], "doc_id INT, text STRING")
    toks = [r["token"] for r in apply_bpe(df, [("a", "b"), ("a", "a")]).collect()]
    # abab -> [ab, ab]; aaaa -> [aa, aa]; aba -> [ab, a]
    assert sorted(toks) == sorted(["ab", "ab", "aa", "aa", "ab", "a"])


def test_token_frequencies_topk(spark):
    merges = train_bpe(_docs(spark), n_merges=4)
    rows = bpe_token_frequencies(_docs(spark), merges, top=5).collect()
    ref, _ = _py_train(TEXTS, 4)
    counts = collections.Counter()
    for t in TEXTS:
        for w in t.split(" "):
            if w:
                counts.update(_py_apply(w, ref))
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["n"]) for r in rows] == expect
