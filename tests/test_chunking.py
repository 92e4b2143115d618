"""fixed_chunks vs a pure-Python replica + coverage/overlap laws."""

import random

import pytest

from dxa_pagerank_spark.functions.chunking import fixed_chunks


def _replica(docs, size, stride):
    out = {}
    for did, text in docs:
        ts = [t for t in text.split(" ") if t]
        if not ts:
            continue
        n = len(ts)
        n_chunks = 1 + -(-max(n - size, 0) // stride)
        for c in range(n_chunks):
            start = c * stride
            stop = min(start + size, n)
            out[(did, c)] = (
                start,
                stop - 1,
                stop - start,
                " ".join(ts[start:stop]),
            )
    return out


def _check(spark, docs, size, stride):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["chunk"]): (
            r["start"],
            r["end"],
            r["n_tokens"],
            r["chunk_text"],
        )
        for r in fixed_chunks(df, size=size, stride=stride).collect()
    }
    assert got == _replica(docs, size, stride)
    return got


def test_chunks_hand_cases(spark):
    docs = [
        (0, " ".join(f"t{i}" for i in range(10))),
        (1, "one two"),   # shorter than size -> one whole chunk
        (2, ""),          # empty -> nothing
    ]
    got = _check(spark, docs, size=4, stride=3)
    assert got[(1, 0)] == (0, 1, 2, "one two")
    assert (2, 0) not in got


def test_every_token_covered_with_exact_overlap(spark):
    ts = [f"w{i}" for i in range(50)]
    got = _check(spark, [(0, " ".join(ts))], size=16, stride=12)
    covered = set()
    prev_end = None
    for c in sorted(k[1] for k in got):
        s, e, n, _ = got[(0, c)]
        covered.update(range(s, e + 1))
        if prev_end is not None and e < 49:
            assert prev_end - s + 1 == 16 - 12  # exact overlap
        prev_end = e
    assert covered == set(range(50))


def test_chunks_random(spark):
    rng = random.Random(6)
    docs = [
        (i, " ".join(f"x{rng.randrange(9)}"
                     for _ in range(rng.randrange(0, 80))))
        for i in range(30)
    ]
    _check(spark, docs, size=20, stride=15)
    _check(spark, docs, size=20, stride=20)  # no overlap boundary case


def test_chunks_rejects_bad_stride(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fixed_chunks(df, size=8, stride=9)
