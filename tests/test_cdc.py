"""Content-defined chunking vs a pure-Python replica, plus the
re-alignment property CDC exists for."""

import hashlib
import random

import pytest

from dxa_pagerank_spark.functions.cdc import cdc_chunks, cdc_dedup_stats

HEX = "0123456789abcdef"


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _replica_chunks(docs, width, divisor):
    prefixes = set(HEX[: 16 // divisor])
    out = {}
    for did, text in docs:
        ts = [t for t in text.split(" ") if t]
        cuts = set()
        for q in range(len(ts) - width + 1):
            if _md5(" ".join(ts[q : q + width]))[0] in prefixes:
                cuts.add(q + width - 1)
        chunk, chunks = 0, {}
        for p, term in enumerate(ts):
            chunks.setdefault(chunk, []).append((p, term))
            if p in cuts:
                chunk += 1
        for c, items in chunks.items():
            poss = [p for p, _ in items]
            out[(did, c)] = (
                min(poss),
                max(poss),
                len(items),
                _md5(" ".join(t for _, t in items)),
            )
    return out


def _check_chunks(spark, docs, width=4, divisor=16):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["chunk"]): (
            r["start"],
            r["end"],
            r["n_tokens"],
            r["chunk_hash"],
        )
        for r in cdc_chunks(df, width=width, divisor=divisor).collect()
    }
    assert got == _replica_chunks(docs, width, divisor)
    return got


def test_cdc_hand_corpus(spark):
    docs = [
        (0, "a b c d e f g h i j k l m n o p"),
        (1, "short doc"),
        (2, ""),
    ]
    _check_chunks(spark, docs, width=2, divisor=2)


def test_cdc_random_corpus(spark):
    rng = random.Random(77)
    vocab = [f"t{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 60))))
        for i in range(25)
    ]
    _check_chunks(spark, docs, width=3, divisor=4)


def test_cdc_realignment_after_prefix_insertion(spark):
    # THE CDC property: prepending tokens shifts every fixed-size
    # chunk, but content-defined chunks re-align — the shared suffix
    # must produce identical chunk hashes in both docs (except near
    # the splice point).
    rng = random.Random(9)
    body = " ".join(f"w{rng.randrange(40)}" for _ in range(300))
    docs = [(0, body), (1, "inserted prefix tokens " + body)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = cdc_chunks(df, width=3, divisor=8).collect()
    hashes = {0: set(), 1: set()}
    for r in rows:
        hashes[r["id"]].add(r["chunk_hash"])
    shared = hashes[0] & hashes[1]
    # most of doc 0's chunks must re-appear verbatim in doc 1
    assert len(shared) >= 0.7 * len(hashes[0])


def test_cdc_dedup_stats(spark):
    docs = [
        (0, "x y z x y z x y z x y z"),
        (1, "x y z x y z x y z x y z"),  # exact dup of 0
        (2, "totally different tokens here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (
            r["n_tokens"],
            r["n_chunks"],
            r["dup_chunks"],
            r["dup_tokens"],
            r["dup_token_frac"],
        )
        for r in cdc_dedup_stats(df, width=2, divisor=4).collect()
    }
    # docs 0 and 1 are identical -> every chunk is shared
    assert got[0] == got[1]
    assert got[0][2] == got[0][1] and got[0][4] == 1.0
    assert got[2][2] == 0 and got[2][4] == 0.0


def test_cdc_bad_divisor_rejected(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=5)
