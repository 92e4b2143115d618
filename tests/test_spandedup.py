"""Exact substring-span dedup (functions/spandedup.py): hand-computed
fixtures for window hashing, keep-first semantics, island merging, and
text rebuild."""

from dxa_pagerank_spark.functions.spandedup import (
    duplicate_spans,
    remove_duplicate_spans,
    substring_dedup_stats,
    token_window_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def _spans(df):
    return sorted(
        (r["id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    )


def test_window_hashes_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "")])
    win = token_window_hashes(df, width=3).collect()
    # doc 1: windows at pos 0 (a b c) and 1 (b c d); docs 2/3 too short
    assert sorted((r["id"], r["pos"]) for r in win) == [(1, 0), (1, 1)]
    h = {(r["id"], r["pos"]): r["h"] for r in win}
    assert h[(1, 0)] != h[(1, 1)]
    # same window text in another doc hashes identically
    win2 = token_window_hashes(
        _docs(spark, [(9, "x a b c")]), width=3
    ).collect()
    assert win2[-1]["h"] == h[(1, 0)] or win2[0]["h"] == h[(1, 0)]


def test_cross_doc_repeat_keeps_first_and_merges_island(spark):
    # 6-token run shared by docs 1 and 2; width 3 -> 4 matching windows
    # in doc 2, merging to one [2, 7] island; doc 1 (first occurrence
    # by min (id, pos)) is exempt
    shared = "p q r s t u"
    df = _docs(spark, [(1, f"{shared} zz"), (2, f"k m {shared}")])
    spans = _spans(duplicate_spans(df, width=3))
    assert spans == [(2, 2, 7, 6)]


def test_intra_doc_repeat_and_keep_first_false(spark):
    df = _docs(spark, [(1, "x y z a b x y z")])
    assert _spans(duplicate_spans(df, width=3)) == [(1, 5, 7, 3)]
    # audit form marks both occurrences
    assert _spans(duplicate_spans(df, width=3, keep_first=False)) == [
        (1, 0, 2, 3),
        (1, 5, 7, 3),
    ]


def test_adjacent_spans_merge_distant_spans_dont(spark):
    # doc 2 repeats doc 1's windows at positions 0-2 and 6-8 with a
    # unique 3-token gap between: two separate islands
    df = _docs(
        spark,
        [(1, "a b c d e f g h i j"), (2, "a b c d n1 n2 g h i j n3")],
    )
    spans = _spans(duplicate_spans(df, width=3))
    assert spans == [(2, 0, 3, 4), (2, 6, 9, 4)]


def test_min_count_three(spark):
    df = _docs(
        spark, [(1, "a b c d"), (2, "a b c e"), (3, "a b c f")]
    )
    # "a b c" occurs 3x: min_count=3 marks occurrences 2 and 3
    assert _spans(duplicate_spans(df, width=3, min_count=3)) == [
        (2, 0, 2, 3),
        (3, 0, 2, 3),
    ]
    # min_count=4: nothing qualifies
    assert _spans(duplicate_spans(df, width=3, min_count=4)) == []


def test_stats_zero_filled_and_fractions(spark):
    df = _docs(spark, [(1, "p q r s"), (2, "z p q r s"), (3, "u v w")])
    rows = {
        r["id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
        for r in substring_dedup_stats(df, width=3).collect()
    }
    assert rows[1] == (4, 0, 0, 0.0)  # first occurrence, exempt
    assert rows[2] == (5, 1, 4, 0.8)
    assert rows[3] == (3, 0, 0, 0.0)


def test_remove_rebuilds_text_in_order(spark):
    shared = "p q r s t u"
    df = _docs(spark, [(1, f"{shared} zz"), (2, f"k m {shared} w")])
    out = {r["id"]: r["text"] for r in remove_duplicate_spans(df, width=3).collect()}
    assert out[1] == f"{shared} zz"  # first occurrence untouched
    assert out[2] == "k m w"
    # a doc that is one big duplicate comes back empty, not missing
    df2 = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    out2 = {r["id"]: r["text"] for r in remove_duplicate_spans(df2, width=4).collect()}
    assert out2 == {1: "a b c d", 2: ""}


def test_no_cartesian_in_plan(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d f")])
    plan = duplicate_spans(df, width=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
