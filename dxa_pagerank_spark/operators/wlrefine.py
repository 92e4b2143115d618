"""Weisfeiler-Leman structural refinement over the directed link
graph (1-WL / color refinement: Weisfeiler & Leman 1968; the
graph-kernel form is Shervashidze et al., JMLR 2011).

Iteratively recolor every vertex by hashing (own color, sorted
multiset of out-neighbor colors, sorted multiset of in-neighbor
colors). After r rounds two vertices share a color only if their
r-hop neighborhood structure is identical — the structural
fingerprint that groups template-generated pages (nav hubs,
paginated archives, mirror layouts) regardless of ids, complementing
the CONTENT fingerprints in functions/mirrors.py. The reference has
no structural analysis (spec extension, SURVEY §2.2).

Determinism / portability: colors are md5 hex strings; each round's
input string is ``prev | 'O:' sorted-out-colors | 'I:' sorted-in-
colors`` with ','-joined lexicographically-sorted multisets — pure
string/array built-ins in both engines, so a SQL oracle replays every
round bit-for-bit. No floats anywhere.

Physical shape per round: two equi-joins of the (deduplicated) edge
table against the 16-byte-per-vertex color table and two
collect_list groupBys — the same gather shape as the PageRank loop,
shuffling vertex-sized state only; the md5 recolor is a pure
projection. Neighbor multisets are degree-sized: the same hub caps /
AQE skew handling as every other gather apply (a 10^7-degree hub's
collected array is the one skew hazard — cap upstream via
max_degree-style filters if the graph has such hubs and exactness of
hub colors is not required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wl_refinement(
    edges: DataFrame, rounds: int = 2, max_degree: int | None = None
) -> DataFrame:
    """-> (id, wl_label): md5-hex structural color after `rounds`
    refinement rounds over the distinct non-loop directed edge set.
    Round 0 colors by the (out_degree, in_degree) pair.

    max_degree (optional) is the skew guard for web-scale graphs: the
    refinement runs on the subgraph with vertices of TOTAL degree >
    max_degree removed entirely (hubs and their incident edges) —
    removal, not truncation, so the cap is a well-defined graph
    operation with exact semantics (truncating a hub's multiset would
    make its color depend on arbitrary neighbor order). Hub pages are
    precisely the ones whose templates the fingerprint does not need;
    the degree filter is one aggregate + semi-join before the loop."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError("max_degree must be >= 1")
        tot = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = tot.filter(F.col("d") <= max_degree).select("id")
        e = e.join(
            keep.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(
            keep.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
    out_deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("od")
    )
    in_deg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("idg")
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = (
        verts.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .select(
            "id",
            F.md5(
                F.concat_ws(
                    ".",
                    F.coalesce("od", F.lit(0)),
                    F.coalesce("idg", F.lit(0)),
                )
            ).alias("wl_label"),
        )
    )
    for _ in range(rounds):
        out_ms = (
            e.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("wl_label").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list("nl")), ","
                ).alias("os")
            )
            .withColumnRenamed("src", "id")
        )
        in_ms = (
            e.join(
                labels.select(
                    F.col("id").alias("src"), F.col("wl_label").alias("nl")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_list("nl")), ","
                ).alias("is_")
            )
            .withColumnRenamed("dst", "id")
        )
        labels = (
            labels.join(out_ms, "id", "left")
            .join(in_ms, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat(
                        F.col("wl_label"),
                        F.lit("|O:"),
                        F.coalesce("os", F.lit("")),
                        F.lit("|I:"),
                        F.coalesce("is_", F.lit("")),
                    )
                ).alias("wl_label"),
            )
        )
    return labels


def wl_class_sizes(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """-> (wl_label, n_vertices): the structural equivalence classes
    and their sizes — template-generated page families surface as
    large classes."""
    return (
        wl_refinement(edges, rounds=rounds)
        .groupBy("wl_label")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
