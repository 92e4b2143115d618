"""Mirror-site detection (host-level near-duplicate detection).
[north_rule extension — no reference code; Bharat-Broder WWW'99
("A technique for finding mirrored hosts") is the classic crawl-side
dedup ABOVE document granularity: mirrored hosts waste crawl budget
and double-count link-graph endorsements, so crawlers collapse them
before frontier scheduling and PageRank.]

Each site is summarized by the SET of its documents' content
fingerprints; two sites are mirror candidates when those sets overlap.
The fingerprint is the md5 of the first `prefix_tokens` whitespace
tokens — a prefix fingerprint catches near-identical pages that
diverge in boilerplate tails (the common mirror pattern) while staying
engine-portable (one md5 per doc, bit-identical in SQL).

Resemblance r(A, B) = |F_A ∩ F_B| / |F_A ∪ F_B| (Broder set
resemblance on the fingerprint sets).

100-TB shape: the signature table is one row per (site, distinct
fingerprint) — corpus-sized, never wider. Pair generation is an
inverted-index self-join keyed by fingerprint, and fingerprints shared
by more than `max_fp_sites` sites are dropped FIRST (template/
boilerplate prefixes — the same stop-feature cap as containment's
stop-shingles), so per-key fan-out is bounded by max_fp_sites² and a
boilerplate prefix can never go quadratic. Site sizes join broadcast
(the site table is |sites| rows, orders of magnitude below |docs|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def site_signatures(
    docs: DataFrame,
    block_size: int = 25,
    prefix_tokens: int = 8,
) -> DataFrame:
    """documents(doc_id, text) -> distinct (site, fp). Site identity
    on the synthetic fixture is the doc_id block (see sitegraph.py);
    on a real crawl pass a host column instead."""
    return (
        docs.select(
            (F.col("doc_id") / block_size).cast("long").alias("site"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(F.split(F.col("text"), " "), 1, prefix_tokens),
                )
            ).alias("fp"),
        )
        .distinct()
    )


def mirror_candidates(
    docs: DataFrame,
    block_size: int = 25,
    prefix_tokens: int = 8,
    min_overlap: int = 1,
    max_fp_sites: int = 16,
) -> DataFrame:
    """-> (site_a, site_b, n_common, size_a, size_b, resemblance):
    site pairs sharing >= min_overlap non-boilerplate fingerprints,
    with Broder set resemblance |∩| / |∪|."""
    sig = site_signatures(docs, block_size, prefix_tokens)
    sizes = sig.groupBy("site").agg(F.count(F.lit(1)).alias("size"))
    # stop-feature cap BEFORE the self-join: a fingerprint on more
    # than max_fp_sites sites is template boilerplate, not mirroring
    rare = sig.join(
        sig.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nsites"))
        .filter(F.col("nsites") <= max_fp_sites)
        .select("fp"),
        "fp",
        "left_semi",
    )
    a = rare.select("fp", F.col("site").alias("site_a"))
    b = rare.select("fp", F.col("site").alias("site_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("site_a") < F.col("site_b"))
        .groupBy("site_a", "site_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_overlap)
    )
    sa = F.broadcast(sizes.select(F.col("site").alias("site_a"), F.col("size").alias("size_a")))
    sb = F.broadcast(sizes.select(F.col("site").alias("site_b"), F.col("size").alias("size_b")))
    return (
        pairs.join(sa, "site_a")
        .join(sb, "site_b")
        .select(
            "site_a",
            "site_b",
            "n_common",
            "size_a",
            "size_b",
            (
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("resemblance"),
        )
    )
