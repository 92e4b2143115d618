"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and exact n-gram Jaccard verification.

Everything is JVM-side DataFrame expressions — the signature
computations use xxhash64 (codegen'd) with per-row min/sum aggregates,
so there is no Python in the hot path and no per-doc shingle blowup
past the first groupBy (map-side partial aggregation).

Scale shape:
  * shingling: explode to (doc_id, shingle_hash) — the only |doc|*|len|
    intermediate; immediately aggregated.
  * MinHash: H=num_hashes min-aggregates in ONE groupBy pass
    (sig_i = min over shingles of xxhash64(shingle, i)).
  * LSH banding: b bands of r rows; band key = xxhash64(band values);
    self-join per band key finds candidates — only colliding docs meet.
  * verification: exact Jaccard via an inner join on shingle hashes,
    restricted to candidate pairs (semi-join pushdown).
  * SimHash: 64 sign-sums in one pass -> 64-bit signature; candidates
    via 16-bit block equality (Hamming<=3 guarantees a matching block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row frame: n_docs, n_unique, n_dup (md5 content hash)."""
    h = F.md5(F.col(text_col).cast("binary"))
    return documents.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_dup"),
    )


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per exact content hash."""
    with_h = documents.withColumn("_h", F.md5(F.col(text_col).cast("binary")))
    keep = with_h.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return with_h.join(keep, [id_col, "_h"], "left_semi").drop("_h")


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------

def shingles(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Word n-gram shingles -> distinct (doc_id, sh) 64-bit hashes.
    Tokenization: lowercase alphanumeric runs (JVM regexp)."""
    sc = documents.sparkSession.sparkContext
    if documents.rdd.getNumPartitions() < sc.defaultParallelism:
        # a small parquet scan arrives as 1-2 splits; the gram explode
        # below is the expensive step, so spread the (cheap, pre-blowup)
        # text rows across the cores first. At real scale the scan has
        # >= cores splits and this is a no-op.
        documents = documents.repartition(sc.defaultParallelism)
    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "), " +"
    )
    toks = F.filter(toks, lambda x: x != "")
    # materialize the token array as a column FIRST: referencing the
    # split/regexp expression inside the transform lambda would
    # re-evaluate the whole tokenizer once per gram (O(len^2) regex
    # work per doc, measured 6x on the minhash pipeline); a multiply-
    # referenced alias is not inlined by CollapseProject
    t = F.col("_toks")
    d = documents.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    # sliding word n-grams via transform over index range
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    grams = F.when(F.size(t) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", t))
    )
    return (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("sh"))
        .distinct()
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(doc_id, sh)* -> (doc_id, sig array<long>); sig_i = min
    xxhash64(sh, i) — one groupBy, H min-aggregates, map-side partials."""
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"s{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"s{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidates(
    sigs: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band key become candidate pairs
    (doc_a < doc_b, distinct)."""
    band_keys = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    keyed = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    sh: DataFrame, pairs: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs ->
    (doc_a, doc_b, jaccard) filtered to >= threshold."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _capped_bucket_edges(
    keyed: DataFrame, bucket_cols: list[str], star_threshold: int
) -> DataFrame:
    """Candidate edges from hash buckets with a hard quadratic-blowup
    cap: buckets with <= star_threshold members emit all pairs (full
    within-bucket recall); larger buckets collapse to a star on the
    bucket-min doc (one edge per member).

    This bounds candidate generation at O(rows x star_threshold) instead
    of O(|bucket|^2) — a single 1M-doc identical-boilerplate cluster
    (routine in web corpora) would emit 5*10^11 pairs from an uncapped
    bucket self-join, vs 1M star edges here. Star buckets preserve
    bucket connectivity exactly (every member joins the rep), so
    downstream verify+connected-components still recovers mega-clusters
    of true duplicates; the only recall loss vs all-pairs is a
    member-member pair inside a *mixed* mega-bucket whose rep matches
    neither — and a mega-bucket that isn't near-duplicates is exactly
    the hash-collision pathology the cap exists to contain.

    ``keyed`` must have a ``doc_id`` column plus ``bucket_cols``; extra
    columns are carried through on both sides as ``<col>_a``/``<col>_b``.
    """
    extra = [
        c for c in keyed.columns if c != "doc_id" and c not in bucket_cols
    ]
    stats = keyed.groupBy(*bucket_cols).agg(
        F.count(F.lit(1)).alias("_sz"), F.min("doc_id").alias("_rep")
    )
    # sized feeds FOUR downstream branches (small a/b, rep_side, large);
    # without materialization each branch recomputes the whole upstream
    # plan — for MinHash that is the 32-min-agg signature build, i.e.
    # a ~4x blow-up measured at sf0.1. One row per (doc, band): small.
    sized = keyed.join(stats, bucket_cols).localCheckpoint(eager=True)
    a = sized.select(
        *bucket_cols,
        F.col("_sz"),
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
    )
    b = sized.select(
        *bucket_cols,
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"{c}_b") for c in extra],
    )
    small = (
        a.filter(F.col("_sz") <= star_threshold)
        .join(b, bucket_cols)
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    rep_side = sized.filter(
        (F.col("_sz") > star_threshold) & (F.col("doc_id") == F.col("_rep"))
    ).select(
        *bucket_cols,
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
    )
    large = (
        sized.filter(
            (F.col("_sz") > star_threshold) & (F.col("doc_id") != F.col("_rep"))
        )
        .select(
            *bucket_cols,
            F.col("doc_id").alias("doc_b"),
            *[F.col(c).alias(f"{c}_b") for c in extra],
        )
        .join(rep_side, bucket_cols)
    )
    out_cols = (
        ["doc_a", "doc_b"]
        + [f"{c}_a" for c in extra]
        + [f"{c}_b" for c in extra]
    )
    return small.select(*out_cols).unionByName(large.select(*out_cols)).distinct()


def lsh_candidate_edges_capped(
    sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    star_threshold: int = 64,
) -> DataFrame:
    """LSH banding with the quadratic-bucket cap (_capped_bucket_edges):
    all pairs inside normal buckets, star edges inside mega-buckets."""
    band_keys = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    keyed = sigs.select("doc_id", F.posexplode(band_keys).alias("band", "key"))
    return _capped_bucket_edges(keyed, ["band", "key"], star_threshold)


def minhash_dedup_groups(
    spark,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    star_threshold: int = 64,
) -> DataFrame:
    """Scalable near-dup clustering -> (doc_id, group_id): capped LSH
    candidates (O(docs x bands x star_threshold), never O(bucket^2)),
    exact Jaccard verification of those edges only, then connected
    components over the verified-edge graph; group_id = min doc_id of
    the cluster.  Output is O(docs) rows — the right dedup API when
    clusters can be huge (the all-pairs output of minhash_dedup_pairs
    is itself quadratic in cluster size)."""
    from ..operators.components import connected_components

    sh = shingles(documents, id_col, text_col, n).persist()
    try:
        sigs = minhash_signatures(sh, num_hashes)
        cands = lsh_candidate_edges_capped(
            sigs, bands, num_hashes // bands, star_threshold
        )
        verified = jaccard_verify(sh, cands, threshold).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        return connected_components(
            spark,
            verified,
            vertices=documents.select(F.col(id_col).alias("id")),
        ).select(F.col("id").alias("doc_id"), F.col("component").alias("group_id"))
    finally:
        sh.unpersist()


def simhash_dedup_groups(
    spark,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    star_threshold: int = 64,
) -> DataFrame:
    """SimHash counterpart of minhash_dedup_groups: capped 16-bit-block
    buckets (all pairs in normal buckets, star edges in mega-buckets),
    exact popcount verification of candidate edges, connected
    components -> (doc_id, group_id). O(docs x 4 x star_threshold)
    candidates regardless of cluster size."""
    from ..operators.components import connected_components

    sigs = simhash_signatures(documents, id_col, text_col)
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * k)
                    .bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("blk", "blk_val"),
    )
    cands = _capped_bucket_edges(
        blocks.select("doc_id", "simhash", "blk", "blk_val"),
        ["blk", "blk_val"],
        star_threshold,
    )
    edges = (
        cands.select(
            F.col("doc_a").alias("src"),
            F.col("doc_b").alias("dst"),
            F.bit_count(
                F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("src", "dst")
        .distinct()
    )
    return connected_components(
        spark, edges, vertices=documents.select(F.col(id_col).alias("id"))
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("group_id"))


def minhash_dedup_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    star_threshold: int | None = 64,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified (doc_a, doc_b,
    jaccard) pairs at >= threshold.

    Candidates go through the capped bucket path by default
    (star_threshold members max per all-pairs bucket, star edges
    above), so a hash-collision mega-bucket can never go quadratic;
    below the cap the output is identical to the uncapped self-join.
    Pass star_threshold=None for the exact uncapped candidate set
    (oracle/debug use only — inherently O(bucket^2))."""
    sh = shingles(documents, id_col, text_col, n).persist()
    sigs = minhash_signatures(sh, num_hashes)
    if star_threshold is None:
        cands = lsh_candidates(sigs, bands, num_hashes // bands)
    else:
        cands = lsh_candidate_edges_capped(
            sigs, bands, num_hashes // bands, star_threshold
        )
    return jaccard_verify(sh, cands, threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

# FNV-1a 32-bit: h = ((h XOR byte) * PRIME) mod 2^32.  Two independent
# streams (standard offset basis / high word of the 64-bit basis) give
# the 64 signature bits.  Chosen over xxhash64 because the fold is
# expressible BOTH as Spark JVM expressions (products < 2^57: ANSI-safe
# long arithmetic, whole-stage codegen) and as a DuckDB list_reduce —
# so the full SimHash pipeline has an exact SQL oracle.
FNV32_PRIME = 16777619
FNV32_OFFSET_LO = 2166136261  # 0x811C9DC5, the FNV-1a 32-bit offset basis
FNV32_OFFSET_HI = 0xCBF29CE4  # high word of the 64-bit basis 0xCBF29CE484222325
_M32 = 1 << 32


def fnv1a32_col(tok, offset: int):
    """FNV-1a-32 of an ASCII token as a JVM expression (left fold over
    characters; tokens from the [a-z0-9] tokenizer are single-byte, so
    ascii(char) == utf-8 byte)."""
    chars = F.filter(F.split(tok, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(offset).cast("long"),
        lambda acc, c: F.pmod(
            acc.bitwiseXOR(F.ascii(c).cast("long")) * F.lit(FNV32_PRIME),
            F.lit(_M32),
        ),
    )


def simhash_signatures(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over unigram token hashes -> (doc_id, simhash).
    Bit j comes from bit (j%32) of the lo (j<32) / hi (j>=32) FNV-1a-32
    token hash stream."""
    toks = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "), " +"
    )
    toks = F.filter(toks, lambda x: x != "")
    th = (
        documents.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .select(
            "doc_id",
            fnv1a32_col(F.col("tok"), FNV32_OFFSET_LO).alias("h_lo"),
            fnv1a32_col(F.col("tok"), FNV32_OFFSET_HI).alias("h_hi"),
        )
    )
    sums = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(
                        F.col("h_hi" if j >= 32 else "h_lo"), j % 32
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_dup_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found via
    16-bit block collision (pigeonhole: <=3 bit flips leave >=1 of 4
    blocks intact) then exact popcount verification."""
    sigs = simhash_signatures(documents, id_col, text_col)
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * k)
                    .bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("blk", "blk_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return cands.select(
        "doc_a",
        "doc_b",
        F.bit_count(
            F.col("sig_a").bitwiseXOR(F.col("sig_b"))
        ).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    min_common: int = 3,
    max_gram_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Broder CONTAINMENT (asymmetric near-dup: c(A in B) =
    |S_A ∩ S_B| / |S_A|) for every doc pair sharing >= min_common
    shingles — catches quotation/subset relations (a small doc embedded
    in a big one) that symmetric Jaccard scores near 0 and minhash LSH
    therefore cannot recall. -> (doc_a, doc_b, inter, sz_a, sz_b,
    containment_a, containment_b, jaccard), doc_a < doc_b.

    Pairs come from the shingle inverted-index self-join. With
    max_gram_df set, shingles occurring in more than that many docs
    are dropped FIRST (the standard stop-shingle cap: per-gram join
    fan-out is bounded by max_gram_df^2, so one boilerplate gram can
    never go quadratic); sizes and intersections are then both over
    the capped sets — self-consistent semantics the SQL oracle mirrors
    with one HAVING. min_common bounds the pair set to docs with real
    overlap."""
    sh = shingles(documents, id_col, text_col, n)
    if max_gram_df is not None:
        keep = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_gram_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh", "left_semi")
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        sa.join(sb, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.col("inter") >= min_common)
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "sz_a",
            "sz_b",
            F.round(F.col("inter") / F.col("sz_a"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("inter") / F.col("sz_b"), 6).alias(
                "containment_b"
            ),
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Incremental (cross-crawl) near-dup detection
# --------------------------------------------------------------------------

def _band_key_array(bands: int, rows_per_band: int):
    """The LSH band-key column: array of b keys, key_b = xxhash64 of the
    band's r signature values (same construction as lsh_candidates /
    lsh_candidate_edges_capped)."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )


def minhash_band_index(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The persistent LSH index of a corpus: (doc_id, band, key).

    At production scale this table is STORED (bucketed by (band, key))
    and appended to per crawl — it is ~b rows of 20 bytes per document,
    so a 10^12-document corpus indexes in ~10^13 rows / ~200 TB-scale
    keys vs re-shingling petabytes of text per crawl.  incremental_
    near_dups accepts it prebuilt for exactly that reason."""
    sh = shingles(documents, id_col, text_col, n)
    sigs = minhash_signatures(sh, num_hashes)
    return sigs.select(
        "doc_id",
        F.posexplode(_band_key_array(bands, num_hashes // bands)).alias(
            "band", "key"
        ),
    )


def incremental_near_dups(
    prior_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int = 64,
    prior_index: DataFrame | None = None,
) -> DataFrame:
    """Which NEW documents near-duplicate a PRIOR corpus — the
    cross-crawl dedup shape: the prior corpus is touched only through
    its LSH band index, never re-paired against itself.

    -> (new_id, prior_id, jaccard) with exact shingle Jaccard >=
    threshold, one row per verified cross pair.

    Scale shape (the reason this exists next to minhash_dedup_pairs):
      * prior side enters as ``prior_index`` (doc_id, band, key) — the
        stored table from previous crawls (built here from text only
        when not supplied).  Prior TEXT is read *only* for candidate
        ids (left-semi join before shingling), so a crawl adding 0.1%
        new pages re-reads ~0.1% of the corpus, not all of it.
      * candidates = new-side band keys equi-joined against the index;
        buckets whose PRIOR population exceeds ``max_bucket`` are
        dropped before the join (the stop-bucket law shared with
        containment_pairs' max_gram_df and mirror detection's
        max_fp_sites): a million-member boilerplate bucket would fan
        every colliding new doc out a million ways.  Bucket population
        is a property of the stored index, so the filter is a pure
        groupBy on the index — no text involved.
      * verification = exact Jaccard (jaccard_verify) restricted to
        candidates; new docs never join each other here — intra-crawl
        dedup is minhash_dedup_groups' job.

    Recall: identical to one-shot LSH at the same (bands, rows) for
    every pair outside dropped mega-buckets."""
    rows_per_band = num_hashes // bands
    if prior_index is None:
        prior_index = minhash_band_index(
            prior_docs, id_col, text_col, n, num_hashes, bands
        )
    sh_new = shingles(new_docs, id_col, text_col, n).persist()
    try:
        sigs_new = minhash_signatures(sh_new, num_hashes)
        new_keyed = sigs_new.select(
            F.col("doc_id").alias("new_id"),
            F.posexplode(_band_key_array(bands, rows_per_band)).alias(
                "band", "key"
            ),
        )
        ok_buckets = (
            prior_index.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_bucket)
            .select("band", "key")
        )
        capped_index = prior_index.select(
            F.col("doc_id").alias("prior_id"), "band", "key"
        ).join(ok_buckets, ["band", "key"])
        cands = (
            new_keyed.join(capped_index, ["band", "key"])
            .select("new_id", "prior_id")
            .distinct()
        )
        # prior text is shingled ONLY for candidate ids
        cand_prior = prior_docs.join(
            cands.select(F.col("prior_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        sh_prior = shingles(cand_prior, id_col, text_col, n)
        pairs = cands.select(
            F.col("new_id").alias("doc_a"), F.col("prior_id").alias("doc_b")
        )
        verified = jaccard_verify(
            sh_new.unionByName(sh_prior), pairs, threshold
        )
        return verified.select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("prior_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    finally:
        sh_new.unpersist()


def elect_canonical(
    groups: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    weight_col: str = "w",
) -> DataFrame:
    """Canonical-document election per dup cluster -> (doc_id,
    group_id, canonical_id, is_canonical, group_size).

    After near-dup clustering (minhash_dedup_groups /
    simhash_dedup_groups) a corpus keeps ONE representative per
    cluster; which one matters — the standard rule is the
    highest-authority / most-complete member, not an arbitrary min-id.
    ``weights`` supplies that integer signal per doc (in-link count,
    n_chars, fetch freshness rank...); the winner is max weight with
    ties to the smaller id, so the election is exact integer
    comparison — no float ordering, every engine replays it. A doc
    with no weight row participates with weight 0 (left join +
    coalesce) — every group member appears in the output exactly once
    regardless of weight coverage.

    Physical shape at 100 TB: one doc-keyed equi-join to attach
    weights, then ONE map-side-combinable aggregation per group — the
    winner is max(struct(w, -id)), no window over the member table —
    and a group-keyed join back to members. Cluster size never appears
    squared anywhere.
    """
    j = (
        groups.select(
            F.col(id_col).alias("doc_id"), F.col(group_col).alias("group_id")
        )
        .join(
            weights.select(
                F.col(id_col).alias("doc_id"),
                F.col(weight_col).cast("long").alias("w"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", "group_id", F.coalesce("w", F.lit(0)).alias("w")
        )
    )
    winners = j.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.max(
            F.struct(F.col("w"), (-F.col("doc_id")).alias("nid"))
        ).alias("_win"),
    )
    winners = winners.select(
        "group_id",
        "group_size",
        (-F.col("_win.nid")).alias("canonical_id"),
    )
    return j.join(winners, "group_id").select(
        "doc_id",
        "group_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        "group_size",
    )


# --------------------------------------------------------------------------
# b-bit minwise hashing (Li & Konig, WWW 2010)


def bbit_signatures(sigs: DataFrame, b: int = 4) -> DataFrame:
    """(doc_id, sig array<long>) -> (doc_id, bsig array<int>): keep
    only the LOW b BITS of each minhash value — the Li-Konig storage
    form. A 32-hash signature shrinks from 256 bytes to 32*b bits
    (16 bytes at b=4): the index that fits in memory at 10^12 docs
    where full signatures cannot."""
    if not 1 <= b <= 32:
        raise ValueError("b must be in 1..32")
    m = 1 << b
    return sigs.select(
        "doc_id",
        F.transform(
            "sig", lambda x: F.pmod(x, F.lit(m)).cast("int")
        ).alias("bsig"),
    )


def bbit_estimate(
    bsigs: DataFrame,
    cands: DataFrame,
    b: int = 4,
    num_hashes: int = 32,
) -> DataFrame:
    """candidate (doc_a, doc_b) pairs -> (doc_a, doc_b, p_match,
    r_est): the bias-corrected b-bit resemblance estimate

        r_est = (p_match - c) / (1 - c),   c = 2^-b

    — matching low bits collide by chance at rate ~c even for
    unrelated sets, so the raw match fraction OVERestimates; the
    correction removes it (Li-Konig eq. 3 in the sparse-set regime
    r1, r2 -> 0, the web-shingle case; the exact C_1b needs set/domain
    ratios and converges to c there — documented simplification).

    One pair-keyed join per side then a zip_with/aggregate fold per
    pair — integer comparisons, two float divisions at output."""
    if not 1 <= b <= 32:
        raise ValueError("b must be in 1..32")
    c = 2.0 ** -b
    a_side = bsigs.select(
        F.col("doc_id").alias("doc_a"), F.col("bsig").alias("sa")
    )
    b_side = bsigs.select(
        F.col("doc_id").alias("doc_b"), F.col("bsig").alias("sb")
    )
    matches = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cands.join(a_side, "doc_a")
        .join(b_side, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches / F.lit(float(num_hashes))).alias("p_match"),
        )
        .select(
            "doc_a",
            "doc_b",
            "p_match",
            ((F.col("p_match") - F.lit(c)) / F.lit(1.0 - c)).alias(
                "r_est"
            ),
        )
    )


def bbit_minhash_dedup_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    b: int = 4,
    screen: float = 0.5,
    threshold: float = 0.8,
    star_threshold: int | None = 64,
) -> DataFrame:
    """The b-bit variant of minhash_dedup_pairs: capped LSH candidates
    are SCREENED by the compact b-bit estimate (r_est >= screen) before
    exact Jaccard verification at >= threshold. The screen touches only
    b-bit arrays (the in-memory index form); full shingle sets are read
    for survivors only. Output identical to the unscreened pipeline
    whenever the corpus separates cleanly around the screen (near-dups
    far above, non-dups far below — the web-dedup regime; the screen is
    recall-only there, and the exact verify keeps precision 1.0 by
    construction)."""
    sh = shingles(documents, id_col, text_col, n).persist()
    sigs = minhash_signatures(sh, num_hashes)
    if star_threshold is None:
        cands = lsh_candidates(sigs, bands, num_hashes // bands)
    else:
        cands = lsh_candidate_edges_capped(
            sigs, bands, num_hashes // bands, star_threshold
        )
    screened = bbit_estimate(
        bbit_signatures(sigs, b), cands, b, num_hashes
    ).filter(F.col("r_est") >= screen)
    return jaccard_verify(
        sh, screened.select("doc_a", "doc_b"), threshold
    )
