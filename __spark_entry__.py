"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship PageRank over sf0.001 lineitem-derived edges.
queries()     -> operator inventory from SURVEY.md §2 (+ training-data ops).
oracle_sql()  -> DuckDB-equivalent SQL per query (omitted only for
                 iterative fixpoints / hash-family-specific ops, which the
                 pytest suite pins against exact pure-Python oracles).

Column-name + rounding discipline: every computed column is aliased
identically in Spark and SQL; floating aggregates are rounded (6 dp for
ranks/ratios, 2-4 dp for money/sums) so engine-vs-DuckDB FP summation
order cannot flip the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

DAMPING = 0.85

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _parquet_num_rows(sf_dir: str, name: str) -> int | None:
    """Table row count from parquet footer metadata only — no data
    scan. Handles both a single file and a part-file directory.
    Returns None when the path isn't a plain local path pyarrow can
    open (e.g. a file:/hdfs:/s3a: URI only Spark resolves) — callers
    fall back to counting through Spark."""
    try:
        import pyarrow.dataset as ds

        return ds.dataset(f"{sf_dir}/{name}.parquet").count_rows()
    except Exception:
        return None


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical graph projection (FIXTURES.md F5): l_orderkey -> l_suppkey."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("src"),
        F.col("l_suppkey").cast("long").alias("dst"),
    )

_EDGES_SQL = "SELECT l_orderkey AS src, l_suppkey AS dst FROM lineitem"

# Cold connected components over _EDGES_SQL — shared by the cold and
# warm-start (incremental_components) oracles: warm-start semantics
# guarantee output identical to a cold run on the full edge set.
_CC_COLD_SQL = f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
    sym AS (SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM edges
        UNION ALL SELECT dst AS u, src AS v FROM edges) t WHERE u <> v),
    -- min-label reachability: a label l spreads from its vertex
    -- along any path whose every subsequent vertex is > l; the
    -- component minimum satisfies this on every path, so
    -- min(label) per id is exactly the component minimum.
    r(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.v AS id, r.label FROM r JOIN sym e ON e.u = r.id
        WHERE r.label < e.v
    )
    SELECT id, min(label) AS component FROM r GROUP BY id
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank on sf0.001, top-100 vertices."""
    from dxa_pagerank_spark.operators.pagerank import pagerank

    edges = _edges(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, edges, damping=DAMPING, threshold=1e-8, max_rounds=60)
    return (
        res.ranks.select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_out_degrees(spark, sf_dir):
    from dxa_pagerank_spark.operators.pagerank import out_degrees

    return out_degrees(_edges(spark, sf_dir))


def q_degree_distribution(spark, sf_dir):
    from dxa_pagerank_spark.operators.pagerank import out_degrees

    return (
        out_degrees(_edges(spark, sf_dir))
        .groupBy("out_deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def q_pagerank_2rounds(spark, sf_dir):
    from dxa_pagerank_spark.operators.pagerank import pagerank

    res = pagerank(
        spark, _edges(spark, sf_dir), damping=DAMPING, threshold=0.0, max_rounds=2
    )
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_resume_4rounds(spark, sf_dir):
    """Mid-iteration resume, driver-verified end-to-end: run 2 rounds
    with per-round durable checkpoints (plans/checkpoint.py), then a
    SECOND pagerank call resumes from the persisted state and finishes
    rounds 3-4. The oracle is the plain 4-round unroll — resume must be
    trajectory-invisible (FIXTURES.md F6). The checkpoint dir is wiped
    up front (not after: the resumed ranks' lineage reads it)."""
    import shutil
    import tempfile

    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.plans.checkpoint import CheckpointManager

    edges = _edges(spark, sf_dir)
    ckpt = os.path.join(
        tempfile.gettempdir(),
        f"dxa_driver_resume_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    cm = CheckpointManager(ckpt, run_id="driver_resume")
    partial = pagerank(
        spark, edges, damping=DAMPING, threshold=0.0, max_rounds=2,
        checkpoint_manager=cm, checkpoint_interval=2,
    )
    assert partial.rounds == 2
    cm2 = CheckpointManager(ckpt, run_id="driver_resume")
    res = pagerank(
        spark, edges, damping=DAMPING, threshold=0.0, max_rounds=4,
        checkpoint_manager=cm2, checkpoint_interval=2, resume=True,
    )
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_pagerank_converged(spark, sf_dir):
    from dxa_pagerank_spark.operators.pagerank import pagerank

    res = pagerank(
        spark, _edges(spark, sf_dir), damping=DAMPING, threshold=1e-10, max_rounds=100
    )
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_top20_pagerank(spark, sf_dir):
    return (
        q_pagerank_2rounds(spark, sf_dir)
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )


def q_pagerank_10rounds(spark, sf_dir):
    """Fixed 10-round trajectory (threshold=0) incl. restore pass —
    checked against a generated 10-round unrolled DuckDB oracle."""
    from dxa_pagerank_spark.operators.pagerank import pagerank

    res = pagerank(
        spark, _edges(spark, sf_dir), damping=DAMPING, threshold=0.0, max_rounds=10
    )
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_cc_one_round(spark, sf_dir):
    from dxa_pagerank_spark.operators.components import _symmetrize
    from dxa_pagerank_spark.operators.pagerank import vertex_universe

    edges = _edges(spark, sf_dir)
    verts = vertex_universe(spark, edges)
    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    nbr_min = sym.groupBy(F.col("v").alias("id")).agg(F.min("u").alias("m"))
    return (
        verts.join(nbr_min, "id", "left")
        .select(
            "id", F.least(F.col("id"), F.coalesce("m", F.col("id"))).alias("component")
        )
    )


def q_connected_components(spark, sf_dir):
    from dxa_pagerank_spark.operators.components import connected_components

    return connected_components(spark, _edges(spark, sf_dir))


def q_lpa_one_round(spark, sf_dir):
    from dxa_pagerank_spark.operators.components import _symmetrize
    from dxa_pagerank_spark.operators.pagerank import vertex_universe

    edges = _edges(spark, sf_dir)
    verts = vertex_universe(spark, edges)
    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    counts = sym.groupBy(
        F.col("v").alias("id"), (F.col("u") % 10).alias("label")
    ).agg(F.count(F.lit(1)).alias("c"))
    best = (
        counts.groupBy("id")
        .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("neg"))).alias("top"))
        .select("id", (-F.col("top.neg")).alias("new_label"))
    )
    return verts.join(best, "id", "left").select(
        "id", F.coalesce("new_label", F.col("id") % 10).alias("label")
    )


def q_label_propagation(spark, sf_dir):
    from dxa_pagerank_spark.operators.labelprop import label_propagation

    return label_propagation(spark, _edges(spark, sf_dir), max_rounds=10)


def q_triangle_count(spark, sf_dir):
    from dxa_pagerank_spark.operators.triangles import triangle_count_df

    return triangle_count_df(spark, _edges(spark, sf_dir))


def q_triangle_count_doulion(spark, sf_dir):
    """DOULION sparsified triangle count (operators/triangles.py):
    keep each undirected simple edge iff a deterministic Lehmer-style
    hash lands in 1-of-2 residues, exact-count the sample, scale by
    2^3. The oracle replays the identical hash in SQL, so the sampled
    subgraph — and therefore the estimate — matches bit-for-bit."""
    from dxa_pagerank_spark.operators.triangles import triangle_count_sampled

    return triangle_count_sampled(spark, _edges(spark, sf_dir), p_inv=2, seed=7)


def q_clustering_coeff(spark, sf_dir):
    from dxa_pagerank_spark.operators.triangles import clustering_coefficients

    return clustering_coefficients(spark, _edges(spark, sf_dir)).select(
        "id", F.round("clustering", 6).alias("clustering")
    )


def q_graph_summary(spark, sf_dir):
    """1-row structural summary of the edge table (all exact counts).

    Single Spark job: the reciprocal/undirected counts come from ONE
    groupBy over the normalized pair key (fwd/bwd presence flags), the
    scalar aggregates are crossJoined 1-row frames — no driver-side
    loop of .count() actions (VERDICT r01 "What's wrong" #3)."""
    e = _edges(spark, sf_dir)
    # per undirected pair: was the forward (src<dst) / backward direction
    # ever present?  n_und = #groups; a directed edge is "reciprocal"
    # when both flags are set -> 2 distinct directed edges per such pair.
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(
            F.max(F.when(F.col("src") < F.col("dst"), 1).otherwise(0)).alias("fwd"),
            F.max(F.when(F.col("src") > F.col("dst"), 1).otherwise(0)).alias("bwd"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_und_edges"),
            F.sum(
                F.when((F.col("fwd") == 1) & (F.col("bwd") == 1), 2).otherwise(0)
            ).alias("n_reciprocal"),
        )
    )
    edge_stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)).alias(
            "n_self_loops"
        ),
    )
    nv = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    return (
        nv.crossJoin(edge_stats)
        .crossJoin(und)
        .select(
            F.col("n_vertices").cast("long"),
            F.col("n_edges").cast("long"),
            F.col("n_und_edges").cast("long"),
            F.col("n_self_loops").cast("long"),
            F.col("n_reciprocal").cast("long"),
        )
    )


def q_tpch_q1ish(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_supplier_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_events_window_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_user_sessions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = ev.withColumn("prev_ts", F.lag("ts").over(w))
    is_start = F.when(
        F.col("prev_ts").isNull()
        | (
            F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800
        ),
        1,
    )
    return with_prev.groupBy("user_id").agg(
        F.count(is_start).alias("n_sessions")
    )


def q_session_spans(spark, sf_dir):
    """Gap-based sessionization, one row per session (streaming/
    sessions.py sessionize_batch — the exact batch spec the stateful
    applyInPandasWithState streaming operator is pinned to in
    tests/test_streaming_sessions.py)."""
    from dxa_pagerank_spark.streaming.sessions import sessionize_batch

    return sessionize_batch(_t(spark, sf_dir, "events"))


def q_term_topk(spark, sf_dir):
    """Corpus heavy hitters: top-50 terms by total occurrences with
    document frequency (functions/terms.py)."""
    from dxa_pagerank_spark.functions.terms import term_topk

    return term_topk(_t(spark, sf_dir, "documents"), k=50)


def q_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (functions/terms.py); ordering
    ties are impossible except at equal (tf, df), where both engines
    compute the identical double."""
    from dxa_pagerank_spark.functions.terms import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


def q_doc_stats(spark, sf_dir):
    from dxa_pagerank_spark.functions.textstats import doc_stats

    return doc_stats(_t(spark, sf_dir, "documents"))


def q_doc_quality(spark, sf_dir):
    from dxa_pagerank_spark.functions.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_dedup_exact_stats(spark, sf_dir):
    from dxa_pagerank_spark.functions.dedup import exact_dup_stats

    return exact_dup_stats(_t(spark, sf_dir, "documents"))


def q_substring_dup_spans(spark, sf_dir):
    """ExactSubstr-style repeated-span detection (Lee et al. 2022,
    functions/spandedup.py): maximal token spans whose every 3-token
    window repeats corpus-wide, globally-first occurrence exempt. The
    oracle replays the md5 window hashing, keep-first aggregate, and
    island merge in SQL."""
    from dxa_pagerank_spark.functions.spandedup import duplicate_spans

    return duplicate_spans(
        _t(spark, sf_dir, "documents"), width=3
    ).withColumnRenamed("id", "doc_id")


def q_substring_dedup_stats(spark, sf_dir):
    """Per-document duplicated-token budget from the span table above:
    how much of each document ExactSubstr removal would delete."""
    from dxa_pagerank_spark.functions.spandedup import substring_dedup_stats

    return substring_dedup_stats(
        _t(spark, sf_dir, "documents"), width=3
    ).withColumnRenamed("id", "doc_id")


def q_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (functions/retrieval.py) for three fixed
    2-term queries over the documents corpus; 2-term queries keep the
    per-doc score a two-operand double sum (order-exact), so the SQL
    oracle replays the identical float arithmetic."""
    from dxa_pagerank_spark.functions.retrieval import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        [(1, "hash join"), (2, "sort merge"), (3, "window agg")],
        k=10,
    )


def _emb_double(spark, sf_dir):
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (functions/clustering.py pq_train/
    pq_encode/pq_topk — Jégou et al. TPAMI'11): m=4 subspaces, k=8
    codes each, deterministic-Lloyd codebooks; ADC top-10 for the
    first 5 vectors as queries. The oracle replays each subspace's
    Lloyd chain and the subspace-ordered ADC sum."""
    from dxa_pagerank_spark.functions.clustering import pq_topk, pq_train

    emb = _emb_double(spark, sf_dir)
    books = pq_train(emb, m=4, k=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(emb, queries, books, k=10)


def q_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss sketch of the embedding table
    (functions/projection.py, Achlioptas ±1 form): 64 -> 8 dims with
    the arithmetic sign hash, exploded to (vec_id, dim, value). The
    oracle replays the sign law and the ascending-index fold."""
    from dxa_pagerank_spark.functions.projection import jl_project

    return jl_project(
        _emb_double(spark, sf_dir), out_dim=8, seed=7
    ).withColumnRenamed("id", "vec_id")


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (functions/bpe.py): 8 merges learned
    from the documents corpus (count desc, lexicographic ties). The
    oracle unrolls all 8 rounds — pair counting over the evolving
    symbolization, scalar argmax, marker-aligned replace — in SQL."""
    from dxa_pagerank_spark.functions.bpe import train_bpe

    merges = train_bpe(_t(spark, sf_dir, "documents"), n_merges=8)
    return spark.createDataFrame(
        [(i + 1, x, y, n) for i, (x, y, n) in enumerate(merges)],
        "merge_rank INT, x STRING, y STRING, pair_count LONG",
    )


def q_bpe_token_counts(spark, sf_dir):
    """BPE APPLICATION: corpus token frequencies under the 8 learned
    merges (pure projection: a chain of literal replaces + one explode),
    top 30 by (count desc, token asc)."""
    from dxa_pagerank_spark.functions.bpe import (
        bpe_token_frequencies,
        train_bpe,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=8)
    return bpe_token_frequencies(docs, merges, top=30)


def q_kmeans_clusters(spark, sf_dir):
    """Lloyd k-means over the embeddings (functions/clustering.py):
    deterministic arithmetic init, 2 fixed iterations, min-index ties,
    empty-cluster carry — the SQL oracle replays training + assignment
    end to end (integer output: no float rounding in the compare)."""
    from dxa_pagerank_spark.functions.clustering import kmeans_assign

    assigned, _ = kmeans_assign(_emb_double(spark, sf_dir), k=8, iters=2)
    return assigned.withColumnRenamed("id", "vec_id")


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) pruning decisions: k-means
    clusters, then within-cluster cosine >= 0.35 against any smaller id
    marks a semantic duplicate (keep-min-id)."""
    from dxa_pagerank_spark.functions.clustering import semdedup

    return semdedup(
        _emb_double(spark, sf_dir), k=8, iters=2, threshold=0.35,
        max_cluster=10_000,  # fail loudly on a mega-cluster instead of
        # running a silently-quadratic self-join (SCALE.md rule #4);
        # the guard is an extra count, the pairs below it are identical
    ).withColumnRenamed("id", "vec_id")


def q_ann_topk(spark, sf_dir):
    from dxa_pagerank_spark.functions.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10)


def q_ann_topk_lsh(spark, sf_dir):
    from dxa_pagerank_spark.functions.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, dim=64)


def q_minhash_dedup(spark, sf_dir):
    """Verified near-dup pairs; candidates run through the capped
    bucket path (star_threshold=64), so no uncapped bucket self-join is
    reachable — identical output below the cap, hence the exact
    all-pairs SQL oracle still matches."""
    from dxa_pagerank_spark.functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, star_threshold=64
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_bbit_minhash_dedup(spark, sf_dir):
    """b-bit minwise near-dup pipeline (functions/dedup.py, Li-Konig
    WWW'10): capped LSH candidates screened by the bias-corrected
    4-bit resemblance estimate (16-byte signatures — the index form
    that fits memory at 10^12 docs) before exact Jaccard verification.
    On this corpus true pairs sit at J >= 0.95 and the screen at 0.5
    (expected r_est ~ J, ~4+ sigma of slack over 32 hashes), so the
    screen is recall-only and the output equals the exact all-pairs
    oracle — the same verified-output contract as minhash_dedup."""
    from dxa_pagerank_spark.functions.dedup import (
        bbit_minhash_dedup_pairs,
    )

    return bbit_minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"),
        b=4,
        screen=0.5,
        threshold=0.8,
        star_threshold=64,
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_incremental_near_dup(spark, sf_dir):
    """Cross-crawl dedup: docs with doc_id % 4 == 0 arrive as the NEW
    crawl and are checked against the LSH band index of the PRIOR
    corpus (the other 3/4).  Prior text is shingled only for candidate
    ids; buckets over 64 prior members are dropped (none here).  The
    oracle is the exact cross-side Jaccard — LSH recall is 1.0 on this
    corpus (all cross pairs sit at J >= 0.95, deterministic per-pair
    miss probability < 1e-9)."""
    from dxa_pagerank_spark.functions.dedup import incremental_near_dups

    docs = _t(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    return incremental_near_dups(prior, new, threshold=0.8, max_bucket=64)


def q_simhash_near_dup(spark, sf_dir):
    from dxa_pagerank_spark.functions.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_minhash_dedup_groups(spark, sf_dir):
    """The O(docs x bands) dedup-cluster path (star-collapsed buckets +
    verify + connected components) — the scalable alternative to the
    inherently-quadratic pairs output."""
    from dxa_pagerank_spark.functions.dedup import minhash_dedup_groups

    return minhash_dedup_groups(
        spark, _t(spark, sf_dir, "documents"), threshold=0.8
    )


def q_simhash_dedup_groups(spark, sf_dir):
    from dxa_pagerank_spark.functions.dedup import simhash_dedup_groups

    return simhash_dedup_groups(spark, _t(spark, sf_dir, "documents"), max_hamming=3)


def q_dedup_canonical(spark, sf_dir):
    """Canonical-document election per near-dup cluster
    (functions/dedup.py elect_canonical): minhash_dedup_groups
    clusters weighted by n_chars (most-complete member wins, ties to
    the smaller id — all-integer comparisons). The oracle composes the
    groups replay with the same argmax rules."""
    from dxa_pagerank_spark.functions.dedup import (
        elect_canonical,
        minhash_dedup_groups,
    )

    docs = _t(spark, sf_dir, "documents")
    groups = minhash_dedup_groups(spark, docs, threshold=0.8)
    return elect_canonical(
        groups, docs.select("doc_id", "n_chars"), weight_col="n_chars"
    )


def q_lang_id(spark, sf_dir):
    from dxa_pagerank_spark.functions.textstats import with_lang_id

    return with_lang_id(_t(spark, sf_dir, "documents")).select("doc_id", "lang_pred")


def q_doc_fingerprint(spark, sf_dir):
    from dxa_pagerank_spark.functions.textstats import with_fingerprint

    return with_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace runs + a BPE-ish piece regex
    (letter runs | digit runs | single punctuation)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).cast("long").alias("n_bpe_pieces"),
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard for consecutive doc_id pairs (the
    exact-verification kernel of the near-dup stack, oracle-checkable)."""
    from dxa_pagerank_spark.functions.dedup import shingles

    s = shingles(_t(spark, sf_dir, "documents"), n=3)
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sizes.alias("x")
        .join(sizes.alias("y"), F.col("y.doc_id") == F.col("x.doc_id") + 1)
        .select(
            F.col("x.doc_id").alias("id1"),
            F.col("y.doc_id").alias("id2"),
            F.col("x.sz").alias("sz1"),
            F.col("y.sz").alias("sz2"),
        )
    )
    inter = (
        s.alias("a")
        .join(
            s.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("a.sh") == F.col("b.sh")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return pairs.join(inter, "id1", "left").select(
        "id1",
        "id2",
        F.round(
            F.coalesce(F.col("i"), F.lit(0)).cast("double")
            / (F.col("sz1") + F.col("sz2") - F.coalesce(F.col("i"), F.lit(0))),
            6,
        ).alias("jaccard"),
    )


def _media_from_docs(spark, sf_dir):
    """Deterministic media table derived from documents: payload =
    utf-8 text bytes, kind by doc_id % 3, synthetic duration."""
    d = _t(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(
            F.col("doc_id") % 3 != 0,
            (F.lit(2500) + F.lit(997) * F.col("doc_id")).cast("long"),
        ).alias("duration_ms"),
    )


def q_image_decode_stats(spark, sf_dir):
    """REAL image decode end-to-end (no codec libs): deterministic PPM
    payloads from the arithmetic pixel rule pixel(x,y,c) = (7x + 13y +
    31*media_id + 5c) mod 256 are genuinely encoded to P6 bytes and
    decoded back by the pure-NumPy decoder; the oracle computes the
    per-channel means from the rule in closed form, never touching
    bytes (functions/multimodal.py)."""
    from dxa_pagerank_spark.functions.multimodal import (
        image_pixel_stats,
        make_synthetic_images,
    )

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(F.col("doc_id").cast("long").alias("media_id"))
    )
    return image_pixel_stats(make_synthetic_images(ids, width=8, height=6))


def q_audio_decode_stats(spark, sf_dir):
    """REAL audio decode end-to-end (no codec libs): deterministic mono
    PCM WAV payloads — sample(t) = ((3t + 11*media_id) mod 256 - 128) *
    256 — genuinely encoded as RIFF bytes and decoded back by the
    pure-NumPy WAV parser; the oracle computes mean amplitude and RMS
    from the rule in closed form (functions/multimodal.py)."""
    from dxa_pagerank_spark.functions.multimodal import (
        audio_stats,
        make_synthetic_audio,
    )

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select(F.col("doc_id").cast("long").alias("media_id"))
    )
    return audio_stats(make_synthetic_audio(ids, n_samples=480, rate=8000))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: image payloads -> (n_bytes, feature dim)
    through the Arrow-batched (stub-decoder) kernel."""
    from dxa_pagerank_spark.functions.multimodal import image_features

    feats = image_features(_media_from_docs(spark, sf_dir), fake=True)
    return feats.select(
        "media_id", "n_bytes", F.size("feature").cast("int").alias("feature_dim")
    )


def q_frame_samples(spark, sf_dir):
    """Multimodal plumbing: video frame sampling via mapInPandas —
    one row per sampled frame at 1 fps."""
    from dxa_pagerank_spark.functions.multimodal import sample_video_frames

    frames = sample_video_frames(
        _media_from_docs(spark, sf_dir), every_ms=1000, fake=True
    )
    return frames.select("media_id", "frame_idx")


def q_embedding_near_dup(spark, sf_dir):
    from dxa_pagerank_spark.functions.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return embedding_near_dup_pairs(emb, threshold=0.9, dim=64)


def q_hits_5rounds(spark, sf_dir):
    """Kleinberg HITS, 5 L1-normalized rounds (operators/hits.py);
    unrolled DuckDB oracle."""
    from dxa_pagerank_spark.operators.hits import hits

    return hits(spark, _edges(spark, sf_dir), rounds=5).select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def q_site_betweenness(spark, sf_dir):
    """Pivot-sampled Brandes betweenness (operators/betweenness.py)
    over the site graph, pivots = the 4 highest-out-degree sites
    (distinct successors, ties min id) — the same rule derives the
    pivots in the SQL oracle, which unrolls the forward BFS/sigma pass
    and the backward dependency sweep level by level (measured site-
    graph BFS depth at sf0.01 is 3; the oracle unrolls 6)."""
    from dxa_pagerank_spark.operators.betweenness import betweenness
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    e = sites.select("src", "dst").distinct()
    pivots = [
        r["src"]
        for r in e.groupBy("src")
        .agg(F.countDistinct("dst").alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("src").asc())
        .limit(4)
        .collect()
    ]
    return betweenness(spark, e, pivots, max_depth=8).select(
        "id", F.round("betweenness", 6).alias("betweenness")
    )


def q_site_sssp(spark, sf_dir):
    """Multi-source weighted shortest paths (operators/sssp.py) on the
    site graph, edge cost = 1 / link multiplicity (strong links are
    cheap), sources = the betweenness pivots (same 4-highest-out-degree
    rule). Oracle unrolls the Bellman-Ford relaxation 20 rounds (>= the
    longest simple path in the 20-site graph; extra rounds are
    idempotent at the fixpoint)."""
    from dxa_pagerank_spark.operators.sitegraph import site_rollup
    from dxa_pagerank_spark.operators.sssp import shortest_paths

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    dedup = sites.select("src", "dst").distinct()
    pivots = [
        r["src"]
        for r in dedup.groupBy("src")
        .agg(F.countDistinct("dst").alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("src").asc())
        .limit(4)
        .collect()
    ]
    weighted = sites.select(
        "src", "dst", (F.lit(1.0) / F.col("weight")).alias("cost")
    )
    return shortest_paths(
        spark, weighted, pivots, weight_col="cost"
    ).select("s", "id", F.round("dist", 6).alias("dist"))


def q_web_salsa(spark, sf_dir):
    """SALSA (Lempel & Moran, operators/salsa.py) over the synthetic web
    edge multiset, 4 L1-normalized rounds; unrolled DuckDB oracle with
    the degree-split gathers."""
    from dxa_pagerank_spark.operators.salsa import salsa

    return salsa(spark, _web_edges(spark, sf_dir), rounds=4).select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def q_k_core_3(spark, sf_dir):
    """3-core of the undirected simple graph (operators/kcore.py). The
    engine peels to a fixpoint; the oracle unrolls peel rounds with
    slack (idempotent once converged)."""
    from dxa_pagerank_spark.operators.kcore import k_core

    return k_core(spark, _edges(spark, sf_dir), k=3)


def q_k_truss_4(spark, sf_dir):
    """4-truss of the undirected simple graph (operators/ktruss.py):
    the surviving edges where each closes >= 2 triangles of the
    surviving subgraph. Engine peels to a fixpoint; the oracle unrolls
    peel rounds with slack (the peel map is idempotent at the
    fixpoint, same trick as the k_core_3 oracle). Measured peeling
    depth at sf0.01 is 6; the oracle unrolls 12."""
    from dxa_pagerank_spark.operators.ktruss import k_truss

    return k_truss(spark, _edges(spark, sf_dir), k=4)


def q_ppr_5rounds(spark, sf_dir):
    """Personalized PageRank, 5 rounds, teleport to the 3 highest-out-
    degree vertices (ties by min id) — seeds derived by the same rule
    in the SQL oracle."""
    from dxa_pagerank_spark.operators.pagerank import out_degrees
    from dxa_pagerank_spark.operators.ppr import personalized_pagerank

    e = _edges(spark, sf_dir)
    seeds = [
        r["id"]
        for r in out_degrees(e)
        .orderBy(F.desc("out_deg"), F.asc("id"))
        .limit(3)
        .collect()
    ]
    return personalized_pagerank(spark, e, seeds, rounds=5).select(
        "id", F.round("rank", 6).alias("rank")
    )


def q_fiedler_bisection(spark, sf_dir):
    """Spectral bisection of the page link graph: the Fiedler vector
    after 8 shifted/deflated power-iteration rounds
    (operators/spectral.py) — sign gives the balanced 2-cut, the
    global counterpart of local_community's sweep. The oracle unrolls
    the identical trajectory (Knuth-hash start, mean deflation, IEEE
    sqrt renormalization)."""
    from dxa_pagerank_spark.operators.spectral import fiedler_vector

    return fiedler_vector(spark, _web_edges(spark, sf_dir), rounds=8).select(
        "id", F.round("fiedler", 6).alias("fiedler")
    )


def q_click_attribution(spark, sf_dir):
    """Last-touch click attribution (streaming/attribution.py): every
    click joined to its most recent same-user view within 30 minutes
    (interval equi-join + max-struct argmax; ties to the larger view
    id), NULLs when unattributed. The streaming form of the same join
    is the watermarked stream-stream interval join — parity pinned in
    tests/test_attribution.py; this batch row is the oracle-checkable
    face. lag_seconds uses whole-second truncation per timestamp."""
    from dxa_pagerank_spark.streaming.attribution import attributed_clicks

    ev = _t(spark, sf_dir, "events")
    att = attributed_clicks(ev, lookback_minutes=30)
    # timestamps leave the contract surface as exact epoch micros
    # (driver convention: no raw timestamp columns in compare frames)
    return att.select(
        "click_id",
        "user_id",
        F.unix_micros(F.col("click_ts").cast("timestamp")).alias(
            "click_us"
        ),
        "view_id",
        F.unix_micros(F.col("view_ts").cast("timestamp")).alias("view_us"),
        "lag_seconds",
    )


def q_hitting_times(spark, sf_dir):
    """Truncated mean hitting time to the top-3 out-degree pages
    under the uniform surfer (operators/hitting.py, 10 value-
    iteration rounds) — the first-passage "surf distance back to
    trust" signal beside web_spam_mass. The oracle unrolls the
    identical trajectory including the dangling self-hold."""
    from dxa_pagerank_spark.operators.hitting import hitting_times
    from dxa_pagerank_spark.operators.pagerank import out_degrees

    e = _web_edges(spark, sf_dir)
    targets = [
        r["id"]
        for r in out_degrees(e)
        .orderBy(F.desc("out_deg"), F.asc("id"))
        .limit(3)
        .collect()
    ]
    return hitting_times(spark, e, targets, rounds=10).select(
        "id", F.round("hit_time", 6).alias("hit_time")
    )


def q_lang_link_matrix(spark, sf_dir):
    """Language-to-language mixing matrix of the page link graph
    (operators/graphstats.py attribute_mixing_matrix — Newman PRE
    2003): who links to whom across languages, exact counts + share.
    The oracle regenerates the edge multiset and replays both joins
    and the share division."""
    from dxa_pagerank_spark.operators.graphstats import (
        attribute_mixing_matrix,
    )

    labels = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("lang").alias("label")
    )
    return attribute_mixing_matrix(
        _web_edges(spark, sf_dir), labels
    ).select(
        "label_src",
        "label_dst",
        "n_links",
        F.round("share", 6).alias("share"),
    )


def q_lang_assortativity(spark, sf_dir):
    """Newman categorical assortativity of language over page links
    (operators/graphstats.py attribute_assortativity): one row,
    r = (tr(e) - sum a_i b_i) / (1 - sum a_i b_i) — integer sums on
    the label domain, two divisions at output, term-for-term in
    SQL."""
    from dxa_pagerank_spark.operators.graphstats import (
        attribute_assortativity,
    )

    labels = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("lang").alias("label")
    )
    return attribute_assortativity(
        _web_edges(spark, sf_dir), labels
    ).select("n_links", F.round("r", 6).alias("r"))


def q_hrw_shards(spark, sf_dir):
    """Rendezvous (highest-random-weight) shard assignment
    (operators/partitioning.py rendezvous_assign, Thaler-Ravishankar):
    per-doc winner at 8 and at 10 shards plus the moved flag — the
    consistent-placement law (expected movement k/(n+k), old-to-old
    churn structurally zero). Integer square-then-LCG weights; the
    oracle replays every (key, shard) weight and both argmaxes."""
    from dxa_pagerank_spark.operators.partitioning import (
        rendezvous_assign,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return docs.select(
        "doc_id",
        rendezvous_assign(F.col("doc_id"), 8).alias("shard8"),
        rendezvous_assign(F.col("doc_id"), 10).alias("shard10"),
        (
            rendezvous_assign(F.col("doc_id"), 8)
            != rendezvous_assign(F.col("doc_id"), 10)
        )
        .cast("long")
        .alias("moved"),
    )


def q_site_lang_entropy(spark, sf_dir):
    """Per-site language purity under the synthetic site law (block
    25): language histogram entropy H = -sum share*ln(share) plus the
    majority language and its share — the content-coherence signal
    next to mirror detection (a spam/scraper site mixes languages; a
    real site doesn't). Exact integer counts; entropy and share are
    the only float math, replayed term-for-term."""
    docs = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") / 25).cast("long").alias("site"), "lang"
    )
    counts = docs.groupBy("site", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("site").agg(F.sum("c").alias("n_docs"))
    j = counts.join(totals, "site").select(
        "site",
        "n_docs",
        "lang",
        "c",
        (F.col("c") / F.col("n_docs")).alias("share"),
    )
    ent = j.groupBy("site", "n_docs").agg(
        F.sum(-F.col("share") * F.log("share")).alias("entropy"),
        F.max(F.struct(F.col("c"), F.col("lang"))).alias("top"),
    )
    return ent.select(
        "site",
        "n_docs",
        F.round("entropy", 6).alias("entropy"),
        F.col("top.lang").alias("majority_lang"),
        F.round(F.col("top.c") / F.col("n_docs"), 6).alias(
            "majority_share"
        ),
    )


def q_seeded_labels(spark, sf_dir):
    """Semi-supervised label spreading over the page graph
    (operators/labelprop.py seeded_label_propagation — hard-clamped
    Zhu-Ghahramani majority variant): every 50th page seeded with
    class (doc_id // 50) %% 5, 6 synchronous rounds, unreached pages
    NULL. The oracle unrolls the identical clamp/majority/tie
    trajectory."""
    from dxa_pagerank_spark.operators.labelprop import (
        seeded_label_propagation,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") / 50).cast("long") % 5).alias("label"),
    )
    return seeded_label_propagation(
        spark, _web_edges(spark, sf_dir), seeds, rounds=6
    )


def q_nb_lang_pred(spark, sf_dir):
    """Trained multinomial Naive Bayes language ID (functions/
    langnb.py — char-trigram model, add-1 smoothing over the global
    vocabulary, unseen-gram floor): train on the labeled corpus,
    classify the same corpus, one row per doc with the winning label
    and log-likelihood. The oracle replays training (counts, totals,
    vocabulary, priors) and the argmax classification term-for-term."""
    from dxa_pagerank_spark.functions.langnb import nb_classify, nb_train

    docs = _t(spark, sf_dir, "documents")
    model, stats = nb_train(docs)
    return nb_classify(docs, model, stats).select(
        "id", "label_pred", F.round("score", 6).alias("score")
    )


def q_inlink_diversity(spark, sf_dir):
    """Per-target in-link host diversity over the page graph with the
    synthetic site law (block 25): total in-links, distinct linking
    hosts, and their ratio — the classic link-spam signal (a page
    whose thousands of in-links come from 2 hosts is bought, not
    endorsed). Exact counts, one division; the oracle regenerates the
    edge multiset and replays both aggregates."""
    e = _web_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    per_edge = e.select(
        "dst", (F.col("src") / 25).cast("long").alias("src_host")
    )
    agg = per_edge.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_hosts"),
    )
    return agg.select(
        F.col("dst").alias("id"),
        "n_inlinks",
        "n_hosts",
        F.round(
            F.col("n_hosts") / F.col("n_inlinks"), 6
        ).alias("host_diversity"),
    )


def q_change_rates(spark, sf_dir):
    """Per-url Poisson change-rate estimation over a 3-cycle synthetic
    crawl series (functions/snapshots.py change_rate — Cho &
    Garcia-Molina TOIT'03, bias-reduced +0.5 form): cycle 2 amends
    doc_id%11 and %13 pages, cycle 3 amends %13 again; observations
    come off the real crawl_delta chain. The oracle computes the
    closed-form (n, X) per residue class and the same estimator."""
    from dxa_pagerank_spark.functions.snapshots import (
        change_rate,
        crawl_delta,
    )
    from dxa_pagerank_spark.sources.pages_synth import page_url

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def cycle(t):
        body = F.when(
            (F.col("doc_id") % 13 == 0) & (F.lit(t) >= 2),
            F.concat(F.col("text"), F.lit(f" rev{t}")),
        ).when(
            (F.col("doc_id") % 11 == 0) & (F.lit(t) >= 2),
            F.concat(F.col("text"), F.lit(" amended")),
        ).otherwise(F.col("text"))
        return docs.select(
            page_url(F.col("doc_id")).alias("url"), body.alias("text")
        )

    # build each crawl cycle once and persist: cycle(2) feeds two deltas
    # (as old and as new), and without the cache the pages projection is
    # recomputed 4x instead of 3.
    cycles = {t: cycle(t).persist() for t in (1, 2, 3)}
    try:
        obs = None
        for t in (2, 3):
            d = crawl_delta(cycles[t - 1], cycles[t]).filter(
                F.col("status").isin(["changed", "unchanged"])
            ).select(
                "url", (F.col("status") == "changed").alias("changed")
            )
            obs = d if obs is None else obs.unionAll(d)
        # materialize the (url, changed) observations so the cycle
        # caches can be dropped before returning — without this the
        # three persisted projections leak into the rest of a
        # 185-query contract/driver session
        obs = obs.localCheckpoint(eager=True)
    finally:
        for c in cycles.values():
            try:
                c.unpersist()
            except Exception:
                pass
    return change_rate(obs, interval_days=1.0).select(
        "url",
        "n_obs",
        "n_changed",
        F.round("change_rate", 6).alias("change_rate"),
        F.round("revisit_days", 6).alias("revisit_days"),
    )


def q_corpus_jsd(spark, sf_dir):
    """Jensen-Shannon divergence between the en and de sub-corpora's
    add-1-smoothed unigram distributions (functions/terms.py
    corpus_divergence) — the domain-shift scalar a mixture designer
    reads before reweighting sources. Exact integer counts; the
    oracle replays the smoothing and the per-term contributions."""
    from dxa_pagerank_spark.functions.terms import corpus_divergence

    return corpus_divergence(
        _t(spark, sf_dir, "documents"), "lang", "en", "de"
    ).select(
        "n_tokens_a",
        "n_tokens_b",
        "vocab_size",
        F.round("jsd", 6).alias("jsd"),
    )


def q_blockrank_init(spark, sf_dir):
    """BlockRank warm-start vector (operators/blockrank.py — Kamvar
    et al. 2003): per-host local PageRank (3 rounds, teleport and
    dangling within the block) x host-graph PageRank (4 wpagerank
    rounds over local-rank-weighted cross links), on the synthetic
    site law (block 25). Sums to 1 by construction; feeds
    pagerank(initial_ranks=...) as the global warm start. The oracle
    unrolls both phases and the product."""
    from dxa_pagerank_spark.operators.blockrank import blockrank_init

    return blockrank_init(
        spark,
        _web_edges(spark, sf_dir),
        block_size=25,
        local_rounds=3,
        host_rounds=4,
    ).select("id", F.round("rank", 6).alias("rank"))


def q_quality_correlations(spark, sf_dir):
    """Pairwise Pearson correlations between the engine's three
    cheap quality signals — heuristic composite, unigram-LM mean NLL,
    Flesch ease — over docs where all three are defined
    (functions/profiler.py signal_correlations): the double-counting
    pre-flight before blending signals in rank_fusion / curation
    gates. Signals are 6-dp-rounded BEFORE correlating so both
    engines correlate identical values; the oracle replays each
    signal and the sufficient-sums formula."""
    from dxa_pagerank_spark.functions.lmscore import unigram_logprob
    from dxa_pagerank_spark.functions.profiler import (
        signal_correlations,
    )
    from dxa_pagerank_spark.functions.textstats import (
        quality_score,
        readability,
    )

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    lm = unigram_logprob(docs).select(
        F.col("id").alias("doc_id"),
        F.round("mean_neg_logprob", 6).alias("lm_nll"),
    )
    rd = readability(docs).select(
        "doc_id", F.round("flesch_ease", 6).alias("flesch_ease")
    )
    joined = q.join(lm, "doc_id").join(rd, "doc_id")
    return signal_correlations(
        joined, ["quality", "lm_nll", "flesch_ease"]
    ).select("signal_a", "signal_b", "n", F.round("r", 6).alias("r"))


def q_diameter_bounds(spark, sf_dir):
    """Double-sweep diameter bounds of the symmetrized page graph
    (operators/bfs.py double_sweep_bound — Magnien-Latapy-Habib): BFS
    from the top-degree vertex, re-BFS from the farthest; ecc lower
    bound + 2*min-ecc upper bound in one row. The oracle replays both
    sweeps as recursive CTEs with the same deterministic picks."""
    from dxa_pagerank_spark.operators.bfs import double_sweep_bound

    return double_sweep_bound(
        spark, _web_edges(spark, sf_dir), max_depth=32
    )


def q_zorder_keys(spark, sf_dir):
    """Morton z-order clustering keys (plans/zorder.py z_value — the
    Z-ORDER BY layout primitive): bit interleave of two 6-bit derived
    keys per document. write_zordered range-partitions+sorts on this
    column so per-file min/max stats are tight in BOTH dimensions
    (pruning measured in tests/test_zorder.py); the oracle replays
    the interleave shift-for-shift."""
    from dxa_pagerank_spark.plans.zorder import z_value

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 64).alias("a"),
        ((F.col("doc_id") * 37) % 64).alias("b"),
    )
    return docs.select(
        "doc_id",
        "a",
        "b",
        z_value(F.col("a"), F.col("b"), bits=6).alias("z"),
    )


def q_reservoir_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted reservoir sampling (functions/
    sampling.py weighted_reservoir): per-language top-15 by the
    deterministic exponential key -ln(u)/w with u from the Knuth
    multiplicative hash and w = token count — a weight-proportional
    sample WITHOUT replacement. The oracle replays hash, key, and
    per-group rank draw-for-draw."""
    from dxa_pagerank_spark.functions.sampling import weighted_reservoir
    from dxa_pagerank_spark.functions.textstats import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).alias("ntok")
    )
    return weighted_reservoir(
        docs, "lang", F.col("doc_id"), F.col("ntok"), k=15
    ).select(
        "doc_id",
        "lang",
        "res_rank",
        F.round("res_key", 6).alias("res_key"),
    )


def q_landmark_closeness(spark, sf_dir):
    """Sampled closeness centrality from the landmark frame
    (operators/landmarks.py landmark_closeness — Eppstein-Wang 2004
    over Potamias et al. landmarks): per-vertex mean inverse distance
    to the 4 highest-degree landmarks, one shared batched BFS +
    per-vertex aggregate. Exact-integer dist_sum; the oracle replays
    landmark choice, the recursive BFS closure, and the aggregate."""
    from dxa_pagerank_spark.operators.landmarks import landmark_closeness

    return landmark_closeness(
        spark, _web_edges(spark, sf_dir), k=4, max_depth=12
    ).select(
        "id",
        "n_landmarks",
        "dist_sum",
        F.round("closeness", 6).alias("closeness"),
    )


def q_web_eigencentrality(spark, sf_dir):
    """Eigenvector centrality (Bonacich) of the page link graph after
    6 L1-normalized power-iteration rounds
    (operators/eigencentrality.py) — the undamped counterpart of
    web_pagerank; the oracle unrolls the identical trajectory."""
    from dxa_pagerank_spark.operators.eigencentrality import (
        eigenvector_centrality,
    )

    return eigenvector_centrality(
        spark, _web_edges(spark, sf_dir), rounds=6
    ).select("id", F.round("centrality", 6).alias("centrality"))


def q_readability(spark, sf_dir):
    """Flesch Reading Ease + Flesch-Kincaid grade per document
    (functions/textstats.py readability): regexp-run counting
    conventions fixed so the oracle recomputes words/sentences/vowel-
    run syllables and the affine formulas term-for-term."""
    from dxa_pagerank_spark.functions.textstats import readability

    docs = _t(spark, sf_dir, "documents")
    return readability(docs).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round("flesch_ease", 6).alias("flesch_ease"),
        F.round("fk_grade", 6).alias("fk_grade"),
    )


def q_wl_classes(spark, sf_dir):
    """Weisfeiler-Leman structural equivalence classes of the page
    link graph after 2 refinement rounds (operators/wlrefine.py):
    (wl_label, n_vertices) — template-generated page families surface
    as large classes. Colors are md5 hex over sorted neighbor-color
    multisets, so the oracle replays every round string-for-string."""
    from dxa_pagerank_spark.operators.wlrefine import wl_class_sizes

    return wl_class_sizes(_web_edges(spark, sf_dir), rounds=2)


def q_local_community(spark, sf_dir):
    """ACL local clustering (FOCS'06): personalized-PageRank
    conductance sweep from the top-3 out-degree seeds — the sweep
    curve (prefix, vertex, volume, cut, conductance) over the top-40
    degree-normalized-PPR prefix (operators/localcluster.py). Integer
    vol/cut bookkeeping; the oracle replays the 5-round PPR chain and
    the window-cumulative sweep."""
    from dxa_pagerank_spark.operators.localcluster import ppr_sweep
    from dxa_pagerank_spark.operators.pagerank import out_degrees

    e = _edges(spark, sf_dir)
    seeds = [
        r["id"]
        for r in out_degrees(e)
        .orderBy(F.desc("out_deg"), F.asc("id"))
        .limit(3)
        .collect()
    ]
    return ppr_sweep(spark, e, seeds, rounds=5, top_m=40).select(
        "t",
        "id",
        "vol",
        "cut",
        F.round("conductance", 6).alias("conductance"),
    )


def _web_pages(spark, sf_dir):
    """Deterministic input_hint-shaped pages table (url, warc_ts,
    html binary, text, lang) synthesised from documents — see
    sources/pages_synth.py for the closed-form link rule."""
    from dxa_pagerank_spark.sources.pages_synth import synth_pages

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return synth_pages(docs, docs.count())


def q_web_pagerank(spark, sf_dir):
    """End-to-end north_rule path: pages(html bytes) -> anchor parse
    (frozen pandas-UDF extractor) -> href resolve/filter -> edges with
    join-mode ids -> converged PageRank. The oracle regenerates the
    identical edge multiset from the arithmetic link rule (no HTML) and
    runs the unrolled reference-exact PageRank on it."""
    from dxa_pagerank_spark.operators.pagerank import pagerank
    from dxa_pagerank_spark.sources.pages import pages_to_edges
    from dxa_pagerank_spark.sources.pages_synth import synth_url_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    edges = pages_to_edges(
        _web_pages(spark, sf_dir), id_mode="join", url_ids=synth_url_ids(docs)
    )
    res = pagerank(spark, edges, damping=DAMPING, threshold=1e-10, max_rounds=100)
    return res.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_web_page_text(spark, sf_dir):
    """Byte-identical html -> text extraction at driver level: the text
    column is recomputed from the html bytes by the frozen extractor
    UDF; the oracle states the closed-form expected string per url."""
    return _web_pages(spark, sf_dir).select("url", "text", "lang")


def _web_edges(spark, sf_dir):
    from dxa_pagerank_spark.sources.pages import pages_to_edges
    from dxa_pagerank_spark.sources.pages_synth import synth_url_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return pages_to_edges(
        _web_pages(spark, sf_dir), id_mode="join", url_ids=synth_url_ids(docs)
    )


def q_anchor_text_stats(spark, sf_dir):
    """Incoming anchor-text aggregation per target url — the classic
    link-text relevance signal. Engine side parses the html (anchor
    parser with text capture, functions/linkextract.py); the oracle
    regenerates the (target, text) multiset from the arithmetic link
    rule ('next'/'rel'/'again' arms) and aggregates in SQL."""
    from dxa_pagerank_spark.sources.pages import page_anchors

    anchors = page_anchors(_web_pages(spark, sf_dir))
    return anchors.groupBy(F.col("link").alias("url")).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.array_join(F.array_sort(F.collect_set("text")), "|").alias("texts"),
    )


_SITE_BLOCK = 25  # synthetic "site" = 25 consecutive doc ids (see sitegraph.py)


def q_site_graph(spark, sf_dir):
    """Host-graph construction: collapse the page link graph to one
    vertex per site with edge multiplicity as weight, self-loops
    dropped (operators/sitegraph.py). On a real crawl the site key is
    parse_url(url,'HOST'); the single-host fixture uses id blocks."""
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    return site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)


def q_site_pagerank(spark, sf_dir):
    """Weighted PageRank over the rolled-up site graph (10 rounds,
    rank distributed proportional to inter-site link multiplicity,
    dangling mass redistributed uniformly per round —
    operators/wpagerank.py)."""
    import math

    from dxa_pagerank_spark.operators.sitegraph import site_rollup
    from dxa_pagerank_spark.operators.wpagerank import weighted_pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_sites = int(math.ceil(docs.count() / _SITE_BLOCK))
    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    ranks = weighted_pagerank(
        spark, sites, num_vertices=n_sites, damping=DAMPING, rounds=10
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def q_web_scc(spark, sf_dir):
    """Strongly connected components of the page link graph via the
    distributed trim + min-label-coloring algorithm
    (operators/scc.py). The oracle computes mutual reachability from
    the recursive-CTE transitive closure — scc id = min mutual id."""
    from dxa_pagerank_spark.operators.scc import (
        strongly_connected_components,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    return strongly_connected_components(
        spark, _web_edges(spark, sf_dir), vertices=docs
    )


def q_web_condensation(spark, sf_dir):
    """Condensation DAG of the page link graph: every SCC contracted
    to one vertex, placed at its topological depth (longest path from
    a root component).  Composes the SCC operator with the bounded
    max-relaxation level loop (operators/condensation.py); the oracle
    rebuilds the component DAG from the recursive-CTE closure and
    takes max walk length per component."""
    from dxa_pagerank_spark.operators.condensation import (
        condensation_report,
    )
    from dxa_pagerank_spark.operators.scc import (
        strongly_connected_components,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    edges = _web_edges(spark, sf_dir)
    labels = strongly_connected_components(spark, edges, vertices=docs)
    return condensation_report(spark, edges, labels)


def q_web_bowtie(spark, sf_dir):
    """Broder bowtie decomposition of the page link graph (core / in /
    out / other, operators/scc.py) — the canonical Common-Crawl
    structural statistic. Per-vertex classes so the oracle checks the
    whole assignment, not just the four counts."""
    from dxa_pagerank_spark.operators.scc import bowtie_classes

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    return bowtie_classes(spark, _web_edges(spark, sf_dir), vertices=docs)


# Hub-degree cap for the pair-generating queries (VERDICT r02 #4): a
# shared endpoint of degree d emits d*(d-1)/2 pair rows, so one nav-bar
# hub makes the output quadratic at crawl scale. The cap is applied
# BEFORE the self-join (semi-join against the degree table) and is
# mirrored as a HAVING clause in the SQL oracles.
_PAIR_DEGREE_CAP = 64


def q_web_cocitation(spark, sf_dir):
    """Co-citation relatedness over the page link graph: pairs of
    pages sharing an in-linker, with the shared-source count
    (operators/cocitation.py — the 'related pages' primitive), sources
    with out-degree > _PAIR_DEGREE_CAP dropped pre-join. The oracle is
    the same capped distinct-edge self-join in SQL."""
    from dxa_pagerank_spark.operators.cocitation import cocitation

    return cocitation(
        _web_edges(spark, sf_dir), min_common=1, max_degree=_PAIR_DEGREE_CAP
    )


def q_web_coupling(spark, sf_dir):
    """Bibliographic coupling over the page link graph: pairs of pages
    sharing an out-link target (operators/cocitation.py coupling — the
    dual of co-citation), targets with in-degree > _PAIR_DEGREE_CAP
    dropped pre-join."""
    from dxa_pagerank_spark.operators.cocitation import coupling

    return coupling(
        _web_edges(spark, sf_dir), min_common=1, max_degree=_PAIR_DEGREE_CAP
    )


def q_web_walks(spark, sf_dir):
    """Deterministic pseudo-random walks (length 4) from every 50th
    page over the link graph (operators/walks.py — DeepWalk-style walk
    sampling with an engine-independent arithmetic neighbor choice, so
    the SQL oracle replays the identical walks step by step)."""
    from dxa_pagerank_spark.operators.walks import random_walks

    seeds = (
        _t(spark, sf_dir, "documents")
        # % 49 == 1 so most seeds are NOT %10==0 dangling pages and the
        # walks genuinely traverse (a dangling seed just stops at step 0)
        .filter(F.col("doc_id") % 49 == 1)
        .select(F.col("doc_id").alias("id"))
    )
    return random_walks(_web_edges(spark, sf_dir), seeds, length=4)


def q_pagerank_mc(spark, sf_dir):
    """Monte Carlo PageRank estimate (Avrachenkov et al. 2007,
    dangling-termination variant) by 4 deterministic teleport-gated
    walks per page — the O(m*n/(1-d)) first-pass ranking whose work is
    independent of iteration count (operators/mcrank.py).  Every
    sampling decision is the walks-module LCG mix, so the oracle
    replays the full walk process round by round."""
    from dxa_pagerank_spark.operators.mcrank import pagerank_monte_carlo

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    return pagerank_monte_carlo(
        spark,
        _web_edges(spark, sf_dir),
        docs,
        damping=0.85,
        walks_per_vertex=4,
        max_length=20,
    )


def q_crawl_budget(spark, sf_dir):
    """Per-site fetch-budget apportionment for the next crawl cycle:
    Hamilton largest-remainder split of a 997-fetch budget across
    sites, weighted by site-level Monte Carlo PageRank visit counts
    (integer weights -> the allocation is bit-exact in SQL).  Composes
    pagerank_monte_carlo with apportion_budget
    (functions/frontier.py); sum(alloc) == budget exactly."""
    from dxa_pagerank_spark.functions.frontier import apportion_budget
    from dxa_pagerank_spark.operators.mcrank import pagerank_monte_carlo

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    mc = pagerank_monte_carlo(
        spark,
        _web_edges(spark, sf_dir),
        docs,
        damping=0.85,
        walks_per_vertex=4,
        max_length=20,
    )
    site_w = mc.groupBy(
        F.floor(F.col("id") / _SITE_BLOCK).cast("long").alias("id")
    ).agg(F.sum("n_visits").alias("w"))
    return apportion_budget(site_w, 997)


def q_walk_skipgrams(spark, sf_dir):
    """Skip-gram co-occurrence table with PMI over the deterministic
    walks (operators/walks.py skipgram_cooccurrence — the
    DeepWalk/node2vec training-pair extraction; PMI per Levy &
    Goldberg). Same seeds/length as web_walks, window 2; the oracle
    replays the walks, the windowed self-join, and the PMI ln."""
    from dxa_pagerank_spark.operators.walks import (
        random_walks,
        skipgram_cooccurrence,
    )

    seeds = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 49 == 1)
        .select(F.col("doc_id").alias("id"))
    )
    walks = random_walks(_web_edges(spark, sf_dir), seeds, length=4)
    return skipgram_cooccurrence(walks, window=2)


def q_web_bfs_levels(spark, sf_dir):
    """Multi-source BFS hop distances from every 100th page over the
    link graph (operators/bfs.py — the Broder-style web distance
    statistic; crawl-depth audit primitive). The oracle is the
    recursive-CTE min-distance closure with the same depth cap."""
    from dxa_pagerank_spark.operators.bfs import bfs_levels

    seeds = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 100 == 1)
        .select(F.col("doc_id").alias("id"))
    )
    return bfs_levels(_web_edges(spark, sf_dir), seeds, max_depth=12)


def q_web_distance_histogram(spark, sf_dir):
    """Hop-count distribution from the BFS seed set (operators/bfs.py
    distance_histogram over q_web_bfs_levels) — the Broder
    'average distance' summary statistic."""
    from dxa_pagerank_spark.operators.bfs import distance_histogram

    return distance_histogram(q_web_bfs_levels(spark, sf_dir))


def q_web_landmark_distances(spark, sf_dir):
    """Landmark distance oracle (operators/landmarks.py — Potamias et
    al. CIKM'09): 4 highest-degree landmarks, one batched BFS over the
    symmetrized link graph, then per-query-pair triangle-inequality
    bounds [d_lower, d_upper] via two vertex-keyed joins (per-pair
    fan-out = k, never a traversal). Query pairs are consecutive
    doc_id % 97 == 1 ids. The oracle replays landmark choice, the BFS
    closure (recursive CTE, same depth cap), and both bounds."""
    from pyspark.sql import Window

    from dxa_pagerank_spark.operators.landmarks import (
        estimate_distances,
        landmark_distances,
    )

    dists = landmark_distances(
        spark, _web_edges(spark, sf_dir), k=4, max_depth=12
    )
    qs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 1)
        .select(F.col("doc_id").alias("u"))
    )
    pairs = qs.select(
        "u", F.lead("u").over(Window.orderBy("u")).alias("v")
    ).filter(F.col("v").isNotNull())
    return estimate_distances(dists, pairs)


def q_mirror_sites(spark, sf_dir):
    """Mirror-site detection (functions/mirrors.py — Bharat-Broder
    WWW'99): sites summarized by their docs' prefix fingerprints,
    boilerplate fingerprints capped BEFORE the inverted-index
    self-join, Broder set resemblance per surviving pair. The oracle
    replays the fingerprint (same md5-of-first-8-tokens), the cap, and
    the resemblance arithmetic."""
    from dxa_pagerank_spark.functions.mirrors import mirror_candidates

    return mirror_candidates(
        _t(spark, sf_dir, "documents"),
        block_size=_SITE_BLOCK,
        prefix_tokens=8,
        min_overlap=1,
        max_fp_sites=16,
    )


def q_graph_reciprocity(spark, sf_dir):
    """Reciprocity of the page link graph: share of distinct non-loop
    edges whose reverse edge exists (operators/graphstats.py). The
    oracle regenerates the arithmetic edge multiset and replays the
    same distinct/EXISTS logic in SQL."""
    from dxa_pagerank_spark.operators.graphstats import reciprocity

    return reciprocity(_web_edges(spark, sf_dir)).select(
        "n_edges", "n_reciprocal", F.round("reciprocity", 6).alias("reciprocity")
    )


def q_degree_assortativity(spark, sf_dir):
    """Out-in degree assortativity (Pearson over edges) of the page
    link graph — operators/graphstats.py. The five sufficient sums are
    integer-valued, so the correlation is bit-deterministic and the SQL
    oracle matches exactly."""
    from dxa_pagerank_spark.operators.graphstats import degree_assortativity

    return degree_assortativity(_web_edges(spark, sf_dir)).select(
        "n", F.round("assortativity", 6).alias("assortativity")
    )


def q_web_triad_census(spark, sf_dir):
    """Directed triad census of the SITE graph (the page graph's
    arithmetic link rule makes page-level triangles vanishingly rare;
    the host rollup is dense and hits several MAN classes): the 7
    connected directed-triangle classes (030T..300) counted via the
    skew-safe degree-ordered wedge closure + one pair-state join
    (operators/motifs.py). The oracle enumerates id-ordered triangles
    over the rolled-up arithmetic edge set and mirrors the
    classification CASE operation-for-operation."""
    from dxa_pagerank_spark.operators.motifs import triad_census
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    return triad_census(spark, sites)


def q_lpa_modularity(spark, sf_dir):
    """Newman modularity of the 10-round deterministic LPA communities
    over the canonical graph (operators/graphstats.py modularity +
    operators/labelprop.py). The oracle replays the identical 10
    unrolled LPA rounds and the same Q formula in SQL."""
    from dxa_pagerank_spark.operators.graphstats import modularity
    from dxa_pagerank_spark.operators.labelprop import label_propagation

    edges = _edges(spark, sf_dir)
    labels = label_propagation(spark, edges, max_rounds=10)
    return modularity(edges, labels).select(
        "n_edges",
        "n_communities",
        F.round("modularity", 6).alias("modularity"),
    )


def q_web_mis(spark, sf_dir):
    """Deterministic Luby maximal independent set of the page link
    graph (operators/mis.py): priority = injective Knuth-hash rank, so
    the oracle unrolls the identical selection rounds in SQL. MIS is
    the building block for distributed scheduling/coloring; converges
    in 3 rounds on this graph (unroll has slack — post-fixpoint rounds
    are identity)."""
    from dxa_pagerank_spark.operators.mis import luby_mis

    return luby_mis(spark, _web_edges(spark, sf_dir), max_rounds=8)


def q_web_louvain(spark, sf_dir):
    """Bounded deterministic Louvain (2 synchronous move rounds at
    level 0, parity-scheduled, exact 64-bit integer gain arithmetic —
    operators/louvain.py louvain_bounded). The integer score law means
    the SQL oracle replays the identical argmax bit-for-bit; the full
    multilevel fixpoint (louvain()) is pinned against a pure-Python
    replica in tests/test_louvain.py."""
    from dxa_pagerank_spark.operators.louvain import louvain_bounded

    return louvain_bounded(spark, _web_edges(spark, sf_dir), rounds=2)


def q_site_coloring(spark, sf_dir):
    """Jones-Plassmann greedy coloring (round-index variant) of the
    site graph — each round's priority-local-maxima form an independent
    set colored with the round number; proper coloring by construction
    (operators/mis.py). Oracle unrolls the same rounds."""
    from dxa_pagerank_spark.operators.mis import jp_coloring
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    return jp_coloring(spark, sites, max_rounds=16)


def q_trending_terms(spark, sf_dir):
    """Trending terms per 1-minute crawl window: the batch form of the
    streaming/trends.py windowed term counts (the identical column
    program runs under readStream with a watermark — parity pinned in
    tests/test_streaming_trends.py), plus the read-time top-5 rank.
    The oracle regenerates the closed-form page text and replays
    window/count/rank in SQL."""
    from dxa_pagerank_spark.streaming.trends import (
        top_terms_per_window,
        windowed_term_counts,
    )

    counts = windowed_term_counts(
        _web_pages(spark, sf_dir), window="1 minute"
    )
    return top_terms_per_window(counts, k=5)


def q_table_profile(spark, sf_dir):
    """Per-column shape report over the documents table (row/null/
    distinct counts, native-order min/max, modal value with smallest-
    value tie-break) — functions/profiler.py; the pipeline pre-flight
    diagnostic. One value-counts groupBy per column; the oracle runs
    the identical semantics per column in SQL."""
    from dxa_pagerank_spark.functions.profiler import table_profile

    return table_profile(
        _t(spark, sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )


def q_feature_smoothing(spark, sf_dir):
    """One SGC/LightGCN-style mean-aggregation round of the document
    embeddings over the page link graph (operators/featprop.py): the
    neighbor sum is an ascending-id left fold, so the SQL oracle
    replays the identical float arithmetic bit-for-bit."""
    from dxa_pagerank_spark.operators.featprop import smooth_features

    out = smooth_features(
        _web_edges(spark, sf_dir),
        _t(spark, sf_dir, "embeddings"),
    )
    return out.select(
        "id", "pos", F.round("value", 6).alias("value")
    )


def q_crawl_delta(spark, sf_dir):
    """Crawl-to-crawl churn per url (functions/snapshots.py
    crawl_delta): two arithmetic sub-crawls of the documents corpus
    (old = doc_id %% 7 != 0; new = doc_id %% 5 != 0 with every 11th
    text amended) compared by content hash in one full-outer url join.
    The oracle regenerates both crawls and the same md5 CASE in SQL."""
    from dxa_pagerank_spark.functions.snapshots import crawl_delta
    from dxa_pagerank_spark.sources.pages_synth import page_url

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        page_url(F.col("doc_id")).alias("url"), "text"
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        page_url(F.col("doc_id")).alias("url"),
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return crawl_delta(old, new)


def q_topic_pagerank(spark, sf_dir):
    """Topic-sensitive PageRank (Haveliwala 2002): three arithmetic
    topic seed sets (doc_id %% 50 residues 0/1/2) ranked in ONE batched
    power-iteration loop — every round is a single adjacency join
    shared by all topics (operators/topicrank.py). The oracle unrolls
    the identical (topic, id)-keyed iteration in SQL."""
    from dxa_pagerank_spark.operators.topicrank import (
        topic_sensitive_pagerank,
    )

    n = _t(spark, sf_dir, "documents").count()
    topics = {
        f"t{r}": [i for i in range(n) if i % 50 == r] for r in (0, 1, 2)
    }
    out = topic_sensitive_pagerank(
        spark, _web_edges(spark, sf_dir), topics, rounds=4
    )
    return out.select("topic", "id", F.round("rank", 6).alias("rank"))


def q_site_coreness(spark, sf_dir):
    """Full k-shell decomposition (coreness per vertex) of the site
    graph — operators/kcore.py core_numbers: ascending-k peeling where
    the (k+1)-core peels FROM the k-core survivors. The oracle unrolls
    every peel round per k with post-fixpoint identity slack."""
    from dxa_pagerank_spark.operators.kcore import core_numbers
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    return core_numbers(spark, sites, max_k=16)


def q_anchor_expanded_docs(spark, sf_dir):
    """Anchor-text document expansion (the classic web-indexing trick:
    a page is described by the text of links POINTING AT it): page text
    extended with the sorted distinct incoming anchor texts. Engine
    side parses html for both the page text and the anchors; the
    oracle regenerates both from the closed forms."""
    from dxa_pagerank_spark.sources.pages import page_anchors

    pages = _web_pages(spark, sf_dir)
    anchors = page_anchors(pages).groupBy(F.col("link").alias("url")).agg(
        F.array_join(F.array_sort(F.collect_set("text")), " ").alias("atext")
    )
    return pages.join(anchors, "url", "left").select(
        "url",
        F.when(
            F.col("atext").isNotNull(),
            F.concat(F.col("text"), F.lit("\n"), F.col("atext")),
        )
        .otherwise(F.col("text"))
        .alias("expanded_text"),
    )


def q_site_mst(spark, sf_dir):
    """Boruvka minimum spanning forest of the weighted site graph
    (operators/mst.py): per round every component picks its minimum
    outgoing edge under the (w, a, b) total order, the choice graph is
    contracted with the large-star/small-star CC operator. Tie-broken
    weights make the forest unique, so the oracle's unrolled Boruvka
    replay (fixed inner min-label depth with identity slack) matches
    exactly."""
    from dxa_pagerank_spark.operators.mst import boruvka_msf
    from dxa_pagerank_spark.operators.sitegraph import site_rollup

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    return boruvka_msf(spark, sites)


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: predicted heuristic language
    (functions/textstats.py with_lang_id) vs the labeled lang column,
    as (lang, lang_pred, n) counts — the calibration readout for the
    n-gram language filter. Oracle = the shared lang_id SQL + the same
    groupBy."""
    from dxa_pagerank_spark.functions.textstats import with_lang_id

    docs = with_lang_id(_t(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_blended_topic_rank(spark, sf_dir):
    """Haveliwala query-time blend: the three topic vectors of
    topic_pagerank mixed with fixed weights (0.5/0.3/0.2) into one
    ranking — a pure weighted sum over the (topic, id) rank table, no
    further iteration. Oracle = the unrolled topic loop + the same
    pivoted sum."""
    from dxa_pagerank_spark.operators.topicrank import (
        topic_sensitive_pagerank,
    )

    n = _t(spark, sf_dir, "documents").count()
    topics = {
        f"t{r}": [i for i in range(n) if i % 50 == r] for r in (0, 1, 2)
    }
    tr = topic_sensitive_pagerank(
        spark, _web_edges(spark, sf_dir), topics, rounds=4
    )
    w = (
        F.when(F.col("topic") == "t0", F.lit(0.5))
        .when(F.col("topic") == "t1", F.lit(0.3))
        .otherwise(F.lit(0.2))
    )
    return (
        tr.select("id", (F.col("rank") * w).alias("wr"))
        .groupBy("id")
        .agg(F.round(F.sum("wr"), 6).alias("rank"))
    )


def _web_edges_old(spark, sf_dir):
    """Yesterday's crawl: the full link rule MINUS the i%3==0 duplicate
    arm (the oracle's _WEB_EDGES_OLD_SQL)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    i = F.col("doc_id").cast("long")
    live = docs.filter(i % 10 != 0)
    return live.select(
        i.alias("src"), ((i + 1) % n).alias("dst")
    ).unionAll(live.select(i.alias("src"), ((3 * i + 7) % n).alias("dst")))


def q_incremental_pagerank(spark, sf_dir):
    """Incremental crawl update: 6 cold reference rounds on yesterday's
    edge table, then a WARM START (operators/pagerank.py initial_ranks)
    of 4 rounds on today's full table — the daily-recrawl path the
    checkpoint/lineage design exists for. The oracle replays both
    phases (cold law with the 1/N quirk, then the warm law with the
    conservation-residual round-1 mass) unrolled in SQL."""
    from dxa_pagerank_spark.operators.pagerank import pagerank

    base = pagerank(
        spark,
        _web_edges_old(spark, sf_dir),
        threshold=1e-18,
        max_rounds=6,
    )
    warm = pagerank(
        spark,
        _web_edges(spark, sf_dir),
        threshold=1e-18,
        max_rounds=4,
        initial_ranks=base.ranks,
    )
    return warm.ranks.select("id", F.round("rank", 6).alias("rank"))


def q_incremental_components(spark, sf_dir):
    """Incremental crawl update for connected components
    (operators/components.py incremental_components): yesterday =
    the (src+dst) %% 3 != 0 subset of the edge table, labeled cold;
    today = the full table, warm-started from those labels. The warm
    result is provably identical to a cold run on the full table —
    the oracle IS the cold-CC SQL, so any warm-start corruption
    hash-mismatches."""
    from dxa_pagerank_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    edges = _edges(spark, sf_dir)
    yesterday = edges.filter((F.col("src") + F.col("dst")) % 3 != 0)
    prior = connected_components(spark, yesterday)
    return incremental_components(spark, edges, prior)


def q_powerlaw_alpha(spark, sf_dir):
    """Discrete power-law exponent MLE over the link graph's in-degree
    tail (operators/graphstats.py powerlaw_fit, Clauset-Shalizi-Newman
    eq. 3.7, dmin=2) — the web-graph heavy-tail characterization next
    to degree_skew. Oracle replays the distinct-degree aggregate and
    the alpha/sigma formulas."""
    from dxa_pagerank_spark.operators.graphstats import powerlaw_fit

    return powerlaw_fit(
        spark, _web_edges(spark, sf_dir), direction="in", dmin=2
    )


def q_crawl_schedule(spark, sf_dir):
    """Politeness-batched recrawl plan (functions/frontier.py
    schedule_frontier): converged web PageRank as priority, host =
    25-page id blocks (the fixture site rule), at most 3 fetches per
    host per wave, first 5 waves. The oracle replays the PageRank
    prelude and the per-host rank/wave assignment."""
    from dxa_pagerank_spark.functions.frontier import schedule_frontier

    pr = q_web_pagerank(spark, sf_dir)
    frontier = pr.select(
        "id",
        F.floor(F.col("id") / 25).alias("host"),
        F.col("rank").alias("priority"),
    )
    return schedule_frontier(frontier, per_host=3, max_waves=5)


def q_redirect_resolution(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py, pointer
    doubling with exact hop counts and sound cycle detection) over a
    deterministic synthetic redirect law on doc ids: %10 in {1,4} hop
    +3 (3-hop chains to a terminal), %100 in {95,97} form 2-cycles
    (whose %10==1/4 feeders are cycle-flagged too). The oracle is the
    recursive chain walk with the same dedup-on-src law."""
    from dxa_pagerank_spark.operators.redirects import resolve_redirects

    d = F.col("doc_id")
    redirects = (
        _t(spark, sf_dir, "documents")
        .select(
            d.alias("src"),
            F.when(d % 100 == 95, d + 2)
            .when(d % 100 == 97, d - 2)
            .when((d % 10).isin(1, 4), d + 3)
            .alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    return resolve_redirects(spark, redirects)


def q_textrank_keywords(spark, sf_dir):
    """Corpus TextRank keywords (functions/textrank.py, Mihalcea &
    Tarau 2004): window-2 token co-occurrence graph, 10 weighted
    rounds of S(u) = 0.15 + 0.85 * sum(w/sumw * S), top 30 terms.
    The oracle unrolls the identical rounds over the same edge
    CTEs."""
    from dxa_pagerank_spark.functions.textrank import textrank_keywords

    return textrank_keywords(
        _t(spark, sf_dir, "documents"),
        window=2,
        rounds=10,
        top_k=30,
    )


def q_cdc_dedup(spark, sf_dir):
    """Content-defined chunking dedup audit (functions/cdc.py,
    LBFS/FastCDC at token granularity): width-4 rolling md5 windows
    cut where the first hex digit is '0' (divisor 16, ~16-token
    chunks); a chunk is dup when its content hash recurs corpus-wide.
    The oracle replays the cut rule, the running-count chunk
    assignment, and the ordered chunk hash in SQL."""
    from dxa_pagerank_spark.functions.cdc import cdc_dedup_stats

    return cdc_dedup_stats(
        _t(spark, sf_dir, "documents"), width=4, divisor=16
    ).withColumnRenamed("id", "doc_id")


def q_corpus_diversity(spark, sf_dir):
    """Per-language lexical diversity report (functions/terms.py
    diversity_report, n=2): type-token ratio and distinct-bigram
    ratio — the repetitiveness gauges read before weighting a source
    in a mixture. Exact integer counts; the oracle replays the
    token/bigram explodes and distinct counts."""
    from dxa_pagerank_spark.functions.terms import diversity_report

    return diversity_report(
        _t(spark, sf_dir, "documents"), n=2, group_col="lang"
    )


def q_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup (functions/dedup.py
    containment_pairs, Broder's c(A in B)): 3-gram shingles,
    stop-shingle df cap 50, pairs sharing >= 3 shingles — catches
    quotation/subset relations symmetric Jaccard scores near 0. The
    oracle replays the gram pipeline, the df cap, and the ratios."""
    from dxa_pagerank_spark.functions.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"),
        n=3,
        min_common=3,
        max_gram_df=50,
    )


def q_rank_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (functions/fusion.py, Cormack et al.
    SIGIR'09) of three document signals: converged web PageRank,
    heuristic quality score, and unigram-LM score (negated — lower
    perplexity is better). k=60, per-signal top-100, fused top-20.
    The oracle replays all three signals and the truncated-rank RRF
    sum in one SQL statement."""
    from dxa_pagerank_spark.functions.fusion import rrf_fuse

    pr = q_web_pagerank(spark, sf_dir)
    q = q_doc_quality(spark, sf_dir)
    lm = q_lm_quality(spark, sf_dir)
    signals = [
        ("pagerank", pr.select("id", F.col("rank").alias("score"))),
        (
            "quality",
            q.select(
                F.col("doc_id").alias("id"), F.col("quality").alias("score")
            ),
        ),
        ("lm", lm.select("id", (-F.col("mean_neg_logprob")).alias("score"))),
    ]
    return rrf_fuse(signals, k=60, top_m=100, n_out=20)


def q_component_histogram(spark, sf_dir):
    """Component size distribution (size -> number of components) over
    the lineitem-projection graph — the classic web-graph giant-
    component report (Broder et al. WWW'00 fig. 9 shape), two
    aggregates over the CC labels. Oracle wraps the cold-CC closure."""
    from dxa_pagerank_spark.operators.components import connected_components

    cc = connected_components(spark, _edges(spark, sf_dir))
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


def q_rmat_skew(spark, sf_dir):
    """In-degree skew profile of a deterministic R-MAT graph
    (datagen.rmat_edges_df, canonical 57/19/19/5 law, 2^10 vertices /
    8192 edges): the heavy-tail benchmark graph whose skew report
    justifies the salting/AQE machinery. Generation is a pure integer
    column program, so the oracle regenerates the identical edges."""
    from dxa_pagerank_spark.datagen import rmat_edges_df
    from dxa_pagerank_spark.operators.graphstats import degree_skew_report

    edges = rmat_edges_df(spark, scale=10, n_edges=8192, seed=3)
    return degree_skew_report(spark, edges, direction="in", top_k=10)


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient curve phi(k) (Zhou-Mondragon / Colizza
    et al.) of the heavy-tail R-MAT benchmark graph — does the hub
    club link to itself more densely than chance? One row per degree
    threshold with club size/edges and phi; exact-integer counts with
    the single division at output (operators/graphstats.py rich_club).
    The oracle regenerates the identical edges and replays the
    histogram-complement cumulative bookkeeping."""
    from dxa_pagerank_spark.datagen import rmat_edges_df
    from dxa_pagerank_spark.operators.graphstats import rich_club

    edges = rmat_edges_df(spark, scale=10, n_edges=8192, seed=3)
    return rich_club(edges).select(
        "k",
        "club_nodes",
        "club_edges",
        F.round("phi", 6).alias("phi"),
    )


def q_cm_heavy_hitters(spark, sf_dir):
    """Count-Min sketch term counting (functions/cmsketch.py,
    Cormode-Muthukrishnan; width 256, depth 4): point estimates for
    the corpus's exact top-20 terms next to their true counts — the
    fixed-memory counting path for vocabularies that no longer fit.
    Additive cells make the sketch order-independent, so the oracle
    rebuilds it cell-for-cell."""
    from dxa_pagerank_spark.functions.cmsketch import cm_estimate
    from dxa_pagerank_spark.functions.terms import tokens

    docs = _t(spark, sf_dir, "documents")
    tf = tokens(docs).groupBy("term").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    top = tf.orderBy(F.desc("true_cnt"), F.asc("term")).limit(20)
    est = cm_estimate(docs, top.select("term"), width=256, depth=4)
    return top.join(est, "term").select("term", "true_cnt", "est")


def q_bloom_blocklist(spark, sf_dir):
    """Bloom-filter membership gate (functions/bloom.py, m=4096 k=4):
    the blocklist is the vocabulary of every 31st document, probed
    with the full corpus vocabulary — the broadcast-membership pattern
    for blocklists too big to ship as sets. Deterministic bits mean
    even the false positives reproduce, so the oracle matches
    exactly."""
    from dxa_pagerank_spark.functions.bloom import bloom_build, bloom_probe
    from dxa_pagerank_spark.functions.terms import tokens

    docs = _t(spark, sf_dir, "documents")
    blocked = (
        tokens(docs.filter(F.col("doc_id") % 31 == 0))
        .select(F.col("term").alias("key"))
        .distinct()
    )
    vocab = tokens(docs).select(F.col("term").alias("key")).distinct()
    bits = bloom_build(blocked, m=4096, k=4)
    return bloom_probe(vocab, bits, m=4096, k=4)


def q_fixed_chunks(spark, sf_dir):
    """Fixed-size overlapping chunking (functions/chunking.py —
    retrieval/RAG corpus prep): 32-token windows at stride 24 (8-token
    overlap), every token covered, pure per-document array program.
    The oracle replays the chunk-count law and the slices."""
    from dxa_pagerank_spark.functions.chunking import fixed_chunks

    return fixed_chunks(
        _t(spark, sf_dir, "documents"), size=32, stride=24
    ).withColumnRenamed("id", "doc_id")


def q_bm25f_topk(spark, sf_dir):
    """BM25F fielded retrieval (functions/retrieval.py bm25f_topk):
    body field weight 1, incoming-anchor-text field weight 2 (the
    classic web ranking where anchor text carries its own signal);
    queries mix body and anchor vocabulary. The oracle regenerates the
    anchor multiset from the closed-form link law and replays the
    field folds."""
    from dxa_pagerank_spark.functions.retrieval import bm25f_topk
    from dxa_pagerank_spark.sources.pages import page_anchors

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    anchors = page_anchors(_web_pages(spark, sf_dir))
    afield = anchors.groupBy(
        F.regexp_extract("link", "([0-9]+)$", 1).cast("long").alias("doc_id")
    ).agg(
        F.array_join(F.array_sort(F.collect_list("text")), " ").alias("text")
    )
    return bm25f_topk(
        [("body", docs, 1.0), ("anchor", afield, 2.0)],
        [(0, "table next"), (1, "rel")],
        k=10,
    )


def q_best_snippets(spark, sf_dir):
    """Query-biased snippets (functions/snippets.py): earliest
    max-coverage 12-token window for the query {table, scan} over
    every 20th document — the search-result summary feature, run here
    on a deterministic doc subset standing in for a retrieval top-k.
    The oracle replays the hit-anchored window argmax and the slice."""
    from dxa_pagerank_spark.functions.snippets import best_snippets

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    return best_snippets(
        docs, ["table", "scan"], window=12
    ).withColumnRenamed("id", "doc_id")


def q_fuzzy_terms(spark, sf_dir):
    """Typo-tolerant term lookup (functions/fuzzy.py, SymSpell
    deletion-index join + Levenshtein verify): queries are
    deterministic middle-character deletions of the md5-'0' slice of
    the vocabulary; output is every (query, vocab term) pair within
    edit distance 1. The oracle replays mutation, deletion keys, and
    the levenshtein filter."""
    from dxa_pagerank_spark.functions.fuzzy import fuzzy_term_matches
    from dxa_pagerank_spark.functions.terms import tokens

    vocab = (
        tokens(_t(spark, sf_dir, "documents")).select("term").distinct()
    )
    queries = (
        vocab.filter(
            (F.substring(F.md5(F.col("term").cast("binary")), 1, 1) == "0")
            & (F.length("term") > 1)
        )
        .withColumn("h", F.floor(F.length("term") / 2).cast("int"))
        .select(
            F.concat(
                F.expr("substring(term, 1, h)"),
                F.expr("substring(term, h + 2, length(term))"),
            ).alias("q")
        )
        .distinct()
    )
    return fuzzy_term_matches(vocab, queries)


def q_phrase_search(spark, sf_dir):
    """Exact phrase search (functions/snippets.py phrase_stats): the
    positional-index posting list for the 2-token phrase "table scan"
    — per-doc occurrence counts and first position, built as a pure
    per-document window program. The oracle replays the window
    equality."""
    from dxa_pagerank_spark.functions.snippets import phrase_stats

    return phrase_stats(
        _t(spark, sf_dir, "documents"), "table scan"
    ).withColumnRenamed("id", "doc_id")


def q_pmi_neighbors(spark, sf_dir):
    """Distributional thesaurus (functions/textrank.py pmi_neighbors,
    Church-Hanks PMI): each term's top-5 window-2 co-occurrence
    neighbors, hapax pairs dropped (min_count=2). The oracle replays
    the symmetrized weights, marginals, and the PMI ln."""
    from dxa_pagerank_spark.functions.textrank import pmi_neighbors

    return pmi_neighbors(
        _t(spark, sf_dir, "documents"), window=2, top_k=5, min_count=2
    )


def q_benchmark_contamination(spark, sf_dir):
    """Span-level benchmark decontamination audit (GPT-3 13-gram
    collision filter at span granularity — functions/spandedup.py
    contamination_stats): the "benchmark" is the arithmetic subset
    doc_id %% 25 == 0 of the corpus itself, so verbatim hits are
    guaranteed; width 8. Oracle replays window hashes, the broadcast
    semi-join, and the island merge in SQL."""
    from dxa_pagerank_spark.functions.spandedup import contamination_stats

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0).select("text")
    return contamination_stats(docs, bench, width=8).withColumnRenamed(
        "id", "doc_id"
    )


def q_temperature_mix(spark, sf_dir):
    """Multinomial temperature re-balancing of the corpus across
    languages (XLM/mT5 mixture rule, alpha=0.5: expected group sizes
    proportional to sqrt(n_g)) — functions/sampling.py
    temperature_sample. alpha=0.5 keeps the per-group threshold
    IEEE-sqrt-exact, so the oracle recomputes group counts, thresholds,
    and the multiplicative-hash decision bit-identically in SQL."""
    from dxa_pagerank_spark.functions.sampling import temperature_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_sample(docs, "doc_id", "lang", alpha=0.5)


def q_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary Jaccard between language sub-corpora
    (functions/terms.py vocab_overlap) — corpus-composition analytics
    over the same single-space tokenization as term_topk."""
    from dxa_pagerank_spark.functions.terms import vocab_overlap

    out = vocab_overlap(_t(spark, sf_dir, "documents"), group_col="lang")
    return out.select(
        "group_a", "group_b", "vocab_a", "vocab_b", "n_shared",
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_degree_skew(spark, sf_dir):
    """In-degree skew profile of the page link graph (gini, exact
    quantiles, hub share — operators/graphstats.py degree_skew_report):
    the pre-flight diagnostic for salting / AQE-skew configuration. All
    integer arithmetic until the two final divisions, so the SQL oracle
    replays it exactly."""
    from dxa_pagerank_spark.operators.graphstats import degree_skew_report

    return degree_skew_report(
        spark, _web_edges(spark, sf_dir), direction="in", top_k=10
    )


def q_corpus_curation(spark, sf_dir):
    """Composed training-corpus curation chain (exact dedup -> lang
    allow-list -> quality floor -> token band) reported per language —
    functions/curation.py."""
    from dxa_pagerank_spark.functions.curation import curation_report

    return curation_report(
        _t(spark, sf_dir, "documents"),
        langs=("en", "de"),
        min_quality=0.5,
        min_tokens=10,
        max_tokens=100_000,
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-keyed stratified sample (partitioning- and
    engine-independent, functions/sampling.py): keep 50% of en, 25% of
    de, 10% of every other language."""
    from dxa_pagerank_spark.functions.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        key="doc_id",
        stratum="lang",
        rates={"en": 0.5, "de": 0.25},
        default_rate=0.1,
        salt=1,
    ).select("doc_id", "lang")


def q_web_boilerplate_lines(spark, sf_dir):
    """Corpus-wide shared-line table (CCNet-style line-dedup stage 1,
    functions/boilerplate.py): lines occurring in > 50% of pages. On
    the synthetic crawl that is exactly the navigation arms
    ('next'/'rel', 90% of pages) and the mailto anchor text ('mail',
    every page)."""
    from dxa_pagerank_spark.functions.boilerplate import boilerplate_lines

    return boilerplate_lines(
        _web_pages(spark, sf_dir), id_col="url", max_doc_frac=0.5, min_docs=2
    )


def q_web_line_dedup(spark, sf_dir):
    """Line-level boilerplate removal over the crawl (CCNet line dedup,
    functions/boilerplate.py): drop every line occurring in > 50% of
    pages, rebuild each page's text in original line order, report
    kept/dropped line counts."""
    from dxa_pagerank_spark.functions.boilerplate import remove_boilerplate

    return remove_boilerplate(
        _web_pages(spark, sf_dir), id_col="url", max_doc_frac=0.5, min_docs=2
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style per-document repetition signals over 2-/3-grams
    (functions/repetition.py): most-frequent-gram coverage and
    duplicate-gram fraction — the standard template-spam filters."""
    from dxa_pagerank_spark.functions.repetition import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), ns=(2, 3))


def q_pii_masked(spark, sf_dir):
    """PII masking (functions/pii.py) over deterministically augmented
    text: each doc gets a synthetic email + IPv4 appended (the fixture
    corpus contains no PII of its own), the masker must replace both
    globally and count hits on the original text."""
    from dxa_pagerank_spark.functions.pii import mask_pii

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 now"),
        ).alias("text"),
    )
    return mask_pii(aug, id_col="doc_id", text_col="text")


def q_quality_weighted_sample(spark, sf_dir):
    """Quality-proportional deterministic sampling
    (functions/sampling.weighted_sample): keep-probability =
    quality^2 per document, decided by the engine-portable
    multiplicative hash — corpus re-weighting with zero shuffles."""
    from dxa_pagerank_spark.functions.sampling import weighted_sample
    from dxa_pagerank_spark.functions.textstats import quality_col

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", quality_col(F.col("text")).alias("quality")
    )
    return weighted_sample(docs, "doc_id", "quality", power=2, salt=3)


def q_ann_topk_ivf(spark, sf_dir):
    """IVF-flat ANN (functions/similarity.ivf_topk): deterministic
    arithmetic-sample centroids, corpus assigned by literal-expression
    argmax-cosine (scan, no shuffle), nprobe=4 of 16 lists probed per
    query — the third ANN strategy next to brute force and LSH."""
    from dxa_pagerank_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # row count from the parquet footer (metadata-only) so the index
    # build never scans the corpus just to pick the centroid stride
    n = _parquet_num_rows(sf_dir, "embeddings")
    return ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4, n=n)


def q_url_canonical(spark, sf_dir):
    """URL canonicalization (functions/urlnorm.py) over four messy
    spellings generated arithmetically per doc_id (case, default port,
    fragment, tracking params, unsorted query). Engine runs the real
    column-program canonicalizer; the oracle states the closed-form
    expected string per case."""
    from dxa_pagerank_spark.functions.urlnorm import canonicalize_urls

    i = F.col("doc_id")
    s = i.cast("string")
    messy = (
        F.when(i % 4 == 0, F.concat(F.lit("HTTP://Example.ORG:80/doc/"), s,
                                    F.lit("?utm_source=feed&b="), s,
                                    F.lit("&a=1#top")))
        .when(i % 4 == 1, F.concat(F.lit("https://EXAMPLE.org:443/doc/"), s))
        .when(i % 4 == 2, F.concat(F.lit("https://Example.org/?fbclid="), s))
        .otherwise(F.concat(F.lit("http://example.org/A/B?z=26&y=25&x="), s))
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", messy.alias("url"))
    return canonicalize_urls(docs)


_TRAP_SECTIONS = ["about", "news", "blog", "docs", "shop", "help", "wiki"]


def q_crawl_traps(spark, sf_dir):
    """Crawl-trap detection (functions/traps.py): urls synthesised
    arithmetically per doc_id — host site{doc_id%20}.test; hosts with
    doc_id%20==0 are a calendar trap (every page under one numeric
    template /cal/{d}/{d}), the rest spread over 7 literal sections.
    The oracle replays the same template rewrite and thresholds in
    SQL."""
    from dxa_pagerank_spark.functions.traps import detect_crawl_traps

    i = F.col("doc_id")
    s = i.cast("string")
    section = F.element_at(
        F.array(*[F.lit(x) for x in _TRAP_SECTIONS]),
        (i % 7 + 1).cast("int"),
    )
    url = F.when(
        i % 20 == 0,
        F.concat(
            F.lit("http://site0.test/cal/"),
            s,
            F.lit("/"),
            ((i * 7) % 97).cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("http://site"),
            (i % 20).cast("string"),
            F.lit(".test/"),
            section,
            F.lit("/"),
            s,
        )
    )
    docs = _t(spark, sf_dir, "documents").select(url.alias("url"))
    return detect_crawl_traps(docs, min_pages=10, min_share=0.5)


def _link_delta_inputs(spark, sf_dir):
    """Old graph = the synthetic web edges; new graph = a deterministic
    recrawl perturbation (edges with (src+dst)%13==0 lost, sources
    doc_id%5==0 gain one arithmetic edge)."""
    old = _web_edges(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    kept = old.filter((F.col("src") + F.col("dst")) % 13 != 0)
    added = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % n).alias("dst"),
    )
    return old, kept.unionByName(added)


def q_link_delta(spark, sf_dir):
    """Edge-level crawl-to-crawl graph diff (functions/snapshots.py
    edge_delta): added/removed/kept per (src, dst) under the arithmetic
    recrawl perturbation the oracle replays."""
    from dxa_pagerank_spark.functions.snapshots import edge_delta

    old, new = _link_delta_inputs(spark, sf_dir)
    return edge_delta(old, new)


def q_link_delta_report(spark, sf_dir):
    """1-row rollup of q_link_delta: status counts, affected-source
    count (what a warm-start recompute must touch), edge churn."""
    from dxa_pagerank_spark.functions.snapshots import edge_delta_report

    old, new = _link_delta_inputs(spark, sf_dir)
    return edge_delta_report(old, new)


def q_rmat_degree_histogram(spark, sf_dir):
    """Out-degree histogram of the deterministic R-MAT heavy-tail
    graph (datagen.rmat_edges_df — the q_rmat_skew input, viewed as
    the full distribution rather than the 1-row skew profile). The
    oracle regenerates every edge bit-for-bit (shared _rmat_edges_sql
    fragment). sf-independent by design (the generator is the thing
    under test)."""
    from dxa_pagerank_spark.datagen import rmat_edges_df

    edges = rmat_edges_df(spark, scale=10, n_edges=8192, seed=3)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    return deg.groupBy("out_deg").agg(
        F.count(F.lit(1)).alias("n_sources")
    )


def q_adjacency_compression(spark, sf_dir):
    """WebGraph-style storage forecast (plans/compression.py) for the
    synthetic web edge table: Elias gamma/delta coded successor-gap
    costs vs raw 64-bit adjacency, integer-exact bit lengths via
    length(bin(gap)) in both engines."""
    from dxa_pagerank_spark.plans.compression import compression_summary

    return compression_summary(_web_edges(spark, sf_dir))


def q_latest_snapshots(spark, sf_dir):
    """Crawl-snapshot merge (functions/snapshots.latest_snapshot):
    every third page is re-crawled one day later with amended text;
    latest-wins per url with a per-url snapshot count. Timestamps
    compared as epoch seconds (tz-independent)."""
    from dxa_pagerank_spark.functions.snapshots import latest_snapshot

    pages = _web_pages(spark, sf_dir).select("url", "warc_ts", "text")
    pid = F.regexp_extract("url", r"([0-9]+)$", 1).cast("long")
    rec = pages.filter(pid % 3 == 0).select(
        "url",
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        F.concat(F.col("text"), F.lit("\nrecrawl")).alias("text"),
    )
    merged = latest_snapshot(pages.unionByName(rec))
    return merged.select(
        "url",
        F.col("warc_ts").cast("long").alias("ts_epoch"),
        "n_snapshots",
        "text",
    )


def q_training_mix_report(spark, sf_dir):
    """The composed corpus pipeline a training run starts from
    (exact dedup -> Gopher repetition gates -> quality floor ->
    quality-weighted sampling), reported per source — exercises four
    operators chained, with the whole chain mirrored in one SQL
    oracle."""
    from dxa_pagerank_spark.functions.dedup import exact_dedup
    from dxa_pagerank_spark.functions.repetition import repetition_filter
    from dxa_pagerank_spark.functions.sampling import weighted_sample
    from dxa_pagerank_spark.functions.textstats import (
        quality_col,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    kept = repetition_filter(exact_dedup(docs))
    scored = kept.select(
        "doc_id", "source",
        quality_col(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
    ).filter(F.col("quality") >= 0.5)
    sampled = weighted_sample(scored, "doc_id", "quality", power=1, salt=5)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


def q_first_seen_dedup(spark, sf_dir):
    """First-seen-wins feed dedup (streaming/dedup.py batch form; the
    streaming form with dropDuplicatesWithinWatermark is parity-pinned
    in tests/test_streaming_dedup.py): documents arrive at
    epoch+doc_id, a full duplicate wave arrives 10 minutes later under
    new ids — every winner is an original."""
    from dxa_pagerank_spark.streaming.dedup import dedup_batch

    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")).alias("ts"),
        "text",
    )
    dupes = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts"),
        "text",
    )
    out = dedup_batch(base.unionByName(dupes))
    return out.select(
        "content_hash",
        "doc_id",
        F.col("ts").cast("long").alias("ts_epoch"),
    )


def q_lm_quality(spark, sf_dir):
    """Per-document unigram LM score (functions/lmscore.py): mean
    -ln p(token) under the corpus's own MLE unigram model — the
    deterministic core of CCNet-style LM filtering; cuts both the
    over-represented (spam) and rare-token (gibberish) tails."""
    from dxa_pagerank_spark.functions.lmscore import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


def q_bigram_lm(spark, sf_dir):
    """Per-document mean bigram conditional -ln p(w2|w1) under the
    corpus's own MLE bigram model (functions/lmscore.py
    bigram_logprob) — the conditional LM filter that catches
    locally-incoherent token salads unigram scoring misses. The oracle
    replays the bigram explode, the left-marginal, and the per-pair
    count*ln association."""
    from dxa_pagerank_spark.functions.lmscore import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"))


def q_kneser_ney_lm(spark, sf_dir):
    """Per-document mean bigram -ln p under interpolated Kneser-Ney
    smoothing, D = 0.75 (functions/lmscore.py kneser_ney_logprob —
    the KenLM/CCNet smoothing; continuation probability counts TYPES,
    so frequent-but-unversatile tokens stop looking cheap). The
    oracle replays bigram types, the three marginals, and the
    discount/backoff formula term-for-term."""
    from dxa_pagerank_spark.functions.lmscore import kneser_ney_logprob

    return kneser_ney_logprob(_t(spark, sf_dir, "documents")).select(
        "id",
        "n_bigrams",
        F.round("mean_neg_logprob", 6).alias("mean_neg_logprob"),
    )


def q_lm_quality_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split
    (functions/lmscore.py:perplexity_buckets, Wenzek et al. 2019):
    per-language tertile cutoffs over the 6-dp unigram LM scores,
    cutoffs rounded before the band comparison so engine and oracle
    compare identical values; zero-token docs tagged 'empty'."""
    from dxa_pagerank_spark.functions.lmscore import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination (functions/lmscore.contaminated_ids):
    documents sharing any 3-gram with the 'benchmark' set (the first 5
    documents) — the GPT-3/Gopher-recipe n-gram-overlap check as a
    broadcast semi-join."""
    from dxa_pagerank_spark.functions.lmscore import contaminated_ids

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return contaminated_ids(docs, bench, n=3)


def q_bucketed_gather(spark, sf_dir):
    """Storage-co-located PageRank gather step (plans/bucketing.py):
    adjacency and out-degree tables written hash-bucketed+sorted by
    src, then the gather equi-join runs with ZERO Exchange (plan
    pinned in tests/test_bucketing.py) — the storage form of the df
    loop's partition-once-reuse-every-round law. Result: per-dst
    incoming normalized mass (one superstep's contribution table)."""
    import tempfile

    from dxa_pagerank_spark.plans.bucketing import (
        colocated_join,
        write_bucketed,
    )

    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    tmp = tempfile.mkdtemp(prefix="bucketed_gather_")
    write_bucketed(edges, "q_edges_b", "src", 8, path=f"{tmp}/edges")
    write_bucketed(deg, "q_deg_b", "src", 8, path=f"{tmp}/deg")
    return (
        colocated_join(spark, "q_edges_b", "q_deg_b", "src")
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.round(F.sum(1.0 / F.col("out_deg")), 6).alias("mass"),
        )
    )


def q_doc_length_quantiles(spark, sf_dir):
    """Per-language exact length quartiles (linear interpolation — the
    corpus-shape report a data lead reads before choosing curation
    bands). Built-in percentile aggregate, one shuffle."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("n_chars").cast("double")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile(c, F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(c, F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(c, F.lit(0.75)), 6).alias("p75"),
    )


_PACK_L = 512


def q_web_spam_mass(spark, sf_dir):
    """TrustRank spam-mass estimate (operators/trustrank.py, Gyöngyi
    et al. 2004): uniform-teleport PageRank and trusted-seed TrustRank
    under the SAME 10-round iteration law (operators/ppr.py); spam
    mass = PR - TR, relative mass = (PR-TR)/PR. Trusted seeds: the
    arithmetic rule id % 50 == 1 over the page-graph vertices, stated
    identically in the oracle."""
    from dxa_pagerank_spark.operators.trustrank import spam_mass

    # materialize the parsed edge table once: two 10-round loops (plus
    # the seed scan) would otherwise re-run the HTML anchor parse
    e = _web_edges(spark, sf_dir).localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    trusted = [
        r["id"] for r in verts.filter(F.col("id") % 50 == 1).collect()
    ]
    return spam_mass(spark, e, trusted, rounds=10).select(
        "id",
        F.round("pagerank", 6).alias("pagerank"),
        F.round("trustrank", 6).alias("trustrank"),
        F.round("spam_mass", 6).alias("spam_mass"),
        F.round("rel_spam_mass", 6).alias("rel_spam_mass"),
    )


def q_sequence_packing(spark, sf_dir):
    """Concat-and-chop sequence packing (functions/packing.py): docs
    in id order, token stream chopped into 512-token training windows;
    per doc its stream span and window range. Engine side is the
    distributed two-pass prefix sum (range partition + per-partition
    window, NO single-partition exchange); the oracle is the plain
    global window cumsum it must equal."""
    from dxa_pagerank_spark.functions.packing import (
        pack_documents,
        token_count_col,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    return pack_documents(d, _PACK_L, tokens_col="n_tokens")


def q_packing_report(spark, sf_dir):
    """1-row packing audit: total docs/tokens, 512-token window count,
    boundary-straddling docs, last-window fill."""
    from dxa_pagerank_spark.functions.packing import (
        pack_documents,
        packing_report,
        token_count_col,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    return packing_report(pack_documents(d, _PACK_L, tokens_col="n_tokens"), _PACK_L)


def q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (functions/dsir.py, Xie et al. 2023):
    hashed uni+bigram bucket models, target = lang='en' docs, source =
    whole corpus; Gumbel top-100 by log importance weight. Broadcast
    ratio table, top-k select — the corpus never shuffles wider than
    doc_id."""
    from dxa_pagerank_spark.functions.dsir import dsir_sample

    d = _t(spark, sf_dir, "documents")
    out = dsir_sample(d, F.col("lang") == "en", k=100, n_buckets=256)
    return out.select(
        "id",
        "n_feats",
        F.round("log_w", 6).alias("log_w"),
        F.round("score", 6).alias("score"),
    )


def q_quality_classifier(spark, sf_dir):
    """fastText-style hashed linear quality classifier
    (functions/qualityclf.py, Joulin et al. 2016 — the model-based
    filtering stage of GPT-3/LLaMA/CCNet pipelines): hashed uni+bigram
    features, broadcast B-row weight table (deterministic Knuth
    stand-in standing where a trained model plugs in), per-doc
    mean-weight score, sigmoid, keep = score >= 0. The oracle replays
    hashing, weights, and verdict bit-for-bit."""
    from dxa_pagerank_spark.functions.qualityclf import quality_classifier

    return quality_classifier(
        _t(spark, sf_dir, "documents"), n_buckets=512
    ).select(
        "id",
        "n_feats",
        F.round("score", 6).alias("score"),
        F.round("prob", 6).alias("prob"),
        "keep",
    )


def q_web_katz(spark, sf_dir):
    """Katz centrality over the page link graph (operators/katz.py):
    x_{t+1} = beta + alpha * A^T x_t, 5 rounds — attenuated in-path
    counting, the PageRank-family centrality without degree
    normalisation. The oracle unrolls the identical recurrence."""
    from dxa_pagerank_spark.operators.katz import katz_centrality

    return katz_centrality(
        spark, _web_edges(spark, sf_dir), alpha=0.1, beta=1.0, rounds=5
    ).select("id", F.round("score", 6).alias("score"))


def q_web_harmonic(spark, sf_dir):
    """Truncated harmonic centrality H(v) = sum over u reaching v
    within 6 hops of 1/d(u,v) — computed by the HyperBall ball
    recurrence in exact (distinct-array) mode over reversed edges
    (operators/neighborhood.py; the hll sketch mode is the 100-TB
    form, pinned against this one in pytest). The oracle recomputes
    all-pairs truncated min-distances via a recursive CTE."""
    from dxa_pagerank_spark.operators.neighborhood import harmonic_centrality

    return harmonic_centrality(spark, _web_edges(spark, sf_dir), rounds=6).select(
        "id", F.round("harmonic", 6).alias("harmonic")
    )


def q_web_neighborhood(spark, sf_dir):
    """Neighborhood function N(t) = #pairs (u,w) with d(u,w) <= t for
    t in 0..6 — the curve behind average-distance / effective-diameter
    estimates (operators/neighborhood.py, exact mode)."""
    from dxa_pagerank_spark.operators.neighborhood import neighborhood_function

    return neighborhood_function(spark, _web_edges(spark, sf_dir), rounds=6)


def q_web_effective_diameter(spark, sf_dir):
    """Interpolated 90% effective diameter of the page link graph
    (operators/neighborhood.py effective_diameter — the ANF/HyperBall
    headline statistic, derived from the same exact-mode neighborhood
    curve the oracle recomputes via a recursive CTE)."""
    from dxa_pagerank_spark.operators.neighborhood import effective_diameter

    return effective_diameter(
        spark, _web_edges(spark, sf_dir), rounds=6, fraction=0.9
    ).select(
        F.round("eff_diameter", 6).alias("eff_diameter"),
        "t_ceil",
        F.round("target_pairs", 6).alias("target_pairs"),
        "max_pairs",
    )


def q_web_link_prediction(spark, sf_dir):
    """Neighborhood link prediction over the undirected page graph
    (operators/linkpred.py): non-adjacent pairs with >= 2 common
    neighbors, scored by Adamic-Adar and Jaccard; shared vertices with
    undirected degree > _PAIR_DEGREE_CAP dropped pre-join (same hub
    cap as co-citation). The oracle replays the capped symmetric
    self-join and both score formulas in SQL."""
    from dxa_pagerank_spark.operators.linkpred import link_prediction

    return link_prediction(
        _web_edges(spark, sf_dir),
        min_common=2,
        max_degree=_PAIR_DEGREE_CAP,
    ).select(
        "a",
        "b",
        "n_common",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _warc_fixture_dir(spark, sf_dir):
    """Deterministic per-sf WARC archive of the synthetic corpus
    (sources/warc.py synth_warc_fixture; atomic-rename idempotent)."""
    from dxa_pagerank_spark.sources.warc import synth_warc_fixture

    out = os.path.join(
        "/tmp", "dxa_pagerank_spark_warc", os.path.basename(sf_dir.rstrip("/"))
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    synth_warc_fixture(spark, docs, out, n_files=8)
    return out


def q_warc_roundtrip(spark, sf_dir):
    """Common-Crawl WARC ingestion (sources/warc.py read_warc): the
    synthetic corpus is materialised as a real sharded WARC archive —
    warcinfo record per file, response records carrying HTTP messages —
    and read back via the binaryFile + Content-Length record walk. The
    oracle rebuilds every record's html by closed-form string concat
    and compares byte length + md5, proving the archive -> pages path
    is byte-identical per url."""
    from dxa_pagerank_spark.sources.warc import read_warc

    pages = read_warc(spark, _warc_fixture_dir(spark, sf_dir))
    return pages.select(
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
        "url",
        F.octet_length("html").alias("n_bytes"),
        F.md5("html").alias("digest"),
    )


def q_warc_link_graph(spark, sf_dir):
    """End-to-end ingestion parity: WARC archive -> html parse -> anchor
    extraction -> edges(src, dst), which must equal the closed-form link
    rule (_WEB_EDGES_SQL) the rest of the web suite is oracled on. This
    is the 100-TB entry point exercised for real: per-file task
    parallelism, frozen extractor UDFs, join id mode."""
    from dxa_pagerank_spark.sources.pages import pages_to_edges
    from dxa_pagerank_spark.sources.pages_synth import synth_url_ids
    from dxa_pagerank_spark.sources.warc import read_warc

    pages = read_warc(spark, _warc_fixture_dir(spark, sf_dir))
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return pages_to_edges(pages, "join", url_ids=synth_url_ids(docs)).select(
        "src", "dst"
    )


def q_sitemap_discovery(spark, sf_dir):
    """Sitemap-driven URL discovery (functions/sitemaps.py): every host
    publishes a sitemap listing its even doc ids — ids %10==0 advertise
    an /extra/ URL the crawl does NOT have (that's what sitemaps are
    for), ids %4==0 carry a lastmod, priority = ((id%9)+1)/10. The xml
    is assembled with JVM string expressions, GENUINELY parsed by the
    regexp parser, and joined against the crawled url set; the oracle
    restates the entry rule in closed form."""
    from dxa_pagerank_spark.functions.sitemaps import (
        parse_sitemaps,
        sitemap_discovery,
    )
    from dxa_pagerank_spark.sources.pages_synth import BASE, page_url

    i = F.col("doc_id").cast("long")
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    entries = docs.filter(i % 2 == 0).select(
        (i / _SITE_BLOCK).cast("long").alias("host"),
        i.alias("id"),
        F.concat(
            F.lit("<url><loc>"),
            F.when(
                i % 10 == 0,
                F.concat(F.lit(f"{BASE[: BASE.rfind('/doc/')]}/extra/"),
                         i.cast("string")),
            ).otherwise(page_url(i)),
            F.lit("</loc>"),
            F.when(
                i % 4 == 0, F.lit("<lastmod>2024-01-01T00:00:00</lastmod>")
            ).otherwise(F.lit("")),
            F.lit("<priority>"),
            ((i % 9 + 1) / F.lit(10.0)).cast("string"),
            F.lit("</priority></url>"),
        ).alias("entry"),
    )
    sitemaps = entries.groupBy("host").agg(
        F.concat(
            F.lit("<urlset>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("id", "entry"))),
                    lambda x: x.entry,
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    crawled = docs.select(page_url(i).alias("url"))
    return sitemap_discovery(parse_sitemaps(sitemaps), crawled)


def q_partition_advisor(spark, sf_dir):
    """Layout advisor (operators/partitioning.py): edge-cut fraction,
    partition load imbalance, and ghost replication (= the exact
    per-round rank-exchange row count of a src-partitioned gather) for
    the two layouts a web graph actually chooses between — id-hash
    (pmod 8) vs site-block ((id//25) pmod 8). The oracle restates each
    metric as flat SQL aggregates per strategy."""
    from dxa_pagerank_spark.operators.partitioning import (
        block_partitioner,
        hash_partitioner,
        partition_report,
    )

    return partition_report(
        _web_edges(spark, sf_dir),
        {
            "hash8": hash_partitioner(8),
            "site_block8": block_partitioner(_SITE_BLOCK, 8),
        },
    )


def q_robots_schedule(spark, sf_dir):
    """Robots-compliant recrawl plan (functions/robots.py): per-host
    robots.txt bodies are synthesised with JVM string expressions by a
    closed host rule — banned (h%5=0), Crawl-delay 2 (h%5=1), a
    /doc/1 Disallow prefix behind an irrelevant badbot group (h%5=2),
    an empty group (h%5=3), no file at all (h%5=4) — then GENUINELY
    parsed by the declarative parser and enforced on the politeness
    schedule (per_host=3, max_waves=4). The oracle states the rules
    directly from host arithmetic and replays the ranked schedule."""
    from dxa_pagerank_spark.functions.robots import apply_robots, parse_robots

    i = F.col("doc_id").cast("long")
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    frontier = docs.select(
        i.alias("id"),
        (i / _SITE_BLOCK).cast("long").alias("host"),
        F.concat(F.lit("/doc/"), i.cast("string")).alias("path"),
        (7 * i % 101).alias("priority"),
    )
    h = F.col("host")
    robots = (
        frontier.select("host")
        .distinct()
        .filter(h % 5 != 4)  # h%5==4: no robots.txt published
        .select(
            "host",
            F.when(h % 5 == 0, F.lit("User-agent: *\nDisallow: /\n"))
            .when(
                h % 5 == 1,
                F.lit("User-agent: *\nCrawl-delay: 2\nDisallow:\n"),
            )
            .when(
                h % 5 == 2,
                F.lit(
                    "User-agent: badbot\nDisallow: /\n\n"
                    "User-agent: *\nDisallow: /doc/1\n"
                ),
            )
            .otherwise(F.lit("User-agent: *\n"))
            .alias("robots_txt"),
        )
    )
    return apply_robots(
        frontier, parse_robots(robots), per_host=3, max_waves=4
    )


def q_site_simrank(spark, sf_dir):
    """Truncated SimRank (Jeh & Widom 2002; operators/simrank.py) over
    the rolled-up site graph: 3 power rounds at C=0.8, pair state
    stepped one in-edge per side per round. Full SimRank is
    pair-quadratic, so it runs on the host-level graph — the level
    "related sites" features actually operate at. The oracle unrolls
    the same 3 rounds as chained SQL CTEs."""
    from dxa_pagerank_spark.operators.sitegraph import site_rollup
    from dxa_pagerank_spark.operators.simrank import simrank

    sites = site_rollup(_web_edges(spark, sf_dir), block_size=_SITE_BLOCK)
    return simrank(sites.select("src", "dst"), rounds=3, c=0.8).select(
        "a", "b", F.round("score", 6).alias("score")
    )


_EXACT_JACCARD_PAIRS_SQL = """
            WITH toks AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                         ' +'), x -> x <> '') AS t
              FROM documents),
            grams AS MATERIALIZED (
              SELECT doc_id,
                     CASE WHEN len(t) >= 3 THEN
                         list_distinct(list_transform(range(1, len(t) - 1),
                             i -> array_to_string(t[i:i+2], ' ')))
                     ELSE [array_to_string(t, ' ')] END AS g
              FROM toks),
            ex AS MATERIALIZED (SELECT doc_id, unnest(g) AS gram FROM grams),
            sizes AS MATERIALIZED (
              SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
            inter AS MATERIALIZED (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
        """


def q_hyperball_anf(spark, sf_dir):
    """HyperBall approximate neighborhood function (operators/anf.py,
    Boldi-Vigna): per-vertex HLL counters (m=16, murmur3-fmix32 hashed)
    absorb out-neighbor registers for 3 rounds over the synthetic web
    graph, then estimate |out-ball(v, 3)| with the standard
    linear-counting small-range branch. Fully deterministic — the
    oracle replays the identical register recurrence in long format
    (id, j, w) with the same fmix32 arithmetic and the same
    left-associated 2^-w fold."""
    from dxa_pagerank_spark.operators.anf import hyperball

    return hyperball(spark, _web_edges(spark, sf_dir), rounds=3).select(
        "id", "zeros", F.round("est", 6).alias("est")
    )


def q_encoding_quality(spark, sf_dir):
    """Mojibake / decode-failure scoring (functions/encoding.py) over
    a deterministically corrupted copy of the corpus: doc_id%7 gains a
    UTF-8-as-cp1252 apostrophe digraph, %11 a U+FFFD replacement char,
    %13 a C0 control byte (the base corpus is pure-ASCII word soup, so
    the closed-form oracle counts exactly the injections)."""
    from dxa_pagerank_spark.functions.encoding import encoding_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(t, F.lit(" donâ€™t")),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 11 == 0, F.concat(t, F.lit("�"))
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 13 == 0, F.concat(t, F.lit(""))
    ).otherwise(t)
    return encoding_quality(docs.select("doc_id", t.alias("text")))


def q_convergence_certificate(spark, sf_dir):
    """Per-round convergence certificate of the df PageRank loop
    (operators/pagerank.py convergence_certificate): the reference's
    PRerr/PRsum scalars (MetaChunk.java:13-20) plus the contraction
    bound d/(1-d) * l1_delta on the distance to the fixpoint. The
    oracle replays the 4-round unrolled recurrence and differences
    consecutive non-dangling rank vectors."""
    from dxa_pagerank_spark.operators.pagerank import (
        convergence_certificate,
        pagerank,
    )

    res = pagerank(
        spark, _edges(spark, sf_dir), threshold=0.0, max_rounds=4
    )
    cert = convergence_certificate(spark, res, damping=0.85)
    return cert.select(
        "round",
        F.round("l1_delta", 6).alias("l1_delta"),
        F.round("mass_residual", 6).alias("mass_residual"),
        F.round("geo_bound", 6).alias("geo_bound"),
    )


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment (functions/splits.py):
    the split is hashed from the SITE (doc_id // 25, the corpus's site
    rule) with fmix32, so near-duplicate pages of one site can never
    straddle the train/test fence. Oracle replays the identical fmix32
    bucket arithmetic in SQL."""
    from dxa_pagerank_spark.functions.splits import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    return leakage_safe_split(
        docs, F.floor(F.col("doc_id") / 25), train_pct=80, val_pct=10
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order = driver-verification priority. The driver
    checks a 50-query prefix of this dict per round, so queries are
    ordered: (1) the 33 entries with no green driver row after r04,
    cheapest-first by the r04 contract-log timings (they sum to
    ~155 s at sf0.01, well inside the driver budget); then (2) the
    152 entries already driver-green in some round, cheapest-first,
    as re-verification headroom for the remaining 17 prefix slots.
    Every entry has an oracle and is certified locally by the
    bit-exact scripts/check_contract.py regardless of driver
    budget."""
    return {
        # -- (1) no driver row yet after r04 (33), cheapest-first --
        "bucketed_gather": q_bucketed_gather,
        "degree_skew": q_degree_skew,
        "bpe_merges": q_bpe_merges,
        "web_link_prediction": q_web_link_prediction,
        "bpe_token_counts": q_bpe_token_counts,
        "dsir_sample": q_dsir_sample,
        "web_triad_census": q_web_triad_census,
        "web_katz": q_web_katz,
        "web_effective_diameter": q_web_effective_diameter,
        "web_neighborhood": q_web_neighborhood,
        "web_harmonic": q_web_harmonic,
        "component_histogram": q_component_histogram,
        "walk_skipgrams": q_walk_skipgrams,
        "site_simrank": q_site_simrank,
        "ann_topk_ivf": q_ann_topk_ivf,
        "web_mis": q_web_mis,
        "blended_topic_rank": q_blended_topic_rank,
        "dedup_canonical": q_dedup_canonical,
        "site_sssp": q_site_sssp,
        "incremental_near_dup": q_incremental_near_dup,
        "incremental_components": q_incremental_components,
        "site_coloring": q_site_coloring,
        "site_coreness": q_site_coreness,
        "lpa_modularity": q_lpa_modularity,
        "web_salsa": q_web_salsa,
        "pagerank_mc": q_pagerank_mc,
        "site_mst": q_site_mst,
        "web_landmark_distances": q_web_landmark_distances,
        "crawl_budget": q_crawl_budget,
        "web_spam_mass": q_web_spam_mass,
        "web_condensation": q_web_condensation,
        "crawl_schedule": q_crawl_schedule,
        "rank_fusion": q_rank_fusion,
        # -- (2) driver-green in r01-r04 (152), cheapest-first --
        "doc_stats": q_doc_stats,
        "stratified_sample": q_stratified_sample,
        "token_counts": q_token_counts,
        "crawl_delta": q_crawl_delta,
        "dedup_exact_stats": q_dedup_exact_stats,
        "degree_distribution": q_degree_distribution,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_length_quantiles": q_doc_length_quantiles,
        "doc_quality": q_doc_quality,
        "encoding_quality": q_encoding_quality,
        "events_window_agg": q_events_window_agg,
        "lang_id": q_lang_id,
        "out_degrees": q_out_degrees,
        "pii_masked": q_pii_masked,
        "readability": q_readability,
        "temperature_mix": q_temperature_mix,
        "url_canonical": q_url_canonical,
        "user_sessions": q_user_sessions,
        "zorder_keys": q_zorder_keys,
        "ann_topk": q_ann_topk,
        "audio_decode_stats": q_audio_decode_stats,
        "cc_one_round": q_cc_one_round,
        "first_seen_dedup": q_first_seen_dedup,
        "fixed_chunks": q_fixed_chunks,
        "hrw_shards": q_hrw_shards,
        "image_decode_stats": q_image_decode_stats,
        "jl_projection": q_jl_projection,
        "lang_confusion": q_lang_confusion,
        "leakage_split": q_leakage_split,
        "media_features": q_media_features,
        "phrase_search": q_phrase_search,
        "quality_weighted_sample": q_quality_weighted_sample,
        "reservoir_sample": q_reservoir_sample,
        "session_spans": q_session_spans,
        "sitemap_discovery": q_sitemap_discovery,
        "tpch_q1ish": q_tpch_q1ish,
        "crawl_traps": q_crawl_traps,
        "graph_summary": q_graph_summary,
        "site_lang_entropy": q_site_lang_entropy,
        "supplier_revenue": q_supplier_revenue,
        "term_topk": q_term_topk,
        "vocab_overlap": q_vocab_overlap,
        "web_page_text": q_web_page_text,
        "best_snippets": q_best_snippets,
        "click_attribution": q_click_attribution,
        "corpus_curation": q_corpus_curation,
        "corpus_jsd": q_corpus_jsd,
        "decontamination": q_decontamination,
        "fuzzy_terms": q_fuzzy_terms,
        "rmat_degree_histogram": q_rmat_degree_histogram,
        "tfidf_topk": q_tfidf_topk,
        "anchor_text_stats": q_anchor_text_stats,
        "bloom_blocklist": q_bloom_blocklist,
        "latest_snapshots": q_latest_snapshots,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "trending_terms": q_trending_terms,
        "warc_roundtrip": q_warc_roundtrip,
        "cm_heavy_hitters": q_cm_heavy_hitters,
        "frame_samples": q_frame_samples,
        "lpa_one_round": q_lpa_one_round,
        "mirror_sites": q_mirror_sites,
        "site_graph": q_site_graph,
        "web_boilerplate_lines": q_web_boilerplate_lines,
        "anchor_expanded_docs": q_anchor_expanded_docs,
        "benchmark_contamination": q_benchmark_contamination,
        "clustering_coeff": q_clustering_coeff,
        "inlink_diversity": q_inlink_diversity,
        "packing_report": q_packing_report,
        "repetition_stats": q_repetition_stats,
        "robots_schedule": q_robots_schedule,
        "sequence_packing": q_sequence_packing,
        "substring_dedup_stats": q_substring_dedup_stats,
        "substring_dup_spans": q_substring_dup_spans,
        "adjacency_compression": q_adjacency_compression,
        "bigram_lm": q_bigram_lm,
        "degree_assortativity": q_degree_assortativity,
        "link_delta": q_link_delta,
        "lm_quality": q_lm_quality,
        "pmi_neighbors": q_pmi_neighbors,
        "quality_classifier": q_quality_classifier,
        "table_profile": q_table_profile,
        "triangle_count": q_triangle_count,
        "warc_link_graph": q_warc_link_graph,
        "cdc_dedup": q_cdc_dedup,
        "graph_reciprocity": q_graph_reciprocity,
        "lang_link_matrix": q_lang_link_matrix,
        "link_delta_report": q_link_delta_report,
        "lm_quality_buckets": q_lm_quality_buckets,
        "partition_advisor": q_partition_advisor,
        "redirect_resolution": q_redirect_resolution,
        "web_cocitation": q_web_cocitation,
        "web_coupling": q_web_coupling,
        "corpus_diversity": q_corpus_diversity,
        "triangle_count_doulion": q_triangle_count_doulion,
        "web_line_dedup": q_web_line_dedup,
        "kneser_ney_lm": q_kneser_ney_lm,
        "powerlaw_alpha": q_powerlaw_alpha,
        "quality_correlations": q_quality_correlations,
        "bm25_topk": q_bm25_topk,
        "lang_assortativity": q_lang_assortativity,
        "training_mix_report": q_training_mix_report,
        "feature_smoothing": q_feature_smoothing,
        "k_core_3": q_k_core_3,
        "nb_lang_pred": q_nb_lang_pred,
        "rmat_skew": q_rmat_skew,
        "minhash_dedup": q_minhash_dedup,
        "top20_pagerank": q_top20_pagerank,
        "embedding_near_dup": q_embedding_near_dup,
        "pagerank_2rounds": q_pagerank_2rounds,
        "simhash_near_dup": q_simhash_near_dup,
        "ann_topk_lsh": q_ann_topk_lsh,
        "connected_components": q_connected_components,
        "kmeans_clusters": q_kmeans_clusters,
        "rich_club": q_rich_club,
        "web_walks": q_web_walks,
        "containment_pairs": q_containment_pairs,
        "bm25f_topk": q_bm25f_topk,
        "wl_classes": q_wl_classes,
        "seeded_labels": q_seeded_labels,
        "bbit_minhash_dedup": q_bbit_minhash_dedup,
        "semdedup_prune": q_semdedup_prune,
        "convergence_certificate": q_convergence_certificate,
        "minhash_dedup_groups": q_minhash_dedup_groups,
        "ppr_5rounds": q_ppr_5rounds,
        "simhash_dedup_groups": q_simhash_dedup_groups,
        "textrank_keywords": q_textrank_keywords,
        "pagerank_10rounds": q_pagerank_10rounds,
        "web_eigencentrality": q_web_eigencentrality,
        "site_pagerank": q_site_pagerank,
        "label_propagation": q_label_propagation,
        "local_community": q_local_community,
        "hits_5rounds": q_hits_5rounds,
        "hitting_times": q_hitting_times,
        "topic_pagerank": q_topic_pagerank,
        "fiedler_bisection": q_fiedler_bisection,
        "blockrank_init": q_blockrank_init,
        "k_truss_4": q_k_truss_4,
        "landmark_closeness": q_landmark_closeness,
        "web_bfs_levels": q_web_bfs_levels,
        "web_distance_histogram": q_web_distance_histogram,
        "pq_topk": q_pq_topk,
        "web_louvain": q_web_louvain,
        "pagerank_resume_4rounds": q_pagerank_resume_4rounds,
        "change_rates": q_change_rates,
        "web_scc": q_web_scc,
        "site_betweenness": q_site_betweenness,
        "hyperball_anf": q_hyperball_anf,
        "incremental_pagerank": q_incremental_pagerank,
        "web_bowtie": q_web_bowtie,
        "pagerank_converged": q_pagerank_converged,
        "diameter_bounds": q_diameter_bounds,
        "web_pagerank": q_web_pagerank,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _pagerank_rounds_sql(k: int, edges_sql: str = _EDGES_SQL) -> str:
    """Unrolled k-round reference-exact PageRank as DuckDB CTEs:
    round-1 danglingPR = 1/N quirk, frozen dangling during iteration,
    conservation-inferred dangling mass, final restore pass
    (SURVEY.md §2.3). Defines CTE `final(id, rank)`. ``edges_sql`` picks
    the edge table (default: the lineitem projection; web_pagerank
    passes the synthetic-pages link rule)."""
    # AS MATERIALIZED everywhere: DuckDB inlines CTEs by default, and an
    # unrolled iteration would re-expand each round's plan exponentially.
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "deg AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w FROM edges e JOIN deg d ON e.src = d.id)",
        "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nv) AS rank FROM deg)",
    ]
    for i in range(1, k + 1):
        mass = (
            "(1.0/(SELECT n FROM nv))"  # round-1 quirk: MetaChunk.java:20
            if i == 1
            else f"(SELECT mass FROM d{i - 1})"
        )
        parts += [
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS id, sum(r.rank*ew.w) AS contrib"
            f" FROM ew JOIN r{i - 1} r ON ew.src = r.id GROUP BY ew.dst)",
            f"r{i} AS MATERIALIZED (SELECT r{i - 1}.id,"
            f" 0.15/(SELECT n FROM nv) + 0.85*coalesce(c{i}.contrib,0)"
            f" + 0.85*{mass}/(SELECT n FROM nv) AS rank"
            f" FROM r{i - 1} LEFT JOIN c{i} ON r{i - 1}.id = c{i}.id)",
            f"d{i} AS MATERIALIZED (SELECT 1 - sum(rank) AS mass FROM r{i})",
        ]
    parts += [
        "dang AS MATERIALIZED (SELECT id FROM verts EXCEPT SELECT id FROM deg)",
        f"cr AS MATERIALIZED (SELECT ew.dst AS id, sum(r.rank*ew.w) AS contrib"
        f" FROM ew JOIN r{k} r ON ew.src = r.id"
        " WHERE ew.dst IN (SELECT id FROM dang) GROUP BY ew.dst)",
        "rd AS MATERIALIZED (SELECT dang.id,"
        " 0.15/(SELECT n FROM nv) + 0.85*coalesce(cr.contrib,0)"
        f" + 0.85*(SELECT mass FROM d{k})/(SELECT n FROM nv) AS rank"
        " FROM dang LEFT JOIN cr ON dang.id = cr.id)",
        f"final AS (SELECT id, rank FROM r{k} UNION ALL SELECT id, rank FROM rd)",
    ]
    return ",\n".join(parts) + "\n"


_PAGERANK_PRELUDE = _pagerank_rounds_sql(2)


def _hits_rounds_sql(k: int) -> str:
    """Unrolled k-round HITS (operators/hits.py semantics: L1-normalize
    after each half-step, edge multiplicity counts). Defines hs{k}
    (id, hub, auth)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "hs0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nv) AS hub,"
        " 1.0/(SELECT n FROM nv) AS auth FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS id, sum(h.hub) AS raw"
            f" FROM edges e JOIN hs{i - 1} h ON e.src = h.id GROUP BY e.dst)",
            f"an{i} AS MATERIALIZED (SELECT coalesce(nullif(sum(raw),0),1.0) AS t FROM ar{i})",
            f"a{i} AS MATERIALIZED (SELECT v.id,"
            f" coalesce(ar{i}.raw,0)/(SELECT t FROM an{i}) AS auth"
            f" FROM verts v LEFT JOIN ar{i} ON v.id = ar{i}.id)",
            f"hr{i} AS MATERIALIZED (SELECT e.src AS id, sum(a.auth) AS raw"
            f" FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY e.src)",
            f"hn{i} AS MATERIALIZED (SELECT coalesce(nullif(sum(raw),0),1.0) AS t FROM hr{i})",
            f"hs{i} AS MATERIALIZED (SELECT a{i}.id,"
            f" coalesce(hr{i}.raw,0)/(SELECT t FROM hn{i}) AS hub, a{i}.auth"
            f" FROM a{i} LEFT JOIN hr{i} ON a{i}.id = hr{i}.id)",
        ]
    return ",\n".join(parts) + "\n"


def _salsa_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled k-round SALSA (operators/salsa.py semantics: degree-
    split gathers, L1-normalize after each half-step, edge multiplicity
    counts in gathers AND degrees). Defines ss{k}(id, hub, auth)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "sod AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src)",
        "sidg AS MATERIALIZED (SELECT dst, count(*)::DOUBLE AS d FROM edges GROUP BY dst)",
        "ss0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nv) AS hub,"
        " 1.0/(SELECT n FROM nv) AS auth FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS id, sum(h.hub / o.d) AS raw"
            f" FROM edges e JOIN ss{i - 1} h ON e.src = h.id"
            f" JOIN sod o ON e.src = o.src GROUP BY e.dst)",
            f"an{i} AS MATERIALIZED (SELECT coalesce(nullif(sum(raw),0),1.0) AS t FROM ar{i})",
            f"a{i} AS MATERIALIZED (SELECT v.id,"
            f" coalesce(ar{i}.raw,0)/(SELECT t FROM an{i}) AS auth"
            f" FROM verts v LEFT JOIN ar{i} ON v.id = ar{i}.id)",
            f"hr{i} AS MATERIALIZED (SELECT e.src AS id, sum(a.auth / g.d) AS raw"
            f" FROM edges e JOIN a{i} a ON e.dst = a.id"
            f" JOIN sidg g ON e.dst = g.dst GROUP BY e.src)",
            f"hn{i} AS MATERIALIZED (SELECT coalesce(nullif(sum(raw),0),1.0) AS t FROM hr{i})",
            f"ss{i} AS MATERIALIZED (SELECT a{i}.id,"
            f" coalesce(hr{i}.raw,0)/(SELECT t FROM hn{i}) AS hub, a{i}.auth"
            f" FROM a{i} LEFT JOIN hr{i} ON a{i}.id = hr{i}.id)",
        ]
    return ",\n".join(parts) + "\n"


def _site_betweenness_sql(depth: int = 6) -> str:
    """Unrolled Brandes over the distinct site graph (operators/
    betweenness.py semantics): forward BFS levels v0..v{depth} carrying
    shortest-path counts (sigma), then backward dependency CTEs
    d{depth}..d0 via a correlated successor sum. Pivots = 4 highest-
    out-degree sites (distinct successors, ties min id). Unrolled
    levels past the true depth are empty and contribute nothing."""
    site_edges = _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
    parts = [
        f"WITH sedge AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({site_edges}))",
        "sverts AS MATERIALIZED (SELECT src AS id FROM sedge UNION SELECT dst FROM sedge)",
        "piv AS MATERIALIZED (SELECT src AS s FROM sedge GROUP BY src"
        " ORDER BY count(DISTINCT dst) DESC, src ASC LIMIT 4)",
        "v0 AS MATERIALIZED (SELECT s, s AS v, 1.0 AS sigma FROM piv)",
        "vis0 AS MATERIALIZED (SELECT * FROM v0)",
    ]
    for l in range(1, depth + 1):
        parts += [
            f"v{l} AS MATERIALIZED (SELECT p.s, e.dst AS v, sum(p.sigma) AS sigma"
            f" FROM v{l - 1} p JOIN sedge e ON p.v = e.src"
            f" WHERE NOT EXISTS (SELECT 1 FROM vis{l - 1} x"
            f" WHERE x.s = p.s AND x.v = e.dst) GROUP BY p.s, e.dst)",
            f"vis{l} AS MATERIALIZED (SELECT * FROM vis{l - 1}"
            f" UNION ALL SELECT * FROM v{l})",
        ]
    parts.append(
        f"d{depth} AS MATERIALIZED (SELECT s, v, 0.0 AS delta FROM v{depth})"
    )
    for l in range(depth - 1, -1, -1):
        parts.append(
            f"d{l} AS MATERIALIZED (SELECT a.s, a.v, coalesce("
            f"(SELECT sum(a.sigma / w.sigma * (1 + dw.delta))"
            f" FROM sedge e JOIN v{l + 1} w ON w.s = a.s AND w.v = e.dst"
            f" JOIN d{l + 1} dw ON dw.s = w.s AND dw.v = w.v"
            f" WHERE e.src = a.v), 0) AS delta FROM v{l} a)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM d{i}" for i in range(depth + 1))
    parts.append(f"alld AS ({union})")
    return (
        ",\n".join(parts)
        + "\nSELECT sv.id, round(coalesce(bc.b, 0), 6) AS betweenness"
        " FROM sverts sv LEFT JOIN (SELECT v, sum(delta) AS b FROM alld"
        " WHERE v <> s GROUP BY v) bc ON sv.id = bc.v"
    )


def _site_sssp_sql(rounds: int = 20) -> str:
    """Unrolled multi-source Bellman-Ford on the weighted site graph
    (operators/sssp.py semantics, cost = 1/weight): d{r}(s, v) = min
    cost over paths of <= r edges; with non-negative costs the fixpoint
    is reached within the longest simple path, so extra unrolled rounds
    are idempotent. Path costs accumulate strictly in path order in
    both engines, so the min is value-exact."""
    site_edges = _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
    parts = [
        f"WITH sedge AS MATERIALIZED ({site_edges})",
        "piv AS MATERIALIZED (SELECT src AS s FROM sedge GROUP BY src"
        " ORDER BY count(DISTINCT dst) DESC, src ASC LIMIT 4)",
        "d0 AS MATERIALIZED (SELECT s, s AS v, 0.0 AS dist FROM piv)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT s, v, min(dist) AS dist FROM ("
            f" SELECT * FROM d{r - 1}"
            f" UNION ALL SELECT d.s, e.dst AS v, d.dist + 1.0 / e.weight"
            f" FROM d{r - 1} d JOIN sedge e ON d.v = e.src) t"
            f" GROUP BY s, v)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT s, v AS id, round(dist, 6) AS dist FROM d{rounds}"
    )


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peeling (operators/kcore.py semantics:
    symmetrized simple graph). The engine peels to a fixpoint; extra
    unrolled rounds are idempotent, so `rounds` only needs to exceed
    the peeling depth. Defines `core(id, degree)`."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst, src FROM edges) t WHERE u <> v)",
        f"al0 AS MATERIALIZED (SELECT u AS id FROM sym GROUP BY u"
        f" HAVING count(*) >= {k})",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"al{i} AS MATERIALIZED (SELECT s.u AS id FROM sym s"
            f" WHERE s.u IN (SELECT id FROM al{i - 1})"
            f" AND s.v IN (SELECT id FROM al{i - 1})"
            f" GROUP BY s.u HAVING count(*) >= {k})"
        )
    parts.append(
        f"core AS (SELECT s.u AS id, count(*) AS degree FROM sym s"
        f" WHERE s.u IN (SELECT id FROM al{rounds})"
        f" AND s.v IN (SELECT id FROM al{rounds}) GROUP BY s.u)"
    )
    return ",\n".join(parts) + "\n"


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peeling (operators/ktruss.py semantics:
    undirected simple graph, support = triangles per edge in the
    surviving subgraph, keep support >= k-2). Triangle enumeration
    here orders vertices numerically (a < b < c) — the triangle SET
    (and hence per-edge support) is identical to the engine's
    (deg,id)-oriented enumeration. Extra rounds past the fixpoint are
    idempotent. Defines e{rounds}(u, v)."""
    need = k - 2
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL})",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,"
        " greatest(src, dst) AS v FROM edges WHERE src <> dst)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"tri{i} AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c"
            f" FROM e{p} e1 JOIN e{p} e2 ON e1.v = e2.u AND e1.u < e2.v"
            f" JOIN e{p} e3 ON e3.u = e1.u AND e3.v = e2.v)"
        )
        parts.append(
            f"sup{i} AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM ("
            f"SELECT a AS u, b AS v FROM tri{i}"
            f" UNION ALL SELECT a, c FROM tri{i}"
            f" UNION ALL SELECT b, c FROM tri{i}) t GROUP BY u, v)"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.u, e.v FROM e{p} e"
            f" LEFT JOIN sup{i} s USING (u, v)"
            f" WHERE coalesce(s.sup, 0) >= {need})"
        )
    return ",\n".join(parts) + "\n"


def _ppr_rounds_sql(k: int) -> str:
    """Unrolled k-round personalized PageRank (operators/ppr.py
    semantics: teleport + dangling mass to the seed set = top-3
    out-degree, ties by min id). Defines p{k}(id, rank)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "deg AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w"
        " FROM edges e JOIN deg d ON e.src = d.id)",
        "seeds AS MATERIALIZED (SELECT src AS id FROM edges GROUP BY src"
        " ORDER BY count(*) DESC, src ASC LIMIT 3)",
        "sv AS MATERIALIZED (SELECT v.id,"
        " CASE WHEN v.id IN (SELECT id FROM seeds) THEN 1.0/3 ELSE 0.0 END AS s,"
        " (d.id IS NULL) AS dang FROM verts v LEFT JOIN deg d ON v.id = d.id)",
        "p0 AS MATERIALIZED (SELECT id, s AS rank FROM sv)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"m{i} AS MATERIALIZED (SELECT coalesce(sum(p.rank),0) AS m"
            f" FROM p{i - 1} p JOIN sv ON p.id = sv.id WHERE sv.dang)",
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS id, sum(p.rank*ew.w) AS contrib"
            f" FROM ew JOIN p{i - 1} p ON ew.src = p.id GROUP BY ew.dst)",
            f"p{i} AS MATERIALIZED (SELECT sv.id,"
            f" (1.0-0.85)*sv.s + 0.85*(coalesce(c{i}.contrib,0)"
            f" + (SELECT m FROM m{i})*sv.s) AS rank"
            f" FROM sv LEFT JOIN c{i} ON sv.id = c{i}.id)",
        ]
    return ",\n".join(parts) + "\n"


def _boruvka_sql(outer: int, inner: int, edges_sql: str) -> str:
    """Unrolled Boruvka MSF (operators/mst.py): per outer round the
    per-component argmin edge under (w, a, b), then a fixed-depth
    min-label propagation contracts the choice graph (depth >= its
    diameter; extra rounds are identity). Rounds past forest completion
    are identity too, so generous outer/inner bounds are safe."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "can AS MATERIALIZED (SELECT least(src, dst) AS a,"
        " greatest(src, dst) AS b, min(weight::DOUBLE) AS w"
        " FROM e WHERE src <> dst GROUP BY 1, 2)",
        "mverts AS MATERIALIZED (SELECT a AS id FROM can"
        " UNION SELECT b FROM can)",
        "g0 AS MATERIALIZED (SELECT id, id AS c FROM mverts)",
    ]
    for r in range(1, outer + 1):
        parts += [
            f"live{r} AS MATERIALIZED (SELECT can.a, can.b, can.w,"
            f" ga.c AS cu, gb.c AS cv FROM can"
            f" JOIN g{r - 1} ga ON can.a = ga.id"
            f" JOIN g{r - 1} gb ON can.b = gb.id WHERE ga.c <> gb.c)",
            f"ch{r} AS MATERIALIZED (SELECT DISTINCT a, b, w FROM ("
            f" SELECT comp, w, a, b, row_number() OVER ("
            f" PARTITION BY comp ORDER BY w, a, b) AS rn FROM ("
            f" SELECT cu AS comp, w, a, b FROM live{r}"
            f" UNION ALL SELECT cv, w, a, b FROM live{r}) h) t"
            f" WHERE rn = 1)",
            f"cgs{r} AS MATERIALIZED (SELECT x, y FROM ("
            f" SELECT ga.c AS x, gb.c AS y FROM ch{r} ch"
            f" JOIN g{r - 1} ga ON ch.a = ga.id"
            f" JOIN g{r - 1} gb ON ch.b = gb.id"
            f" UNION ALL"
            f" SELECT gb.c, ga.c FROM ch{r} ch"
            f" JOIN g{r - 1} ga ON ch.a = ga.id"
            f" JOIN g{r - 1} gb ON ch.b = gb.id) u GROUP BY x, y)",
            f"l{r}_0 AS MATERIALIZED (SELECT x AS c, x AS m FROM ("
            f" SELECT x FROM cgs{r} UNION SELECT y FROM cgs{r}) n)",
        ]
        for t in range(1, inner + 1):
            parts.append(
                f"l{r}_{t} AS MATERIALIZED (SELECT l.c,"
                f" least(l.m, coalesce(nm.m, l.m)) AS m"
                f" FROM l{r}_{t - 1} l LEFT JOIN ("
                f" SELECT s.x AS c, min(l2.m) AS m FROM cgs{r} s"
                f" JOIN l{r}_{t - 1} l2 ON s.y = l2.c GROUP BY s.x) nm"
                f" ON nm.c = l.c)"
            )
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT g.id, coalesce(l.m, g.c) AS c"
            f" FROM g{r - 1} g LEFT JOIN l{r}_{inner} l ON g.c = l.c)"
        )
    forest = " UNION ALL ".join(
        f"SELECT a, b, w AS weight FROM ch{r}" for r in range(1, outer + 1)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM ({forest}) f"


def _core_numbers_sql(kmax: int, depth: int, edges_sql: str) -> str:
    """Unrolled k-shell decomposition (operators/kcore.py
    core_numbers): for each k = 1..kmax, ``depth`` peel rounds (deg < k
    removal) starting from the previous core's survivors — peel rounds
    past the fixpoint are identity, so generous depth is safe; vertices
    dropped between consecutive cores get coreness k-1."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM e"
        " UNION SELECT dst FROM e)",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM e "
        "UNION ALL SELECT dst AS u, src AS v FROM e) t WHERE u <> v)",
        "a0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym)",
    ]
    for k in range(1, kmax + 1):
        prev = f"a{k - 1}"
        for t in range(1, depth + 1):
            cur = f"c{k}_{t}"
            parts.append(
                f"{cur} AS MATERIALIZED (SELECT s.u AS id FROM sym s"
                f" JOIN {prev} x ON s.u = x.id"
                f" JOIN {prev} y ON s.v = y.id"
                f" GROUP BY s.u HAVING count(*) >= {k})"
            )
            prev = cur
        parts += [
            f"a{k} AS MATERIALIZED (SELECT id FROM {prev})",
            f"d{k} AS MATERIALIZED (SELECT id, {k - 1} AS coreness"
            f" FROM a{k - 1} WHERE id NOT IN (SELECT id FROM a{k}))",
        ]
    shells = " UNION ALL ".join(f"SELECT * FROM d{k}" for k in range(1, kmax + 1))
    return (
        ",\n".join(parts)
        + f""",
    shells AS ({shells})
    SELECT verts.id, coalesce(shells.coreness, 0) AS coreness
    FROM verts LEFT JOIN shells ON verts.id = shells.id"""
    )


def _topicrank_rounds_sql(k: int) -> str:
    """Unrolled k-round topic-sensitive PageRank
    (operators/topicrank.py semantics; topics = doc_id % 50 residues
    0/1/2, s = 1/|S_t|, per-topic dangling mass)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_WEB_EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges"
        " UNION SELECT dst FROM edges)",
        "deg AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg"
        " FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w"
        " FROM edges e JOIN deg d ON e.src = d.id)",
        "seeds AS MATERIALIZED ("
        " SELECT 't0' AS topic, doc_id AS id FROM documents WHERE doc_id % 50 = 0"
        " UNION ALL SELECT 't1', doc_id FROM documents WHERE doc_id % 50 = 1"
        " UNION ALL SELECT 't2', doc_id FROM documents WHERE doc_id % 50 = 2)",
        "scount AS MATERIALIZED (SELECT topic, count(*) AS c FROM seeds"
        " GROUP BY topic)",
        "sv AS MATERIALIZED (SELECT sc.topic, v.id,"
        " CASE WHEN s.id IS NOT NULL THEN 1.0/sc.c ELSE 0.0 END AS s,"
        " (d.id IS NULL) AS dang"
        " FROM scount sc CROSS JOIN verts v"
        " LEFT JOIN seeds s ON s.topic = sc.topic AND s.id = v.id"
        " LEFT JOIN deg d ON v.id = d.id)",
        "p0 AS MATERIALIZED (SELECT topic, id, s AS rank FROM sv)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"m{i} AS MATERIALIZED (SELECT sv.topic,"
            f" coalesce(sum(p.rank), 0) AS m FROM sv"
            f" LEFT JOIN p{i - 1} p ON p.topic = sv.topic AND p.id = sv.id"
            f" WHERE sv.dang GROUP BY sv.topic)",
            f"c{i} AS MATERIALIZED (SELECT p.topic, ew.dst AS id,"
            f" sum(p.rank * ew.w) AS contrib"
            f" FROM ew JOIN p{i - 1} p ON ew.src = p.id"
            f" GROUP BY p.topic, ew.dst)",
            f"p{i} AS MATERIALIZED (SELECT sv.topic, sv.id,"
            f" (1.0-0.85)*sv.s + 0.85*(coalesce(c.contrib, 0)"
            f" + coalesce(m.m, 0)*sv.s) AS rank"
            f" FROM sv LEFT JOIN c{i} c"
            f" ON c.topic = sv.topic AND c.id = sv.id"
            f" LEFT JOIN m{i} m ON m.topic = sv.topic)",
        ]
    return (
        ",\n".join(parts)
        + f"\nSELECT topic, id, round(rank, 6) AS rank FROM p{k}"
    )


def _lpa_rounds_sql(k: int) -> str:
    """Unrolled k-round deterministic synchronous LPA (same semantics as
    operators.labelprop: adopt most frequent neighbor label, tie-break
    min label, isolated vertices keep their own). Running the full k
    rounds equals early-stop-at-fixpoint because the round map is
    identity at a fixpoint."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst AS u, src AS v FROM edges) t WHERE u <> v)",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"c{i} AS MATERIALIZED (SELECT s.v AS vid, l.label, count(*) AS cnt"
            f" FROM sym s JOIN l{i - 1} l ON s.u = l.id GROUP BY 1, 2)",
            f"b{i} AS MATERIALIZED (SELECT vid, label AS new_label FROM ("
            f"SELECT vid, label, row_number() OVER (PARTITION BY vid"
            f" ORDER BY cnt DESC, label ASC) AS rn FROM c{i}) t WHERE rn = 1)",
            f"l{i} AS MATERIALIZED (SELECT l.id,"
            f" coalesce(b.new_label, l.label) AS label"
            f" FROM l{i - 1} l LEFT JOIN b{i} b ON l.id = b.vid)",
        ]
    return ",\n".join(parts) + f"\nSELECT id, label FROM l{k}"


def _fnv32_fold_sql(offset: int) -> str:
    """DuckDB FNV-1a-32 left fold over a token's characters — exact
    replica of functions.dedup.fnv1a32_col (the prepended offset is the
    fold's initial accumulator)."""
    return (
        f"list_reduce(list_prepend({offset}::BIGINT, "
        "list_transform(split(tok, ''), c -> ord(c)::BIGINT)), "
        "(a, b) -> (xor(a, b) * 16777619) % 4294967296)"
    )


def _simhash_sigs_ctes() -> str:
    """Shared CTE chain computing exact per-doc SimHash signatures in
    SQL (FNV-1a-32 token-hash pair, identical to the engine's JVM fold).
    Defines CTE ``sigs(doc_id, simhash)``."""
    pow2 = ",".join(f"({j}, {1 << j}::HUGEINT)" for j in range(64))
    return f"""toks AS MATERIALIZED (
          SELECT doc_id, unnest(list_filter(string_split_regex(
              regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +'),
              x -> x <> '')) AS tok
          FROM documents),
        h AS MATERIALIZED (
          SELECT doc_id,
                 {_fnv32_fold_sql(2166136261)} AS h_lo,
                 {_fnv32_fold_sql(0xCBF29CE4)} AS h_hi
          FROM toks),
        bits AS MATERIALIZED (
          SELECT doc_id, jj.j,
                 sum(CASE WHEN ((CASE WHEN jj.j >= 32 THEN h_hi ELSE h_lo END
                                 >> (jj.j % 32)) & 1) = 1
                          THEN 1 ELSE -1 END) AS s
          FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj
          GROUP BY doc_id, jj.j),
        sigs AS MATERIALIZED (
          SELECT doc_id,
                 (CASE WHEN u >= 9223372036854775808::HUGEINT
                       THEN u - 18446744073709551616::HUGEINT
                       ELSE u END)::BIGINT AS simhash
          FROM (SELECT doc_id,
                       sum(CASE WHEN s > 0 THEN p.v ELSE 0::HUGEINT END) AS u
                FROM bits
                JOIN (SELECT * FROM (VALUES {pow2}) AS t(j, v)) p
                  ON p.j = bits.j
                GROUP BY doc_id) t)"""


def _simhash_near_dup_sql(max_hamming: int = 3) -> str:
    """Exact SQL oracle for the full SimHash pipeline: per-doc 64-bit
    signature from the same FNV-1a-32 token-hash pair the engine folds
    JVM-side, then ALL-PAIRS popcount(xor) <= max_hamming.  The engine's
    16-bit-block candidate join is pigeonhole-exhaustive for
    hamming <= 3, so its output must equal this exact set — the oracle
    therefore checks both the hash math and the blocking recall."""
    return f"""
        WITH {_simhash_sigs_ctes()}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _simhash_groups_sql(max_hamming: int = 3) -> str:
    """Oracle for simhash_dedup_groups: connected components (recursive
    min-label) over the exact all-pairs hamming <= k graph, every doc a
    vertex, group = component min."""
    return f"""
        WITH RECURSIVE {_simhash_sigs_ctes()},
        sym AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM sigs a JOIN sigs b ON a.doc_id <> b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}),
        verts AS (SELECT doc_id AS id FROM documents),
        r(id, label) AS (
          SELECT id, id FROM verts
          UNION
          SELECT e.v, r.label FROM r JOIN sym e ON e.u = r.id
          WHERE r.label < e.v)
        SELECT id AS doc_id, min(label) AS group_id FROM r GROUP BY id
    """


_MINHASH_GROUPS_SQL = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(
                 regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                 ' +'), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
                 list_distinct(list_transform(range(1, len(t) - 1),
                     i -> array_to_string(t[i:i+2], ' ')))
             ELSE [array_to_string(t, ' ')] END AS g
      FROM toks),
    ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
    sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    verts AS (SELECT doc_id AS id FROM documents),
    r(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.v, r.label FROM r JOIN sym e ON e.u = r.id
      WHERE r.label < e.v)
    SELECT id AS doc_id, min(label) AS group_id FROM r GROUP BY id
"""


# The synthetic-pages link rule in closed form (sources/pages_synth.py):
# page i links to (i+1)%N and (3i+7)%N, duplicates the first link when
# i%3==0, and pages with i%10==0 are dangling. The engine derives this
# multiset by PARSING the generated html; the oracle states it directly.
def _simrank_rounds_sql(rounds: int, c: float, edges_sql: str) -> str:
    """Truncated SimRank unrolled as chained CTEs: s0 = identity, each
    round steps every pair one in-edge per side and renormalises by the
    in-degree product (operators/simrank.py, same fold order irrelevant
    at 6-dp rounding)."""
    prelude = f"""
        WITH e AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM ({edges_sql}) se),
        ine AS (SELECT dst AS node, src AS nbr FROM e),
        deg AS (SELECT node, count(*) AS d FROM ine GROUP BY node),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        s0 AS (SELECT id AS a, id AS b, 1.0::DOUBLE AS score FROM nodes)
    """
    for k in range(1, rounds + 1):
        prelude += f""",
        s{k} AS (
            SELECT ia.node AS a, jb.node AS b,
                   {c} * sum(p.score) / (max(da.d) * max(db.d)) AS score
            FROM s{k - 1} p
            JOIN ine ia ON ia.nbr = p.a
            JOIN ine jb ON jb.nbr = p.b
            JOIN deg da ON da.node = ia.node
            JOIN deg db ON db.node = jb.node
            WHERE ia.node <> jb.node
            GROUP BY ia.node, jb.node
            UNION ALL
            SELECT id, id, 1.0 FROM nodes)
        """
    return prelude + f"""
        SELECT a, b, round(score, 6) AS score FROM s{rounds}
        WHERE a < b AND score > 0
    """


# closed-form rebuild of pages_synth.synth_pages html for page doc_id
# (sources/pages_synth.py docstring has the link rule); ASCII-only, so
# md5/octet_length over encode() match Spark's binary html column
_SYNTH_HTML_SQL = """
    '<html><head><title>Doc ' || doc_id
    || '</title><script>var x = "not text";</script></head>'
    || '<body><p>Synthetic page ' || doc_id || ' of '
    || (SELECT count(*) FROM documents) || '.</p>'
    || CASE WHEN doc_id % 10 = 0 THEN '' ELSE
         '<a href="/doc/' || ((doc_id + 1) % (SELECT count(*) FROM documents))
         || '">next</a><a href="https://example.org/doc/'
         || ((3 * doc_id + 7) % (SELECT count(*) FROM documents))
         || '#s">rel</a>'
         || CASE WHEN doc_id % 3 = 0 THEN
              '<a href="/doc/'
              || ((doc_id + 1) % (SELECT count(*) FROM documents))
              || '">again</a>' ELSE '' END
       END
    || '<a href="mailto:crawl@example.org">mail</a></body></html>'
"""

_WEB_EDGES_SQL = """
    SELECT doc_id AS src,
           (doc_id + 1) % (SELECT count(*) FROM documents) AS dst
    FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT doc_id, (3 * doc_id + 7) % (SELECT count(*) FROM documents)
    FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT doc_id, (doc_id + 1) % (SELECT count(*) FROM documents)
    FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 3 = 0
"""

# (target, anchor_text) multiset in closed form: arm 1 carries text
# 'next', arm 2 'rel', the i%3==0 duplicate 'again'; the mailto anchor
# is scheme-filtered out before any aggregation.
_ANCHOR_TEXT_SQL = """
    WITH pairs AS (
        SELECT (doc_id + 1) % (SELECT count(*) FROM documents) AS dst,
               'next' AS text
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT (3 * doc_id + 7) % (SELECT count(*) FROM documents), 'rel'
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT (doc_id + 1) % (SELECT count(*) FROM documents), 'again'
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 3 = 0
    )
    SELECT 'https://example.org/doc/' || dst AS url,
           count(*) AS n_anchors,
           array_to_string(list_sort(list_distinct(list(text))), '|') AS texts
    FROM pairs GROUP BY dst
"""

# Site rollup of the web edge multiset: block of 25 ids = one site,
# self-loops dropped, multiplicity -> weight (operators/sitegraph.py).
_SITE_EDGES_SQL = """
    SELECT src // 25 AS src, dst // 25 AS dst, count(*)::DOUBLE AS weight
    FROM ({web_edges}) pages_e
    WHERE src // 25 <> dst // 25
    GROUP BY 1, 2
"""

_SITE_VERTS_SQL = "SELECT DISTINCT doc_id // 25 AS id FROM documents"

# SCC oracle: mutual-reachability from the recursive-CTE transitive
# closure of the page graph; scc(v) = min id mutually reachable with v
# (self included). The bowtie oracle extends it with the largest-SCC
# core (ties -> min scc id) and forward/backward closure membership.
_SCC_CLOSURE_SQL = """
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    r AS (
        SELECT src AS u, dst AS v FROM e
        UNION
        SELECT r.u, e.dst FROM r JOIN e ON r.v = e.src),
    m AS (SELECT a.u AS x, min(a.v) AS mn
          FROM r a JOIN r b ON a.u = b.v AND a.v = b.u
          GROUP BY a.u),
    sccs AS (
        SELECT d.doc_id AS id,
               least(d.doc_id, coalesce(m.mn, d.doc_id)) AS scc
        FROM documents d LEFT JOIN m ON d.doc_id = m.x)
"""

_SCC_SQL = _SCC_CLOSURE_SQL + "SELECT id, scc FROM sccs"

# Condensation oracle: contract edges through the SCC labels, then
# level(c) = longest walk length ending at c in the component DAG
# (recursive walk CTE terminates because the condensation is acyclic).
_CONDENSATION_SQL = _SCC_CLOSURE_SQL + """,
    ce AS MATERIALIZED (
        SELECT DISTINCT sa.scc AS src, sb.scc AS dst
        FROM e JOIN sccs sa ON e.src = sa.id
               JOIN sccs sb ON e.dst = sb.id
        WHERE sa.scc <> sb.scc),
    walk AS (
        SELECT src, dst, 1 AS len FROM ce
        UNION
        SELECT w.src, c.dst, w.len + 1 FROM walk w JOIN ce c ON w.dst = c.src),
    comp AS (SELECT scc, count(*) AS size FROM sccs GROUP BY scc),
    lvl AS (
        SELECT comp.scc, coalesce(max(w.len), 0) AS level
        FROM comp LEFT JOIN walk w ON w.dst = comp.scc
        GROUP BY comp.scc)
    SELECT lvl.scc, lvl.level, comp.size
    FROM lvl JOIN comp USING (scc)
"""

_BOWTIE_SQL = _SCC_CLOSURE_SQL + """,
    core AS (SELECT scc AS cid FROM sccs
             GROUP BY scc ORDER BY count(*) DESC, scc LIMIT 1),
    fwd AS (SELECT DISTINCT r.v AS id
            FROM r JOIN sccs s ON r.u = s.id JOIN core ON s.scc = core.cid),
    bwd AS (SELECT DISTINCT r.u AS id
            FROM r JOIN sccs s ON r.v = s.id JOIN core ON s.scc = core.cid)
    SELECT s.id,
           CASE WHEN s.scc = (SELECT cid FROM core) THEN 'core'
                WHEN s.id IN (SELECT id FROM bwd) THEN 'in'
                WHEN s.id IN (SELECT id FROM fwd) THEN 'out'
                ELSE 'other' END AS cls
    FROM sccs s
"""

# BFS: recursive min-distance closure, identical seed rule and depth
# cap as operators/bfs.py (UNION dedups (id, dist) states, so the
# recursion is bounded by N x max_depth).
_LANDMARK_SQL = """
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT u, v FROM (
            SELECT src AS u, dst AS v FROM ({web_edges}) w1
            UNION ALL
            SELECT dst AS u, src AS v FROM ({web_edges}) w2) t
        WHERE u <> v),
    deg AS (SELECT u AS id, count(*) AS d FROM e GROUP BY u),
    lm AS MATERIALIZED (
        SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 4),
    lvl AS (
        SELECT id AS l, id, 0 AS dist FROM lm
        UNION
        SELECT lvl.l, e.v, lvl.dist + 1
        FROM lvl JOIN e ON lvl.id = e.u WHERE lvl.dist < 12),
    d AS MATERIALIZED (
        SELECT l, id, min(dist) AS dist FROM lvl GROUP BY l, id),
    q AS (
        SELECT doc_id AS u, lead(doc_id) OVER (ORDER BY doc_id) AS v
        FROM documents WHERE doc_id % 97 = 1)
    SELECT q.u, q.v,
           max(abs(du.dist - dv.dist))::BIGINT AS d_lower,
           min(du.dist + dv.dist)::BIGINT AS d_upper,
           count(*)::BIGINT AS n_landmarks
    FROM q
    JOIN d du ON du.id = q.u
    JOIN d dv ON dv.l = du.l AND dv.id = q.v
    WHERE q.v IS NOT NULL
    GROUP BY q.u, q.v
"""

# landmark_closeness: the _LANDMARK_SQL prefix (same landmark rule,
# same recursive BFS closure incl. the 0-distance self-rows), then the
# per-vertex aggregate with the one division at output.
_LANDMARK_CLOSENESS_SQL = """
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT u, v FROM (
            SELECT src AS u, dst AS v FROM ({web_edges}) w1
            UNION ALL
            SELECT dst AS u, src AS v FROM ({web_edges}) w2) t
        WHERE u <> v),
    deg AS (SELECT u AS id, count(*) AS d FROM e GROUP BY u),
    lm AS MATERIALIZED (
        SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 4),
    lvl AS (
        SELECT id AS l, id, 0 AS dist FROM lm
        UNION
        SELECT lvl.l, e.v, lvl.dist + 1
        FROM lvl JOIN e ON lvl.id = e.u WHERE lvl.dist < 12),
    d AS MATERIALIZED (
        SELECT l, id, min(dist) AS dist FROM lvl GROUP BY l, id)
    SELECT id, count(*)::BIGINT AS n_landmarks,
           sum(dist)::BIGINT AS dist_sum,
           CASE WHEN sum(dist) > 0 THEN
               round(count(*)::DOUBLE / sum(dist)::DOUBLE, 6)
           END AS closeness
    FROM d GROUP BY id
"""

_MIRROR_SQL = """
    WITH sig AS MATERIALIZED (
        SELECT DISTINCT doc_id // 25 AS site,
               md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
        FROM documents),
    sizes AS (SELECT site, count(*)::BIGINT AS size FROM sig GROUP BY site),
    rare AS (
        SELECT s.site, s.fp FROM sig s
        JOIN (SELECT fp FROM sig GROUP BY fp HAVING count(*) <= 16) r
        USING (fp)),
    p AS (
        SELECT a.site AS site_a, b.site AS site_b,
               count(*)::BIGINT AS n_common
        FROM rare a JOIN rare b ON a.fp = b.fp AND a.site < b.site
        GROUP BY 1, 2 HAVING count(*) >= 1)
    SELECT p.site_a, p.site_b, p.n_common,
           sa.size AS size_a, sb.size AS size_b,
           p.n_common::DOUBLE / (sa.size + sb.size - p.n_common)
               AS resemblance
    FROM p
    JOIN sizes sa ON sa.site = p.site_a
    JOIN sizes sb ON sb.site = p.site_b
"""

_BFS_SQL = """
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    lvl AS (
        SELECT doc_id AS id, 0 AS dist FROM documents WHERE doc_id % 100 = 1
        UNION
        SELECT e.dst, lvl.dist + 1 FROM lvl JOIN e ON lvl.id = e.src
        WHERE lvl.dist < 12)
    SELECT id, min(dist) AS dist FROM lvl GROUP BY id
"""

# Co-citation / coupling: same capped distinct-edge self-join on the
# shared endpoint as operators/cocitation.py (pair order a < b; shared
# endpoints of degree > {cap} dropped before pairing, mirroring the
# engine's max_degree semi-join).
_COCITATION_SQL = """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    keep AS (SELECT src FROM e0 GROUP BY src HAVING count(*) <= {cap}),
    e AS MATERIALIZED (
        SELECT e0.src, e0.dst FROM e0 JOIN keep USING (src))
    SELECT x.dst AS a, y.dst AS b, count(*) AS n_common
    FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
    GROUP BY 1, 2
"""

_COUPLING_SQL = """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    keep AS (SELECT dst FROM e0 GROUP BY dst HAVING count(*) <= {cap}),
    e AS MATERIALIZED (
        SELECT e0.src, e0.dst FROM e0 JOIN keep USING (dst))
    SELECT x.src AS a, y.src AS b, count(*) AS n_common
    FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
    GROUP BY 1, 2
"""


# Global concat-and-chop token spans (functions/packing.py): the
# one-window cumsum the distributed two-pass prefix sum must equal.
_PACKING_SPANS_SQL = r"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id AS id,
               len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        FROM documents),
    spans AS MATERIALIZED (
        SELECT id, n_tokens,
               (sum(n_tokens) OVER (ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens)::BIGINT AS start_offset
        FROM toks)
"""


def _dsir_sample_sql(k: int, n_buckets: int, target_pred: str) -> str:
    """Replica of functions/dsir.py: hashed uni+bigram bucket models
    (FNV-1a-32 % B over the [a-z0-9] tokenization), add-1 smoothing,
    per-doc log importance weight, Gumbel top-k via the Knuth hash."""
    B = int(n_buckets)
    fnv = _fnv32_fold_sql(2166136261)
    return f"""
    WITH tl AS MATERIALIZED (
        SELECT doc_id AS id,
               list_filter(
                   string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' +'),
                   x -> x <> '') AS l
        FROM documents),
    feats AS MATERIALIZED (
        SELECT id,
               unnest(l || CASE WHEN len(l) >= 2 THEN
                      list_transform(range(1, len(l)),
                                     i -> l[i] || ' ' || l[i+1])
                      ELSE [] END) AS tok
        FROM tl),
    b AS MATERIALIZED (
        SELECT id, {fnv} % {B} AS bucket FROM feats),
    pc AS MATERIALIZED (
        SELECT id, bucket, count(*) AS n FROM b GROUP BY id, bucket),
    src AS (SELECT bucket, sum(n) AS c_src FROM pc GROUP BY bucket),
    tgt AS (SELECT bucket, sum(n) AS c_tgt
            FROM pc JOIN documents d ON pc.id = d.doc_id
            WHERE {target_pred} GROUP BY bucket),
    tot AS (SELECT (SELECT sum(c_src) FROM src)::DOUBLE AS ts,
                   coalesce((SELECT sum(c_tgt) FROM tgt), 0)::DOUBLE AS tt),
    ratio AS (SELECT src.bucket,
                     ln((coalesce(c_tgt, 0) + 1.0) / (tt + {B}))
                     - ln((c_src + 1.0) / (ts + {B})) AS log_ratio
              FROM src LEFT JOIN tgt USING (bucket), tot),
    lw AS (SELECT pc.id, sum(n)::BIGINT AS n_feats,
                  sum(n * log_ratio) AS log_w
           FROM pc JOIN ratio USING (bucket) GROUP BY pc.id),
    fulls AS (SELECT d.doc_id AS id,
                     coalesce(lw.n_feats, 0) AS n_feats,
                     coalesce(lw.log_w, 0.0) AS log_w
              FROM documents d LEFT JOIN lw ON d.doc_id = lw.id),
    scored AS (SELECT id, n_feats, log_w,
                      log_w - ln(-ln(
                          (((id % 2147483648) * 2654435761)
                               % 4294967296 + 0.5) / 4294967296.0))
                          AS score
               FROM fulls)
    SELECT id, n_feats, round(log_w, 6) AS log_w, round(score, 6) AS score
    FROM scored ORDER BY score DESC, id LIMIT {int(k)}
    """


def _quality_clf_sql(n_buckets: int, bias: float, salt: int) -> str:
    """Replica of functions/qualityclf.py: hashed uni+bigram features
    (same FNV-1a-32 % B front end as DSIR), Knuth stand-in weight
    table, per-doc mean-weight score, sigmoid, keep = score >= 0
    (decided on the unrounded score, as the engine does)."""
    B = int(n_buckets)
    fnv = _fnv32_fold_sql(2166136261)
    return f"""
    WITH tl AS MATERIALIZED (
        SELECT doc_id AS id,
               list_filter(
                   string_split_regex(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' +'),
                   x -> x <> '') AS l
        FROM documents),
    feats AS MATERIALIZED (
        SELECT id,
               unnest(l || CASE WHEN len(l) >= 2 THEN
                      list_transform(range(1, len(l)),
                                     i -> l[i] || ' ' || l[i+1])
                      ELSE [] END) AS tok
        FROM tl),
    b AS MATERIALIZED (
        SELECT id, {fnv} % {B} AS bucket FROM feats),
    pc AS MATERIALIZED (
        SELECT id, bucket, count(*) AS n FROM b GROUP BY id, bucket),
    w AS (SELECT bucket,
                 (((bucket + {salt}) % 2147483648) * 2654435761)
                     % 4294967296 / 4294967296.0 - 0.5 AS weight
          FROM (SELECT unnest(range(0, {B})) AS bucket)),
    sc AS (SELECT pc.id, sum(n)::BIGINT AS n_feats,
                  sum(n * weight) AS wsum
           FROM pc JOIN w USING (bucket) GROUP BY pc.id),
    scored AS (SELECT d.doc_id AS id,
                      coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
                      {float(bias)} + CASE WHEN sc.n_feats > 0
                          THEN sc.wsum / sc.n_feats ELSE 0.0 END AS score
               FROM documents d LEFT JOIN sc ON d.doc_id = sc.id)
    SELECT id, n_feats, round(score, 6) AS score,
           round(1.0 / (1.0 + exp(-score)), 6) AS prob,
           (score >= 0) AS keep
    FROM scored
    """


def _katz_rounds_sql(k: int, alpha: float, beta: float, edges_sql: str) -> str:
    """Unrolled k-round Katz recurrence (operators/katz.py): duplicate
    edges count, vertices = endpoints of the edge multiset. Defines
    CTE k{k}(id, score)."""
    parts = [
        f"""
    WITH e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}) we),
    verts AS MATERIALIZED (
        SELECT DISTINCT id FROM (
            SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e) t),
    k0 AS MATERIALIZED (SELECT id, {beta!r} AS score FROM verts)"""
    ]
    for t in range(1, k + 1):
        parts.append(
            f""",
    k{t} AS MATERIALIZED (
        SELECT v.id, {beta!r} + {alpha!r} * coalesce(g.s, 0.0) AS score
        FROM verts v LEFT JOIN (
            SELECT e.dst AS id, sum(p.score) AS s
            FROM e JOIN k{t - 1} p ON e.src = p.id GROUP BY e.dst) g
        ON v.id = g.id)"""
        )
    return "".join(parts) + "\n"


def _spammass_sql(k: int, web_edges: str, seed_pred: str) -> str:
    """Unrolled twin PageRank/TrustRank chains (operators/trustrank.py
    via operators/ppr.py): chain u = uniform teleport 1/|V|, chain t =
    teleport 1/|S| on seeds ({seed_pred}); dangling mass returns to
    each chain's own teleport vector."""
    parts = [
        f"WITH edges AS MATERIALIZED ({web_edges})",
        "verts AS MATERIALIZED ("
        "SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "deg AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg"
        " FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w"
        " FROM edges e JOIN deg d ON e.src = d.id)",
        f"seeds AS MATERIALIZED (SELECT id FROM verts WHERE {seed_pred})",
        "sv AS MATERIALIZED (SELECT v.id,"
        " 1.0/(SELECT count(*) FROM verts) AS su,"
        " CASE WHEN v.id IN (SELECT id FROM seeds)"
        " THEN 1.0/(SELECT count(*) FROM seeds) ELSE 0.0 END AS st,"
        " (d.id IS NULL) AS dang FROM verts v LEFT JOIN deg d ON v.id = d.id)",
        "u0 AS MATERIALIZED (SELECT id, su AS rank FROM sv)",
        "t0 AS MATERIALIZED (SELECT id, st AS rank FROM sv)",
    ]
    for c, svec in (("u", "su"), ("t", "st")):
        for i in range(1, k + 1):
            parts += [
                f"{c}m{i} AS MATERIALIZED (SELECT coalesce(sum(p.rank),0) AS m"
                f" FROM {c}{i - 1} p JOIN sv ON p.id = sv.id WHERE sv.dang)",
                f"{c}c{i} AS MATERIALIZED (SELECT ew.dst AS id,"
                f" sum(p.rank*ew.w) AS contrib"
                f" FROM ew JOIN {c}{i - 1} p ON ew.src = p.id GROUP BY ew.dst)",
                f"{c}{i} AS MATERIALIZED (SELECT sv.id,"
                f" (1.0-0.85)*sv.{svec} + 0.85*(coalesce({c}c{i}.contrib,0)"
                f" + (SELECT m FROM {c}m{i})*sv.{svec}) AS rank"
                f" FROM sv LEFT JOIN {c}c{i} ON sv.id = {c}c{i}.id)",
            ]
    return (
        ",\n".join(parts)
        + f"""
    SELECT u.id, round(u.rank, 6) AS pagerank, round(t.rank, 6) AS trustrank,
           round(u.rank - t.rank, 6) AS spam_mass,
           round((u.rank - t.rank) / u.rank, 6) AS rel_spam_mass
    FROM u{k} u JOIN t{k} t ON u.id = t.id
    """
    )


# All-pairs truncated min-distance closure over the distinct page
# graph (operators/neighborhood.py semantics): walk states are
# (root, id, dist<=rounds), UNION-deduped, min per pair. Defines CTEs
# verts(id) and d(root, id, dist); harmonic/neighborhood project it.
_DIST_CLOSURE_SQL = """
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    verts AS MATERIALIZED (
        SELECT DISTINCT id FROM (
            SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e) t),
    walk AS (
        SELECT id AS root, id, 0 AS dist FROM verts
        UNION
        SELECT walk.root, e.dst, walk.dist + 1
        FROM walk JOIN e ON walk.id = e.src
        WHERE walk.dist < {rounds}),
    d AS MATERIALIZED (
        SELECT root, id, min(dist) AS dist FROM walk GROUP BY root, id)
"""

_HARMONIC_SQL = _DIST_CLOSURE_SQL + """,
    h AS (SELECT id, sum(1.0 / dist) AS harmonic
          FROM d WHERE dist > 0 GROUP BY id)
    SELECT v.id, round(coalesce(h.harmonic, 0.0), 6) AS harmonic
    FROM verts v LEFT JOIN h ON v.id = h.id
"""

_NEIGHBORHOOD_SQL = _DIST_CLOSURE_SQL + """
    SELECT gs.t::INT AS t, count(*) AS n_pairs
    FROM generate_series(0, {rounds}) gs(t) JOIN d ON d.dist <= gs.t
    GROUP BY gs.t
"""

# Interpolated effective diameter from the same distance closure
# (operators/neighborhood.py effective_diameter): smallest t with
# N(t) >= fraction*N(rounds), linear interpolation between the
# bracketing rounds. The interpolation operands are identical exact
# integers on both sides, so the IEEE result matches bit-for-bit.
_EFFDIAM_SQL = _DIST_CLOSURE_SQL + """,
    nf AS MATERIALIZED (
        SELECT gs.t::INT AS t, count(*)::DOUBLE AS n
        FROM generate_series(0, {rounds}) gs(t) JOIN d ON d.dist <= gs.t
        GROUP BY gs.t),
    c AS (SELECT t, n, lag(n) OVER (ORDER BY t) AS prev,
                 {fraction} * max(n) OVER () AS target,
                 max(n) OVER () AS max_n
          FROM nf),
    hit AS (SELECT * FROM c WHERE n >= target),
    first AS (SELECT min(t) AS t_ceil FROM hit)
    SELECT CASE WHEN h.t = 0 THEN 0.0
                ELSE round(h.t - 1 + (h.target - h.prev) / (h.n - h.prev), 6)
           END AS eff_diameter,
           f.t_ceil::INT AS t_ceil,
           round(h.target, 6) AS target_pairs,
           h.max_n::BIGINT AS max_pairs
    FROM hit h JOIN first f ON h.t = f.t_ceil
"""

# Link prediction (operators/linkpred.py): symmetrize the distinct
# loop-free edge set, cap shared vertices at {cap} BEFORE the
# self-join, score non-adjacent pairs by count / Adamic-Adar / Jaccard
# with the UNCAPPED true degrees.
_LINKPRED_SQL = """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    und AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM e0
            UNION ALL SELECT dst AS a, src AS b FROM e0) t),
    deg AS MATERIALIZED (SELECT a AS id, count(*) AS d FROM und GROUP BY a),
    ez AS MATERIALIZED (
        SELECT und.a AS z, und.b AS v, deg.d AS dz
        FROM und JOIN deg ON und.a = deg.id
        WHERE deg.d <= {cap}),
    pairs AS MATERIALIZED (
        SELECT x.v AS a, y.v AS b, count(*) AS n_common,
               sum(1.0 / ln(x.dz)) AS aa
        FROM ez x JOIN ez y ON x.z = y.z AND x.v < y.v
        GROUP BY 1, 2
        HAVING count(*) >= {min_common})
    SELECT p.a, p.b, p.n_common,
           round(p.aa, 6) AS adamic_adar,
           round(p.n_common::DOUBLE / (da.d + db.d - p.n_common), 6)
               AS jaccard
    FROM pairs p
    JOIN deg da ON da.id = p.a
    JOIN deg db ON db.id = p.b
    LEFT JOIN und ON und.a = p.a AND und.b = p.b
    WHERE und.a IS NULL
"""


def _walks_cte(web_edges: str, length: int = 4) -> str:
    """WITH-clause prefix ending in a `w(walk_id, step, v)` CTE that
    replays operators/walks.py exactly: step t picks
    min_by(dst, score(dst, v, t)) — the same injective arithmetic rule,
    so the walks are identical step by step. Shared by the walk and
    skip-gram oracles."""
    steps = []
    for t in range(1, length + 1):
        score = (
            f"(1103515245 * ((e.dst + 12345 * (s{t - 1}.v + {31 * t}))"
            " % 2147483647)) % 2147483647"
        )
        steps.append(
            f"s{t} AS (SELECT walk_id, min_by(e.dst, {score}) AS v "
            f"FROM s{t - 1} JOIN e ON s{t - 1}.v = e.src GROUP BY walk_id)"
        )
    unions = "\n        UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, v FROM s{t}" for t in range(length + 1)
    )
    return (
        "WITH e AS MATERIALIZED (SELECT DISTINCT src, dst "
        f"FROM ({web_edges}) we),\n"
        "s0 AS (SELECT doc_id AS walk_id, doc_id AS v FROM documents "
        "WHERE doc_id % 49 = 1),\n"
        + ",\n".join(steps)
        + ",\n    w AS MATERIALIZED (\n        "
        + unions
        + ")"
    )


def _walks_sql(web_edges: str, length: int = 4) -> str:
    """Unrolled replay of operators/walks.py (see _walks_cte)."""
    return _walks_cte(web_edges, length) + "\n    SELECT * FROM w"


def _mc_pagerank_sql(
    web_edges: str,
    m: int = 4,
    max_length: int = 20,
    damping: float = 0.85,
) -> str:
    """Unrolled replay of operators/mcrank.py pagerank_monte_carlo:
    the same integer continue gate and LCG neighbor choice per round,
    visit counts over the union of all rounds' frontiers."""
    thr = int(damping * 2147483647)
    parts = [
        f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    s0 AS MATERIALIZED (
        SELECT doc_id * {m} + t.r AS w, doc_id AS v
        FROM documents, range({m}) t(r))"""
    ]
    for t in range(1, max_length + 1):
        parts.append(
            f"""
    s{t} AS MATERIALIZED (
        SELECT a.w,
               min_by(e.dst,
                 (1103515245 * ((e.dst + 12345 * (a.w + {31 * t}))
                  % 2147483647)) % 2147483647) AS v
        FROM s{t - 1} a JOIN e ON a.v = e.src
        WHERE (1103515245 * ((a.w + {12345 * t}) % 2147483647))
              % 2147483647 < {thr}
        GROUP BY a.w)"""
        )
    union = " UNION ALL ".join(
        f"SELECT v FROM s{t}" for t in range(max_length + 1)
    )
    parts.append(
        f""",
    visits AS (SELECT v, count(*) AS n FROM ({union}) u GROUP BY v),
    tot AS (SELECT sum(n)::BIGINT AS t FROM visits)
    SELECT d.doc_id AS id, coalesce(n, 0)::BIGINT AS n_visits,
           round(coalesce(n, 0)::DOUBLE / tot.t, 6) AS est_rank
    FROM documents d LEFT JOIN visits ON d.doc_id = visits.v, tot
    """
    )
    return ",".join(parts[:1] + parts[1:-1]) + parts[-1]


def _crawl_budget_sql(
    web_edges: str,
    budget: int = 997,
    block: int = 25,
    m: int = 4,
    max_length: int = 20,
    damping: float = 0.85,
) -> str:
    """Replay of q_crawl_budget: site-level visit weights from the
    identical Monte Carlo walk replay (_mc_pagerank_sql), then the
    Hamilton largest-remainder allocation of functions/frontier.py
    apportion_budget — floor quotas B*w//W, leftovers to the largest
    remainders (B*w) % W with ties to the smaller id.  All-integer in
    HUGEINT, so the replay is bit-exact."""
    mc = _mc_pagerank_sql(web_edges, m=m, max_length=max_length, damping=damping)
    return f"""
    WITH site_w AS MATERIALIZED (
        SELECT (id // {block})::BIGINT AS id, sum(n_visits)::BIGINT AS w
        FROM ({mc}) mc GROUP BY 1),
    tot AS (SELECT sum(w::HUGEINT) AS t FROM site_w),
    q AS (
        SELECT id, w,
               ((({budget}::HUGEINT) * w::HUGEINT) // t)::BIGINT AS fl,
               (({budget}::HUGEINT) * w::HUGEINT) % t AS rem
        FROM site_w, tot),
    lv AS (SELECT {budget} - sum(fl) AS leftover FROM q)
    SELECT id, w,
           (fl + CASE WHEN row_number()
                           OVER (ORDER BY rem DESC, id ASC) <= lv.leftover
                      THEN 1 ELSE 0 END)::BIGINT AS alloc
    FROM q, lv
    """


def _skipgram_sql(web_edges: str, length: int = 4, window: int = 2) -> str:
    """Replay of q_walk_skipgrams: the identical deterministic walks
    (shared _walks_cte), the window-bounded self-join, exact-integer
    counts/marginals, and the PMI ln in the same operand order."""
    win = int(window)
    return (
        _walks_cte(web_edges, length)
        + f""",
    pairs AS (
        SELECT a.v AS center, b.v AS context
        FROM w a JOIN w b ON a.walk_id = b.walk_id
         AND a.step <> b.step AND abs(a.step - b.step) <= {win}),
    cnt AS (
        SELECT center, context, count(*) AS n_cooc
        FROM pairs GROUP BY center, context),
    tot AS (SELECT sum(n_cooc)::BIGINT AS t FROM cnt)
    SELECT center, context, n_cooc,
           round(ln(n_cooc * t
                    / (sum(n_cooc) OVER (PARTITION BY center)
                       * sum(n_cooc) OVER (PARTITION BY context))),
                 6) AS pmi
    FROM cnt, tot
    """
    )


# Sessionization: identical rule to streaming/sessions.py
# sessionize_batch — truncated-second timestamps (Spark unix_timestamp
# floors; epoch() keeps ms, so floor() before casting), 1800 s gap,
# (ts, event_id) ordering.
_SESSION_SPANS_SQL = """
    WITH ev AS (
        SELECT user_id, floor(epoch(ts))::BIGINT AS ts_s, event_id
        FROM events),
    m AS (
        SELECT user_id, ts_s, event_id,
               CASE WHEN lag(ts_s) OVER w IS NULL
                         OR ts_s - lag(ts_s) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
    g AS (
        SELECT user_id, ts_s,
               sum(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts_s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM m)
    SELECT user_id, min(ts_s) AS session_start, max(ts_s) AS session_end,
           count(*) AS n_events
    FROM g GROUP BY user_id, session_no
"""

# Term analytics: single-space tokenization (empty tokens dropped),
# exactly functions/terms.py.
_TOKENS_SQL = """
    tok AS (
        SELECT doc_id, term FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
        WHERE term <> '')
"""

def _substring_spans_sql(width: int) -> str:
    """CTE chain replaying functions/spandedup.py exactly: md5 window
    hashes (identical tokenization: split on single space, empties
    dropped), keep-first via min (doc_id, pos) struct, overlap/adjacent
    island merge via running-max window. Defines `spans(doc_id,
    span_start, span_end, span_len)`."""
    w = int(width)
    return f"""
    toks AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        FROM documents),
    win AS MATERIALIZED (
        SELECT doc_id, pos, md5(array_to_string(ts[pos+1 : pos+{w}], ' ')) AS h
        FROM (SELECT doc_id, ts,
                     unnest(range(0, greatest(len(ts) - {w} + 1, 0))) AS pos
              FROM toks)),
    agg AS MATERIALIZED (
        SELECT h, count(*) AS cnt,
               min(struct_pack(d := doc_id, p := pos)) AS first
        FROM win GROUP BY h),
    dupw AS (
        SELECT w.doc_id, w.pos AS s, w.pos + {w} - 1 AS e
        FROM win w JOIN agg a ON w.h = a.h
        WHERE a.cnt >= 2 AND NOT (w.doc_id = a.first.d AND w.pos = a.first.p)),
    marked AS (
        SELECT doc_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -2) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM dupw),
    grp AS (
        SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                              ROWS UNBOUNDED PRECEDING) AS g
        FROM marked),
    spans AS (
        SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
               max(e) - min(s) + 1 AS span_len
        FROM grp GROUP BY doc_id, g)
"""


_SUBSTRING_SPANS_SQL = (
    "WITH "
    + _substring_spans_sql(3)
    + "SELECT doc_id, span_start, span_end, span_len FROM spans"
)

_SUBSTRING_STATS_SQL = (
    "WITH "
    + _substring_spans_sql(3)
    + """
    SELECT t.doc_id, len(t.ts) AS n_tokens,
           count(sp.doc_id) AS n_spans,
           coalesce(sum(sp.span_len), 0)::BIGINT AS dup_tokens,
           round(coalesce(sum(sp.span_len), 0)
                 / greatest(len(t.ts), 1)::DOUBLE, 6) AS dup_frac
    FROM toks t LEFT JOIN spans sp ON t.doc_id = sp.doc_id
    GROUP BY t.doc_id, len(t.ts)
"""
)


def _bpe_cte_sql(rounds: int = 8) -> str:
    """CTE chain replaying functions/bpe.py training: s0 = marker-
    prefixed symbolization of the (word, count) multiset; per round r,
    p{r} counts adjacent symbol pairs, m{r} is the deterministic argmax
    (count desc, x asc, y asc), s{r} advances by one marker-aligned
    replace (DuckDB replace() is leftmost-nonoverlapping, same as the
    engine's). Defines m1..m{rounds} and s{rounds}."""
    parts = [
        "WITH words AS MATERIALIZED (SELECT word, count(*) AS cnt FROM ("
        " SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))"
        " AS word FROM documents) t GROUP BY word)",
        "s0 AS MATERIALIZED (SELECT chr(31) ||"
        " array_to_string(string_split(word, ''), chr(31)) AS s, cnt"
        " FROM words)",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"p{r} AS (SELECT sym[i] AS x, sym[i + 1] AS y, sum(cnt) AS n"
            f" FROM (SELECT sym, cnt, unnest(range(1, len(sym))) AS i"
            f" FROM (SELECT list_filter(string_split(s, chr(31)),"
            f" z -> z <> '') AS sym, cnt FROM s{r - 1}) q) u"
            f" GROUP BY 1, 2)",
            f"m{r} AS MATERIALIZED (SELECT x, y, n FROM p{r}"
            f" ORDER BY n DESC, x ASC, y ASC LIMIT 1)",
            f"s{r} AS MATERIALIZED (SELECT replace(s,"
            f" chr(31) || (SELECT x FROM m{r}) || chr(31) || (SELECT y FROM m{r}),"
            f" chr(31) || (SELECT x FROM m{r}) || (SELECT y FROM m{r})) AS s,"
            f" cnt FROM s{r - 1})",
        ]
    return ",\n".join(parts) + "\n"


def _kmeans_dist_sql(e_v: str, c_cent: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({e_v}, {c_cent}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _kmeans_cte_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    prefix: str = "",
    vexpr: str = "list_transform(embedding, x -> x::DOUBLE)",
    with_kw: bool = True,
) -> str:
    """CTE chain replaying functions/clustering.py's deterministic
    k-means: arithmetic init (c0), per-iteration argmin assignment
    (row_number over (dist, cluster)) and element-wise mean update with
    empty-cluster carry (coalesce), final assignment `{prefix}af(vec_id,
    cluster)` against {prefix}c{iters}. Distance = index-ordered sum of
    squared diffs, the same fold the engine computes. `prefix`/`vexpr`
    let the PQ oracle run one chain per subspace over vector slices."""
    dist = _kmeans_dist_sql
    p = prefix
    head = "WITH " if with_kw else ""
    parts = [
        f"{head}{p}emb AS MATERIALIZED (SELECT vec_id,"
        f" {vexpr} AS v FROM embeddings)",
        f"{p}nst AS (SELECT greatest(count(*) // {k}, 1) AS stride"
        f" FROM {p}emb)",
        f"{p}c0 AS MATERIALIZED ("
        f" SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cent"
        f" FROM {p}emb WHERE vec_id % (SELECT stride FROM {p}nst) = 0"
        f" AND vec_id < (SELECT stride FROM {p}nst) * {k})",
    ]
    for i in range(1, iters + 1):
        parts += [
            f"{p}a{i} AS MATERIALIZED (SELECT vec_id, cluster FROM ("
            f" SELECT e.vec_id, c.cluster, row_number() OVER ("
            f" PARTITION BY e.vec_id ORDER BY {dist('e.v', 'c.cent')} ASC,"
            f" c.cluster ASC) AS rn FROM {p}emb e CROSS JOIN {p}c{i - 1} c) t"
            f" WHERE rn = 1)",
            f"{p}c{i} AS MATERIALIZED (SELECT c.cluster,"
            f" coalesce(n.cent, c.cent) AS cent FROM {p}c{i - 1} c LEFT JOIN ("
            f" SELECT cluster, list(m ORDER BY pos) AS cent FROM ("
            f" SELECT a.cluster, t.i AS pos, avg(e.v[t.i]) AS m"
            f" FROM {p}a{i} a JOIN {p}emb e USING (vec_id),"
            f" unnest(generate_series(1, {dim})) t(i)"
            f" GROUP BY a.cluster, t.i) s GROUP BY cluster) n"
            f" ON n.cluster = c.cluster)",
        ]
    parts.append(
        f"{p}af AS MATERIALIZED (SELECT vec_id, cluster FROM ("
        f" SELECT e.vec_id, c.cluster, row_number() OVER ("
        f" PARTITION BY e.vec_id ORDER BY {dist('e.v', 'c.cent')} ASC,"
        f" c.cluster ASC) AS rn FROM {p}emb e CROSS JOIN {p}c{iters} c) t"
        f" WHERE rn = 1)"
    )
    return ",\n".join(parts) + "\n"


def _rmat_edges_sql(scale: int, n_edges: int, seed: int) -> str:
    """SQL regeneration of datagen.rmat_edges_df: the per-level integer
    quadrant draws unrolled into one arithmetic expression per
    endpoint."""
    src_e, dst_e = "0", "0"
    for level in range(scale):
        inner = f"((t * 2654435761 + {12345 + seed + level * 40503}) % 2147483647)"
        h = f"(((1103515245 * {inner}) % 2147483647) % 100)"
        bit_s = f"(CASE WHEN {h} >= 76 THEN 1 ELSE 0 END)"
        bit_d = (
            f"(CASE WHEN ({h} >= 57 AND {h} < 76) OR {h} >= 95"
            f" THEN 1 ELSE 0 END)"
        )
        src_e = f"({src_e} * 2 + {bit_s})"
        dst_e = f"({dst_e} * 2 + {bit_d})"
    return (
        f"SELECT {src_e} AS src, {dst_e} AS dst"
        f" FROM (SELECT unnest(range(0, {n_edges})) AS t)"
    )


def _jl_sql(out_dim: int = 8, seed: int = 7, in_dim: int = 64) -> str:
    """Replay of q_jl_projection: the arithmetic ±1 sign law and the
    ascending-index fold of functions/projection.py."""
    b = 12345 + seed
    sign = (
        f"CASE WHEN ((1103515245 * ((i * 2654435761 + d.dim + {b})"
        f" % 2147483647)) % 2147483647) % 2 = 0"
        f" THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END"
    )
    return f"""
    WITH emb AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings),
    dims AS (SELECT unnest(range(0, {out_dim})) AS dim)
    SELECT e.vec_id, d.dim,
           round(list_sum(list_transform(range(0, {in_dim}),
                     i -> e.v[i + 1] * ({sign})))
                 / sqrt({out_dim}), 6) AS value
    FROM emb e CROSS JOIN dims d
    """


def _pq_sql(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    topk: int = 10,
    n_queries: int = 5,
) -> str:
    """Replay of q_pq_topk: one deterministic-Lloyd chain per subspace
    (prefixed _kmeans_cte_sql over the vector slice), then ADC = the
    per-subspace squared distances between the raw query slice and the
    assigned centroid, added in subspace order (the engine's float
    association), ranked per query on the 6-dp value."""
    d_sub = dim // m
    chains = []
    joins = []
    terms = []
    for s in range(m):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        vexpr = f"list_transform(embedding, x -> x::DOUBLE)[{lo}:{hi}]"
        chains.append(
            _kmeans_cte_sql(
                k, iters, d_sub, prefix=f"s{s}_", vexpr=vexpr,
                with_kw=(s == 0),
            ).rstrip()
        )
        joins.append(
            f"JOIN s{s}_af a{s} ON a{s}.vec_id = e.vec_id"
            f" JOIN s{s}_c{iters} cb{s} ON cb{s}.cluster = a{s}.cluster"
        )
        terms.append(_kmeans_dist_sql(f"q.v[{lo}:{hi}]", f"cb{s}.cent"))
    return (
        ",\n".join(chains)
        + f""",
    qrys AS (SELECT vec_id AS query_id,
                    list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings WHERE vec_id < {n_queries}),
    allv AS (SELECT vec_id FROM embeddings),
    d AS (
        SELECT q.query_id, e.vec_id,
               round({" + ".join(terms)}, 6) AS adc_dist
        FROM qrys q CROSS JOIN allv e
        {" ".join(joins)})
    SELECT query_id, vec_id, adc_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_dist ASC, vec_id ASC) AS rn FROM d)
    WHERE rn <= {topk}
    """
    )


_KMEANS_SQL = _kmeans_cte_sql() + "SELECT vec_id, cluster FROM af"

_SEMDEDUP_SQL = (
    _kmeans_cte_sql()
    + """,
    dups AS (
        SELECT DISTINCT aw.vec_id FROM af au
        JOIN emb eu ON au.vec_id = eu.vec_id
        JOIN af aw ON aw.cluster = au.cluster AND au.vec_id < aw.vec_id
        JOIN emb ew ON aw.vec_id = ew.vec_id
        WHERE list_sum(list_transform(list_zip(eu.v, ew.v),
                                      p -> p[1] * p[2]))
              / (sqrt(list_sum(list_transform(eu.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(ew.v, x -> x * x))))
              >= 0.35)
    SELECT a.vec_id, a.cluster,
           (d.vec_id IS NOT NULL) AS is_dup
    FROM af a LEFT JOIN dups d ON a.vec_id = d.vec_id
"""
)


# BM25 (functions/retrieval.py): float expression trees mirror the
# Spark column algebra operation-for-operation (same associativity), so
# round(6) values are engine-identical; per-(query, doc) sums have <= 2
# operands (2-term queries), so summation order cannot differ.
_BM25_SQL = """
    WITH toks AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        FROM documents),
    lens AS MATERIALIZED (SELECT doc_id, len(ts) AS dl FROM toks),
    stats AS MATERIALIZED (
        SELECT count(*)::DOUBLE AS n, avg(dl) AS avg_len FROM lens),
    qterms(query_id, term) AS (
        VALUES (1, 'hash'), (1, 'join'), (2, 'sort'), (2, 'merge'),
               (3, 'window'), (3, 'agg')),
    tok AS (SELECT doc_id, unnest(ts) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qterms)
           GROUP BY 1, 2),
    idf AS (SELECT term,
                   ln(((SELECT n FROM stats) - count(*) + 0.5)
                      / (count(*) + 0.5) + 1.0) AS idf
            FROM tf GROUP BY term),
    scored AS (
        SELECT q.query_id, t.doc_id,
               sum(i.idf * (t.tf * 2.2)
                   / (t.tf + 1.2 * (0.25 + 0.75 * l.dl
                                    / (SELECT avg_len FROM stats)))) AS score
        FROM tf t
        JOIN qterms q USING (term)
        JOIN idf i USING (term)
        JOIN lens l USING (doc_id)
        GROUP BY 1, 2),
    ranked AS (
        SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY score DESC, doc_id ASC) AS doc_rank
        FROM scored)
    SELECT query_id, doc_id, round(score, 6) AS score, doc_rank
    FROM ranked WHERE doc_rank <= 10
"""


_TERM_TOPK_SQL = (
    "WITH "
    + _TOKENS_SQL
    + """,
    per AS (SELECT doc_id, term, count(*) AS tf_d FROM tok GROUP BY 1, 2),
    stats AS (SELECT term, sum(tf_d)::BIGINT AS tf, count(*) AS df
              FROM per GROUP BY term)
    SELECT term, tf, df FROM stats ORDER BY tf DESC, term ASC LIMIT 50
"""
)

_TFIDF_SQL = (
    "WITH "
    + _TOKENS_SQL
    + """,
    per AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfv AS (SELECT term, count(*) AS df FROM per GROUP BY term),
    scored AS (
        SELECT p.doc_id, p.term, p.tf, d.df,
               p.tf * ln((SELECT count(*) FROM documents)::DOUBLE / d.df)
                   AS tfidf
        FROM per p JOIN dfv d USING (term)),
    ranked AS (
        SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
                  AS term_rank
        FROM scored)
    SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf, term_rank
    FROM ranked WHERE term_rank <= 3
"""
)

# Reciprocity / assortativity over the distinct non-loop web edge set —
# same distinct + degree-join logic as operators/graphstats.py; all
# inputs to the float math are integer-valued so values match exactly.
_RECIPROCITY_SQL = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    r AS (SELECT count(*) AS n_reciprocal FROM e
          WHERE EXISTS (SELECT 1 FROM e e2
                        WHERE e2.src = e.dst AND e2.dst = e.src)),
    n AS (SELECT count(*) AS n_edges FROM e)
    SELECT n.n_edges, r.n_reciprocal,
           round(r.n_reciprocal::DOUBLE / n.n_edges, 6) AS reciprocity
    FROM n, r
"""

_ASSORTATIVITY_SQL = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    od AS (SELECT src, count(*)::DOUBLE AS x FROM e GROUP BY src),
    idg AS (SELECT dst, count(*)::DOUBLE AS y FROM e GROUP BY dst),
    p AS (SELECT od.x, idg.y FROM e
          JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM p)
    SELECT n,
           round((n*sxy - sx*sy)
                 / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
               AS assortativity
    FROM s
"""

# Triad census in SQL: pair-state table (fwd/bwd flags per undirected
# pair), id-ordered triangle triple join, then the classification CASE
# mirrored operation-for-operation from operators/motifs.py (all flag
# arithmetic is integer, so the match is exact).
_TRIAD_CENSUS_SQL = """
    WITH d AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    ps AS MATERIALIZED (
        SELECT least(src, dst) AS a, greatest(src, dst) AS b,
               max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
               max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS bwd
        FROM d GROUP BY 1, 2),
    tri AS MATERIALIZED (
        SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
        FROM ps e1 JOIN ps e2 ON e2.a = e1.b
             JOIN ps e3 ON e3.a = e1.a AND e3.b = e2.b),
    flags AS (
        SELECT p12.fwd AS f12, p12.bwd AS g12,
               p13.fwd AS f13, p13.bwd AS g13,
               p23.fwd AS f23, p23.bwd AS g23
        FROM tri t
        JOIN ps p12 ON p12.a = t.v1 AND p12.b = t.v2
        JOIN ps p13 ON p13.a = t.v1 AND p13.b = t.v3
        JOIN ps p23 ON p23.a = t.v2 AND p23.b = t.v3),
    cls AS (
        SELECT CASE
            WHEN f12*g12 + f13*g13 + f23*g23 = 3 THEN '300'
            WHEN f12*g12 + f13*g13 + f23*g23 = 2 THEN '210'
            WHEN f12*g12 + f13*g13 + f23*g23 = 0 THEN
                CASE WHEN f12*f23*g13 + g12*g23*f13 = 1
                     THEN '030C' ELSE '030T' END
            ELSE CASE
                WHEN (CASE WHEN f12*g12 = 1 THEN g13 + g23
                           WHEN f13*g13 = 1 THEN g12 + f23
                           ELSE f12 + f13 END) = 2 THEN '120D'
                WHEN (CASE WHEN f12*g12 = 1 THEN g13 + g23
                           WHEN f13*g13 = 1 THEN g12 + f23
                           ELSE f12 + f13 END) = 0 THEN '120U'
                ELSE '120C' END
        END AS triad_class
        FROM flags)
    SELECT triad_class, count(*) AS n FROM cls GROUP BY triad_class
"""


def _table_profile_oracle() -> str:
    from dxa_pagerank_spark.functions.profiler import table_profile_sql

    return table_profile_sql(
        "documents", ["doc_id", "lang", "source", "n_chars"]
    )



_WEB_EDGES_OLD_SQL = """
    SELECT doc_id AS src,
           (doc_id + 1) % (SELECT count(*) FROM documents) AS dst
    FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT doc_id, (3 * doc_id + 7) % (SELECT count(*) FROM documents)
    FROM documents WHERE doc_id % 10 <> 0
"""


def _incremental_pagerank_sql(k1: int, k2: int) -> str:
    """Two-phase unrolled replay of q_incremental_pagerank: phase A =
    reference-exact cold PageRank (round-1 1/N quirk + restore) for k1
    rounds on the OLD edge rule (_WEB_EDGES_OLD_SQL: the duplicate
    i%3==0 arm not yet crawled); phase B = the warm-start law
    (operators/pagerank.py initial_ranks: 1/N fill for new non-dangling
    vertices, round-1 dangling mass = conservation residual of the
    injected ranks) for k2 rounds on the FULL edge rule + restore."""
    a = [
        f"WITH edges AS MATERIALIZED ({_WEB_EDGES_OLD_SQL})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges)",
        "nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "deg AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w FROM edges e JOIN deg d ON e.src = d.id)",
        "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nv) AS rank FROM deg)",
    ]
    for i in range(1, k1 + 1):
        mass = (
            "(1.0/(SELECT n FROM nv))" if i == 1
            else f"(SELECT mass FROM d{i - 1})"
        )
        a += [
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS id, sum(r.rank*ew.w) AS contrib"
            f" FROM ew JOIN r{i - 1} r ON ew.src = r.id GROUP BY ew.dst)",
            f"r{i} AS MATERIALIZED (SELECT r{i - 1}.id,"
            f" 0.15/(SELECT n FROM nv) + 0.85*coalesce(c{i}.contrib,0)"
            f" + 0.85*{mass}/(SELECT n FROM nv) AS rank"
            f" FROM r{i - 1} LEFT JOIN c{i} ON r{i - 1}.id = c{i}.id)",
            f"d{i} AS MATERIALIZED (SELECT 1 - sum(rank) AS mass FROM r{i})",
        ]
    a += [
        "dangA AS MATERIALIZED (SELECT id FROM verts EXCEPT SELECT id FROM deg)",
        f"crA AS MATERIALIZED (SELECT ew.dst AS id, sum(r.rank*ew.w) AS contrib"
        f" FROM ew JOIN r{k1} r ON ew.src = r.id"
        " WHERE ew.dst IN (SELECT id FROM dangA) GROUP BY ew.dst)",
        "rdA AS MATERIALIZED (SELECT dangA.id,"
        " 0.15/(SELECT n FROM nv) + 0.85*coalesce(crA.contrib,0)"
        f" + 0.85*(SELECT mass FROM d{k1})/(SELECT n FROM nv) AS rank"
        " FROM dangA LEFT JOIN crA ON dangA.id = crA.id)",
        f"finalA AS MATERIALIZED (SELECT id, rank FROM r{k1}"
        " UNION ALL SELECT id, rank FROM rdA)",
        # ---- phase B: warm start on the full edge rule ----
        f"edgesB AS MATERIALIZED ({_WEB_EDGES_SQL})",
        "vertsB AS MATERIALIZED (SELECT src AS id FROM edgesB UNION SELECT dst AS id FROM edgesB)",
        "nvB AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM vertsB)",
        "degB AS MATERIALIZED (SELECT src AS id, count(*)::DOUBLE AS out_deg FROM edgesB GROUP BY src)",
        "ewB AS MATERIALIZED (SELECT e.src, e.dst, 1.0/d.out_deg AS w FROM edgesB e JOIN degB d ON e.src = d.id)",
        "b0 AS MATERIALIZED (SELECT degB.id,"
        " coalesce(finalA.rank, 1.0/(SELECT n FROM nvB)) AS rank"
        " FROM degB LEFT JOIN finalA ON degB.id = finalA.id)",
        "bd0 AS MATERIALIZED (SELECT 1 - sum(rank) AS mass FROM b0)",
    ]
    for i in range(1, k2 + 1):
        a += [
            f"bc{i} AS MATERIALIZED (SELECT ewB.dst AS id, sum(b.rank*ewB.w) AS contrib"
            f" FROM ewB JOIN b{i - 1} b ON ewB.src = b.id GROUP BY ewB.dst)",
            f"b{i} AS MATERIALIZED (SELECT b{i - 1}.id,"
            f" 0.15/(SELECT n FROM nvB) + 0.85*coalesce(bc{i}.contrib,0)"
            f" + 0.85*(SELECT mass FROM bd{i - 1})/(SELECT n FROM nvB) AS rank"
            f" FROM b{i - 1} LEFT JOIN bc{i} ON b{i - 1}.id = bc{i}.id)",
            f"bd{i} AS MATERIALIZED (SELECT 1 - sum(rank) AS mass FROM b{i})",
        ]
    a += [
        "dangB AS MATERIALIZED (SELECT id FROM vertsB EXCEPT SELECT id FROM degB)",
        f"crB AS MATERIALIZED (SELECT ewB.dst AS id, sum(b.rank*ewB.w) AS contrib"
        f" FROM ewB JOIN b{k2} b ON ewB.src = b.id"
        " WHERE ewB.dst IN (SELECT id FROM dangB) GROUP BY ewB.dst)",
        "rdB AS MATERIALIZED (SELECT dangB.id,"
        " 0.15/(SELECT n FROM nvB) + 0.85*coalesce(crB.contrib,0)"
        f" + 0.85*(SELECT mass FROM bd{k2})/(SELECT n FROM nvB) AS rank"
        " FROM dangB LEFT JOIN crB ON dangB.id = crB.id)",
    ]
    return (
        ",\n".join(a)
        + f"""
    SELECT id, round(rank, 6) AS rank FROM b{k2}
    UNION ALL SELECT id, round(rank, 6) AS rank FROM rdB"""
    )


def _textrank_sql(window: int = 2, rounds: int = 10, top_k: int = 30) -> str:
    """Replay of q_textrank_keywords: the window-bounded co-occurrence
    edge CTEs, then `rounds` unrolled weighted TextRank rounds with the
    exact float shapes of functions/textrank.py ((e.w / sumw) * score
    per edge, (1 - 0.85::DOUBLE) base so the double literal matches
    Spark's Python-computed 1.0 - damping)."""
    w = int(window)
    parts = [
        """WITH toks AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split(text, ' '),
                                   t -> t <> '') AS ts
        FROM documents)""",
        """tpos AS MATERIALIZED (
        SELECT doc_id, pos, ts[pos + 1] AS term
        FROM (SELECT doc_id, ts, unnest(range(0, len(ts))) AS pos
              FROM toks))""",
        f"""pairs AS (
        SELECT least(a.term, b.term) AS u, greatest(a.term, b.term) AS v
        FROM tpos a JOIN tpos b ON a.doc_id = b.doc_id
         AND b.pos > a.pos AND b.pos - a.pos <= {w}
         AND a.term <> b.term)""",
        "und AS (SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v)",
        "ed AS MATERIALIZED (SELECT u, v, w FROM und"
        " UNION ALL SELECT v, u, w FROM und)",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS term FROM ed)",
        "sw AS MATERIALIZED (SELECT v AS term, sum(w) AS sumw"
        " FROM ed GROUP BY v)",
        "s0 AS MATERIALIZED (SELECT term, 1.0::DOUBLE AS score FROM verts)",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"""g{i} AS (
        SELECT e.u AS term, sum((e.w / sw.sumw) * s{i - 1}.score) AS acc
        FROM ed e JOIN sw ON e.v = sw.term
        JOIN s{i - 1} ON e.v = s{i - 1}.term
        GROUP BY e.u)""",
            f"""s{i} AS MATERIALIZED (
        SELECT vv.term,
               (1 - 0.85::DOUBLE)
               + 0.85::DOUBLE * coalesce(g{i}.acc, 0.0::DOUBLE) AS score
        FROM verts vv LEFT JOIN g{i} ON vv.term = g{i}.term)""",
        ]
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT term, round(score, 6) AS score FROM s{rounds}
    ORDER BY round(score, 6) DESC, term LIMIT {top_k}
    """
    )


def _rank_fusion_sql(k: int = 60, top_m: int = 100, n_out: int = 20) -> str:
    """Replay of q_rank_fusion: the 60-round web PageRank prelude
    (shared with the web_pagerank oracle), the quality and unigram-LM
    signals (CTE-renamed copies of their own oracles), per-signal
    truncated row_number ranks, and the fixed-order RRF sum with
    ::DOUBLE divisions (DuckDB's bare 1.0 is DECIMAL — different
    division semantics than Spark's double)."""
    return (
        _pagerank_rounds_sql(60, edges_sql=_WEB_EDGES_SQL)
        + f""",
    sig_pr AS (SELECT id, round(rank, 6) AS score FROM final),
    qs AS (SELECT doc_id,
            length(text) AS n_chars,
            length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                / greatest(length(text), 1) AS alpha_ratio,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1) AS atl
           FROM documents),
    sig_q AS (SELECT doc_id AS id,
              round(((CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1.0
                           ELSE least(n_chars::DOUBLE / 200.0, 1.0) END)
                     + (CASE WHEN atl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
                     + alpha_ratio) / 3.0, 6) AS score
              FROM qs),
    lm_toks AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS term
        FROM documents),
    lm_pd AS (SELECT doc_id, term, count(*) AS tf FROM lm_toks
              GROUP BY doc_id, term),
    lm_vocab AS (SELECT term, sum(tf) AS ctf FROM lm_pd GROUP BY term),
    lm_tot AS (SELECT sum(ctf)::DOUBLE AS t FROM lm_vocab),
    lm_agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                      sum(tf * -ln(ctf / (SELECT t FROM lm_tot))) AS nll
               FROM lm_pd JOIN lm_vocab USING (term) GROUP BY doc_id),
    sig_lm AS (SELECT d.doc_id AS id,
                      -round(CASE WHEN coalesce(lm_agg.n_tokens, 0) > 0
                                  THEN lm_agg.nll / lm_agg.n_tokens
                                  ELSE 0.0 END, 6) AS score
               FROM documents d LEFT JOIN lm_agg ON d.doc_id = lm_agg.doc_id),
    rp AS (SELECT id, r FROM (
             SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r
             FROM sig_pr) WHERE r <= {top_m}),
    rq AS (SELECT id, r FROM (
             SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r
             FROM sig_q) WHERE r <= {top_m}),
    rl AS (SELECT id, r FROM (
             SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r
             FROM sig_lm) WHERE r <= {top_m})
    SELECT coalesce(rp.id, rq.id, rl.id) AS id,
           coalesce(rp.r, 0) AS rank_pagerank,
           coalesce(rq.r, 0) AS rank_quality,
           coalesce(rl.r, 0) AS rank_lm,
           round(coalesce(1.0::DOUBLE / ({k} + rp.r), 0.0)
                 + coalesce(1.0::DOUBLE / ({k} + rq.r), 0.0)
                 + coalesce(1.0::DOUBLE / ({k} + rl.r), 0.0), 6) AS rrf_score
    FROM rp
    FULL JOIN rq ON rp.id = rq.id
    FULL JOIN rl ON coalesce(rp.id, rq.id) = rl.id
    ORDER BY rrf_score DESC, coalesce(rp.id, rq.id, rl.id)
    LIMIT {n_out}
    """
    )


def _contamination_sql(width: int) -> str:
    """Replay of q_benchmark_contamination: benchmark = doc_id %% 25
    == 0 subset, md5 window hashes on both sides, semi-join, island
    merge, per-doc stats (zeros for clean docs)."""
    w = int(width)
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        FROM documents),
    win AS MATERIALIZED (
        SELECT doc_id, pos, md5(array_to_string(ts[pos+1 : pos+{w}], ' ')) AS h
        FROM (SELECT doc_id, ts,
                     unnest(range(0, greatest(len(ts) - {w} + 1, 0))) AS pos
              FROM toks)),
    bw AS MATERIALIZED (
        SELECT DISTINCT h FROM win WHERE doc_id % 25 = 0),
    hits AS (
        SELECT w.doc_id, w.pos AS s, w.pos + {w} - 1 AS e
        FROM win w WHERE w.h IN (SELECT h FROM bw)),
    marked AS (
        SELECT doc_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -2) + 1
                    THEN 1 ELSE 0 END AS brk
        FROM hits),
    grp AS (
        SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                              ROWS UNBOUNDED PRECEDING) AS g
        FROM marked),
    spans AS (
        SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
               max(e) - min(s) + 1 AS span_len
        FROM grp GROUP BY doc_id, g),
    per AS (
        SELECT doc_id, sum(span_len) AS ct, count(*) AS ns
        FROM spans GROUP BY doc_id)
    SELECT t.doc_id, len(t.ts) AS n_tokens,
           coalesce(per.ct, 0)::BIGINT AS contaminated_tokens,
           round(coalesce(per.ct, 0)
                 / greatest(len(t.ts), 1)::DOUBLE, 6) AS contaminated_frac,
           coalesce(per.ns, 0) AS n_spans
    FROM toks t LEFT JOIN per ON t.doc_id = per.doc_id
    """


def _lpa_modularity_sql(k: int) -> str:
    """Newman modularity of the k-round unrolled LPA labels — the
    labels CTE is the exact _lpa_rounds_sql(k) query, the Q formula
    mirrors operators/graphstats.py modularity term-for-term."""
    return f"""
    WITH labels AS MATERIALIZED (SELECT * FROM ({_lpa_rounds_sql(k)}) lq),
    edges AS MATERIALIZED ({_EDGES_SQL}),
    und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
    m AS (SELECT count(*) AS c FROM und),
    tagged AS MATERIALIZED (
        SELECT la.label AS ca, lb.label AS cb
        FROM und JOIN labels la ON und.a = la.id
                 JOIN labels lb ON und.b = lb.id),
    intra AS (SELECT ca AS comm, count(*) AS mc FROM tagged
              WHERE ca = cb GROUP BY ca),
    deg AS (SELECT comm, count(*) AS dc FROM (
                SELECT ca AS comm FROM tagged
                UNION ALL SELECT cb FROM tagged) u GROUP BY comm),
    per_c AS (
        SELECT coalesce(intra.mc, 0) / (SELECT c FROM m)::DOUBLE
               - (deg.dc / (2.0 * (SELECT c FROM m)))
                 * (deg.dc / (2.0 * (SELECT c FROM m))) AS q
        FROM deg LEFT JOIN intra ON deg.comm = intra.comm)
    SELECT (SELECT c FROM m) AS n_edges,
           count(*) AS n_communities,
           round(sum(q), 6) AS modularity
    FROM per_c
    """


# Injective deterministic vertex priority shared by the MIS / coloring
# oracles — exact mirror of operators/mis.py _priority (Knuth hash of
# functions/sampling.hash_bucket, id appended): all BIGINT-safe for
# ids < 2^31.
_MIS_PRI_SQL = "((id % 2147483648) * 2654435761) % 4294967296 * 2147483648 + id"


def _mis_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled k-round deterministic Luby MIS (operators/mis.py
    luby_mis): round r selects undecided vertices whose priority beats
    every undecided neighbor's, then removes them and their neighbors.
    Post-fixpoint rounds are identity, so unrolling past convergence is
    safe."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM e "
        "UNION ALL SELECT dst AS u, src AS v FROM e) t WHERE u <> v)",
        f"u0 AS MATERIALIZED (SELECT id, {_MIS_PRI_SQL} AS pri FROM verts)",
    ]
    for r in range(1, k + 1):
        parts += [
            f"s{r} AS MATERIALIZED (SELECT u.id FROM u{r - 1} u LEFT JOIN ("
            f"SELECT s.v AS id, max(w.pri) AS npri"
            f" FROM sym s JOIN u{r - 1} w ON s.u = w.id GROUP BY s.v) nm"
            f" ON u.id = nm.id"
            f" WHERE nm.npri IS NULL OR u.pri > nm.npri)",
            f"u{r} AS MATERIALIZED (SELECT * FROM u{r - 1}"
            f" WHERE id NOT IN (SELECT id FROM s{r})"
            f" AND id NOT IN (SELECT s.v FROM sym s"
            f" JOIN s{r} ON s.u = s{r}.id))",
        ]
    picked = " UNION ALL ".join(
        f"SELECT id, {r} AS mis_round FROM s{r}" for r in range(1, k + 1)
    )
    return (
        ",\n".join(parts)
        + f""",
    picked AS ({picked})
    SELECT verts.id, picked.id IS NOT NULL AS in_mis,
           coalesce(picked.mis_round, 0) AS mis_round
    FROM verts LEFT JOIN picked ON verts.id = picked.id"""
    )


def _louvain_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled k-round bounded Louvain (operators/louvain.py
    louvain_bounded): synchronous gain-argmax moves over the alternating
    parity class, in EXACT 64-bit integer arithmetic — score(v, c) =
    2m * k_{v,c} - deg(v) * (tot(c) - [c = c_v] deg(v)), ties to the
    smaller community label, singleton pairs may only merge toward the
    smaller label. Integer law => bit-identical to the engine."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM e "
        "UNION ALL SELECT dst AS u, src AS v FROM e) t WHERE u <> v)",
        "dg AS MATERIALIZED (SELECT u AS id, count(*)::BIGINT AS deg"
        " FROM sym GROUP BY u)",
        "m AS MATERIALIZED (SELECT sum(deg)::BIGINT AS m2 FROM dg)",
        "l0 AS MATERIALIZED (SELECT id, id AS c FROM dg)",
    ]
    for i in range(1, k + 1):
        p = (i - 1) % 2
        parts += [
            # community degree totals + sizes under the round-entry labels
            f"tot{i} AS MATERIALIZED (SELECT l.c, sum(d.deg)::BIGINT AS tot,"
            f" count(*)::BIGINT AS csize"
            f" FROM l{i - 1} l JOIN dg d ON l.id = d.id GROUP BY l.c)",
            # k_{v,c}: edge weight from v into each neighboring community
            f"kin{i} AS MATERIALIZED (SELECT s.u AS vid, l.c AS cand,"
            f" count(*)::BIGINT AS kin"
            f" FROM sym s JOIN l{i - 1} l ON s.v = l.id GROUP BY 1, 2)",
            # staying score (own kin coalesces to the zero own-candidate row)
            f"stay{i} AS MATERIALIZED (SELECT l.id AS vid, l.c AS c_cur,"
            f" d.deg, (SELECT m2 FROM m) * coalesce(k.kin, 0)"
            f" - d.deg * (t.tot - d.deg) AS stay_score,"
            f" t.csize AS own_size"
            f" FROM l{i - 1} l JOIN dg d ON l.id = d.id"
            f" JOIN tot{i} t ON t.c = l.c"
            f" LEFT JOIN kin{i} k ON k.vid = l.id AND k.cand = l.c)",
            # best non-own candidate: max score, ties to smaller label
            f"best{i} AS MATERIALIZED (SELECT vid, cand, score, csize FROM ("
            f"SELECT k.vid, k.cand,"
            f" (SELECT m2 FROM m) * k.kin - s.deg * t.tot AS score, t.csize,"
            f" row_number() OVER (PARTITION BY k.vid ORDER BY"
            f" (SELECT m2 FROM m) * k.kin - s.deg * t.tot DESC, k.cand ASC"
            f") AS rn"
            f" FROM kin{i} k JOIN stay{i} s ON k.vid = s.vid"
            f" JOIN tot{i} t ON t.c = k.cand"
            f" WHERE k.cand <> s.c_cur) z WHERE rn = 1)",
            # parity-gated strict-improvement move with the singleton guard
            f"l{i} AS MATERIALIZED (SELECT s.vid AS id,"
            f" CASE WHEN s.vid % 2 = {p} AND b.vid IS NOT NULL"
            f" AND b.score > s.stay_score"
            f" AND NOT (s.own_size = 1 AND b.csize = 1 AND b.cand > s.c_cur)"
            f" THEN b.cand ELSE s.c_cur END AS c"
            f" FROM stay{i} s LEFT JOIN best{i} b ON b.vid = s.vid)",
        ]
    return ",\n".join(parts) + f"\nSELECT id, c AS community FROM l{k}"


def _coloring_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled k-round Jones-Plassmann coloring (operators/mis.py
    jp_coloring): same selection rule as MIS, but only selected
    vertices leave; color = round index."""
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM e "
        "UNION ALL SELECT dst AS u, src AS v FROM e) t WHERE u <> v)",
        f"u0 AS MATERIALIZED (SELECT id, {_MIS_PRI_SQL} AS pri FROM verts)",
    ]
    for r in range(1, k + 1):
        parts += [
            f"s{r} AS MATERIALIZED (SELECT u.id FROM u{r - 1} u LEFT JOIN ("
            f"SELECT s.v AS id, max(w.pri) AS npri"
            f" FROM sym s JOIN u{r - 1} w ON s.u = w.id GROUP BY s.v) nm"
            f" ON u.id = nm.id"
            f" WHERE nm.npri IS NULL OR u.pri > nm.npri)",
            f"u{r} AS MATERIALIZED (SELECT * FROM u{r - 1}"
            f" WHERE id NOT IN (SELECT id FROM s{r}))",
        ]
    colored = " UNION ALL ".join(
        f"SELECT id, {r} AS color FROM s{r}" for r in range(1, k + 1)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM ({colored}) fin"


# Anchor expansion: the closed-form page text plus the sorted distinct
# incoming anchor texts (same multiset law as _ANCHOR_TEXT_SQL).
_ANCHOR_EXPANDED_SQL = """
    WITH pages AS MATERIALIZED (
        SELECT doc_id,
               'https://example.org/doc/' || doc_id AS url,
               'Doc ' || doc_id || chr(10)
                 || 'Synthetic page ' || doc_id || ' of '
                 || (SELECT count(*) FROM documents) || '.'
                 || CASE WHEN doc_id % 10 <> 0 THEN
                        chr(10) || 'next' || chr(10) || 'rel'
                        || CASE WHEN doc_id % 3 = 0
                                THEN chr(10) || 'again' ELSE '' END
                    ELSE '' END
                 || chr(10) || 'mail' AS text
        FROM documents),
    pairs AS (
        SELECT (doc_id + 1) % (SELECT count(*) FROM documents) AS dst,
               'next' AS t
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT (3 * doc_id + 7) % (SELECT count(*) FROM documents), 'rel'
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT (doc_id + 1) % (SELECT count(*) FROM documents), 'again'
        FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 3 = 0),
    an AS (
        SELECT dst,
               array_to_string(list_sort(list_distinct(list(t))), ' ')
                   AS atext
        FROM pairs GROUP BY dst)
    SELECT p.url,
           CASE WHEN an.atext IS NOT NULL
                THEN p.text || chr(10) || an.atext
                ELSE p.text END AS expanded_text
    FROM pages p LEFT JOIN an ON an.dst = p.doc_id
"""

# Crawl delta: the same two arithmetic sub-crawls and md5-compare CASE
# as q_crawl_delta.
_CRAWL_DELTA_SQL = """
    WITH o AS MATERIALIZED (
        SELECT 'https://example.org/doc/' || doc_id AS url,
               md5(text) AS oh
        FROM documents WHERE doc_id % 7 <> 0),
    n AS MATERIALIZED (
        SELECT 'https://example.org/doc/' || doc_id AS url,
               md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                        ELSE text END) AS nh
        FROM documents WHERE doc_id % 5 <> 0)
    SELECT coalesce(o.url, n.url) AS url,
           CASE WHEN o.url IS NULL THEN 'added'
                WHEN n.url IS NULL THEN 'removed'
                WHEN oh <> nh THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM o FULL OUTER JOIN n ON o.url = n.url
"""

# Feature propagation: identical ascending-u left fold as the engine
# (list(val ORDER BY u) + list_reduce with a prepended 0.0 accumulator)
# so every smoothed value is bit-identical; the division by (1 + nd)
# is exact double arithmetic in both engines.
_FEATPROP_SQL = """
    WITH e AS MATERIALIZED ({web_edges}),
    sym AS MATERIALIZED (SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM e
        UNION ALL SELECT dst AS u, src AS v FROM e) t WHERE u <> v),
    fe AS MATERIALIZED (
        SELECT vec_id AS id, t.i - 1 AS pos, embedding[t.i]::DOUBLE AS val
        FROM embeddings, unnest(generate_series(1, 64)) t(i)),
    nb AS MATERIALIZED (
        SELECT s.v AS id, f.pos,
               list_reduce(list_prepend(0.0, list(f.val ORDER BY s.u)),
                           (a, b) -> a + b) AS nsum,
               count(*) AS nd
        FROM sym s JOIN fe f ON s.u = f.id
        GROUP BY s.v, f.pos)
    SELECT fe.id, fe.pos,
           round((fe.val + coalesce(nb.nsum, 0.0))
                 / (1 + coalesce(nb.nd, 0)), 6) AS value
    FROM fe LEFT JOIN nb ON fe.id = nb.id AND fe.pos = nb.pos
"""

# Trending terms: closed-form page text (same literal construction as
# _WEB_PAGE_TEXT_SQL), warc_ts = 1704067200 + doc_id seconds
# (sources/pages_synth.py), 1-minute tumbling windows, count + top-5
# rank with (n desc, term asc) ties — integer counts, so the rank row
# set is engine-independent.
_TRENDING_TERMS_SQL = """
    WITH p AS MATERIALIZED (
        SELECT doc_id, 1704067200 + doc_id AS ts_sec,
               'Doc ' || doc_id || chr(10)
                 || 'Synthetic page ' || doc_id || ' of '
                 || (SELECT count(*) FROM documents) || '.'
                 || CASE WHEN doc_id % 10 <> 0 THEN
                        chr(10) || 'next' || chr(10) || 'rel'
                        || CASE WHEN doc_id % 3 = 0
                                THEN chr(10) || 'again' ELSE '' END
                    ELSE '' END
                 || chr(10) || 'mail' AS text
        FROM documents),
    tok AS (
        SELECT ts_sec // 60 * 60 AS window_start,
               unnest(string_split(text, ' ')) AS term
        FROM p),
    cnt AS (SELECT window_start, term, count(*) AS n FROM tok
            WHERE term <> '' GROUP BY 1, 2),
    rk AS (SELECT *, row_number() OVER (
               PARTITION BY window_start ORDER BY n DESC, term ASC)
               AS term_rank
           FROM cnt)
    SELECT window_start, term, n, term_rank FROM rk WHERE term_rank <= 5
"""

# Vocabulary Jaccard between language sub-corpora — same single-space
# tokenization as _TOKENS_SQL, distinct per (lang, term), pair join
# bounded by (#langs)^2 rows per term.
_VOCAB_OVERLAP_SQL = """
    WITH tok AS (
        SELECT lang AS g, unnest(string_split(text, ' ')) AS term
        FROM documents),
    v AS MATERIALIZED (
        SELECT DISTINCT g, term FROM tok WHERE term <> ''),
    sizes AS (SELECT g, count(*) AS vocab FROM v GROUP BY g),
    shared AS (
        SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_shared
        FROM v a JOIN v b ON a.term = b.term AND a.g < b.g
        GROUP BY 1, 2)
    SELECT group_a, group_b, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           n_shared,
           round(n_shared / (sa.vocab + sb.vocab - n_shared)::DOUBLE, 6)
               AS jaccard
    FROM shared
    JOIN sizes sa ON sa.g = group_a
    JOIN sizes sb ON sb.g = group_b
"""

# In-degree skew profile — mirrors operators/graphstats.py
# degree_skew_report term-for-term: distinct non-loop edges, vertex
# universe with zero-degree fill, rank-formula gini over the
# distinct-degree table in HUGEINT (exact), type-1 integer quantiles.
_DEGREE_SKEW_SQL = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we WHERE src <> dst),
    verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    degp AS MATERIALIZED (
        SELECT dst AS id, count(*) AS d FROM e GROUP BY dst),
    degt AS (SELECT verts.id, coalesce(degp.d, 0) AS d
             FROM verts LEFT JOIN degp ON verts.id = degp.id),
    dist AS (SELECT d, count(*) AS c FROM degt GROUP BY d),
    cum AS MATERIALIZED (
        SELECT d, c, sum(c) OVER (ORDER BY d) AS cum,
               d::HUGEINT * (c::HUGEINT *
                             (sum(c) OVER (ORDER BY d) - c)::HUGEINT
                             + (c::HUGEINT * (c + 1)::HUGEINT) // 2)
                   AS rank_term
        FROM dist),
    s AS (SELECT sum(c)::BIGINT AS n,
                 sum(d::HUGEINT * c::HUGEINT) AS sd,
                 sum(rank_term) AS si,
                 max(d) AS max_deg
          FROM cum),
    topk AS (SELECT coalesce(sum(d), 0)::BIGINT AS t FROM (
                 SELECT d FROM degp ORDER BY d DESC, id ASC LIMIT 10) tt)
    SELECT s.n AS n_vertices, s.sd::BIGINT AS n_edges, s.max_deg,
           (SELECT min(d) FROM cum WHERE cum >= (s.n * 50 + 99) // 100) AS p50,
           (SELECT min(d) FROM cum WHERE cum >= (s.n * 90 + 99) // 100) AS p90,
           (SELECT min(d) FROM cum WHERE cum >= (s.n * 99 + 99) // 100) AS p99,
           round(2.0 * s.si::DOUBLE / (s.n::DOUBLE * s.sd::DOUBLE)
                 - (s.n + 1.0) / s.n, 6) AS gini,
           round(topk.t::DOUBLE / s.sd::DOUBLE, 6) AS topk_share
    FROM s, topk
"""


def _fiedler_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled shifted/deflated power iteration for the Fiedler
    vector (operators/spectral.py): sigma = max_deg + 1, re-center to
    mean 0, L2-renormalize (IEEE sqrt both engines). Defines
    x{k}(id, d, x)."""
    parts = [
        f"WITH raw AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,"
        " greatest(src, dst) AS b FROM raw WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT a, b FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "deg AS MATERIALIZED (SELECT a AS id, count(*) AS d"
        " FROM sym GROUP BY a)",
        "x0 AS MATERIALIZED (SELECT id, d,"
        " ((2654435761 * id) % 4294967296)::DOUBLE / 4294967296.0"
        " - 0.5 AS x FROM deg)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"nb{i} AS MATERIALIZED (SELECT s.a AS id, sum(x.x) AS nbr"
            f" FROM sym s JOIN x{i - 1} x ON s.b = x.id GROUP BY s.a)",
            f"y{i} AS MATERIALIZED (SELECT x.id, x.d,"
            f" ((SELECT max(d) FROM deg) + 1.0 - x.d) * x.x"
            f" + coalesce(nb.nbr, 0) AS y"
            f" FROM x{i - 1} x LEFT JOIN nb{i} nb ON x.id = nb.id)",
            f"m{i} AS (SELECT sum(y)"
            f" / (SELECT count(*) FROM deg)::DOUBLE AS m FROM y{i})",
            f"c{i} AS MATERIALIZED (SELECT id, d,"
            f" y - (SELECT m FROM m{i}) AS c FROM y{i})",
            f"q{i} AS (SELECT CASE WHEN sqrt(sum(c * c)) = 0 THEN 1.0"
            f" ELSE sqrt(sum(c * c)) END AS q FROM c{i})",
            f"x{i} AS MATERIALIZED (SELECT id, d,"
            f" c / (SELECT q FROM q{i}) AS x FROM c{i})",
        ]
    return ",\n".join(parts) + "\n"


def _blockrank_init_sql(
    lr: int, hr: int, block: int, edges_sql: str
) -> str:
    """Unrolled BlockRank warm-start vector (operators/blockrank.py):
    lr local rounds per host block (teleport/dangling within block),
    host graph weighted by local-rank-scaled cross links, hr rounds
    of the wpagerank law, init = l * hostpr. Ends with the final
    SELECT (id, rank)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        f"verts AS MATERIALIZED (SELECT id, id // {block} AS host FROM"
        " (SELECT src AS id FROM edges UNION SELECT dst FROM edges) v)",
        "hsize AS MATERIALIZED (SELECT host, count(*) AS n_h"
        " FROM verts GROUP BY host)",
        f"intra AS MATERIALIZED (SELECT src, dst FROM edges"
        f" WHERE src // {block} = dst // {block})",
        "ideg AS MATERIALIZED (SELECT src AS id, count(*) AS ideg"
        " FROM intra GROUP BY src)",
        "lew AS MATERIALIZED (SELECT i.src, i.dst, 1e0 / d.ideg AS w"
        " FROM intra i JOIN ideg d ON i.src = d.id)",
        "vb AS MATERIALIZED (SELECT v.id, v.host, h.n_h,"
        " (d.id IS NULL) AS dang"
        " FROM verts v JOIN hsize h USING (host)"
        " LEFT JOIN ideg d ON v.id = d.id)",
        "l0 AS MATERIALIZED (SELECT id, host, n_h, 1e0 / n_h AS l"
        " FROM vb)",
    ]
    for i in range(1, lr + 1):
        parts += [
            f"lm{i} AS MATERIALIZED (SELECT vb.host,"
            f" coalesce(sum(p.l), 0) AS m"
            f" FROM vb JOIN l{i - 1} p ON vb.id = p.id"
            f" WHERE vb.dang GROUP BY vb.host)",
            f"lc{i} AS MATERIALIZED (SELECT lew.dst AS id,"
            f" sum(p.l * lew.w) AS contrib"
            f" FROM lew JOIN l{i - 1} p ON lew.src = p.id"
            f" GROUP BY lew.dst)",
            f"l{i} AS MATERIALIZED (SELECT vb.id, vb.host, vb.n_h,"
            f" (1e0 - 0.85e0) / vb.n_h"
            f" + 0.85e0 * coalesce(lm{i}.m, 0) / vb.n_h"
            f" + 0.85e0 * coalesce(lc{i}.contrib, 0) AS l"
            f" FROM vb LEFT JOIN lm{i} ON vb.host = lm{i}.host"
            f" LEFT JOIN lc{i} ON vb.id = lc{i}.id)",
        ]
    parts += [
        "gdeg AS MATERIALIZED (SELECT src AS id, count(*) AS gdeg"
        " FROM edges GROUP BY src)",
        f"he AS MATERIALIZED (SELECT e.src // {block} AS src,"
        f" e.dst // {block} AS dst, sum(l.l / g.gdeg) AS weight"
        f" FROM edges e JOIN gdeg g ON e.src = g.id"
        f" JOIN l{lr} l ON e.src = l.id"
        f" WHERE e.src // {block} <> e.dst // {block}"
        f" GROUP BY 1, 2)",
        "hv AS MATERIALIZED (SELECT DISTINCT host AS id FROM verts)",
        "hn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM hv)",
        "htot AS MATERIALIZED (SELECT src AS id, sum(weight) AS w_tot"
        " FROM he GROUP BY src HAVING sum(weight) > 0)",
        "hew AS MATERIALIZED (SELECT he.src, he.dst,"
        " he.weight / t.w_tot AS w FROM he JOIN htot t"
        " ON he.src = t.id)",
        "hdang AS MATERIALIZED (SELECT id FROM hv"
        " EXCEPT SELECT id FROM htot)",
        "h0 AS MATERIALIZED (SELECT id, 1e0 / (SELECT n FROM hn)"
        " AS rank FROM hv)",
    ]
    for i in range(1, hr + 1):
        parts += [
            f"hd{i} AS MATERIALIZED (SELECT coalesce(sum(rank), 0) AS m"
            f" FROM h{i - 1} WHERE id IN (SELECT id FROM hdang))",
            f"hc{i} AS MATERIALIZED (SELECT hew.dst AS id,"
            f" sum(r.rank * hew.w) AS contrib"
            f" FROM hew JOIN h{i - 1} r ON hew.src = r.id"
            f" GROUP BY hew.dst)",
            f"h{i} AS MATERIALIZED (SELECT v.id,"
            f" (1e0 - 0.85e0) / (SELECT n FROM hn)"
            f" + 0.85e0 * (SELECT m FROM hd{i}) / (SELECT n FROM hn)"
            f" + 0.85e0 * coalesce(hc{i}.contrib, 0) AS rank"
            f" FROM hv v LEFT JOIN hc{i} ON v.id = hc{i}.id)",
        ]
    parts_sql = ",\n".join(parts)
    return (
        parts_sql
        + f"\nSELECT l.id, round(l.l * h.rank, 6) AS rank"
        f" FROM l{lr} l JOIN h{hr} h ON l.host = h.id"
    )


def _seeded_lpa_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled seeded label propagation (operators/labelprop.py
    seeded_label_propagation: clamp seeds, majority of labeled
    neighbors, ties min label, keep-old when no labeled neighbor,
    NULL until reached). Seeds: doc_id % 50 == 0 with class
    (doc_id // 50) % 5."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges"
        " UNION SELECT dst AS id FROM edges)",
        "sym AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        "SELECT src AS u, dst AS v FROM edges"
        " UNION ALL SELECT dst AS u, src AS v FROM edges) t"
        " WHERE u <> v)",
        "sd AS MATERIALIZED (SELECT doc_id AS id,"
        " (doc_id // 50) % 5 AS slabel FROM documents"
        " WHERE doc_id % 50 = 0)",
        "b AS MATERIALIZED (SELECT v.id, sd.slabel FROM verts v"
        " LEFT JOIN sd ON v.id = sd.id)",
        "sl0 AS MATERIALIZED (SELECT id, slabel AS label FROM b)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"sc{i} AS MATERIALIZED (SELECT s.v AS vid, l.label,"
            f" count(*) AS cnt FROM sym s"
            f" JOIN sl{i - 1} l ON s.u = l.id"
            f" WHERE l.label IS NOT NULL GROUP BY 1, 2)",
            f"sb{i} AS MATERIALIZED (SELECT vid, label AS new_label"
            f" FROM (SELECT vid, label, row_number() OVER ("
            f"PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn"
            f" FROM sc{i}) t WHERE rn = 1)",
            f"sl{i} AS MATERIALIZED (SELECT b.id,"
            f" coalesce(b.slabel, sb.new_label, l.label) AS label"
            f" FROM b JOIN sl{i - 1} l USING (id)"
            f" LEFT JOIN sb{i} sb ON b.id = sb.vid)",
        ]
    return ",\n".join(parts) + f"\nSELECT id, label FROM sl{k}"


def _hitting_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled truncated-hitting-time value iteration
    (operators/hitting.py; targets = top-3 out-degree, ties min id;
    dangling self-holds). Defines h{k}(id, h)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        "deg AS MATERIALIZED (SELECT src AS id, count(*) AS od"
        " FROM edges GROUP BY src)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / d.od AS w"
        " FROM edges e JOIN deg d ON e.src = d.id)",
        "tg AS MATERIALIZED (SELECT src AS id FROM edges GROUP BY src"
        " ORDER BY count(*) DESC, src ASC LIMIT 3)",
        "verts AS MATERIALIZED (SELECT v.id,"
        " (v.id IN (SELECT id FROM tg)) AS is_t,"
        " (d.id IS NULL) AS dang"
        " FROM (SELECT src AS id FROM edges"
        " UNION SELECT dst FROM edges) v"
        " LEFT JOIN deg d ON v.id = d.id)",
        "h0 AS MATERIALIZED (SELECT id, 0.0 AS h FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"g{i} AS MATERIALIZED (SELECT ew.src AS id,"
            f" sum(p.h * ew.w) AS gh"
            f" FROM ew JOIN h{i - 1} p ON ew.dst = p.id"
            f" GROUP BY ew.src)",
            f"h{i} AS MATERIALIZED (SELECT v.id,"
            f" CASE WHEN v.is_t THEN 0.0"
            f" WHEN v.dang THEN 1.0 + p.h"
            f" ELSE 1.0 + coalesce(g.gh, 0.0) END AS h"
            f" FROM verts v JOIN h{i - 1} p ON v.id = p.id"
            f" LEFT JOIN g{i} g ON v.id = g.id)",
        ]
    return ",\n".join(parts) + "\n"


def _eigen_rounds_sql(k: int, edges_sql: str) -> str:
    """Unrolled L1-normalized eigenvector-centrality power iteration
    (operators/eigencentrality.py; edge multiplicity counts, zero-sum
    rounds guarded to a 1.0 divisor). Defines x{k}(id, v)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM edges"
        " UNION SELECT dst FROM edges)",
        "x0 AS MATERIALIZED (SELECT id,"
        " 1.0 / (SELECT count(*) FROM verts) AS v FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"g{i} AS MATERIALIZED (SELECT e.dst AS id, sum(x.v) AS raw"
            f" FROM edges e JOIN x{i - 1} x ON e.src = x.id"
            f" GROUP BY e.dst)",
            f"r{i} AS MATERIALIZED (SELECT verts.id,"
            f" coalesce(g{i}.raw, 0) AS raw"
            f" FROM verts LEFT JOIN g{i} ON verts.id = g{i}.id)",
            f"t{i} AS (SELECT CASE WHEN coalesce(sum(raw), 0) = 0"
            f" THEN 1.0 ELSE sum(raw) END AS t FROM r{i})",
            f"x{i} AS MATERIALIZED (SELECT id,"
            f" raw / (SELECT t FROM t{i}) AS v FROM r{i})",
        ]
    return ",\n".join(parts) + "\n"


def _wl_rounds_sql(rounds: int, edges_sql: str) -> str:
    """Unrolled Weisfeiler-Leman refinement (operators/wlrefine.py):
    md5 colors over (own, sorted out-multiset, sorted in-multiset),
    replayed string-for-string. Defines l{rounds}(id, lab)."""
    parts = [
        f"WITH raw AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src <> dst)",
        "verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "od AS (SELECT src AS id, count(*) AS c FROM e GROUP BY src)",
        "idg AS (SELECT dst AS id, count(*) AS c FROM e GROUP BY dst)",
        "l0 AS MATERIALIZED (SELECT v.id,"
        " md5(coalesce(od.c, 0)::VARCHAR || '.'"
        " || coalesce(idg.c, 0)::VARCHAR) AS lab"
        " FROM verts v LEFT JOIN od ON v.id = od.id"
        " LEFT JOIN idg ON v.id = idg.id)",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"o{r} AS (SELECT e.src AS id,"
            f" array_to_string(list_sort(list(l.lab)), ',') AS s"
            f" FROM e JOIN l{r - 1} l ON e.dst = l.id GROUP BY e.src)",
            f"i{r} AS (SELECT e.dst AS id,"
            f" array_to_string(list_sort(list(l.lab)), ',') AS s"
            f" FROM e JOIN l{r - 1} l ON e.src = l.id GROUP BY e.dst)",
            f"l{r} AS MATERIALIZED (SELECT l.id,"
            f" md5(l.lab || '|O:' || coalesce(o{r}.s, '')"
            f" || '|I:' || coalesce(i{r}.s, '')) AS lab"
            f" FROM l{r - 1} l LEFT JOIN o{r} ON l.id = o{r}.id"
            f" LEFT JOIN i{r} ON l.id = i{r}.id)",
        ]
    return ",\n".join(parts) + "\n"


# ppr_sweep tail appended to _ppr_rounds_sql(5): symmetrized simple
# graph, 12-decimal-rounded degree-normalized score order (ties by
# id — engine-portable, mirrors localcluster.py), per-edge
# max-prefix-rank histogram, cumulative vol/internal windows, one
# division at output.
_SWEEP_TAIL_SQL = """
    , und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
    udeg AS MATERIALIZED (
        SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM und UNION ALL SELECT b FROM und) v
        GROUP BY id),
    ranked AS MATERIALIZED (
        SELECT id, d, row_number() OVER (ORDER BY score DESC, id ASC) AS t
        FROM (SELECT p.id, udeg.d, round(p.rank / udeg.d, 12) AS score
              FROM p{k} p JOIN udeg ON p.id = udeg.id) sc
        ORDER BY score DESC, id ASC LIMIT {m}),
    eint AS (SELECT greatest(ra.t, rb.t) AS te, count(*) AS ce
             FROM und JOIN ranked ra ON und.a = ra.id
                      JOIN ranked rb ON und.b = rb.id GROUP BY 1),
    sweep AS (
        SELECT r.t, r.id,
               sum(r.d) OVER (ORDER BY r.t) AS vol,
               sum(coalesce(e.ce, 0)) OVER (ORDER BY r.t) AS ei
        FROM ranked r LEFT JOIN eint e ON e.te = r.t)
    SELECT t, id, vol::BIGINT AS vol, (vol - 2 * ei)::BIGINT AS cut,
           round((vol - 2.0 * ei)
                 / least(vol, (SELECT sum(d) FROM udeg) - vol), 6)
               AS conductance
    FROM sweep
    WHERE least(vol, (SELECT sum(d) FROM udeg) - vol) > 0
"""


# rich_club term-for-term: canonical distinct undirected edges,
# degrees, per-edge min-degree histogram + node-degree histogram on
# the merged threshold domain, club counts as cumulative complements,
# one division at output (graphstats.py rich_club).
_RICH_CLUB_SQL = """
    WITH raw AS MATERIALIZED ({edges}),
    e AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM raw WHERE src <> dst),
    deg AS MATERIALIZED (
        SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM e UNION ALL SELECT b FROM e) v
        GROUP BY id),
    em AS (SELECT least(da.d, db.d) AS m, count(*) AS ce
           FROM e JOIN deg da ON e.a = da.id JOIN deg db ON e.b = db.id
           GROUP BY 1),
    nh AS (SELECT d, count(*) AS cn FROM deg GROUP BY d),
    dom AS (
        SELECT k, sum(cn) AS cn, sum(ce) AS ce FROM (
            SELECT d AS k, cn, 0 AS ce FROM nh
            UNION ALL SELECT m, 0, ce FROM em
            UNION ALL SELECT 0, 0, 0) u GROUP BY k),
    cum AS (
        SELECT k,
               (SELECT sum(cn) FROM dom)
                   - sum(cn) OVER (ORDER BY k) AS club_nodes,
               (SELECT sum(ce) FROM dom)
                   - sum(ce) OVER (ORDER BY k) AS club_edges
        FROM dom)
    SELECT k, club_nodes::BIGINT AS club_nodes,
           club_edges::BIGINT AS club_edges,
           round(2.0 * club_edges::DOUBLE
                 / (club_nodes::DOUBLE * (club_nodes - 1)::DOUBLE), 6)
               AS phi
    FROM cum WHERE club_nodes >= 2
"""


# Curation chain in SQL: min-id-per-md5 keep set, then the same quality
# / token expressions as the doc_quality and doc_stats oracles, then
# the allow-list and bands, aggregated per lang.
_CURATION_SQL = """
    WITH kept AS (
        SELECT d.* FROM documents d
        JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_id
              FROM documents GROUP BY md5(text)) k
          ON d.doc_id = k.doc_id),
    scored AS (
        SELECT lang,
               len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_tokens,
               round(((CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0
                            ELSE least(length(text)::DOUBLE / 200.0, 1.0) END)
                      + (CASE WHEN (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                                    / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1))
                                   BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
                      + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                        / greatest(length(text), 1)) / 3.0, 6) AS quality
        FROM kept)
    SELECT lang, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
           round(avg(quality), 6) AS avg_quality
    FROM scored
    WHERE lang IN ('en', 'de') AND quality >= 0.5
      AND n_tokens BETWEEN 10 AND 100000
    GROUP BY lang
"""


def _strat_sample_sql() -> str:
    """Mirror of q_stratified_sample: same fold/multiply/threshold
    arithmetic as functions/sampling.py, thresholds per stratum."""
    from dxa_pagerank_spark.functions.sampling import MOD, _FOLD, KNUTH

    def thr(rate: float) -> int:
        return int(rate * MOD)

    return f"""
        SELECT doc_id, lang FROM documents
        WHERE (((doc_id + 1) % {_FOLD} + {_FOLD}) % {_FOLD} * {KNUTH}) % {MOD}
              < (CASE lang WHEN 'de' THEN {thr(0.25)}
                           WHEN 'en' THEN {thr(0.5)}
                           ELSE {thr(0.1)} END)
    """


def _wpagerank_rounds_sql(k: int, edges_sql: str, verts_sql: str) -> str:
    """Unrolled k-round WEIGHTED PageRank (operators/wpagerank.py
    semantics: contribution proportional to weight/out-weight, dangling
    mass summed from the CURRENT ranks and redistributed uniformly,
    no reference round-1 quirk). Defines CTE `final(id, rank)`.
    Float literals use e-notation so DuckDB parses them as DOUBLE and
    the IEEE expression tree matches the engine's driver arithmetic."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        f"verts AS MATERIALIZED ({verts_sql})",
        "nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM verts)",
        "tot AS MATERIALIZED (SELECT src AS id, sum(weight) AS w_tot"
        " FROM edges GROUP BY src HAVING sum(weight) > 0)",
        "ew AS MATERIALIZED (SELECT e.src, e.dst, e.weight/t.w_tot AS w"
        " FROM edges e JOIN tot t ON e.src = t.id)",
        "dang AS MATERIALIZED (SELECT id FROM verts EXCEPT SELECT id FROM tot)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nv) AS rank FROM verts)",
    ]
    for i in range(1, k + 1):
        parts += [
            f"d{i} AS MATERIALIZED (SELECT coalesce(sum(rank),0) AS m"
            f" FROM r{i - 1} WHERE id IN (SELECT id FROM dang))",
            f"c{i} AS MATERIALIZED (SELECT ew.dst AS id, sum(r.rank*ew.w) AS contrib"
            f" FROM ew JOIN r{i - 1} r ON ew.src = r.id GROUP BY ew.dst)",
            # engine: rank = ((1-d)/n + d*dmass/n) + d*coalesce(contrib,0)
            f"r{i} AS MATERIALIZED (SELECT v.id,"
            f" (1e0 - 0.85e0)/(SELECT n FROM nv)"
            f" + 0.85e0*(SELECT m FROM d{i})/(SELECT n FROM nv)"
            f" + 0.85e0*coalesce(c{i}.contrib,0) AS rank"
            f" FROM verts v LEFT JOIN c{i} ON v.id = c{i}.id)",
        ]
    parts.append(f"final AS (SELECT id, rank FROM r{k})")
    return ",\n".join(parts) + "\n"


# Closed-form expected extraction output per page (title node, body
# node, anchor-text nodes in document order, joined by \n — the frozen
# extractor's rules over the generated single-line html).
_WEB_PAGE_TEXT_SQL = """
    SELECT 'https://example.org/doc/' || doc_id AS url,
           'Doc ' || doc_id || chr(10)
             || 'Synthetic page ' || doc_id || ' of '
             || (SELECT count(*) FROM documents) || '.'
             || CASE WHEN doc_id % 10 <> 0 THEN
                    chr(10) || 'next' || chr(10) || 'rel'
                    || CASE WHEN doc_id % 3 = 0
                            THEN chr(10) || 'again' ELSE '' END
                ELSE '' END
             || chr(10) || 'mail' AS text,
           'en' AS lang
    FROM documents
"""


def _sql_double(x: float) -> str:
    """Literal that DuckDB parses directly as DOUBLE (exponent forces the
    DOUBLE parser — a plain decimal literal would go through DECIMAL and
    can land one ulp off for 17-significant-digit values)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"


def _ann_topk_lsh_sql(k: int = 10, n_bits: int = 16, n_blocks: int = 4) -> str:
    """Exact SQL oracle for lsh_topk: the seeded hyperplanes are embedded
    as DOUBLE literals and every dot product uses the same left-fold
    order as the engine's F.aggregate, so signatures, buckets, candidate
    sets and cosine ranks are bit-identical — SQL reproduces the whole
    approximation family, not just a weaker invariant."""
    from dxa_pagerank_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(64, n_bits, seed=7)
    plane_rows = ",".join(
        "(%d, [%s])" % (j, ",".join(_sql_double(x) for x in p))
        for j, p in enumerate(planes)
    )

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), "
            "(x, y) -> x + y)"
        )

    bpb = n_bits // n_blocks
    mask = (1 << bpb) - 1
    return f"""
        WITH planes AS MATERIALIZED (
          SELECT * FROM (VALUES {plane_rows}) AS t(j, p)),
        e AS MATERIALIZED (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sigs AS MATERIALIZED (
          SELECT e.vec_id,
                 sum(CASE WHEN {dot("p", "v")} > 0
                          THEN (1::BIGINT << j) ELSE 0 END) AS sig
          FROM e CROSS JOIN planes GROUP BY e.vec_id),
        qs AS MATERIALIZED (
          SELECT vec_id AS query_id, sig AS qsig FROM sigs WHERE vec_id < 5),
        cand AS MATERIALIZED (
          SELECT DISTINCT q.query_id, c.vec_id
          FROM qs q
          CROSS JOIN (SELECT unnest(range(0, {n_blocks})) AS b) bl
          JOIN sigs c
            ON ((q.qsig >> ({bpb} * bl.b)) & {mask})
             = ((c.sig >> ({bpb} * bl.b)) & {mask})),
        scored AS MATERIALIZED (
          SELECT cand.query_id, cand.vec_id,
                 {dot("q.v", "c.v")}
                   / (sqrt({dot("q.v", "q.v")}) * sqrt({dot("c.v", "c.v")}))
                   AS cos
          FROM cand
          JOIN e q ON q.vec_id = cand.query_id
          JOIN e c ON c.vec_id = cand.vec_id),
        ranked AS (
          SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, vec_id) AS rnk
          FROM scored)
        SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rnk::INT AS rnk
        FROM ranked WHERE rnk <= {k}
    """


# The composite quality expression (functions/textstats.quality_col) in
# DuckDB SQL — the same arithmetic the corpus_curation oracle inlines.
_QUALITY_EXPR_SQL = """
    round(((CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1.0
                 ELSE least(length(text)::DOUBLE / 200.0, 1.0) END)
           + (CASE WHEN (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                         / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1))
                        BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
           + length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
             / greatest(length(text), 1)) / 3.0, 6)
"""

# Line-level boilerplate (functions/boilerplate.py) over the synthetic
# crawl: the pages' closed-form text is regenerated arithmetically
# (same CTE as web_page_text), exploded into positioned lines in SQL.
_LINES_CTE = f"""
    pages AS MATERIALIZED ({_WEB_PAGE_TEXT_SQL}),
    nd AS (SELECT count(*)::DOUBLE AS n FROM pages),
    lines AS MATERIALIZED (
        SELECT url, unnest(string_split(text, chr(10))) AS line,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        FROM pages),
    boiler AS MATERIALIZED (
        SELECT line, count(DISTINCT url) AS n_docs FROM lines GROUP BY line
        HAVING count(DISTINCT url) >= 2
           AND count(DISTINCT url) > 0.5 * (SELECT n FROM nd))
"""

_WEB_BOILERPLATE_LINES_SQL = f"""
    WITH {_LINES_CTE}
    SELECT line, n_docs,
           round(n_docs / (SELECT n FROM nd), 9) AS doc_frac
    FROM boiler
"""

_WEB_LINE_DEDUP_SQL = f"""
    WITH {_LINES_CTE}
    SELECT l.url AS id,
           coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS text,
           sum(CASE WHEN b.line IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_lines_kept,
           sum(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_lines_dropped
    FROM lines l LEFT JOIN boiler b ON l.line = b.line
    GROUP BY l.url
"""

# Gopher repetition stats: n-grams built with list lambdas per doc,
# exploded, counted, then left-joined back so gram-less (doc, n) rows
# survive with zeros — functions/repetition.py semantics.
_REPETITION_STATS_SQL = """
    WITH toks AS MATERIALIZED (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
        FROM documents),
    g AS MATERIALIZED (
        SELECT doc_id, 2 AS n,
               CASE WHEN len(l) >= 2 THEN list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i+1]) ELSE [] END AS grams
        FROM toks
        UNION ALL
        SELECT doc_id, 3,
               CASE WHEN len(l) >= 3 THEN list_transform(range(1, len(l) - 1),
                    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) ELSE [] END
        FROM toks),
    ex AS (SELECT doc_id, n, unnest(grams) AS gram FROM g),
    pg AS (SELECT doc_id, n, gram, count(*) AS cnt FROM ex
           GROUP BY doc_id, n, gram),
    agg AS (SELECT doc_id, n, sum(cnt) AS total, count(*) AS dist,
                   max(cnt) AS top
            FROM pg GROUP BY doc_id, n)
    SELECT g.doc_id AS id, g.n,
           coalesce(total, 0)::BIGINT AS total_grams,
           coalesce(dist, 0)::BIGINT AS distinct_grams,
           coalesce(top, 0)::BIGINT AS top_gram_count,
           round(CASE WHEN coalesce(total, 0) > 0
                      THEN top::DOUBLE / total::DOUBLE ELSE 0.0 END, 9)
               AS top_gram_frac,
           round(CASE WHEN coalesce(total, 0) > 0
                      THEN (total - dist)::DOUBLE / total::DOUBLE
                      ELSE 0.0 END, 9) AS dup_gram_frac
    FROM g LEFT JOIN agg ON g.doc_id = agg.doc_id AND g.n = agg.n
"""

# PII masking over deterministically augmented text (functions/pii.py
# MASKS patterns — Java-regex/RE2-portable by construction).
_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_MASKED_SQL = f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com at 10.'
                    || (doc_id % 256) || '.0.1 now' AS t
        FROM documents)
    SELECT doc_id AS id,
           regexp_replace(regexp_replace(t, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PII_IP_RE}', '<IP>', 'g') AS text,
           len(regexp_extract_all(t, '{_PII_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{_PII_IP_RE}'))::BIGINT AS n_ips
    FROM aug
"""


def _quality_weighted_sample_sql() -> str:
    """Mirror of q_quality_weighted_sample: quality expression + the
    weighted-sample hash predicate (functions/sampling.py)."""
    from dxa_pagerank_spark.functions.sampling import (
        weighted_sample_sql_predicate,
    )

    pred = weighted_sample_sql_predicate("doc_id", "quality", power=2, salt=3)
    return f"""
        WITH scored AS (
            SELECT doc_id, {_QUALITY_EXPR_SQL} AS quality FROM documents)
        SELECT doc_id, quality FROM scored WHERE {pred}
    """


# IVF-flat ANN (functions/similarity.ivf_topk): centroids are the
# arithmetic sample vec_id % stride == 0 (stride = n // 16), corpus and
# queries assign by max-cosine (ties to smaller cid), queries probe the
# 4 nearest lists, exact re-rank inside.
_ANN_TOPK_IVF_SQL = """
    WITH nn AS (SELECT count(*) // 16 AS stride FROM embeddings),
    cents AS MATERIALIZED (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
        WHERE vec_id % (SELECT stride FROM nn) = 0
          AND vec_id < (SELECT stride FROM nn) * 16),
    assign AS MATERIALIZED (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv)
                            DESC, c.cid) AS r
        FROM embeddings e CROSS JOIN cents c),
    lists AS (SELECT cid, vec_id, v FROM assign WHERE r = 1),
    qprobe AS (
        SELECT a.vec_id AS query_id, a.v AS qv, a.cid
        FROM assign a WHERE a.vec_id < 5 AND a.r <= 4),
    scored AS (
        SELECT p.query_id, l.vec_id,
               list_cosine_similarity(p.qv, l.v) AS cos
        FROM lists l JOIN qprobe p ON l.cid = p.cid),
    ranked AS (
        SELECT query_id, vec_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id) AS rnk
        FROM scored)
    SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rnk::INT AS rnk
    FROM ranked WHERE rnk <= 10
"""

# URL canonicalization: input AND expected output are both closed-form
# arithmetic cases of doc_id (functions/urlnorm.py rules).
def _rmat_hist_sql(scale: int, n_edges: int, seed: int) -> str:
    """Replay of q_rmat_degree_histogram: the shared bit-exact edge
    regeneration (_rmat_edges_sql) plus the two-level degree rollup."""
    return f"""
    WITH e AS MATERIALIZED ({_rmat_edges_sql(scale, n_edges, seed)}),
    deg AS (SELECT src, count(*)::BIGINT AS out_deg
            FROM e GROUP BY src)
    SELECT out_deg, count(*)::BIGINT AS n_sources
    FROM deg GROUP BY out_deg
    """


# Link delta: replay of q_link_delta — identical perturbation law,
# set-compare via full outer join.
_LINK_DELTA_SQL_TMPL = """
    WITH o AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    n AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM o WHERE (src + dst) % 13 <> 0
            UNION ALL
            SELECT doc_id AS src,
                   (doc_id * 7 + 3) % (SELECT count(*) FROM documents)
                       AS dst
            FROM documents WHERE doc_id % 5 = 0) u),
    d AS (
        SELECT coalesce(o.src, n.src) AS src,
               coalesce(o.dst, n.dst) AS dst,
               CASE WHEN o.src IS NULL THEN 'added'
                    WHEN n.src IS NULL THEN 'removed'
                    ELSE 'kept' END AS status
        FROM o FULL OUTER JOIN n ON o.src = n.src AND o.dst = n.dst)
"""

_LINK_DELTA_REPORT_TAIL = """
    SELECT sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT
               AS n_added,
           sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT
               AS n_removed,
           sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END)::BIGINT
               AS n_kept,
           count(DISTINCT CASE WHEN status <> 'kept' THEN src END)::BIGINT
               AS n_affected_sources,
           round((sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
                  + sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END))
                 ::DOUBLE
                 / (sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
                    + sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END)),
                 6) AS edge_churn
    FROM d
"""


# Adjacency compression: replay of plans/compression.py over the same
# distinct edge set — first gap dst+1, then successor differences,
# gamma = 2*blen-1, delta = blen-1 + 2*blen(blen)-1, blen via
# length(bin(x)) (integer-exact in both engines).
_ADJ_COMPRESSION_SQL_TMPL = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({web_edges}) we),
    g AS (
        SELECT src,
               CASE WHEN lag(dst) OVER w IS NULL THEN dst + 1
                    ELSE dst - lag(dst) OVER w END AS gap
        FROM e WINDOW w AS (PARTITION BY src ORDER BY dst)),
    b AS (
        SELECT src, length(bin(gap)) AS bl,
               length(bin(length(bin(gap)))) AS bl2
        FROM g),
    p AS (
        SELECT src, count(*)::BIGINT AS deg,
               sum(2 * bl - 1)::BIGINT AS gb,
               sum(bl - 1 + 2 * bl2 - 1)::BIGINT AS db
        FROM b GROUP BY src)
    SELECT count(*)::BIGINT AS n_sources,
           sum(deg)::BIGINT AS n_edges,
           sum(gb)::BIGINT AS gamma_bits,
           sum(db)::BIGINT AS delta_bits,
           round(sum(gb)::DOUBLE / sum(deg), 6) AS gamma_bpe,
           round(sum(db)::DOUBLE / sum(deg), 6) AS delta_bpe,
           (sum(deg) * 64)::BIGINT AS raw_bits,
           round((sum(deg) * 64)::DOUBLE / sum(gb), 6) AS gamma_ratio
    FROM p
"""


# Crawl traps: replay of q_crawl_traps — the identical arithmetic url
# synthesis, the functions/traps.py template rewrite (hex runs >= 8 ->
# {h} first, then digit runs -> {d}, fragment dropped), and the
# (min_pages=10, min_share=0.5) thresholds.
_CRAWL_TRAPS_SQL = """
    WITH u AS (
        SELECT CASE WHEN doc_id % 20 = 0
                    THEN 'http://site0.test/cal/' || doc_id || '/'
                         || ((doc_id * 7) % 97)
                    ELSE 'http://site' || (doc_id % 20) || '.test/'
                         || (['about','news','blog','docs','shop','help',
                              'wiki'])[(doc_id % 7) + 1]
                         || '/' || doc_id
               END AS url
        FROM documents),
    t AS (
        SELECT lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
               regexp_replace(regexp_replace(
                   regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1),
                   '[0-9a-fA-F]{8,}', '{h}', 'g'),
                   '[0-9]+', '{d}', 'g') AS template
        FROM u),
    pt AS (SELECT host, template, count(*)::BIGINT AS n_urls
           FROM t GROUP BY 1, 2),
    ph AS (SELECT host, sum(n_urls)::BIGINT AS host_pages
           FROM pt GROUP BY 1)
    SELECT pt.host, template, n_urls, host_pages,
           round(n_urls::DOUBLE / host_pages, 6) AS share,
           (n_urls >= 10 AND n_urls::DOUBLE / host_pages >= 0.5) AS is_trap
    FROM pt JOIN ph USING (host)
"""


_URL_CANONICAL_SQL = """
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN 'HTTP://Example.ORG:80/doc/' || doc_id
                         || '?utm_source=feed&b=' || doc_id || '&a=1#top'
             WHEN 1 THEN 'https://EXAMPLE.org:443/doc/' || doc_id
             WHEN 2 THEN 'https://Example.org/?fbclid=' || doc_id
             ELSE 'http://example.org/A/B?z=26&y=25&x=' || doc_id
           END AS url,
           CASE doc_id % 4
             WHEN 0 THEN 'http://example.org/doc/' || doc_id
                         || '?a=1&b=' || doc_id
             WHEN 1 THEN 'https://example.org/doc/' || doc_id
             WHEN 2 THEN 'https://example.org'
             ELSE 'http://example.org/A/B?x=' || doc_id || '&y=25&z=26'
           END AS canonical_url
    FROM documents
"""

# Snapshot merge: regenerate the crawl + its day-later recrawl of every
# third page arithmetically, latest-wins per url in SQL.
_LATEST_SNAPSHOTS_SQL = """
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               'https://example.org/doc/' || doc_id AS url,
               1704067200 + doc_id AS ts_epoch,
               'Doc ' || doc_id || chr(10)
                 || 'Synthetic page ' || doc_id || ' of '
                 || (SELECT count(*) FROM documents) || '.'
                 || CASE WHEN doc_id % 10 <> 0 THEN
                        chr(10) || 'next' || chr(10) || 'rel'
                        || CASE WHEN doc_id % 3 = 0
                                THEN chr(10) || 'again' ELSE '' END
                    ELSE '' END
                 || chr(10) || 'mail' AS text
        FROM documents),
    snaps AS (
        SELECT url, ts_epoch, text FROM base
        UNION ALL
        SELECT url, ts_epoch + 86400, text || chr(10) || 'recrawl'
        FROM base WHERE doc_id % 3 = 0),
    ranked AS (
        SELECT url, ts_epoch, text,
               row_number() OVER (PARTITION BY url
                                  ORDER BY ts_epoch DESC, md5(text)) AS rn,
               count(*) OVER (PARTITION BY url) AS n_snapshots
        FROM snaps)
    SELECT url, ts_epoch, n_snapshots::BIGINT AS n_snapshots, text
    FROM ranked WHERE rn = 1
"""


def _training_mix_sql() -> str:
    """The full curation chain in one SQL statement: md5 min-id dedup,
    Gopher repetition gates (same rounded fractions as the engine),
    quality floor, weighted-sample predicate, per-source report."""
    from dxa_pagerank_spark.functions.sampling import (
        weighted_sample_sql_predicate,
    )

    pred = weighted_sample_sql_predicate("doc_id", "quality", power=1, salt=5)
    return f"""
        WITH kept0 AS MATERIALIZED (
            SELECT d.* FROM documents d
            JOIN (SELECT md5(text) AS h, min(doc_id) AS doc_id
                  FROM documents GROUP BY md5(text)) k
              ON d.doc_id = k.doc_id),
        toks AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), t -> t <> '') AS l
                 FROM kept0),
        g AS (
            SELECT doc_id, 2 AS n,
                   CASE WHEN len(l) >= 2 THEN list_transform(range(1, len(l)),
                        i -> l[i] || ' ' || l[i+1]) ELSE [] END AS grams
            FROM toks
            UNION ALL
            SELECT doc_id, 3,
                   CASE WHEN len(l) >= 3 THEN
                        list_transform(range(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                   ELSE [] END
            FROM toks),
        ex AS (SELECT doc_id, n, unnest(grams) AS gram FROM g),
        pg AS (SELECT doc_id, n, gram, count(*) AS cnt FROM ex
               GROUP BY doc_id, n, gram),
        agg AS (SELECT doc_id, n, sum(cnt) AS total, count(*) AS dist,
                       max(cnt) AS top
                FROM pg GROUP BY doc_id, n),
        bad AS (SELECT DISTINCT doc_id FROM agg
                WHERE total >= 20  -- repetition_filter min_grams floor
                  AND ((n = 2 AND round(top::DOUBLE / total::DOUBLE, 9) > 0.18)
                    OR (n = 3 AND round((total - dist)::DOUBLE
                                        / total::DOUBLE, 9) > 0.30))),
        scored AS (
            SELECT doc_id, source, {_QUALITY_EXPR_SQL} AS quality,
                   len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT
                       AS n_tokens
            FROM kept0
            WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        samp AS (SELECT * FROM scored WHERE quality >= 0.5 AND {pred})
        SELECT source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
               round(avg(quality), 6) AS avg_quality
        FROM samp GROUP BY source
    """


_DOC_LENGTH_QUANTILES_SQL = """
    SELECT lang, count(*) AS n_docs,
           round(quantile_cont(n_chars::DOUBLE, 0.25), 6) AS p25,
           round(quantile_cont(n_chars::DOUBLE, 0.5), 6) AS p50,
           round(quantile_cont(n_chars::DOUBLE, 0.75), 6) AS p75
    FROM documents GROUP BY lang
"""


_LANG_ID_SQL = r"""
            WITH h2 AS (
              SELECT doc_id, substr(coalesce(text, ''), 1, 2000) AS h
              FROM documents),
            w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(h), '[a-zA-Zäöüéèêàçñ]+') AS words,
                     length(regexp_replace(h, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
                     greatest(length(h), 1) AS hl
              FROM h2),
            c AS (
              SELECT doc_id, cjk, hl, words,
                len(list_filter(words, x -> list_contains(
                  ['the','and','of','to','is','that','with','for'], x))) AS c_en,
                len(list_filter(words, x -> list_contains(
                  ['der','die','und','das','ist','nicht','ein','mit'], x))) AS c_de,
                len(list_filter(words, x -> list_contains(
                  ['le','la','les','et','est','une','que','des'], x))) AS c_fr,
                len(list_filter(words, x -> list_contains(
                  ['el','la','los','que','es','una','por','con'], x))) AS c_es
              FROM w)
            SELECT doc_id,
              CASE
                WHEN cjk > 0 AND cjk::DOUBLE / hl > 0.05 THEN 'zh'
                WHEN len(words) = 0 THEN 'und'
                WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und'
                WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                WHEN c_en = greatest(c_en, c_fr, c_es) THEN 'en'
                WHEN c_es = greatest(c_fr, c_es) THEN 'es'
                ELSE 'fr'
              END AS lang_pred
            FROM c
        """


def _mul32_sql(h: str, c: int) -> str:
    """Exact 32-bit modular multiply (16-bit split), the SQL mirror of
    operators/anf.py _mul32."""
    return (
        f"((({h}) & 65535) * {c} + "
        f"(((({h}) >> 16) * {c}) & 65535) * 65536) & 4294967295"
    )


def _fmix32_stages_sql(src_cte: str, keep: str, expr: str) -> str:
    """CTE chain applying the murmur3 fmix32 finalizer to `expr` from
    `src_cte`, carrying the `keep` columns; ends with CTE fx(keep, h).
    Mirrors operators/anf.py fmix32 stage for stage. The first fold is
    sign-safe (double mod) because DuckDB `%` keeps the dividend's
    sign while Spark's F.pmod is always non-negative — a negative
    input (e.g. an xxhash64 group key) must land on the same residue
    in both engines."""
    return (
        f"f0 AS (SELECT {keep}, ((({expr}) % 2147483648) + 2147483648)"
        f" % 2147483648 AS h"
        f" FROM {src_cte}),\n"
        f"f1 AS (SELECT {keep}, xor(h, h >> 16) AS h FROM f0),\n"
        f"f2 AS (SELECT {keep}, {_mul32_sql('h', 0x85EBCA6B)} AS h"
        " FROM f1),\n"
        f"f3 AS (SELECT {keep}, xor(h, h >> 13) AS h FROM f2),\n"
        f"f4 AS (SELECT {keep}, {_mul32_sql('h', 0xC2B2AE35)} AS h"
        " FROM f3),\n"
        f"fx AS (SELECT {keep}, xor(h, h >> 16) AS h FROM f4)"
    )


def _hyperball_sql(
    rounds: int = 3, p: int = 4, edges_sql: str = _WEB_EDGES_SQL
) -> str:
    """Long-format replay of operators/anf.py hyperball: the identical
    fmix32 register law (16-bit-split multiplies, high-bit index,
    trailing-zero rho), k rounds of (id, j, max w) propagation along
    out-edges, then the same left-associated 2^-w fold and
    linear-counting branch. Ends with CTE est(id, zeros, est)."""
    m = 1 << p
    lowmask = (1 << (32 - p)) - 1
    alpha_mm = repr(0.673 * m * m)  # exact double literal, both engines
    mul1, mul2 = 0x85EBCA6B, 0xC2B2AE35
    mul32 = _mul32_sql

    parts = [
        f"WITH we AS MATERIALIZED ({edges_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM we"
        " WHERE src <> dst)",
        # vertex universe from the RAW edge set (a vertex appearing
        # only in self-loop edges still exists, ball = {itself}),
        # matching operators/anf.py hyperball's verts
        "verts AS MATERIALIZED (SELECT src AS id FROM we"
        " UNION SELECT dst FROM we)",
        # sign-safe first fold: DuckDB % keeps sign, Spark pmod doesn't
        "h0 AS (SELECT id, ((id % 2147483648) + 2147483648)"
        " % 2147483648 AS h FROM verts)",
        "h1 AS (SELECT id, xor(h, h >> 16) AS h FROM h0)",
        f"h2 AS (SELECT id, {mul32('h', mul1)} AS h FROM h1)",
        "h3 AS (SELECT id, xor(h, h >> 13) AS h FROM h2)",
        f"h4 AS (SELECT id, {mul32('h', mul2)} AS h FROM h3)",
        "hx AS MATERIALIZED (SELECT id, xor(h, h >> 16) AS h FROM h4)",
        f"r0 AS MATERIALIZED (SELECT id, h >> {32 - p} AS j,"
        f" CASE WHEN (h & {lowmask}) = 0 THEN {32 - p + 1}"
        f" ELSE bit_count(((h & {lowmask}) & -(h & {lowmask})) - 1) + 1"
        " END AS w FROM hx)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT id, j, max(w) AS w FROM ("
            f"SELECT id, j, w FROM r{t - 1} UNION ALL "
            f"SELECT e.src AS id, r.j, r.w FROM e"
            f" JOIN r{t - 1} r ON e.dst = r.id) GROUP BY id, j)"
        )
    pivots = ", ".join(
        f"coalesce(max(w) FILTER (WHERE j = {i}), 0) AS s{i}"
        for i in range(m)
    )
    ssum = " + ".join(f"pow(2.0, -s{i})" for i in range(m))
    zsum = " + ".join(
        f"(CASE WHEN s{i} = 0 THEN 1 ELSE 0 END)" for i in range(m)
    )
    parts += [
        f"piv AS (SELECT id, {pivots} FROM r{rounds} GROUP BY id)",
        f"fold AS (SELECT id, ({ssum}) AS s, ({zsum}) AS zeros FROM piv)",
        f"est AS (SELECT id, zeros, CASE WHEN {alpha_mm} / s <= {2.5 * m}"
        f" AND zeros > 0 THEN {float(m)} * ln({float(m)} / zeros)"
        f" ELSE {alpha_mm} / s END AS est FROM fold)",
    ]
    return ",\n".join(parts) + "\n"


def oracle_sql() -> dict[str, str]:
    from dxa_pagerank_spark.functions.sampling import temperature_sample_sql

    return {
        # the WARC reader must reproduce the synthetic html byte-for-byte;
        # the oracle rebuilds each page with the pages_synth closed form
        "warc_roundtrip": f"""
            WITH h AS (SELECT doc_id, {_SYNTH_HTML_SQL} AS html FROM documents)
            SELECT doc_id,
                   'https://example.org/doc/' || doc_id AS url,
                   octet_length(encode(html)) AS n_bytes,
                   md5(html) AS digest
            FROM h
        """,
        "warc_link_graph": f"SELECT src, dst FROM ({_WEB_EDGES_SQL}) we",
        # the sitemap entry rule in closed form: even ids listed, %10==0
        # ids advertise an /extra/ URL the crawl lacks, protocol-default
        # handling is exercised by the engine-side parse
        "sitemap_discovery": """
            SELECT doc_id // 25 AS host,
                   CASE WHEN doc_id % 10 = 0
                        THEN 'https://example.org/extra/' || doc_id
                        ELSE 'https://example.org/doc/' || doc_id END AS loc,
                   ((doc_id % 9) + 1) / 10.0 AS priority,
                   doc_id % 10 <> 0 AS crawled
            FROM documents WHERE doc_id % 2 = 0
        """,
        # one block per strategy: cut/load from the per-partition group,
        # ghost from the distinct (partition, dst) exchange set
        "partition_advisor": f"""
            WITH e AS MATERIALIZED (
                SELECT src, dst FROM ({_WEB_EDGES_SQL}) we),
            h AS (SELECT src % 8 AS ps, dst % 8 AS pd, dst FROM e),
            b AS (SELECT (src // 25) % 8 AS ps, (dst // 25) % 8 AS pd, dst
                  FROM e),
            hl AS (SELECT ps, count(*) AS load,
                          sum(CASE WHEN ps <> pd THEN 1 ELSE 0 END) AS cut
                   FROM h GROUP BY ps),
            bl AS (SELECT ps, count(*) AS load,
                          sum(CASE WHEN ps <> pd THEN 1 ELSE 0 END) AS cut
                   FROM b GROUP BY ps),
            nd AS (SELECT count(DISTINCT dst) AS n FROM e)
            SELECT 'hash8' AS strategy,
                   round(sum(cut)::DOUBLE / sum(load), 6) AS edge_cut_frac,
                   round(max(load)::DOUBLE / avg(load), 6) AS load_imbalance,
                   round((SELECT count(*) FROM (SELECT DISTINCT ps, dst
                          FROM h) x)::DOUBLE / (SELECT n FROM nd), 6)
                       AS ghost_factor
            FROM hl
            UNION ALL
            SELECT 'site_block8',
                   round(sum(cut)::DOUBLE / sum(load), 6),
                   round(max(load)::DOUBLE / avg(load), 6),
                   round((SELECT count(*) FROM (SELECT DISTINCT ps, dst
                          FROM b) x)::DOUBLE / (SELECT n FROM nd), 6)
            FROM bl
        """,
        # closed-form restatement of the synthesised robots rules
        # (banned h%5=0, delay-2 h%5=1, /doc/1 prefix h%5=2) + the
        # politeness-ranked schedule; the engine actually parses the txt
        "robots_schedule": """
            WITH f AS (
              SELECT doc_id AS id, doc_id // 25 AS host,
                     '/doc/' || doc_id AS path,
                     (7 * doc_id) % 101 AS priority
              FROM documents),
            allowed AS (
              SELECT * FROM f
              WHERE host % 5 <> 0
                AND NOT (host % 5 = 2 AND starts_with(path, '/doc/1'))),
            ranked AS (
              SELECT id, host,
                     row_number() OVER (
                       PARTITION BY host
                       ORDER BY priority DESC, id) AS host_rank
              FROM allowed),
            waves AS (
              SELECT id, host, host_rank,
                     (host_rank - 1)
                       // (CASE WHEN host % 5 = 1 THEN 1 ELSE 3 END) AS wave
              FROM ranked)
            SELECT id, host, host_rank, wave FROM waves WHERE wave < 4
        """,
        "site_simrank": _simrank_rounds_sql(
            3, 0.8, _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
        ),
        "out_degrees": f"""
            WITH edges AS ({_EDGES_SQL})
            SELECT src AS id, count(*) AS out_deg FROM edges GROUP BY src
        """,
        "degree_distribution": f"""
            WITH edges AS ({_EDGES_SQL}),
            deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)
            SELECT out_deg, count(*) AS n_vertices FROM deg GROUP BY out_deg
        """,
        "pagerank_2rounds": _PAGERANK_PRELUDE
        + "SELECT id, round(rank, 6) AS rank FROM final",
        "pagerank_10rounds": _pagerank_rounds_sql(10)
        + "SELECT id, round(rank, 6) AS rank FROM final",
        # resume is trajectory-invisible: 2 checkpointed + 2 resumed
        # rounds must equal the plain 4-round unroll
        "pagerank_resume_4rounds": _pagerank_rounds_sql(4)
        + "SELECT id, round(rank, 6) AS rank FROM final",
        # engine stops at L1 <= 1e-10; the fixed 60-round unroll is past
        # that point, and both sit ~1e-11-deep at the unique fixed point,
        # far inside the 6-dp rounding — verified exact-equal at sf0.01.
        "pagerank_converged": _pagerank_rounds_sql(60)
        + "SELECT id, round(rank, 6) AS rank FROM final",
        "hits_5rounds": _hits_rounds_sql(5)
        + "SELECT id, round(auth, 6) AS auth, round(hub, 6) AS hub FROM hs5",
        "web_salsa": _salsa_rounds_sql(4, _WEB_EDGES_SQL)
        + "SELECT id, round(auth, 6) AS auth, round(hub, 6) AS hub FROM ss4",
        "site_betweenness": _site_betweenness_sql(6),
        "site_sssp": _site_sssp_sql(20),
        # 24 unrolled peels >> observed peeling depth at sf0.01 (4); the
        # peel map is idempotent at the fixpoint, so slack is harmless
        "k_core_3": _kcore_sql(3, 24) + "SELECT id, degree FROM core",
        # 12 unrolled peels >> measured peeling depth at sf0.01 (6)
        "k_truss_4": _ktruss_sql(4, 12) + "SELECT u, v FROM e12",
        "ppr_5rounds": _ppr_rounds_sql(5)
        + "SELECT id, round(rank, 6) AS rank FROM p5",
        "local_community": _ppr_rounds_sql(5)
        + _SWEEP_TAIL_SQL.format(k=5, m=40),
        "web_eigencentrality": _eigen_rounds_sql(6, _WEB_EDGES_SQL)
        + "SELECT id, round(v, 6) AS centrality FROM x6",
        "fiedler_bisection": _fiedler_rounds_sql(8, _WEB_EDGES_SQL)
        + "SELECT id, round(x, 6) AS fiedler FROM x8",
        "wl_classes": _wl_rounds_sql(2, _WEB_EDGES_SQL)
        + "SELECT lab AS wl_label, count(*) AS n_vertices"
        " FROM l2 GROUP BY lab",
        "readability": """
            WITH c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-z]+'))
                           AS n_words,
                       greatest(len(regexp_extract_all(text, '[.!?]+')),
                                1) AS n_sentences,
                       len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                           AS n_syllables
                FROM documents)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   CASE WHEN n_words > 0 THEN
                       round(206.835
                             - 1.015 * (n_words::DOUBLE / n_sentences)
                             - 84.6 * (n_syllables::DOUBLE / n_words),
                             6)
                   END AS flesch_ease,
                   CASE WHEN n_words > 0 THEN
                       round(0.39 * (n_words::DOUBLE / n_sentences)
                             + 11.8 * (n_syllables::DOUBLE / n_words)
                             - 15.59, 6)
                   END AS fk_grade
            FROM c
        """,
        "top20_pagerank": _PAGERANK_PRELUDE
        + """SELECT id, round(rank, 6) AS rank FROM final
             ORDER BY round(rank, 6) DESC, id LIMIT 20""",
        "connected_components": _CC_COLD_SQL,
        "incremental_components": _CC_COLD_SQL,
        "component_histogram": f"""
            WITH base AS ({_CC_COLD_SQL})
            SELECT size, count(*) AS n_components FROM (
                SELECT component, count(*) AS size FROM base
                GROUP BY component)
            GROUP BY size
        """,
        "cc_one_round": f"""
            WITH edges AS ({_EDGES_SQL}),
            verts AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
            sym AS (SELECT DISTINCT u, v FROM (
                SELECT src AS u, dst AS v FROM edges
                UNION ALL SELECT dst AS u, src AS v FROM edges) t WHERE u <> v),
            nbrmin AS (SELECT v AS id, min(u) AS m FROM sym GROUP BY v)
            SELECT verts.id, least(verts.id, coalesce(nbrmin.m, verts.id)) AS component
            FROM verts LEFT JOIN nbrmin ON verts.id = nbrmin.id
        """,
        "lpa_one_round": f"""
            WITH edges AS ({_EDGES_SQL}),
            verts AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
            sym AS (SELECT DISTINCT u, v FROM (
                SELECT src AS u, dst AS v FROM edges
                UNION ALL SELECT dst AS u, src AS v FROM edges) t WHERE u <> v),
            cnt AS (SELECT v AS id, (u % 10) AS label, count(*) AS c FROM sym GROUP BY 1, 2),
            best AS (SELECT id, label FROM (
                SELECT id, label, row_number() OVER (
                    PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM cnt) t
                WHERE rn = 1)
            SELECT verts.id, coalesce(best.label, verts.id % 10) AS label
            FROM verts LEFT JOIN best ON verts.id = best.id
        """,
        "triangle_count": f"""
            WITH edges AS ({_EDGES_SQL}),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM edges WHERE src <> dst)
            SELECT count(*) AS n_triangles
            FROM und e1 JOIN und e2 ON e2.a = e1.b
                 JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "triangle_count_doulion": f"""
            WITH edges AS ({_EDGES_SQL}),
            und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                    FROM edges WHERE src <> dst),
            -- identical Lehmer-style hash to triangles._edge_hash_col
            -- (seed 7, rate 1/2): every intermediate < 2^52
            samp AS (SELECT a, b FROM und
                     WHERE ((((a % 2147483647) * 1000003
                              + (b % 2147483647) + 7) % 2147483647)
                            * 16807) % 2147483647 % 2 = 0)
            SELECT count(*) AS n_tri_sampled,
                   count(*) * 8 AS n_triangles_est
            FROM samp e1 JOIN samp e2 ON e2.a = e1.b
                 JOIN samp e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "clustering_coeff": f"""
            WITH edges AS MATERIALIZED ({_EDGES_SQL}),
            verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
            sym AS MATERIALIZED (SELECT DISTINCT u, v FROM (
                SELECT src AS u, dst AS v FROM edges
                UNION ALL SELECT dst AS u, src AS v FROM edges) t WHERE u <> v),
            deg AS MATERIALIZED (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
            und AS MATERIALIZED (SELECT u AS a, v AS b FROM sym WHERE u < v),
            tri AS MATERIALIZED (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1 JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
            tv AS MATERIALIZED (
                SELECT id, count(*) AS t FROM (
                    SELECT x AS id FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri) u GROUP BY id)
            SELECT verts.id,
                   round(CASE WHEN coalesce(deg.d, 0) >= 2
                              THEN 2.0 * coalesce(tv.t, 0) / (deg.d * (deg.d - 1))
                              ELSE 0.0 END, 6) AS clustering
            FROM verts
            LEFT JOIN deg ON verts.id = deg.id
            LEFT JOIN tv ON verts.id = tv.id
        """,
        "graph_summary": f"""
            WITH edges AS MATERIALIZED ({_EDGES_SQL})
            SELECT
              (SELECT count(*) FROM (SELECT src AS id FROM edges
                                     UNION SELECT dst FROM edges) v) AS n_vertices,
              (SELECT count(*) FROM edges) AS n_edges,
              (SELECT count(*) FROM (SELECT DISTINCT least(src, dst), greatest(src, dst)
                                     FROM edges WHERE src <> dst) u) AS n_und_edges,
              (SELECT count(*) FROM edges WHERE src = dst) AS n_self_loops,
              (SELECT count(*) FROM (SELECT DISTINCT x.src, x.dst FROM edges x
                   JOIN edges y ON x.src = y.dst AND x.dst = y.src
                   WHERE x.src <> x.dst) r) AS n_reciprocal
        """,
        "tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "supplier_revenue": """
            SELECT s.s_nationkey::BIGINT AS nationkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey
        """,
        "events_window_agg": """
            SELECT (floor(epoch(ts) / 300) * 300)::BIGINT AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "user_sessions": """
            WITH x AS (SELECT user_id, ts,
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT user_id,
                   count(*) FILTER (WHERE prev IS NULL OR epoch(ts) - epoch(prev) > 1800)
                       AS n_sessions
            FROM x GROUP BY user_id
        """,
        "doc_stats": """
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                         / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                         / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1), 6)
                       AS avg_token_len
            FROM documents
        """,
        "doc_quality": """
            WITH s AS (SELECT doc_id,
                length(text) AS n_chars,
                len(regexp_extract_all(text, '[A-Za-z]+')) AS n_tokens,
                length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))::DOUBLE
                    / greatest(length(text), 1) AS alpha_ratio,
                length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                    / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1) AS atl
              FROM documents)
            SELECT doc_id,
                   round(((CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 1.0
                                ELSE least(n_chars::DOUBLE / 200.0, 1.0) END)
                          + (CASE WHEN atl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
                          + alpha_ratio) / 3.0, 6) AS quality
            FROM s
        """,
        "substring_dup_spans": _SUBSTRING_SPANS_SQL,
        "substring_dedup_stats": _SUBSTRING_STATS_SQL,
        "bm25_topk": _BM25_SQL,
        "kmeans_clusters": _KMEANS_SQL,
        "pq_topk": _pq_sql(m=4, k=8, iters=2, dim=64, topk=10, n_queries=5),
        "jl_projection": _jl_sql(out_dim=8, seed=7, in_dim=64),
        "semdedup_prune": _SEMDEDUP_SQL,
        "bpe_merges": _bpe_cte_sql(8)
        + " UNION ALL ".join(
            f"SELECT {r}::INT AS merge_rank, x, y, n::BIGINT AS pair_count"
            f" FROM m{r}"
            for r in range(1, 9)
        ),
        "bpe_token_counts": _bpe_cte_sql(8)
        + """,
    tok AS (SELECT t AS token, sum(cnt)::BIGINT AS n FROM (
        SELECT unnest(list_filter(string_split(s, chr(31)),
                                  z -> z <> '')) AS t, cnt
        FROM s8) u GROUP BY t)
    SELECT token, n FROM tok ORDER BY n DESC, token ASC LIMIT 30
""",
        "dedup_exact_stats": """
            SELECT count(*) AS n_docs,
                   count(DISTINCT md5(text)) AS n_unique,
                   count(*) - count(DISTINCT md5(text)) AS n_dup
            FROM documents
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
                       FROM embeddings e CROSS JOIN q),
            ranked AS (SELECT query_id, vec_id, cos,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY cos DESC, vec_id) AS rnk
                       FROM scored)
            SELECT query_id, vec_id, round(cos, 6) AS cos_sim, rnk::INT AS rnk
            FROM ranked WHERE rnk <= 10
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
                       AS n_bpe_pieces
            FROM documents
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                               ' +'),
                           x -> x <> '') AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) >= 3 THEN
                           list_distinct(list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')))
                       ELSE [array_to_string(t, ' ')] END AS g
                FROM toks)
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   round(len(list_intersect(a.g, b.g))::DOUBLE
                         / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6)
                       AS jaccard
            FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
        """,
        # the rule (7x+13y+31*id+5c) mod 256 averaged over the 8x6 grid,
        # per channel — the engine must reproduce it through ENCODED
        # image bytes and the real decoder
        "image_decode_stats": """
            WITH ids AS (SELECT doc_id AS media_id FROM documents
                         WHERE doc_id % 3 = 0),
            grid AS (SELECT r1.range AS x, r2.range AS y
                     FROM range(0, 8) r1, range(0, 6) r2),
            px AS (SELECT i.media_id, c.c,
                          (7 * g.x + 13 * g.y + 31 * i.media_id + 5 * c.c)
                              % 256 AS v
                   FROM ids i, grid g, (VALUES (0), (1), (2)) c(c))
            SELECT media_id, 8::INT AS width, 6::INT AS height,
                   round(avg(CASE WHEN c = 0 THEN v END), 6) AS mean_r,
                   round(avg(CASE WHEN c = 1 THEN v END), 6) AS mean_g,
                   round(avg(CASE WHEN c = 2 THEN v END), 6) AS mean_b
            FROM px GROUP BY media_id
        """,
        # the rule ((3t+11*id) mod 256 - 128)*256 over 480 samples; the
        # engine reproduces it through ENCODED RIFF bytes + real decode
        "audio_decode_stats": """
            WITH ids AS (SELECT doc_id AS media_id FROM documents
                         WHERE doc_id % 3 = 1),
            s AS (SELECT i.media_id,
                         (((3 * t.range + 11 * i.media_id) % 256) - 128)
                             * 256 AS v
                  FROM ids i, range(0, 480) t)
            SELECT media_id, 480::BIGINT AS n_samples,
                   8000::INT AS sample_rate, 1::INT AS channels,
                   round(avg(v), 6) AS mean_amp,
                   round(sqrt(avg(v * v)), 6) AS rms
            FROM s GROUP BY media_id
        """,
        "media_features": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   8::INT AS feature_dim
            FROM documents WHERE doc_id % 3 = 0
        """,
        "frame_samples": """
            WITH v AS (SELECT doc_id AS media_id, 2500 + 997 * doc_id AS dur
                       FROM documents WHERE doc_id % 3 = 2)
            SELECT media_id, (i - 1)::INT AS frame_idx FROM (
                SELECT media_id,
                       unnest(generate_series(1, greatest(dur // 1000, 1))) AS i
                FROM v) t
        """,
        "label_propagation": _lpa_rounds_sql(10),
        # Folds UTF-8 BYTES (codepoints expanded arithmetically), exactly
        # like the engine's _fingerprint_one — not ord(c) — so the oracle
        # holds on non-ASCII documents too (ADVICE r01). Tokenizer is the
        # explicit ASCII whitespace class both sides.
        "doc_fingerprint": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''),
                                        '[^ \t\n\r\f\v]+') AS toks
              FROM documents),
            b AS (
              SELECT doc_id,
                flatten(list_transform(toks, tok ->
                  list_append(
                    flatten(list_transform(split(tok, ''), c ->
                      CASE
                        WHEN ord(c) < 128 THEN [ord(c)::HUGEINT]
                        WHEN ord(c) < 2048 THEN
                          [(192 + ord(c)//64)::HUGEINT,
                           (128 + ord(c)%64)::HUGEINT]
                        WHEN ord(c) < 65536 THEN
                          [(224 + ord(c)//4096)::HUGEINT,
                           (128 + (ord(c)//64)%64)::HUGEINT,
                           (128 + ord(c)%64)::HUGEINT]
                        ELSE
                          [(240 + ord(c)//262144)::HUGEINT,
                           (128 + (ord(c)//4096)%64)::HUGEINT,
                           (128 + (ord(c)//64)%64)::HUGEINT,
                           (128 + ord(c)%64)::HUGEINT]
                      END)),
                    32::HUGEINT))) AS bytes
              FROM t)
            SELECT doc_id,
                   CASE WHEN len(bytes) = 0 THEN 0 ELSE
                     list_reduce(list_prepend(0::HUGEINT, bytes),
                       (a, b) -> (a * 1000003 + b) % 2305843009213693951)::BIGINT
                   END AS fingerprint
            FROM b
        """,
        "lang_id": _LANG_ID_SQL,
        # minhash_dedup's LSH stage is exact-verified (jaccard join) and
        # deterministic; the oracle is the exact all-pairs >= 0.8 set.
        # Verified recall = 1.0 on this corpus (all near-dup pairs have
        # J >= 0.9; deterministic per-pair miss probability < 2e-4).
        # exact cross-side Jaccard between the doc_id%4 split halves;
        # recall note at q_incremental_near_dup.
        "incremental_near_dup": """
            WITH toks AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                         ' +'), x -> x <> '') AS t
              FROM documents),
            grams AS MATERIALIZED (
              SELECT doc_id,
                     CASE WHEN len(t) >= 3 THEN
                         list_distinct(list_transform(range(1, len(t) - 1),
                             i -> array_to_string(t[i:i+2], ' ')))
                     ELSE [array_to_string(t, ' ')] END AS g
              FROM toks),
            ex AS MATERIALIZED (SELECT doc_id, unnest(g) AS gram FROM grams),
            sizes AS MATERIALIZED (
              SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
            inter AS MATERIALIZED (
              SELECT a.doc_id AS new_id, b.doc_id AS prior_id, count(*) AS i
              FROM ex a JOIN ex b ON a.gram = b.gram
               AND a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0
              GROUP BY 1, 2)
            SELECT new_id, prior_id,
                   round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = new_id
            JOIN sizes sb ON sb.doc_id = prior_id
            WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.8
        """,
        "minhash_dedup": _EXACT_JACCARD_PAIRS_SQL,
        "bbit_minhash_dedup": _EXACT_JACCARD_PAIRS_SQL,
        # exact all-pairs cosine >= threshold; the corpus has no pair
        # above 0.52, so both sides must (and do) return the empty set —
        # this still catches any false positive from the LSH bucketing.
        "embedding_near_dup": """
            WITH e AS MATERIALIZED (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.9
        """,
        # The two approximation-family queries get EXACT oracles too:
        # the hyperplanes are literals and the token hash is an
        # SQL-expressible FNV-1a fold, so DuckDB reproduces signatures,
        # buckets and ranks bit-for-bit (see the builders above).
        "ann_topk_lsh": _ann_topk_lsh_sql(),
        "simhash_near_dup": _simhash_near_dup_sql(),
        "web_pagerank": _pagerank_rounds_sql(60, edges_sql=_WEB_EDGES_SQL)
        + "SELECT id, round(rank, 6) AS rank FROM final",
        "web_page_text": _WEB_PAGE_TEXT_SQL,
        "anchor_text_stats": _ANCHOR_TEXT_SQL,
        "site_graph": _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL),
        "site_pagerank": _wpagerank_rounds_sql(
            10,
            edges_sql=_SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL),
            verts_sql=_SITE_VERTS_SQL,
        )
        + "SELECT id, round(rank, 6) AS rank FROM final",
        "web_scc": _SCC_SQL.format(web_edges=_WEB_EDGES_SQL),
        "web_bowtie": _BOWTIE_SQL.format(web_edges=_WEB_EDGES_SQL),
        "web_condensation": _CONDENSATION_SQL.format(
            web_edges=_WEB_EDGES_SQL
        ),
        "web_cocitation": _COCITATION_SQL.format(
            web_edges=_WEB_EDGES_SQL, cap=_PAIR_DEGREE_CAP
        ),
        "web_coupling": _COUPLING_SQL.format(
            web_edges=_WEB_EDGES_SQL, cap=_PAIR_DEGREE_CAP
        ),
        "sequence_packing": _PACKING_SPANS_SQL + f"""
            SELECT id, n_tokens, start_offset,
                   (start_offset // {_PACK_L})::BIGINT AS pack_first,
                   (greatest(start_offset + n_tokens - 1, start_offset)
                       // {_PACK_L})::BIGINT AS pack_last,
                   (CASE WHEN n_tokens = 0 THEN 0
                        ELSE greatest(start_offset + n_tokens - 1, start_offset)
                                 // {_PACK_L}
                             - start_offset // {_PACK_L} + 1
                   END)::BIGINT AS n_packs
            FROM spans
        """,
        "packing_report": _PACKING_SPANS_SQL + f"""
            SELECT (SELECT count(*) FROM spans) AS n_docs,
                   (SELECT sum(n_tokens) FROM spans)::BIGINT AS n_tokens,
                   (SELECT CASE WHEN sum(n_tokens) = 0 THEN 0
                           ELSE (sum(n_tokens) - 1) // {_PACK_L} + 1 END
                    FROM spans)::BIGINT AS n_windows,
                   (SELECT count(*) FROM spans
                    WHERE n_tokens > 0
                      AND (start_offset + n_tokens - 1) // {_PACK_L}
                          > start_offset // {_PACK_L}) AS n_straddling,
                   (SELECT round(CASE WHEN sum(n_tokens) = 0 THEN 0.0
                           ELSE ((sum(n_tokens) - 1) % {_PACK_L} + 1)
                                / {_PACK_L}.0 END, 6)
                    FROM spans) AS last_window_fill
        """,
        "dsir_sample": _dsir_sample_sql(
            k=100, n_buckets=256, target_pred="d.lang = 'en'"
        ),
        "quality_classifier": _quality_clf_sql(
            n_buckets=512, bias=0.0, salt=97
        ),
        "web_katz": _katz_rounds_sql(5, 0.1, 1.0, _WEB_EDGES_SQL)
        + "SELECT id, round(score, 6) AS score FROM k5",
        "web_harmonic": _HARMONIC_SQL.format(
            web_edges=_WEB_EDGES_SQL, rounds=6
        ),
        "web_neighborhood": _NEIGHBORHOOD_SQL.format(
            web_edges=_WEB_EDGES_SQL, rounds=6
        ),
        "web_effective_diameter": _EFFDIAM_SQL.format(
            web_edges=_WEB_EDGES_SQL, rounds=6, fraction=0.9
        ),
        "web_link_prediction": _LINKPRED_SQL.format(
            web_edges=_WEB_EDGES_SQL, cap=_PAIR_DEGREE_CAP, min_common=2
        ),
        "web_spam_mass": _spammass_sql(10, _WEB_EDGES_SQL, "id % 50 = 1"),
        "web_walks": _walks_sql(_WEB_EDGES_SQL, length=4),
        "pagerank_mc": _mc_pagerank_sql(
            _WEB_EDGES_SQL, m=4, max_length=20, damping=0.85
        ),
        "crawl_budget": _crawl_budget_sql(
            _WEB_EDGES_SQL, budget=997, block=_SITE_BLOCK
        ),
        "walk_skipgrams": _skipgram_sql(_WEB_EDGES_SQL, length=4, window=2),
        "web_bfs_levels": _BFS_SQL.format(web_edges=_WEB_EDGES_SQL),
        "web_landmark_distances": _LANDMARK_SQL.format(
            web_edges=_WEB_EDGES_SQL
        ),
        "landmark_closeness": _LANDMARK_CLOSENESS_SQL.format(
            web_edges=_WEB_EDGES_SQL
        ),
        "click_attribution": """
            WITH views AS (
                SELECT user_id, event_id AS view_id, ts AS view_ts
                FROM events WHERE event_type = 'view'),
            clicks AS (
                SELECT user_id, event_id AS click_id, ts AS click_ts
                FROM events WHERE event_type = 'click'),
            pairs AS (
                SELECT c.click_id, v.view_id, v.view_ts
                FROM clicks c JOIN views v
                  ON c.user_id = v.user_id
                 AND c.click_ts >= v.view_ts
                 AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE),
            best AS (
                SELECT click_id, view_id, view_ts FROM (
                    SELECT *, row_number() OVER (PARTITION BY click_id
                        ORDER BY view_ts DESC, view_id DESC) AS rn
                    FROM pairs) t
                WHERE rn = 1)
            SELECT c.click_id, c.user_id,
                   epoch_us(c.click_ts) AS click_us,
                   b.view_id,
                   epoch_us(b.view_ts) AS view_us,
                   floor(epoch(c.click_ts))::BIGINT
                       - floor(epoch(b.view_ts))::BIGINT AS lag_seconds
            FROM clicks c LEFT JOIN best b USING (click_id)
        """,
        "reservoir_sample": """
            WITH t AS (
                SELECT doc_id, lang,
                       len(regexp_extract_all(text, '[A-Za-z]+'))::DOUBLE
                           AS w
                FROM documents),
            keyed AS (
                SELECT doc_id, lang,
                       -ln((((doc_id % 2147483648) * 2654435761)
                                % 4294967296 + 1.0)
                           / 4294967296.0) / w AS res_key
                FROM t WHERE w > 0),
            r AS (SELECT doc_id, lang, res_key,
                         row_number() OVER (PARTITION BY lang
                             ORDER BY res_key ASC, doc_id ASC)
                             AS res_rank
                  FROM keyed)
            SELECT doc_id, lang, res_rank, round(res_key, 6) AS res_key
            FROM r WHERE res_rank <= 15
        """,
        "mirror_sites": _MIRROR_SQL,
        "web_distance_histogram": (
            "WITH levels AS ("
            + _BFS_SQL.format(web_edges=_WEB_EDGES_SQL)
            + ") SELECT dist, count(*) AS n_vertices FROM levels GROUP BY dist"
        ),
        "session_spans": _SESSION_SPANS_SQL,
        "term_topk": _TERM_TOPK_SQL,
        "tfidf_topk": _TFIDF_SQL,
        "graph_reciprocity": _RECIPROCITY_SQL.format(web_edges=_WEB_EDGES_SQL),
        "degree_assortativity": _ASSORTATIVITY_SQL.format(
            web_edges=_WEB_EDGES_SQL
        ),
        "web_triad_census": _TRIAD_CENSUS_SQL.format(
            web_edges=_SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
        ),
        "lpa_modularity": _lpa_modularity_sql(10),
        "temperature_mix": temperature_sample_sql(
            "SELECT doc_id, lang FROM documents", "doc_id", "lang"
        ),
        "vocab_overlap": _VOCAB_OVERLAP_SQL,
        "degree_skew": _DEGREE_SKEW_SQL.format(web_edges=_WEB_EDGES_SQL),
        "pmi_neighbors": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                FROM documents),
            tpos AS MATERIALIZED (
                SELECT doc_id, pos, ts[pos + 1] AS term
                FROM (SELECT doc_id, ts, unnest(range(0, len(ts))) AS pos
                      FROM toks)),
            pairs AS (
                SELECT least(a.term, b.term) AS u,
                       greatest(a.term, b.term) AS v
                FROM tpos a JOIN tpos b ON a.doc_id = b.doc_id
                 AND b.pos > a.pos AND b.pos - a.pos <= 2
                 AND a.term <> b.term),
            und AS (SELECT u, v, count(*) AS w FROM pairs GROUP BY u, v
                    HAVING count(*) >= 2),
            ed AS MATERIALIZED (SELECT u, v, w FROM und
                 UNION ALL SELECT v, u, w FROM und),
            sw AS (SELECT u, sum(w) AS sumw FROM ed GROUP BY u),
            tot AS (SELECT sum(w)::BIGINT AS t FROM ed)
            SELECT term, neighbor, w, pmi, nbr_rank FROM (
                SELECT e.u AS term, e.v AS neighbor, e.w AS w,
                       round(ln(e.w * tot.t / (su.sumw * sv.sumw)), 6)
                           AS pmi,
                       row_number() OVER (
                           PARTITION BY e.u
                           ORDER BY round(ln(e.w * tot.t
                                    / (su.sumw * sv.sumw)), 6) DESC,
                                    e.v) AS nbr_rank
                FROM ed e
                JOIN sw su ON e.u = su.u
                JOIN sw sv ON e.v = sv.u
                CROSS JOIN tot)
            WHERE nbr_rank <= 5
        """,
        "phrase_search": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                FROM documents),
            win AS (
                SELECT doc_id, pos,
                       array_to_string(ts[pos + 1 : pos + 2], ' ') AS w
                FROM (SELECT doc_id, ts,
                             unnest(range(0, greatest(len(ts) - 1, 0)))
                                 AS pos
                      FROM toks WHERE len(ts) >= 2))
            SELECT doc_id, count(*) AS n_hits, min(pos) AS first_pos
            FROM win WHERE w = 'table scan'
            GROUP BY doc_id
        """,
        "fuzzy_terms": """
            WITH vocab AS MATERIALIZED (
                SELECT DISTINCT unnest(list_filter(string_split(text, ' '),
                                t -> t <> '')) AS term
                FROM documents),
            qs AS MATERIALIZED (
                SELECT DISTINCT
                       substr(term, 1, len(term) // 2)
                       || substr(term, len(term) // 2 + 2,
                                 len(term)) AS q
                FROM vocab
                WHERE substr(md5(term), 1, 1) = '0' AND len(term) > 1),
            vk AS (SELECT DISTINCT term, k FROM (
                SELECT term, unnest(list_append(
                    list_transform(range(1, len(term) + 1),
                        i -> substr(term, 1, i - 1)
                             || substr(term, i + 1, len(term))),
                    term)) AS k
                FROM vocab)),
            qk AS (SELECT DISTINCT q, k FROM (
                SELECT q, unnest(list_append(
                    list_transform(range(1, len(q) + 1),
                        i -> substr(q, 1, i - 1)
                             || substr(q, i + 1, len(q))),
                    q)) AS k
                FROM qs)),
            cand AS (SELECT DISTINCT qk.q, vk.term
                     FROM qk JOIN vk ON qk.k = vk.k)
            SELECT q, term, levenshtein(q, term) AS dist
            FROM cand WHERE levenshtein(q, term) <= 1
        """,
        "best_snippets": """
            WITH docs AS MATERIALIZED (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                FROM documents WHERE doc_id % 20 = 0),
            pos AS (SELECT doc_id, pos, ts[pos + 1] AS term
                    FROM (SELECT doc_id, ts,
                                 unnest(range(0, len(ts))) AS pos
                          FROM docs)),
            hits AS (SELECT doc_id, pos FROM pos
                     WHERE term IN ('table', 'scan')),
            scored AS (
                SELECT a.doc_id, a.pos AS s, count(*) AS n_matches
                FROM hits a JOIN hits b ON a.doc_id = b.doc_id
                 AND b.pos >= a.pos AND b.pos < a.pos + 12
                GROUP BY a.doc_id, a.pos),
            best AS (SELECT doc_id, s, n_matches FROM (
                         SELECT *, row_number() OVER (
                             PARTITION BY doc_id
                             ORDER BY n_matches DESC, s) AS rn
                         FROM scored) WHERE rn = 1)
            SELECT b.doc_id, b.s AS snip_start,
                   least(b.s + 12, len(d.ts)) - 1 AS snip_end,
                   b.n_matches,
                   array_to_string(
                       d.ts[b.s + 1 : least(b.s + 12, len(d.ts))],
                       ' ') AS snippet
            FROM best b JOIN docs d ON b.doc_id = d.doc_id
        """,
        "bm25f_topk": """
            WITH pairs AS (
                SELECT (doc_id + 1) % (SELECT count(*) FROM documents)
                           AS dst, 'next' AS text
                FROM documents WHERE doc_id % 10 <> 0
                UNION ALL
                SELECT (3 * doc_id + 7) % (SELECT count(*) FROM documents),
                       'rel'
                FROM documents WHERE doc_id % 10 <> 0
                UNION ALL
                SELECT (doc_id + 1) % (SELECT count(*) FROM documents),
                       'again'
                FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 3 = 0
            ),
            qterms(query_id, term) AS (
                VALUES (0, 'table'), (0, 'next'), (1, 'rel')),
            qdist AS (SELECT DISTINCT term FROM qterms),
            af AS (SELECT dst AS doc_id, text AS term,
                          count(*)::DOUBLE * 2 AS tf
                   FROM pairs WHERE text IN (SELECT term FROM qdist)
                   GROUP BY dst, text),
            alen AS (SELECT dst AS doc_id, count(*)::DOUBLE * 2 AS dl
                     FROM pairs GROUP BY dst),
            btoks AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            blen AS (SELECT doc_id,
                            len(list_filter(string_split(text, ' '),
                                t -> t <> ''))::DOUBLE AS dl
                     FROM documents),
            btf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                    FROM btoks WHERE term IN (SELECT term FROM qdist)
                    GROUP BY doc_id, term),
            tfw AS (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
                           coalesce(b.term, a.term) AS term,
                           coalesce(b.tf, 0) + coalesce(a.tf, 0) AS tf
                    FROM btf b FULL JOIN af a
                      ON b.doc_id = a.doc_id AND b.term = a.term),
            lens AS (SELECT b.doc_id,
                            b.dl + coalesce(a.dl, 0) AS dl
                     FROM blen b LEFT JOIN alen a ON b.doc_id = a.doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl
                      FROM lens),
            idf AS (SELECT term,
                           ln(((SELECT n FROM stats) - count(*) + 0.5)
                              / (count(*) + 0.5) + 1.0) AS idf
                    FROM tfw GROUP BY term),
            scored AS (
                SELECT q.query_id, t.doc_id,
                       sum(i.idf * (t.tf * 2.2)
                           / (t.tf + 1.2 * (0.25
                              + 0.75 * l.dl / (SELECT avgdl FROM stats))))
                           AS score
                FROM tfw t
                JOIN lens l ON t.doc_id = l.doc_id
                JOIN qterms q ON t.term = q.term
                JOIN idf i ON t.term = i.term
                GROUP BY q.query_id, t.doc_id)
            SELECT query_id, doc_id, round(score, 6) AS score, doc_rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY score DESC, doc_id) AS doc_rank
                  FROM scored)
            WHERE doc_rank <= 10
        """,
        "fixed_chunks": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                FROM documents),
            nz AS (SELECT doc_id, ts, len(ts) AS n FROM toks
                   WHERE len(ts) > 0),
            ch AS (SELECT doc_id, n, ts,
                          unnest(range(0,
                              1 + ceil(greatest(n - 32, 0)
                                       / 24)::BIGINT)) AS chunk
                   FROM nz)
            SELECT doc_id, chunk,
                   chunk * 24 AS start,
                   least(chunk * 24 + 32, n) - 1 AS "end",
                   least(chunk * 24 + 32, n) - chunk * 24 AS n_tokens,
                   array_to_string(
                       ts[chunk * 24 + 1 : least(chunk * 24 + 32, n)],
                       ' ') AS chunk_text
            FROM ch
        """,
        "bloom_blocklist": """
            WITH tok AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            blocked AS (SELECT DISTINCT term FROM tok
                        WHERE doc_id % 31 = 0),
            vocab AS (SELECT DISTINCT term FROM tok),
            rws AS (SELECT unnest(range(0, 4)) AS r),
            bk AS (SELECT ('0x' || substr(md5(term), 1, 12))::BIGINT AS h
                   FROM blocked),
            bits AS (SELECT DISTINCT
                        ((1103515245 * ((bk.h + 12345 + rws.r * 40503)
                            % 2147483647)) % 2147483647) % 4096 AS bit
                     FROM bk CROSS JOIN rws),
            pk AS (SELECT term AS key,
                          ((1103515245 * (((('0x' || substr(md5(term), 1,
                              12))::BIGINT) + 12345 + rws.r * 40503)
                              % 2147483647)) % 2147483647) % 4096 AS bit
                   FROM vocab CROSS JOIN rws),
            hits AS (SELECT key, count(*) AS hits FROM pk
                     WHERE bit IN (SELECT bit FROM bits)
                     GROUP BY key)
            SELECT v.term AS key,
                   coalesce(h.hits, 0)::BIGINT AS hits,
                   coalesce(h.hits, 0) = 4 AS member
            FROM vocab v LEFT JOIN hits h ON v.term = h.key
        """,
        "cm_heavy_hitters": """
            WITH tok AS MATERIALIZED (
                SELECT unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            tf AS (SELECT term, count(*) AS true_cnt FROM tok
                   GROUP BY term),
            top AS (SELECT term, true_cnt FROM tf
                    ORDER BY true_cnt DESC, term LIMIT 20),
            keys AS (SELECT term,
                            ('0x' || substr(md5(term), 1, 12))::BIGINT AS k
                     FROM (SELECT DISTINCT term FROM tok)),
            rws AS (SELECT unnest(range(0, 4)) AS r),
            occ AS (SELECT k FROM tok JOIN keys USING (term)),
            sk AS (SELECT rws.r AS row,
                          ((1103515245 * ((occ.k + 12345 + rws.r * 40503)
                              % 2147483647)) % 2147483647) % 256 AS col,
                          count(*) AS cnt
                   FROM occ CROSS JOIN rws GROUP BY 1, 2),
            est AS (SELECT t.term,
                           min(coalesce(sk.cnt, 0)) AS est
                    FROM top t
                    JOIN keys USING (term)
                    CROSS JOIN rws
                    LEFT JOIN sk ON sk.row = rws.r
                     AND sk.col = ((1103515245 * ((keys.k + 12345
                         + rws.r * 40503) % 2147483647)) % 2147483647) % 256
                    GROUP BY t.term)
            SELECT t.term, t.true_cnt, e.est
            FROM top t JOIN est e USING (term)
        """,
        "rmat_skew": _DEGREE_SKEW_SQL.format(
            web_edges=_rmat_edges_sql(scale=10, n_edges=8192, seed=3)
        ),
        "rich_club": _RICH_CLUB_SQL.format(
            edges=_rmat_edges_sql(scale=10, n_edges=8192, seed=3)
        ),
        "web_mis": _mis_rounds_sql(8, _WEB_EDGES_SQL),
        "web_louvain": _louvain_rounds_sql(2, _WEB_EDGES_SQL),
        "trending_terms": _TRENDING_TERMS_SQL,
        "table_profile": _table_profile_oracle(),
        "feature_smoothing": _FEATPROP_SQL.format(web_edges=_WEB_EDGES_SQL),
        "crawl_delta": _CRAWL_DELTA_SQL,
        "topic_pagerank": _topicrank_rounds_sql(4),
        "anchor_expanded_docs": _ANCHOR_EXPANDED_SQL,
        "lang_confusion": (
            "WITH lp AS MATERIALIZED (" + _LANG_ID_SQL + ") "
            "SELECT d.lang, lp.lang_pred, count(*) AS n "
            "FROM documents d JOIN lp ON d.doc_id = lp.doc_id "
            "GROUP BY d.lang, lp.lang_pred"
        ),
        "blended_topic_rank": (
            _topicrank_rounds_sql(4).rsplit("SELECT", 1)[0]
            + "SELECT id, round(sum(rank * CASE topic WHEN 't0' THEN 0.5"
            + " WHEN 't1' THEN 0.3 ELSE 0.2 END), 6) AS rank"
            + f" FROM p4 GROUP BY id"
        ),
        "incremental_pagerank": _incremental_pagerank_sql(6, 4),
        "benchmark_contamination": _contamination_sql(8),
        "rank_fusion": _rank_fusion_sql(k=60, top_m=100, n_out=20),
        "textrank_keywords": _textrank_sql(window=2, rounds=10, top_k=30),
        "containment_pairs": """
            WITH toks AS MATERIALIZED (
              SELECT doc_id,
                     list_filter(string_split_regex(
                         regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                         ' +'), x -> x <> '') AS t
              FROM documents),
            grams AS MATERIALIZED (
              SELECT doc_id,
                     CASE WHEN len(t) >= 3 THEN
                         list_distinct(list_transform(range(1, len(t) - 1),
                             i -> array_to_string(t[i:i+2], ' ')))
                     ELSE [array_to_string(t, ' ')] END AS g
              FROM toks),
            ex0 AS MATERIALIZED (SELECT doc_id, unnest(g) AS gram FROM grams),
            keep AS (SELECT gram FROM ex0 GROUP BY gram
                     HAVING count(*) <= 50),
            ex AS MATERIALIZED (
              SELECT doc_id, gram FROM ex0
              WHERE gram IN (SELECT gram FROM keep)),
            sizes AS MATERIALIZED (
              SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS inter
              FROM ex a JOIN ex b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT doc_a, doc_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
                   round(inter / sa.sz, 6) AS containment_a,
                   round(inter / sb.sz, 6) AS containment_b,
                   round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
        """,
        "corpus_diversity": """
            WITH toks AS MATERIALIZED (
                SELECT lang AS grp,
                       list_filter(string_split(text, ' '),
                                   t -> t <> '') AS ts
                FROM documents),
            docs AS (SELECT grp, count(*) AS n_docs,
                            sum(len(ts))::BIGINT AS n_tokens,
                            sum(greatest(len(ts) - 1, 0))::BIGINT
                                AS total_ngrams
                     FROM toks GROUP BY grp),
            types AS (SELECT grp, count(DISTINCT term) AS n_types
                      FROM (SELECT grp, unnest(ts) AS term FROM toks)
                      GROUP BY grp),
            grams AS (SELECT grp, count(DISTINCT gram) AS distinct_ngrams
                      FROM (SELECT grp, ts[pos + 1] || ' ' || ts[pos + 2]
                                        AS gram
                            FROM (SELECT grp, ts,
                                         unnest(range(0,
                                             greatest(len(ts) - 1, 0)))
                                             AS pos
                                  FROM toks))
                      GROUP BY grp)
            SELECT d.grp, d.n_docs, d.n_tokens,
                   coalesce(t.n_types, 0)::BIGINT AS n_types,
                   round(coalesce(t.n_types, 0)
                         / greatest(d.n_tokens, 1)::DOUBLE, 6) AS ttr,
                   coalesce(g.distinct_ngrams, 0)::BIGINT
                       AS distinct_ngrams,
                   d.total_ngrams,
                   round(coalesce(g.distinct_ngrams, 0)
                         / greatest(d.total_ngrams, 1)::DOUBLE, 6)
                       AS distinct_ngram_ratio
            FROM docs d
            LEFT JOIN types t ON d.grp = t.grp
            LEFT JOIN grams g ON d.grp = g.grp
        """,
        "cdc_dedup": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                FROM documents),
            tok AS MATERIALIZED (
                SELECT doc_id, pos, ts[pos + 1] AS term
                FROM (SELECT doc_id, ts, unnest(range(0, len(ts))) AS pos
                      FROM toks)),
            win AS (
                SELECT doc_id, pos,
                       md5(array_to_string(ts[pos + 1 : pos + 4], ' ')) AS h
                FROM (SELECT doc_id, ts,
                             unnest(range(0, greatest(len(ts) - 3, 0))) AS pos
                      FROM toks)),
            cuts AS (SELECT doc_id, pos + 3 AS cut_pos FROM win
                     WHERE substr(h, 1, 1) = '0'),
            flagged AS (
                SELECT t.doc_id, t.pos, t.term,
                       CASE WHEN c.cut_pos IS NOT NULL THEN 1 ELSE 0 END
                           AS cut
                FROM tok t LEFT JOIN cuts c
                  ON t.doc_id = c.doc_id AND t.pos = c.cut_pos),
            chunked AS (
                SELECT doc_id, pos, term,
                       coalesce(sum(cut) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS chunk
                FROM flagged),
            chunks AS (
                SELECT doc_id, chunk, count(*) AS n_tokens,
                       md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_hash
                FROM chunked GROUP BY doc_id, chunk),
            multi AS (SELECT chunk_hash FROM (
                          SELECT chunk_hash, count(*) AS c FROM chunks
                          GROUP BY chunk_hash) WHERE c >= 2),
            dup AS (SELECT doc_id, count(*) AS dup_chunks,
                           sum(n_tokens) AS dup_tokens
                    FROM chunks
                    WHERE chunk_hash IN (SELECT chunk_hash FROM multi)
                    GROUP BY doc_id),
            per AS (SELECT doc_id, sum(n_tokens) AS n_tokens,
                           count(*) AS n_chunks
                    FROM chunks GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
                   coalesce(per.n_chunks, 0)::BIGINT AS n_chunks,
                   coalesce(dup.dup_chunks, 0)::BIGINT AS dup_chunks,
                   coalesce(dup.dup_tokens, 0)::BIGINT AS dup_tokens,
                   round(coalesce(dup.dup_tokens, 0)
                         / greatest(coalesce(per.n_tokens, 0), 1)::DOUBLE,
                         6) AS dup_token_frac
            FROM documents d
            LEFT JOIN per ON d.doc_id = per.doc_id
            LEFT JOIN dup ON d.doc_id = dup.doc_id
        """,
        "redirect_resolution": """
            WITH RECURSIVE raw AS (
                SELECT doc_id AS src,
                       CASE WHEN doc_id % 100 = 95 THEN doc_id + 2
                            WHEN doc_id % 100 = 97 THEN doc_id - 2
                            WHEN doc_id % 10 IN (1, 4) THEN doc_id + 3
                       END AS dst
                FROM documents),
            rd AS (SELECT src, min(dst) AS dst FROM raw
                   WHERE dst IS NOT NULL AND src <> dst GROUP BY src),
            srcs AS (SELECT src FROM rd),
            r(src, cur, d) AS (
                SELECT src, dst, 1::BIGINT FROM rd
                UNION
                SELECT r.src, rd.dst, r.d + 1
                FROM r JOIN rd ON r.cur = rd.src WHERE r.d < 1000
            ),
            term AS (SELECT src, min(cur) AS final, min(d) AS hops
                     FROM r
                     WHERE cur NOT IN (SELECT src FROM srcs)
                     GROUP BY src)
            SELECT s.src, coalesce(term.final, -1) AS final,
                   coalesce(term.hops, 0)::BIGINT AS hops,
                   term.src IS NULL AS is_cycle
            FROM srcs s LEFT JOIN term ON s.src = term.src
        """,
        "crawl_schedule": _pagerank_rounds_sql(60, edges_sql=_WEB_EDGES_SQL)
        + """,
    f AS (SELECT id, id // 25 AS host, round(rank, 6) AS priority
          FROM final),
    rk AS (SELECT id, host,
                  row_number() OVER (PARTITION BY host
                                     ORDER BY priority DESC, id) AS host_rank
           FROM f)
    SELECT id, host, host_rank, (host_rank - 1) // 3 AS wave
    FROM rk WHERE host_rank <= 15
    """,
        "bigram_lm": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split(text, ' '),
                                   t -> t <> '') AS ts
                FROM documents),
            bg AS MATERIALIZED (
                SELECT doc_id, ts[pos + 1] || ' ' || ts[pos + 2] AS gram
                FROM (SELECT doc_id, ts,
                             unnest(range(0, greatest(len(ts) - 1, 0))) AS pos
                      FROM toks)),
            pd AS (SELECT doc_id, gram, count(*) AS tf FROM bg
                   GROUP BY doc_id, gram),
            vocab AS (SELECT gram, sum(tf) AS cbg FROM pd GROUP BY gram),
            lft AS (SELECT split_part(gram, ' ', 1) AS w1,
                           sum(cbg) AS cleft
                    FROM vocab GROUP BY w1),
            model AS (SELECT gram, cbg, cleft
                      FROM vocab JOIN lft
                        ON split_part(vocab.gram, ' ', 1) = lft.w1),
            agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
                           sum(tf * -ln(cbg / cleft)) AS nll
                    FROM pd JOIN model USING (gram) GROUP BY doc_id)
            SELECT d.doc_id AS id,
                   coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
                   round(CASE WHEN coalesce(agg.n_bigrams, 0) > 0
                              THEN agg.nll / agg.n_bigrams
                              ELSE 0.0 END, 6) + 0 AS mean_neg_logprob
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "hitting_times": _hitting_rounds_sql(10, _WEB_EDGES_SQL)
        + "SELECT id, round(h, 6) AS hit_time FROM h10",
        "blockrank_init": _blockrank_init_sql(3, 4, 25, _WEB_EDGES_SQL),
        "seeded_labels": _seeded_lpa_rounds_sql(6, _WEB_EDGES_SQL),
        "nb_lang_pred": """
            WITH g AS MATERIALIZED (
                SELECT doc_id, lang, substr(text, i, 3) AS gram
                FROM (SELECT doc_id, lang, text,
                             unnest(range(1,
                                 greatest(length(text) - 2, 0) + 1))
                                 AS i
                      FROM documents) t),
            counts AS MATERIALIZED (
                SELECT lang AS label, gram, count(*) AS c
                FROM g GROUP BY 1, 2),
            v AS (SELECT count(DISTINCT gram) AS v FROM counts),
            totals AS MATERIALIZED (
                SELECT label, sum(c) AS n_l FROM counts
                GROUP BY label),
            model AS MATERIALIZED (
                SELECT counts.label, counts.gram,
                       ln((counts.c + 1)
                          / (totals.n_l + (SELECT v FROM v))::DOUBLE)
                           AS logp
                FROM counts JOIN totals USING (label)),
            stats AS MATERIALIZED (
                SELECT d.label,
                       ln(d.n_docs_l
                          / (SELECT count(*) FROM documents)::DOUBLE)
                           AS log_prior,
                       ln(1.0 / (t.n_l + (SELECT v FROM v))::DOUBLE)
                           AS log_floor
                FROM (SELECT lang AS label, count(*) AS n_docs_l
                      FROM documents GROUP BY lang) d
                JOIN totals t USING (label)),
            dg AS MATERIALIZED (
                SELECT doc_id AS id, gram, count(*) AS c
                FROM g GROUP BY 1, 2),
            pl AS MATERIALIZED (
                SELECT dg.id, s.label,
                       sum(dg.c * coalesce(model.logp, s.log_floor))
                           AS gram_ll
                FROM dg CROSS JOIN stats s
                LEFT JOIN model ON model.label = s.label
                                AND model.gram = dg.gram
                GROUP BY dg.id, s.label),
            scored AS MATERIALIZED (
                SELECT b.id, b.label,
                       b.log_prior + coalesce(pl.gram_ll, 0.0)
                           AS score
                FROM (SELECT d.doc_id AS id, s.label, s.log_prior
                      FROM documents d CROSS JOIN stats s) b
                LEFT JOIN pl ON pl.id = b.id AND pl.label = b.label)
            SELECT id, label AS label_pred, round(score, 6) AS score
            FROM (SELECT *, row_number() OVER (PARTITION BY id
                      ORDER BY score DESC, label ASC) AS rn
                  FROM scored) r
            WHERE rn = 1
        """,
        "inlink_diversity": f"""
            WITH e AS (SELECT src, dst FROM ({_WEB_EDGES_SQL}) we
                       WHERE src <> dst),
            a AS (SELECT dst, count(*) AS n_inlinks,
                         count(DISTINCT src // 25) AS n_hosts
                  FROM e GROUP BY dst)
            SELECT dst AS id, n_inlinks::BIGINT AS n_inlinks,
                   n_hosts::BIGINT AS n_hosts,
                   round(n_hosts::DOUBLE / n_inlinks, 6)
                       AS host_diversity
            FROM a
        """,
        "hyperball_anf": _hyperball_sql(3, 4)
        + "SELECT id, zeros::BIGINT AS zeros, round(est, 6) AS est"
        " FROM est",
        "convergence_certificate": _pagerank_rounds_sql(4)
        + ",\ncert AS ("
        + " UNION ALL ".join(
            f"SELECT {i}::BIGINT AS round,"
            f" (SELECT sum(abs(a.rank - b.rank)) FROM r{i} a"
            f" JOIN r{i - 1} b ON a.id = b.id) AS e,"
            f" (SELECT mass FROM d{i}) AS m"
            for i in range(1, 5)
        )
        + f""")
            SELECT round, round(e, 6) AS l1_delta,
                   round(m, 6) AS mass_residual,
                   round(e * {0.85 / 0.15!r}, 6) AS geo_bound
            FROM cert
        """,
        "leakage_split": "WITH g AS (SELECT doc_id,"
        " doc_id // 25 AS group_id FROM documents),\n"
        + _fmix32_stages_sql("g", "doc_id, group_id", "group_id")
        + """
            SELECT doc_id, group_id, (h % 100)::BIGINT AS bucket,
                   CASE WHEN h % 100 < 80 THEN 'train'
                        WHEN h % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM fx
        """,
        "encoding_quality": """
            SELECT doc_id,
                   (CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0
                    END)::BIGINT AS n_replacement,
                   (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0
                    END)::BIGINT AS n_mojibake,
                   (CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0
                    END)::BIGINT AS n_ctrl,
                   CASE WHEN doc_id % 11 = 0 OR doc_id % 13 = 0
                        THEN 'bad'
                        WHEN doc_id % 7 = 0 THEN 'suspect'
                        ELSE 'clean' END AS verdict
            FROM documents
        """,
        "change_rates": """
            WITH cls AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN 2
                            WHEN doc_id % 11 = 0 THEN 1
                            ELSE 0 END AS x
                FROM documents)
            SELECT 'https://example.org/doc/' || doc_id AS url,
                   2::BIGINT AS n_obs, x::BIGINT AS n_changed,
                   -- "+ 0" normalizes IEEE -0.0 (from -ln(1.0)) to +0.0 so the
                   -- bit-pattern hash matches Spark's BigDecimal-backed round.
                   round(-ln((2 - x + 0.5) / (2 + 0.5)) / 1.0, 6) + 0
                       AS change_rate,
                   CASE WHEN -ln((2 - x + 0.5) / (2 + 0.5)) / 1.0 > 0
                        THEN round(greatest(
                            1.0 / (-ln((2 - x + 0.5) / (2 + 0.5))
                                   / 1.0), 1.0), 6)
                   END AS revisit_days
            FROM cls
        """,
        "site_lang_entropy": """
            WITH counts AS MATERIALIZED (
                SELECT doc_id // 25 AS site, lang, count(*) AS c
                FROM documents GROUP BY 1, 2),
            tot AS (SELECT site, sum(c) AS n_docs FROM counts
                    GROUP BY site),
            j AS (SELECT counts.site, tot.n_docs, counts.lang, counts.c,
                         counts.c / tot.n_docs::DOUBLE AS share
                  FROM counts JOIN tot USING (site)),
            top AS (SELECT site, lang AS majority_lang,
                           c AS top_c FROM (
                        SELECT site, lang, c, row_number() OVER (
                            PARTITION BY site
                            ORDER BY c DESC, lang DESC) AS rn
                        FROM counts) r WHERE rn = 1)
            SELECT j.site, j.n_docs::BIGINT AS n_docs,
                   round(sum(-j.share * ln(j.share)), 6) AS entropy,
                   any_value(top.majority_lang) AS majority_lang,
                   round(any_value(top.top_c)
                         / any_value(j.n_docs)::DOUBLE, 6)
                       AS majority_share
            FROM j JOIN top USING (site)
            GROUP BY j.site, j.n_docs
        """,
        "corpus_jsd": """
            WITH tf AS MATERIALIZED (
                SELECT lang AS g, term, count(*) AS c FROM (
                    SELECT lang,
                           unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS term
                    FROM documents WHERE lang IN ('en', 'de')) t
                GROUP BY g, term),
            wide AS MATERIALIZED (
                SELECT term,
                       sum(CASE WHEN g = 'en' THEN c ELSE 0 END) AS ca,
                       sum(CASE WHEN g = 'de' THEN c ELSE 0 END) AS cb
                FROM tf GROUP BY term),
            tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
                           count(*)::BIGINT AS v
                    FROM wide),
            contrib AS (
                SELECT 0.5 * p * ln(p / m) + 0.5 * q * ln(q / m) AS jc
                FROM (
                    SELECT p, q, (p + q) / 2.0 AS m FROM (
                        SELECT
                            (ca + 1) / ((SELECT na FROM tot)
                                        + (SELECT v FROM tot))::DOUBLE
                                AS p,
                            (cb + 1) / ((SELECT nb FROM tot)
                                        + (SELECT v FROM tot))::DOUBLE
                                AS q
                        FROM wide) x) y)
            SELECT (SELECT na FROM tot) AS n_tokens_a,
                   (SELECT nb FROM tot) AS n_tokens_b,
                   (SELECT v FROM tot) AS vocab_size,
                   round((SELECT sum(jc) FROM contrib), 6) AS jsd
        """,
        "quality_correlations": """
            WITH q AS (
                SELECT doc_id,
                    round(((CASE WHEN length(text) BETWEEN 200 AND 20000
                                 THEN 1.0
                                 ELSE least(length(text)::DOUBLE / 200.0,
                                            1.0) END)
                           + (CASE WHEN
                                  length(regexp_replace(text, '[^A-Za-z]',
                                                        '', 'g'))::DOUBLE
                                  / greatest(len(regexp_extract_all(
                                        text, '[A-Za-z]+')), 1)
                                  BETWEEN 3.0 AND 10.0
                              THEN 1.0 ELSE 0.5 END)
                           + length(regexp_replace(text, '[^A-Za-z ]',
                                                   '', 'g'))::DOUBLE
                             / greatest(length(text), 1)) / 3.0,
                          6) AS quality
                FROM documents),
            toks AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            pd AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   GROUP BY doc_id, term),
            vocab AS (SELECT term, sum(tf) AS ctf FROM pd GROUP BY term),
            tot AS (SELECT sum(ctf)::DOUBLE AS t FROM vocab),
            lmagg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                             sum(tf * -ln(ctf / (SELECT t FROM tot)))
                                 AS nll
                      FROM pd JOIN vocab USING (term) GROUP BY doc_id),
            lm AS (SELECT d.doc_id,
                          round(CASE WHEN coalesce(lmagg.n_tokens, 0) > 0
                                     THEN lmagg.nll / lmagg.n_tokens
                                     ELSE 0.0 END, 6) + 0 AS lm_nll
                   FROM documents d
                   LEFT JOIN lmagg ON d.doc_id = lmagg.doc_id),
            rc AS (SELECT doc_id,
                          len(regexp_extract_all(text, '[A-Za-z]+'))
                              AS n_words,
                          greatest(len(regexp_extract_all(text,
                                                          '[.!?]+')), 1)
                              AS n_sentences,
                          len(regexp_extract_all(text,
                                                 '[aeiouyAEIOUY]+'))
                              AS n_syllables
                   FROM documents),
            rd AS (SELECT doc_id,
                          round(206.835
                                - 1.015 * (n_words::DOUBLE / n_sentences)
                                - 84.6 * (n_syllables::DOUBLE / n_words),
                                6) AS flesch_ease
                   FROM rc WHERE n_words > 0),
            j AS MATERIALIZED (
                SELECT q.quality, lm.lm_nll, rd.flesch_ease
                FROM q JOIN lm USING (doc_id) JOIN rd USING (doc_id)),
            s AS (SELECT count(*) AS n,
                         sum(quality) AS s_q, sum(quality * quality)
                             AS ss_q,
                         sum(lm_nll) AS s_l, sum(lm_nll * lm_nll)
                             AS ss_l,
                         sum(flesch_ease) AS s_f,
                         sum(flesch_ease * flesch_ease) AS ss_f,
                         sum(quality * lm_nll) AS sx_ql,
                         sum(quality * flesch_ease) AS sx_qf,
                         sum(lm_nll * flesch_ease) AS sx_lf
                  FROM j)
            SELECT 'quality' AS signal_a, 'lm_nll' AS signal_b,
                   n::BIGINT AS n,
                   CASE WHEN (n * ss_q - s_q * s_q) > 0
                         AND (n * ss_l - s_l * s_l) > 0 THEN
                       round((n * sx_ql - s_q * s_l)
                             / sqrt((n * ss_q - s_q * s_q)
                                    * (n * ss_l - s_l * s_l)), 6)
                   END AS r
            FROM s
            UNION ALL
            SELECT 'quality', 'flesch_ease', n::BIGINT,
                   CASE WHEN (n * ss_q - s_q * s_q) > 0
                         AND (n * ss_f - s_f * s_f) > 0 THEN
                       round((n * sx_qf - s_q * s_f)
                             / sqrt((n * ss_q - s_q * s_q)
                                    * (n * ss_f - s_f * s_f)), 6)
                   END
            FROM s
            UNION ALL
            SELECT 'lm_nll', 'flesch_ease', n::BIGINT,
                   CASE WHEN (n * ss_l - s_l * s_l) > 0
                         AND (n * ss_f - s_f * s_f) > 0 THEN
                       round((n * sx_lf - s_l * s_f)
                             / sqrt((n * ss_l - s_l * s_l)
                                    * (n * ss_f - s_f * s_f)), 6)
                   END
            FROM s
        """,
        "lang_link_matrix": f"""
            WITH e AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM ({_WEB_EDGES_SQL}) we
                WHERE src <> dst),
            m AS MATERIALIZED (
                SELECT da.lang AS label_src, db.lang AS label_dst,
                       count(*) AS n_links
                FROM e
                JOIN documents da ON e.src = da.doc_id
                JOIN documents db ON e.dst = db.doc_id
                GROUP BY 1, 2)
            SELECT label_src, label_dst, n_links::BIGINT AS n_links,
                   round(n_links::DOUBLE
                         / (SELECT sum(n_links) FROM m), 6) AS share
            FROM m
        """,
        "lang_assortativity": f"""
            WITH e AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM ({_WEB_EDGES_SQL}) we
                WHERE src <> dst),
            m AS MATERIALIZED (
                SELECT da.lang AS ls, db.lang AS ld,
                       count(*) AS c
                FROM e
                JOIN documents da ON e.src = da.doc_id
                JOIN documents db ON e.dst = db.doc_id
                GROUP BY 1, 2),
            t AS (SELECT sum(c) AS t FROM m),
            tr AS (SELECT coalesce(sum(c), 0) AS tr FROM m
                   WHERE ls = ld),
            ab AS (SELECT sum(ra * rb) AS sab FROM
                   (SELECT ls AS l, sum(c) AS ra FROM m GROUP BY ls) a
                   JOIN (SELECT ld AS l, sum(c) AS rb FROM m
                         GROUP BY ld) b USING (l))
            SELECT t.t::BIGINT AS n_links,
                   CASE WHEN ab.sab::DOUBLE / (t.t * t.t) < 1.0 THEN
                       round(((tr.tr / t.t)
                              - (ab.sab::DOUBLE / (t.t * t.t)))
                             / (1.0 - ab.sab::DOUBLE / (t.t * t.t)),
                             6)
                   END AS r
            FROM t, tr, ab
        """,
        "hrw_shards": """
            WITH h AS (
                SELECT doc_id, s,
                       (1103515245 * ((x * x) % 2147483647) + 12345)
                           % 2147483647 AS h
                FROM (
                    SELECT doc_id, s,
                           (doc_id + 12345 + s * 40503)
                               % 2147483647 AS x
                    FROM documents,
                         (SELECT unnest(range(0, 10)) AS s) sh) t),
            a8 AS (
                SELECT doc_id, s AS shard8 FROM (
                    SELECT doc_id, s, row_number() OVER (
                        PARTITION BY doc_id ORDER BY h DESC, s ASC)
                        AS rn
                    FROM h WHERE s < 8) r WHERE rn = 1),
            a10 AS (
                SELECT doc_id, s AS shard10 FROM (
                    SELECT doc_id, s, row_number() OVER (
                        PARTITION BY doc_id ORDER BY h DESC, s ASC)
                        AS rn
                    FROM h) r WHERE rn = 1)
            SELECT a8.doc_id, a8.shard8, a10.shard10,
                   (a8.shard8 <> a10.shard10)::BIGINT AS moved
            FROM a8 JOIN a10 USING (doc_id)
        """,
        "diameter_bounds": f"""
            WITH RECURSIVE e AS MATERIALIZED (
                SELECT DISTINCT u, v FROM (
                    SELECT src AS u, dst AS v FROM ({_WEB_EDGES_SQL}) w1
                    UNION ALL
                    SELECT dst, src FROM ({_WEB_EDGES_SQL}) w2) t
                WHERE u <> v),
            deg AS (SELECT u AS id, count(*) AS d FROM e GROUP BY u),
            st AS MATERIALIZED (
                SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 1),
            l1 AS (
                SELECT id, 0 AS dist FROM st
                UNION
                SELECT e.v, l1.dist + 1 FROM l1
                JOIN e ON l1.id = e.u WHERE l1.dist < 32),
            d1 AS MATERIALIZED (
                SELECT id, min(dist) AS dist FROM l1 GROUP BY id),
            far AS MATERIALIZED (
                SELECT id, dist FROM d1 ORDER BY dist DESC, id ASC
                LIMIT 1),
            l2 AS (
                SELECT id, 0 AS dist FROM (SELECT id FROM far) f
                UNION
                SELECT e.v, l2.dist + 1 FROM l2
                JOIN e ON l2.id = e.u WHERE l2.dist < 32),
            d2 AS MATERIALIZED (
                SELECT id, min(dist) AS dist FROM l2 GROUP BY id),
            ecc2 AS (SELECT max(dist) AS m FROM d2)
            SELECT (SELECT id FROM st)::BIGINT AS start_id,
                   (SELECT dist FROM far)::BIGINT AS ecc_start,
                   (SELECT id FROM far)::BIGINT AS far_id,
                   (SELECT m FROM ecc2)::BIGINT AS ecc_far,
                   greatest((SELECT dist FROM far),
                            (SELECT m FROM ecc2))::BIGINT AS diameter_lb,
                   (2 * least((SELECT dist FROM far),
                              (SELECT m FROM ecc2)))::BIGINT
                       AS diameter_ub
        """,
        "zorder_keys": """
            WITH k AS (
                SELECT doc_id, doc_id % 64 AS a,
                       (doc_id * 37) % 64 AS b
                FROM documents)
            SELECT doc_id, a, b,
                   """
        + " + ".join(
            f"(((a >> {i}) & 1) << {2 * i})"
            f" + (((b >> {i}) & 1) << {2 * i + 1})"
            for i in range(6)
        )
        + """ AS z
            FROM k
        """,
        "kneser_ney_lm": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split(text, ' '),
                                   t -> t <> '') AS ts
                FROM documents),
            bg AS MATERIALIZED (
                SELECT doc_id, ts[pos + 1] || ' ' || ts[pos + 2] AS gram
                FROM (SELECT doc_id, ts,
                             unnest(range(0, greatest(len(ts) - 1, 0))) AS pos
                      FROM toks)),
            pd AS (SELECT doc_id, gram, count(*) AS tf FROM bg
                   GROUP BY doc_id, gram),
            vocab AS MATERIALIZED (
                SELECT gram, sum(tf) AS cbg FROM pd GROUP BY gram),
            lft AS (SELECT split_part(gram, ' ', 1) AS w1,
                           sum(cbg) AS cleft, count(*) AS n1w1
                    FROM vocab GROUP BY w1),
            rgt AS (SELECT split_part(gram, ' ', -1) AS w2,
                           count(*) AS n1r
                    FROM vocab GROUP BY w2),
            tt AS (SELECT count(*) AS tt FROM vocab),
            model AS (
                SELECT gram,
                       (cbg - 0.75) / cleft
                       + (0.75 * n1w1 / cleft)
                           * (n1r / (SELECT tt FROM tt)) AS p
                FROM vocab
                JOIN lft ON split_part(vocab.gram, ' ', 1) = lft.w1
                JOIN rgt ON split_part(vocab.gram, ' ', -1) = rgt.w2),
            agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
                           sum(tf * -ln(p)) AS nll
                    FROM pd JOIN model USING (gram) GROUP BY doc_id)
            SELECT d.doc_id AS id,
                   coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
                   round(CASE WHEN coalesce(agg.n_bigrams, 0) > 0
                              THEN agg.nll / agg.n_bigrams
                              ELSE 0.0 END, 6) + 0 AS mean_neg_logprob
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "powerlaw_alpha": f"""
            WITH we AS ({_WEB_EDGES_SQL}),
            e AS (SELECT DISTINCT src, dst FROM we WHERE src <> dst),
            deg AS (SELECT dst AS id, count(*) AS d FROM e GROUP BY dst),
            dist AS (SELECT d, count(*) AS c FROM deg WHERE d >= 2
                     GROUP BY d),
            agg AS (SELECT sum(c)::BIGINT AS n,
                           sum(c * ln(d::DOUBLE / 1.5::DOUBLE)) AS s
                    FROM dist)
            SELECT 2::BIGINT AS dmin, n AS n_tail,
                   round(1 + n / s, 6) AS alpha,
                   round((n / s) / sqrt(n), 6) AS sigma
            FROM agg
        """,
        "site_mst": _boruvka_sql(
            6, 20, _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
        ),
        "site_coreness": _core_numbers_sql(
            10, 6, _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
        ),
        "site_coloring": _coloring_rounds_sql(
            16, _SITE_EDGES_SQL.format(web_edges=_WEB_EDGES_SQL)
        ),
        "corpus_curation": _CURATION_SQL,
        "stratified_sample": _strat_sample_sql(),
        "web_boilerplate_lines": _WEB_BOILERPLATE_LINES_SQL,
        "web_line_dedup": _WEB_LINE_DEDUP_SQL,
        "repetition_stats": _REPETITION_STATS_SQL,
        "pii_masked": _PII_MASKED_SQL,
        "quality_weighted_sample": _quality_weighted_sample_sql(),
        "ann_topk_ivf": _ANN_TOPK_IVF_SQL,
        "bucketed_gather": f"""
            WITH edges AS ({_EDGES_SQL}),
            deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)
            SELECT e.dst, count(*) AS n_in,
                   round(sum(1.0 / d.out_deg), 6) AS mass
            FROM edges e JOIN deg d ON e.src = d.src
            GROUP BY e.dst
        """,
        "doc_length_quantiles": _DOC_LENGTH_QUANTILES_SQL,
        "url_canonical": _URL_CANONICAL_SQL,
        "crawl_traps": _CRAWL_TRAPS_SQL,
        "adjacency_compression": _ADJ_COMPRESSION_SQL_TMPL.format(
            web_edges=_WEB_EDGES_SQL
        ),
        "link_delta": _LINK_DELTA_SQL_TMPL.format(web_edges=_WEB_EDGES_SQL)
        + " SELECT src, dst, status FROM d",
        "link_delta_report": _LINK_DELTA_SQL_TMPL.format(
            web_edges=_WEB_EDGES_SQL
        )
        + _LINK_DELTA_REPORT_TAIL,
        "rmat_degree_histogram": _rmat_hist_sql(
            scale=10, n_edges=8192, seed=3
        ),
        "latest_snapshots": _LATEST_SNAPSHOTS_SQL,
        "training_mix_report": _training_mix_sql(),
        "lm_quality": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            pd AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   GROUP BY doc_id, term),
            vocab AS (SELECT term, sum(tf) AS ctf FROM pd GROUP BY term),
            tot AS (SELECT sum(ctf)::DOUBLE AS t FROM vocab),
            agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                           sum(tf * -ln(ctf / (SELECT t FROM tot))) AS nll
                    FROM pd JOIN vocab USING (term) GROUP BY doc_id)
            SELECT d.doc_id AS id,
                   coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens,
                   round(CASE WHEN coalesce(agg.n_tokens, 0) > 0
                              THEN agg.nll / agg.n_tokens
                              ELSE 0.0 END, 6) + 0 AS mean_neg_logprob
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "lm_quality_buckets": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents),
            pd AS (SELECT doc_id, term, count(*) AS tf FROM toks
                   GROUP BY doc_id, term),
            vocab AS (SELECT term, sum(tf) AS ctf FROM pd GROUP BY term),
            tot AS (SELECT sum(ctf)::DOUBLE AS t FROM vocab),
            agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                           sum(tf * -ln(ctf / (SELECT t FROM tot))) AS nll
                    FROM pd JOIN vocab USING (term) GROUP BY doc_id),
            scored AS MATERIALIZED (
                SELECT d.doc_id AS id, d.lang,
                       coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens,
                       round(CASE WHEN coalesce(agg.n_tokens, 0) > 0
                                  THEN agg.nll / agg.n_tokens
                                  ELSE 0.0 END, 6) + 0 AS score
                FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id),
            cuts AS (SELECT lang,
                            round(quantile_cont(score, 1.0/3), 6) AS c1,
                            round(quantile_cont(score, 2.0/3), 6) AS c2
                     FROM scored WHERE n_tokens > 0 GROUP BY lang)
            SELECT s.id, s.lang, s.n_tokens, s.score,
                   CASE WHEN s.n_tokens = 0 THEN 'empty'
                        WHEN s.score <= c.c1 THEN 'head'
                        WHEN s.score <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s LEFT JOIN cuts c USING (lang)
        """,
        "decontamination": """
            WITH tl AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> t <> '') AS l
                FROM documents),
            grams AS MATERIALIZED (
                SELECT doc_id,
                       unnest(CASE WHEN len(l) >= 3 THEN
                              list_transform(range(1, len(l) - 1),
                                  i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])
                              ELSE [] END) AS gram
                FROM tl),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 5)
            SELECT DISTINCT doc_id AS id FROM grams
            WHERE gram IN (SELECT gram FROM bench)
        """,
        "first_seen_dedup": """
            WITH base AS (
                SELECT doc_id, 1704067200 + doc_id AS ts_epoch, text
                FROM documents),
            feed AS (
                SELECT doc_id, ts_epoch, text FROM base
                UNION ALL
                SELECT doc_id + 1000000, ts_epoch + 600, text FROM base),
            ranked AS (
                SELECT md5(text) AS content_hash, doc_id, ts_epoch,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY ts_epoch, doc_id) AS rn
                FROM feed)
            SELECT content_hash, doc_id, ts_epoch FROM ranked WHERE rn = 1
        """,
        # groups oracles are connected components over the EXACT pair
        # graphs (all-pairs Jaccard / hamming), so they also re-verify
        # that the star-collapsed candidate generation loses no
        # connectivity on this corpus (recall 1.0, same argument as the
        # minhash_dedup oracle note).
        "minhash_dedup_groups": _MINHASH_GROUPS_SQL,
        "dedup_canonical": f"""
    WITH j AS MATERIALIZED (
        SELECT g.doc_id, g.group_id, d.n_chars::BIGINT AS w
        FROM ({_MINHASH_GROUPS_SQL}) g
        JOIN documents d USING (doc_id)),
    wnr AS (
        SELECT group_id, doc_id AS canonical_id FROM (
            SELECT group_id, doc_id,
                   row_number() OVER (PARTITION BY group_id
                                      ORDER BY w DESC, doc_id ASC) AS rn
            FROM j) WHERE rn = 1),
    sz AS (SELECT group_id, count(*)::BIGINT AS group_size
           FROM j GROUP BY 1)
    SELECT j.doc_id, j.group_id, wnr.canonical_id,
           (j.doc_id = wnr.canonical_id) AS is_canonical, sz.group_size
    FROM j JOIN wnr USING (group_id) JOIN sz USING (group_id)
    """,
        "simhash_dedup_groups": _simhash_groups_sql(),
    }
