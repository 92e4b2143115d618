"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k per query: JVM-side
  zip_with/aggregate dot products (no Python), crossjoin bounded by
  broadcasting the (small) query set. The correctness baseline.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures, block
  bucketing, exact re-rank inside buckets. The 100-TB scale path: the
  corpus side is touched once to sign, then only bucket-colliding
  candidates get exact scoring.
* ``embedding_near_dup_pairs`` — near-duplicate detection by cosine
  over the corpus itself (LSH buckets + exact verify).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double"))
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """-> (query_id, vec_id, cos_sim, rnk) exact top-k by cosine;
    deterministic tie-break by vec_id. Queries are broadcast."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def signature_col(vec_col, planes: list[list[float]]):
    """Sign-bit signature (long) of a vector against fixed hyperplanes."""
    sig = None
    for j, p in enumerate(planes):
        d = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 16,
    n_blocks: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any
    signature block with the query, exact cosine re-rank inside."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_bits, seed)
    bits_per_block = n_bits // n_blocks
    mask = (1 << bits_per_block) - 1

    def blocks(df, idc, vecc, out_id):
        sig = signature_col(F.col(vecc), planes)
        return df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(f"{out_id}_vec"), sig.alias("sig")
        ).select(
            out_id,
            f"{out_id}_vec",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("sig"), bits_per_block * j)
                        .bitwiseAND(F.lit(mask))
                        for j in range(n_blocks)
                    ]
                )
            ).alias("blk", "blk_val"),
        )

    cb = blocks(corpus, id_col, vec_col, "vec_id")
    qb = blocks(queries, query_id_col, vec_col, "query_id")
    cands = (
        cb.join(F.broadcast(qb), ["blk", "blk_val"])
        .select("query_id", "query_id_vec", "vec_id", "vec_id_vec")
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        cosine_col(F.col("query_id_vec"), F.col("vec_id_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into
    ``n_centroids`` inverted lists by nearest centroid, search only the
    ``nprobe`` lists nearest each query.

    ``n`` is the corpus row count, used only to pick the centroid
    stride. Pass it when known (e.g. from parquet footer metadata) —
    otherwise a ``corpus.count()`` action runs here, one extra scan
    whose only purpose is the stride.

    Centroids are a deterministic arithmetic sample of the corpus
    itself (every ``stride = n // n_centroids``-th id) rather than
    k-means output, so the whole index is a closed-form function of the
    data — SQL-oracle-checkable end to end. A production deployment
    swaps the sample for trained centroids (they arrive as a small
    artifact exactly like this one); every plan property below is
    unchanged.

    100-TB shape: the centroid set is driver-materialized (K rows — the
    "model", like lsh_topk's hyperplanes) and folded into a literal
    column expression, so corpus list-assignment is a PURE projection:
    the corpus is scanned once, never shuffled. Probing joins the
    (tiny, broadcast) query-probe table on centroid id, so exact
    scoring touches ~nprobe/n_centroids of the corpus; the only
    exchange is the final per-query top-k window over candidates.
    """
    from pyspark.sql import Window

    if n is None:
        n = corpus.count()
    stride = max(n // n_centroids, 1)
    cents = (
        corpus.filter(
            (F.col(id_col) % stride == 0)
            & (F.col(id_col) < stride * n_centroids)
        )
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"))
        .collect()
    )

    def nearest_struct_array(vec):
        """Array of (neg_cos, cid) structs vs every centroid — struct
        ordering makes array_sort yield max-cosine-then-min-cid."""
        return F.array_sort(
            F.array(
                *[
                    F.struct(
                        (
                            -cosine_col(
                                vec,
                                F.array(
                                    *[F.lit(float(x)) for x in r["c_vec"]]
                                ),
                            )
                        ).alias("neg_cos"),
                        F.lit(int(r["cid"])).alias("cid"),
                    )
                    for r in cents
                ]
            )
        )

    lists = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        nearest_struct_array(F.col(vec_col))[0]["cid"].alias("cid"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.transform(
                F.slice(nearest_struct_array(F.col(vec_col)), 1, nprobe),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    scored = lists.join(F.broadcast(probes), "cid").select(
        "query_id",
        "vec_id",
        cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
        )
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 16,
    n_blocks: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos_sim) pairs with cosine >= threshold found via
    signature-block collision + exact verification."""
    planes = _hyperplanes(dim, n_bits, seed)
    bits_per_block = n_bits // n_blocks
    mask = (1 << bits_per_block) - 1
    sig = signature_col(F.col(vec_col), planes)
    keyed = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), sig.alias("sig")
    ).select(
        "vid",
        "vec",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), bits_per_block * j)
                    .bitwiseAND(F.lit(mask))
                    for j in range(n_blocks)
                ]
            )
        ).alias("blk", "blk_val"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .distinct()
    )
    return (
        cands.select(
            "vec_a", "vec_b", cosine_col(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
