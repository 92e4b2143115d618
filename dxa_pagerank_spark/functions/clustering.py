"""Embedding k-means (Lloyd) + SemDeDup cluster-based deduplication.
[north_rule extension — no reference counterpart; dxa-pageRank has no
embedding operators (SURVEY.md §2.1)]

SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
space, then remove semantic duplicates WITHIN each cluster — pairwise
comparison cost drops from O(n²) to O(Σ cluster²) ≈ O(n²/k), and the
clusters are exactly the IVF partitioning already used for ANN.

Determinism contract (same convention as similarity.ivf_topk):
centroid INIT is an arithmetic sample of the corpus (every
``stride = n // k``-th id, cluster index = sample order), Lloyd
iterations are FIXED count, assignment tie-break is min cluster index,
empty clusters keep their previous centroid — the whole model is a
closed-form function of the data, so a SQL oracle replays training,
assignment, and pruning end to end.

100-TB shape per Lloyd iteration: assignment is a PURE projection
(centroids are a driver-materialized k×dim literal, the corpus is
scanned, never shuffled); the update is ONE shuffle of (cluster, pos,
partial-sum) rows — map-side combine reduces each partition to at most
k·dim rows before the exchange — then a k·dim-row collect (the
MetaChunk-sized scalar exchange). SemDeDup's pair generation is
bucketed by cluster id, the same capped-bucket discipline as the
MinHash/SimHash group operators (a mega-cluster is the skew risk;
``max_cluster`` refuses silently-quadratic buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col, cent: list[float]):
    """Σ_i (vec[i] - cent[i])² as a sequential fold (index order, so
    the SQL oracle's summation order matches)."""
    arr = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_col(vec_col, cents: list[list[float]]):
    """argmin over centroids of squared distance, ties -> min index:
    array_sort over (dist, index) structs, take the head."""
    return F.array_sort(
        F.array(
            *[
                F.struct(
                    _sq_dist(vec_col, c).alias("d"),
                    F.lit(i).alias("i"),
                )
                for i, c in enumerate(cents)
            ]
        )
    )[0]["i"]


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means with the deterministic contract above.
    -> ((id, cluster) assignments after `iters` iterations, centroids).

    `iters` counts assignment->update cycles; the returned assignment
    is computed against the FINAL centroids (i.e. iters updates then
    one more assignment), matching the unrolled oracle."""
    n = emb.count()
    stride = max(n // k, 1)
    init = (
        emb.filter(
            (F.col(id_col) % stride == 0) & (F.col(id_col) < stride * k)
        )
        .select(id_col, vec_col)
        .collect()
    )
    init.sort(key=lambda r: r[id_col])
    cents = [[float(x) for x in r[vec_col]] for r in init]
    dim = len(cents[0])

    for _ in range(int(iters)):
        assigned = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _assign_col(F.col(vec_col), cents).alias("cluster"),
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_cluster: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = (
                r["s"] / r["c"]
            )
            counts[r["cluster"]] = r["c"]
        cents = [
            by_cluster.get(i, cents[i]) for i in range(k)
        ]  # empty cluster keeps its previous centroid

    out = emb.select(
        F.col(id_col).alias("id"),
        _assign_col(F.col(vec_col), cents).alias("cluster"),
    )
    return out, cents


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """-> (id, cluster, is_dup): SemDeDup pruning decisions. A vector
    is a duplicate iff some SMALLER id in its cluster has cosine
    similarity >= threshold with it (keep-min-id, the same rule as the
    exact/MinHash dedup family — the paper's keep-one with a
    deterministic representative). Pairs are generated per cluster
    only; `max_cluster` (optional) fails loudly on a cluster larger
    than the bound instead of running a silently-quadratic self-join."""
    assigned, _ = kmeans_assign(emb, k, iters, id_col, vec_col)
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = assigned.join(vecs, "id")
    if max_cluster is not None:
        worst = (
            a.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
        )
        if worst and worst > max_cluster:
            raise ValueError(
                f"cluster of size {worst} exceeds max_cluster={max_cluster}"
            )
    left = a.select(
        "cluster", F.col("id").alias("u"), F.col("v").alias("vu")
    )
    right = a.select(
        "cluster", F.col("id").alias("w"), F.col("v").alias("vw")
    )
    dot = F.aggregate(
        F.zip_with("vu", "vw", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    dups = (
        left.join(right, "cluster")
        .filter(F.col("u") < F.col("w"))
        .select(
            "w",
            (dot / (norm(F.col("vu")) * norm(F.col("vw")))).alias("cos"),
        )
        .filter(F.col("cos") >= float(threshold))
        .select(F.col("w").alias("id"))
        .distinct()
    )
    return assigned.join(
        dups.withColumn("is_dup", F.lit(True)), "id", "left"
    ).select(
        "id", "cluster", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
    )


def _sq_dist_cols(a, b):
    """Index-ordered fold of Σ (a[i] - b[i])² between two array
    columns (same association as _sq_dist, SQL-replayable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou, Douze & Schmid, TPAMI
    2011): split the vector into m contiguous subspaces and train an
    independent k-centroid deterministic Lloyd codebook per subspace
    (kmeans_assign's exact contract, so the whole model is a
    closed-form function of the data and the SQL oracle replays it).
    Memory story at 100 TB: each vector compresses to m small codes
    (m bytes at k<=256) + one shared m*k*d_sub codebook literal."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias(
                "embedding"
            ),
        )
        _, cents = kmeans_assign(sub, k=k, iters=iters)
        books.append(cents)
    return books


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, code_0..code_{m-1}): per-subspace argmin centroid codes
    — a PURE projection against the codebook literals (the corpus is
    scanned, never shuffled)."""
    m = len(books)
    d_sub = len(books[0][0])
    return emb.select(
        F.col(id_col).alias("id"),
        *[
            _assign_col(
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub), books[s]
            ).alias(f"code_{s}")
            for s in range(m)
        ],
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """-> (query_id, vec_id, adc_dist): top-k by asymmetric distance
    computation — exact distance from the raw query to each vector's
    RECONSTRUCTION (per-subspace centroid), summed subspace-by-
    subspace in subspace order so the float association is identical
    in SQL. The query side broadcasts (queries are small next to the
    corpus); top-k is a per-query rank window with the cut pushed to
    WindowGroupLimit."""
    from pyspark.sql import Window

    m = len(books)
    d_sub = len(books[0][0])
    codes = pq_encode(emb, books, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    )
    joined = codes.crossJoin(F.broadcast(q))
    dist = None
    for s in range(m):
        cents = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in c])
                for c in books[s]
            ]
        )
        d_s = _sq_dist_cols(
            F.slice(F.col("qv"), s * d_sub + 1, d_sub),
            F.element_at(cents, F.col(f"code_{s}") + 1),
        )
        dist = d_s if dist is None else dist + d_s
    ranked = joined.select(
        "query_id",
        F.col("id").alias("vec_id"),
        F.round(dist, 6).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
