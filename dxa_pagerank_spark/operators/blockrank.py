"""BlockRank: exploiting the host-block structure of the web for
PageRank acceleration (Kamvar, Haveliwala, Manning & Golub, "Exploiting
the block structure of the web for computing PageRank", Stanford
2003).

The web link matrix is overwhelmingly block-diagonal by host (most
links are intra-site). BlockRank runs

  1. LOCAL PageRank inside every host block independently (teleport
     and dangling mass stay within the block),
  2. PageRank on the HOST graph whose edge (i, j) is weighted by the
     local-rank-weighted cross-host link mass B_ij = sum over v in i,
     links v->u in j of l(v) / outdeg(v),
  3. the Kronecker-ish product init x0(v) = l(v) * hostpr(host(v))
     — which sums to 1 by construction —

and feeds x0 to the standard global loop as a warm start
(operators/pagerank.py initial_ranks).

What is guaranteed (and pinned in tests/test_blockrank.py): x0 is
MUCH closer to the global fixed point than the uniform start in L1
(measured ~3.6x on the uneven-blocks fixture), the local/host phases
are cheap and block-parallel, and the warm-started loop reaches the
SAME fixed point. What is NOT guaranteed: fewer rounds under the
engine's successive-iterate L1 stopping rule — the warm trajectory
can carry a slightly larger coefficient on the slowest mode than the
(accidentally well-aligned) uniform start on small graphs; Kamvar's
reported iteration savings rely on the real web's >80% intra-host
link fraction. Measured honestly here rather than asserted.

100-TB shape: the local phase shuffles host-keyed (every aggregate
keys on host or vertex — blocks never serialize to the driver; a
mega-host is just a big key, same salting/AQE levers as the global
loop); the host graph is hosts-sized; phases 1-2 are a few cheap
rounds and the expensive global loop runs fewer supersteps — that IS
the algorithm's value proposition.

Semantics fixed for oracle replay: vertex universe = global edge
endpoints; host(v) = v // block_size (the synthetic site law,
sitegraph.py); duplicate edges count everywhere; local law per round
mirrors wpagerank's association: (1-d)/n_h + d*m_h/n_h + d*contrib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def local_block_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    block_size: int = 25,
    rounds: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, host, lrank): per-host local PageRank after `rounds`
    iterations over intra-host edges only; teleport 1/n_h and
    block-dangling mass redistribute within the block, so each
    block's lranks sum to 1."""
    if block_size < 1:
        raise ValueError("block_size must be >= 1")
    P = num_partitions or spark.sparkContext.defaultParallelism
    d = damping
    host = lambda c: F.floor(c / F.lit(block_size)).cast("long")  # noqa: E731
    verts0 = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", host(F.col("id")).alias("host"))
    )
    hsize = verts0.groupBy("host").agg(F.count(F.lit(1)).alias("n_h"))
    intra = edges.filter(
        host(F.col("src")) == host(F.col("dst"))
    ).select("src", "dst")
    ideg = intra.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("ideg")
    )
    ew = (
        intra.join(ideg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.lit(1.0) / F.col("ideg")).alias("w"))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        verts0.join(hsize, "host")
        .join(ideg, "id", "left")
        .select(
            "id", "host", "n_h", F.col("ideg").isNull().alias("dang")
        )
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    state = verts.select(
        "id", "host", "n_h", (F.lit(1.0) / F.col("n_h")).alias("l")
    ).localCheckpoint(eager=True)
    try:
        for _ in range(rounds):
            m = (
                verts.filter("dang")
                .join(state.select("id", "l"), "id")
                .groupBy("host")
                .agg(F.sum("l").alias("m"))
            )
            c = (
                ew.join(state.select(F.col("id").alias("src"), "l"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("l") * F.col("w")).alias("contrib"))
            )
            old = state
            state = (
                verts.select("id", "host", "n_h")
                .join(m, "host", "left")
                .join(c, "id", "left")
                .select(
                    "id",
                    "host",
                    "n_h",
                    (
                        F.lit(1.0 - d) / F.col("n_h")
                        + F.lit(d)
                        * F.coalesce("m", F.lit(0.0))
                        / F.col("n_h")
                        + F.lit(d) * F.coalesce("contrib", F.lit(0.0))
                    ).alias("l"),
                )
                .localCheckpoint(eager=True)
            )
            try:
                old.unpersist()
            except Exception:
                pass
        return state.select("id", "host", F.col("l").alias("lrank"))
    finally:
        ew.unpersist()
        verts.unpersist()


def blockrank_init(
    spark: SparkSession,
    edges: DataFrame,
    block_size: int = 25,
    local_rounds: int = 3,
    host_rounds: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """-> (id, rank): the BlockRank warm-start vector
    l(v) * hostpr(host(v)). Sums to 1 (each block's l sums to 1,
    hostpr sums to 1)."""
    from dxa_pagerank_spark.operators.wpagerank import weighted_pagerank

    host = lambda c: F.floor(c / F.lit(block_size)).cast("long")  # noqa: E731
    l = local_block_pagerank(
        spark, edges, block_size, local_rounds, damping
    ).persist(StorageLevel.MEMORY_AND_DISK)
    gdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("gdeg")
    )
    cross = (
        edges.filter(host(F.col("src")) != host(F.col("dst")))
        .select("src", "dst")
        .join(gdeg.withColumnRenamed("id", "src"), "src")
        .join(
            l.select(F.col("id").alias("src"), "lrank"), "src"
        )
        .select(
            host(F.col("src")).alias("hsrc"),
            host(F.col("dst")).alias("hdst"),
            (F.col("lrank") / F.col("gdeg")).alias("w"),
        )
        .groupBy("hsrc", "hdst")
        .agg(F.sum("w").alias("weight"))
        .select(
            F.col("hsrc").alias("src"),
            F.col("hdst").alias("dst"),
            "weight",
        )
    )
    hosts = l.select(F.col("host").alias("id")).distinct()
    hpr = weighted_pagerank(
        spark,
        cross,
        vertices=hosts,
        damping=damping,
        rounds=host_rounds,
    )
    out = l.join(
        hpr.select(F.col("id").alias("host"), F.col("rank").alias("hr")),
        "host",
    ).select("id", (F.col("lrank") * F.col("hr")).alias("rank"))
    return out


def blockrank(
    spark: SparkSession,
    edges: DataFrame,
    block_size: int = 25,
    local_rounds: int = 3,
    host_rounds: int = 4,
    damping: float = 0.85,
    **pagerank_kwargs,
):
    """Full BlockRank: warm-start the standard global loop
    (operators/pagerank.py, all its kwargs pass through — threshold,
    max_rounds, salting, checkpointing) from blockrank_init. Returns
    the PageRankResult; .rounds is where the speedup shows."""
    from dxa_pagerank_spark.operators.pagerank import pagerank

    init = blockrank_init(
        spark, edges, block_size, local_rounds, host_rounds, damping
    )
    return pagerank(
        spark,
        edges,
        damping=damping,
        initial_ranks=init,
        **pagerank_kwargs,
    )
