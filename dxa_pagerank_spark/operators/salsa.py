"""SALSA — Stochastic Approach for Link-Structure Analysis.
[north_rule extension — no reference counterpart; extends the link-
analysis family (pagerank.py, hits.py) per SURVEY.md §2.2]

Lempel & Moran 2000 (public literature, PAPERS.md): HITS's mutual
reinforcement with the adjacency replaced by the *stochastic* bipartite
walk — each endpoint's contribution is split by its degree, so a
mega-hub no longer dominates by raw degree (the "TKC effect"). The
iteration, L1-normalized each half-step so trajectories are scale-free
and SQL-checkable (same convention as hits.py):

    auth_i(v) = sum over in-edges  (u,v) of hub_{i-1}(u) / outdeg(u),
                then /= sum
    hub_i(u)  = sum over out-edges (u,v) of auth_i(v) / indeg(v),
                then /= sum

Edge multiplicity counts, in both the gather and the degrees
(consistent with the engine's file-ingest semantics,
ReadLumpInEdgeListTask.java:69-71) — a doubled edge carries double
weight AND doubles the divisor, exactly the multigraph random walk.

Physical plan, per round: TWO rank-table shuffles, zero edge-table
shuffles — the degree divisions are folded into per-edge weights at
setup (one groupBy per side) and the weighted edges are persisted in
BOTH join orientations (hash-partitioned by src for the auth gather,
by dst for the hub gather), so neither half-step re-exchanges the
100-TB side; map-side partial aggregation shrinks each gather product
to ~|V| rows before its exchange. Each gather executes exactly ONCE
per round: its product is localCheckpoint-ed, the L1 total is then a
trivial scan of the cached ~|V| rows, and the normalizing division is
folded into the next half-step's expression as a collected literal
(the dangling-lump trick, pagerank.py) — previously the
un-materialized gather re-executed for the total and again downstream,
3 heavy jobs per round for 2 gathers. (hits.py keeps a single
src-partitioned copy and pays an edge re-exchange in its dst-side
gather; SALSA's weighted table is where the two-orientation trick pays
for its memory.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, auth, hub) after `rounds` L1-normalized SALSA rounds."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    raw = edges.select("src", "dst")
    out_deg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    in_deg = raw.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    # fold both degree divisions into per-edge weights once, up front —
    # the loop then never touches the degree tables again. TWO persisted
    # orientations, one hash-partitioned per join side, so neither
    # half-step ever re-exchanges the edge table: the auth gather joins
    # e_fwd on src in place, the hub gather joins e_bwd on dst in place,
    # and each groupBy's map-side partial agg shrinks the product to
    # ~|V| rows before its exchange.
    weighted = raw.join(out_deg, "src").join(in_deg, "dst")
    e_fwd = (
        weighted.select(
            "src", "dst", (F.lit(1.0) / F.col("od")).alias("w_fwd")
        )
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_bwd = (
        weighted.select(
            "src", "dst", (F.lit(1.0) / F.col("idg")).alias("w_bwd")
        )
        .repartition(P, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        raw.select(F.col("src").alias("id"))
        .union(raw.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()
    state_ckpt = verts.select(
        "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)
    state = state_ckpt

    try:
        for _ in range(rounds):
            # auth step: pull degree-split hub mass along in-edges.
            # Checkpoint the gather product FIRST, then take the L1
            # total as a trivial scan of the cached ~|V| rows and fold
            # the division in as a literal (the dangling-lump trick,
            # pagerank.py): previously the un-materialized gather
            # re-executed once for the total and again in the hub
            # half-step — 3 heavy executions per round for 2 gathers.
            a = (
                e_fwd.join(state.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("hub") * F.col("w_fwd")).alias("a_raw"))
                .localCheckpoint(eager=True)
            )
            tot_a = a.agg(F.sum("a_raw")).collect()[0][0] or 1.0
            st = verts.join(a, "id", "left").select(
                "id",
                (F.coalesce("a_raw", F.lit(0.0)) / tot_a).alias("auth"),
            )
            # hub step: pull degree-split auth mass along out-edges
            h = (
                e_bwd.join(st.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum(F.col("auth") * F.col("w_bwd")).alias("h_raw"))
            )
            st2 = (
                verts.join(h, "id", "left")
                .join(st, "id")
                .select(
                    "id", "auth", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
                )
                .localCheckpoint(eager=True)
            )
            tot_h = st2.agg(F.sum("h_raw")).collect()[0][0] or 1.0
            old = state_ckpt
            state_ckpt = st2
            state = st2.select(
                "id", "auth", (F.col("h_raw") / tot_h).alias("hub")
            )
            old.unpersist()
            a.unpersist()
        return state.select("id", "auth", "hub")
    finally:
        e_fwd.unpersist()
        e_bwd.unpersist()
        verts.unpersist()
