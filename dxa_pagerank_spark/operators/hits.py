"""HITS (hubs & authorities) over the directed edge table.

Beyond the reference's single PageRank analytic (north_rule scope is
"link-graph analytics engine"): the classic Kleinberg mutual-
reinforcement iteration, L1-normalized each half-step so trajectories
are scale-free and SQL-checkable:

    auth_i(v) = sum over in-edges (u,v) of hub_{i-1}(u), then /= sum
    hub_i(u)  = sum over out-edges (u,v) of auth_i(v), then /= sum

Edge multiplicity counts (consistent with the engine's file-ingest
semantics, ReadLumpInEdgeListTask.java:69-71).

Physical plan, per round: TWO rank-table shuffles (auth gather by dst,
hub gather by src) against the edge table persisted in BOTH join
orientations (src-partitioned for the auth gather, dst-partitioned for
the hub gather) — the 100-TB side never moves in either half-step;
map-side partial aggregation keeps each exchange at ~|V| rows. Each
gather executes exactly once per round: its product is
localCheckpoint-ed, the L1 total is then a trivial scan of the cached
~|V| rows, and the normalizing division folds into the next half-step
as a collected literal (the dangling-lump trick, pagerank.py; same
restructuring as salsa.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def hits(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, auth, hub) after `rounds` L1-normalized iterations."""
    P = num_partitions or spark.sparkContext.defaultParallelism
    # the edge table is persisted in BOTH join orientations (hash-
    # partitioned by src for the auth gather, by dst for the hub
    # gather) so neither half-step re-exchanges the 100-TB side; each
    # gather's map-side partial agg shrinks its product to ~|V| rows
    # before the one rank-table exchange per half-step
    e = (
        edges.select("src", "dst")
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_bwd = e.repartition(P, "dst").persist(StorageLevel.MEMORY_AND_DISK)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
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
            # auth step: pull hub mass along in-edges. Checkpoint the
            # gather product FIRST, take the L1 total from the cached
            # ~|V| rows, and fold the division in as a literal —
            # previously the un-materialized gather re-executed for
            # the total and again in the hub half-step (same
            # restructuring as salsa.py).
            a = (
                e.join(state.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("a_raw"))
                .localCheckpoint(eager=True)
            )
            tot_a = a.agg(F.sum("a_raw")).collect()[0][0] or 1.0
            st = verts.join(a, "id", "left").select(
                "id",
                (F.coalesce("a_raw", F.lit(0.0)) / tot_a).alias("auth"),
            )
            # hub step: pull auth mass along out-edges
            h = (
                e_bwd.join(st.select(F.col("id").alias("dst"), "auth"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("h_raw"))
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
                "id", (F.col("h_raw") / tot_h).alias("hub"), "auth"
            )
            try:
                old.unpersist()
            except Exception:
                pass
            a.unpersist()
        return state.select("id", "auth", "hub")
    finally:
        e.unpersist()
        e_bwd.unpersist()
        verts.unpersist()
