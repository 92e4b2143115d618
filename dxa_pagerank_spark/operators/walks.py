"""Deterministic random walks over a directed link graph.
[north_rule extension — no reference code; walk sampling is the
standard web-graph embedding / sampling primitive (DeepWalk KDD'14,
node2vec KDD'16) that a training-data pipeline runs next to PageRank]

Walks are *deterministic pseudo-random*: at vertex v choosing step t,
the successor is the out-neighbor d minimizing

    score(d, v, t) = (1103515245 * ((d + 12345*(v + 31*t)) % p)) % p,
    p = 2147483647 (prime)

a two-stage LCG-style mix. For fixed (v, t) the map d -> score is
injective (shift mod p, then multiply by a unit mod p), so there are
never ties and the walk is a pure function of (graph, seed vertex) —
reproducible across engines, partitionings, and retries, which is what
makes the output oracle-checkable and the sampling auditable. All
operands stay < 2^62, so the arithmetic is exact in int64 on any
engine.

Per step the plan is one equi-join (current positions ⋈ edges on src)
and one groupBy(walk) min_by — both JVM, map-side combinable. The
frontier is one row per live walk (<< |E|), so each step shuffles only
the walk set; the edge table is the static probe side. Walks that
reach a dangling vertex (no out-edges) simply stop. L is a small
constant, so the unrolled loop is L tiny jobs; lineage is truncated
per step with localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647
A = 1103515245
B = 12345
C = 31


def step_score(dst_col, v_col, t: int):
    """The deterministic neighbor-selection score (shared with the SQL
    oracles; injective in dst for fixed (v, t))."""
    inner = (dst_col + F.lit(B) * (v_col + F.lit(C * t))) % F.lit(P)
    return (F.lit(A) * inner) % F.lit(P)


def random_walks(
    edges: DataFrame, seeds: DataFrame, length: int = 4
) -> DataFrame:
    """-> (walk_id, step, v): deterministic walks of up to `length`
    steps from each seed (walk_id = seed id; step 0 = the seed itself;
    a walk ends early at a vertex with no out-edges)."""
    e = edges.select("src", "dst").distinct()
    cur = seeds.select(
        F.col("id").alias("walk_id"),
        F.lit(0).alias("step"),
        F.col("id").alias("v"),
    ).localCheckpoint(eager=True)
    out = cur
    for t in range(1, length + 1):
        cur = (
            cur.join(e, cur.v == e.src)
            .groupBy("walk_id")
            .agg(
                F.min_by("dst", step_score(F.col("dst"), F.col("v"), t))
                .alias("v")
            )
            .select("walk_id", F.lit(t).alias("step"), "v")
            .localCheckpoint(eager=True)
        )
        out = out.union(cur)
    return out
