"""Monte Carlo PageRank estimation by deterministic walk sampling.
[north_rule extension — no reference code; the estimator family is
Avrachenkov, Litvak, Nemirovsky & Osipova, "Monte Carlo methods in
PageRank computation: When one iteration is sufficient" (SIAM J.
Numer. Anal. 45(2), 2007) — the "complete path stopping at dangling
nodes" variant.]

The scale story: power iteration touches EVERY edge EVERY superstep;
the MC estimator runs m walks per vertex, each of expected length
1/(1-d) ≈ 6.7 steps at d=0.85, and per step the frontier SHRINKS
geometrically (x d per round), so total work is O(m·n/(1-d)) edge
lookups independent of the iteration count to convergence — the
cheap first-pass ranking over a 10^12-page crawl whose exact ranks
only the final run needs.  Estimate quality is O(1/sqrt(m)) per
vertex; ordering of the head is stable far earlier than values.

Determinism contract (shared with this repo's walk/DOULION samplers):
every "random" decision is the walks-module LCG mix, a pure function
of (walk_id, step) — so the run is reproducible across engines,
partitionings, and retries, and the SQL oracle replays the entire
sampling process bit-for-bit (the same auditable-sampling law as
triangle_count_sampled).

Per round the plan is: a pure-expression continue gate on the live
frontier (no data motion), one equi-join frontier ⋈ edges on src,
one groupBy(walk) min_by — all JVM, map-side combinable.  Dangling
vertices end walks by failing the inner join (the Avrachenkov
dangling-termination variant); estimates are visit shares, so the
output is the ranking measure of the chain WITHOUT the lumped
dangling redistribution — a ranking estimator, not a calibrated
score (the exact loop in operators/pagerank.py is the scoring path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .walks import A, B, P, step_score


def _continue_gate(w_col, t: int, threshold: int):
    """Deterministic per-(walk, step) continue decision: the LCG mix of
    (walk_id, t) lands under floor(damping * P)."""
    return (F.lit(A) * ((w_col + F.lit(B * t)) % F.lit(P))) % F.lit(P) < F.lit(
        threshold
    )


def pagerank_monte_carlo(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    damping: float = 0.85,
    walks_per_vertex: int = 4,
    max_length: int = 20,
) -> DataFrame:
    """-> (id, n_visits, est_rank): visit counts of m deterministic
    teleport-terminated walks per vertex and the normalized visit
    share.  est_rank sums to 1 over the vertex universe; unvisited
    vertices get explicit zero rows (every walk visits its own seed,
    so a vertex with no visits means id outside the seed set).

    Walk w = seed*m + r steps while the (w, t) mix stays below
    floor(damping*P); at a dangling vertex the walk ends (inner join
    on src).  max_length truncates the geometric tail: at d=0.85 the
    probability a walk survives 20 gates is d^20 < 0.04, and the
    truncation is part of the (deterministic, oracle-replayed) spec.
    """
    m = int(walks_per_vertex)
    thr = int(damping * P)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    verts = vertices.select("id")
    seeds = verts.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda r: F.col("id") * m + r,
            )
        ).alias("walk_id"),
        F.col("id").alias("v"),
    )
    cur = seeds.localCheckpoint(eager=True)
    visits = cur.select("v")
    for t in range(1, max_length + 1):
        cur = (
            cur.filter(_continue_gate(F.col("walk_id"), t, thr))
            .join(e, F.col("v") == e["src"])
            .groupBy("walk_id")
            .agg(
                F.min_by("dst", step_score(F.col("dst"), F.col("walk_id"), t))
                .alias("v")
            )
            .localCheckpoint(eager=True)
        )
        if cur.limit(1).count() == 0:
            break
        visits = visits.union(cur.select("v"))
    counts = visits.groupBy("v").agg(F.count(F.lit(1)).alias("n_visits"))
    total = counts.agg(F.sum("n_visits").alias("t"))
    return (
        verts.join(counts, verts["id"] == counts["v"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.coalesce(F.col("n_visits"), F.lit(0)).alias("n_visits"),
            F.round(
                F.coalesce(F.col("n_visits"), F.lit(0)) / F.col("t"), 6
            ).alias("est_rank"),
        )
    )
