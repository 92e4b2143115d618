"""Maximal independent set (Luby) and greedy graph coloring by
iterated priority selection (Jones–Plassmann). [north_rule extension —
no reference code]

Both use a deterministic per-vertex priority instead of Luby's random
bits, so the result is engine-independent and SQL-oracle-replayable:

    pri(v) = hash_bucket(v) * 2^31 + v

(the engine-portable Knuth multiplicative hash of functions/sampling,
made injective by appending the id — ties are impossible). Requires
vertex ids in [0, 2^31); web-scale deployments using 64-bit hashed url
ids remap to a contiguous id space first (the same precondition as the
CSR kernel), enforced with a loud guard.

MIS (Luby 1986, deterministic-priority variant): each round, every
undecided vertex whose priority exceeds ALL undecided neighbors'
priorities joins the MIS; it and its neighbors leave the undecided
set. Expected O(log n) rounds on hash-random priorities. The result is
maximal AND independent by construction.

Coloring (Jones & Plassmann 1993, round-index variant): same selection
rule, but only selected vertices leave — the r-th round's selected set
is an independent set, so ``color = r`` is a proper coloring. Uses more
colors than smallest-missing-color greedy, in exchange for a pure
join+agg round that unrolls into exact SQL.

Physical shape per round: one edges⋈undecided join + max-aggregate
(both keyed by vertex; blockers are restricted to undecided vertices by
the join itself), one anti-join shrink. The undecided set only shrinks;
frontier DataFrames are lineage-truncated every round. Raises if
max_rounds is exhausted before the fixpoint — silent partial output is
never returned (repo hardening rule, ADVICE r02).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sampling import hash_bucket

_ID_BOUND = 1 << 31


def _priority(id_col: Column) -> Column:
    return hash_bucket(id_col) * F.lit(_ID_BOUND) + id_col


def _prepared(spark: SparkSession, edges: DataFrame):
    """-> (verts(id, pri) checkpointed, sym(u, v) checkpointed)."""
    from .components import _symmetrize
    from .pagerank import vertex_universe

    verts = vertex_universe(spark, edges)
    bad = verts.filter(
        (F.col("id") < 0) | (F.col("id") >= _ID_BOUND)
    ).limit(1).count()
    if bad:
        raise ValueError(
            "mis/coloring need vertex ids in [0, 2^31) for the injective "
            "arithmetic priority — remap hashed ids to a contiguous space "
            "first"
        )
    sym = _symmetrize(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    ).localCheckpoint(eager=True)
    und = verts.select(
        "id", _priority(F.col("id")).alias("pri")
    ).localCheckpoint(eager=True)
    return und, sym


def _select_round(und: DataFrame, sym: DataFrame) -> DataFrame:
    """-> (id): undecided vertices whose priority beats every undecided
    neighbor's (vertices with no undecided neighbor qualify). Blockers
    are undecided by construction: the u side joins against ``und``,
    and the v side is filtered to ``und`` by the outer left join."""
    up = und.select(F.col("id").alias("u"), F.col("pri").alias("pu"))
    nmax = (
        sym.join(up, "u")
        .select(F.col("v").alias("id"), "pu")
        .groupBy("id")
        .agg(F.max("pu").alias("npri"))
    )
    return (
        und.join(nmax, "id", "left")
        .filter(F.col("npri").isNull() | (F.col("pri") > F.col("npri")))
        .select("id")
    )


def luby_mis(
    spark: SparkSession, edges: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """-> (id, in_mis boolean, mis_round long): deterministic maximal
    independent set of the undirected simple graph; mis_round = the
    selection round (0 for non-members)."""
    base, sym = _prepared(spark, edges)
    und = base
    picked: DataFrame | None = None
    for r in range(1, max_rounds + 1):
        if und.limit(1).count() == 0:
            break
        sel = _select_round(und, sym).localCheckpoint(eager=True)
        tagged = sel.select("id", F.lit(r).alias("mis_round"))
        picked = tagged if picked is None else picked.union(tagged)
        sel_u = sel.select(F.col("id").alias("u"))
        nbrs = sym.join(sel_u, "u", "left_semi").select(
            F.col("v").alias("id")
        )
        und = und.join(
            sel.union(nbrs).distinct(), "id", "left_anti"
        ).localCheckpoint(eager=True)
    if und.limit(1).count() > 0:
        raise RuntimeError(f"luby_mis did not converge in {max_rounds} rounds")
    out = base.select("id").join(picked, "id", "left")
    return out.select(
        "id",
        F.col("mis_round").isNotNull().alias("in_mis"),
        F.coalesce("mis_round", F.lit(0)).alias("mis_round"),
    )


def jp_coloring(
    spark: SparkSession, edges: DataFrame, max_rounds: int = 80
) -> DataFrame:
    """-> (id, color long >= 1): proper coloring of the undirected
    simple graph; each round's priority-local-maxima form an
    independent set and get the round index as their color."""
    und, sym = _prepared(spark, edges)
    colored: DataFrame | None = None
    for r in range(1, max_rounds + 1):
        if und.limit(1).count() == 0:
            break
        sel = _select_round(und, sym).localCheckpoint(eager=True)
        tagged = sel.select("id", F.lit(r).alias("color"))
        colored = tagged if colored is None else colored.union(tagged)
        und = und.join(sel, "id", "left_anti").localCheckpoint(eager=True)
    if und.limit(1).count() > 0:
        raise RuntimeError(
            f"jp_coloring did not converge in {max_rounds} rounds"
        )
    return colored
