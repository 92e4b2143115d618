"""Approximate neighborhood function via HyperBall (HLL ball growth).
[north_rule extension — no reference counterpart; extends the
link-graph family per SURVEY.md §2.2]

Boldi & Vigna, "In-Core Computation of Geometric Centralities with
HyperBall" (public literature, PAPERS.md family): per-vertex
HyperLogLog counters seeded with the vertex itself; each round every
counter absorbs (elementwise register max) the counters of its
out-neighbors, so after t rounds counter(v) sketches the OUT-ball
B(v, t) = {u : dist(v, u) <= t}. The neighborhood function
N(t) = sum_v |B(v, t)| and the effective-diameter curve fall out of
the per-round estimates; this module returns the per-vertex ball-size
estimates after a fixed number of rounds.

Everything is DETERMINISTIC (seeded integer hash, no RNG), so the
whole computation replays exactly in SQL — the driver oracle unrolls
the identical register recurrence in long format.

Register math (classic HLL, m = 2^p registers):
    h(v)   = fmix32(v mod 2^31) — the murmur3 32-bit finalizer
             (xor-shift 16 / mul 0x85ebca6b / xor-shift 13 /
             mul 0xc2b2ae35 / xor-shift 16), with each 32-bit
             multiplication done as a 16-bit-split sum so no
             intermediate exceeds 2^48 (ANSI-long-safe, exact, and
             replayable verbatim in the SQL oracle). A plain Knuth
             multiplicative hash is NOT usable here: it is
             low-discrepancy by construction, so consecutive vertex
             ids land in distinct registers far more often than a
             binomial law allows and linear counting systematically
             overestimates (measured +85% on K_12).
    j(v)   = h >> (32 - p)          (register index, high bits)
    x      = h mod 2^(32-p)
    w(v)   = bit_count((x & -x) - 1) + 1        (trailing zeros + 1;
             x = 0 -> 32 - p + 1, the max rho)
    merge  = elementwise max
    S      = sum_i 2^-reg[i]   (untouched reg = 0 contributes 1)
    raw    = alpha_16 * m^2 / S                 (alpha_16 = 0.673)
    est    = m * ln(m / zeros)  if raw <= 2.5 m and zeros > 0
             raw                otherwise        (linear counting)

Physical shape at 100 TB: counters are ONE array<int> of length m per
vertex (m=16 -> 16 registers ≈ 64 B), so the state table is |V| rows.
Each round is one edge⋈counter hash join (counter side shuffles,
edges pre-partitioned by dst and reused) and a groupBy(src) whose
elementwise max is m independent, map-side-combinable MAX aggregates
— partial combine shrinks the product to ~|V| rows before the
exchange, the same gather discipline as pagerank.py. Lineage is
truncated per round via localCheckpoint. No Python anywhere; the
per-register fold at output is a single sequential F.aggregate over a
16-element array (deterministic left-to-right order, matching the
oracle's explicit left-associated sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_M32 = 2**32
ALPHA_16 = 0.673  # Flajolet et al. HLL constant for m = 16


def _mul32(h, c: int):
    """Exact 32-bit modular multiply by a constant, split at 16 bits
    so every intermediate stays under 2^48 (ANSI-long-safe)."""
    lo = F.pmod(h, F.lit(1 << 16))
    hi = F.floor(h / F.lit(1 << 16)).cast("long")
    return F.pmod(
        lo * F.lit(c)
        + F.pmod(hi * F.lit(c), F.lit(1 << 16)) * F.lit(1 << 16),
        F.lit(_M32),
    )


def _xorshift(h, s: int):
    return h.bitwiseXOR(F.floor(h / F.lit(1 << s)).cast("long"))


def fmix32(col):
    """murmur3 32-bit finalizer as a pure column expression."""
    h = F.pmod(col, F.lit(2**31))
    h = _mul32(_xorshift(h, 16), 0x85EBCA6B)
    h = _mul32(_xorshift(h, 13), 0xC2B2AE35)
    return _xorshift(h, 16)


def _initial_registers(verts: DataFrame, p: int) -> DataFrame:
    """(id) -> (id, regs array<int>[m]): the one-hot HLL counter
    holding only the vertex's own hash."""
    m = 1 << p
    h = fmix32(F.col("id"))
    # index from the HIGH bits, rho from the low
    j = F.floor(h / F.lit(1 << (32 - p))).cast("long")
    x = F.pmod(h, F.lit(1 << (32 - p)))
    rho = F.when(x == 0, F.lit(32 - p + 1)).otherwise(
        F.bit_count(x.bitwiseAND(-x) - 1) + 1
    )
    regs = F.array(
        *[
            F.when(j == i, rho).otherwise(F.lit(0)).cast("int")
            for i in range(m)
        ]
    )
    return verts.select("id", regs.alias("regs"))


def hyperball(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    p: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, zeros, est): per-vertex estimated |out-ball(id, rounds)|
    (the vertex itself included), plus the linear-counting zeros count
    for observability. Deterministic; SQL-replayable."""
    m = 1 << p
    P = num_partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(P, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    r = _initial_registers(verts, p).localCheckpoint(eager=True)
    try:
        for _ in range(rounds):
            # absorb out-neighbors: reg(src) |= reg(dst), elementwise
            # max expressed as m independent map-side-combinable MAXes
            nbr = (
                e.join(r.select(F.col("id").alias("dst"), "regs"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(
                    F.array(
                        *[F.max(F.col("regs")[i]) for i in range(m)]
                    ).alias("nbr_regs")
                )
            )
            merged = (
                r.join(nbr, "id", "left")
                .select(
                    "id",
                    F.when(F.col("nbr_regs").isNull(), F.col("regs"))
                    .otherwise(
                        F.zip_with(
                            "regs",
                            "nbr_regs",
                            lambda a, b: F.greatest(a, b),
                        )
                    )
                    .alias("regs"),
                )
                .localCheckpoint(eager=True)
            )
            r.unpersist()
            r = merged
        # estimate: sequential left-to-right fold over the m registers
        # (deterministic sum order — the oracle writes the same
        # explicit left-associated sum)
        s = F.aggregate(
            "regs",
            F.lit(0.0),
            lambda acc, w: acc + F.pow(F.lit(2.0), -w.cast("double")),
        )
        zeros = F.size(F.filter("regs", lambda w: w == F.lit(0)))
        raw = F.lit(ALPHA_16 * m * m) / s
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(raw)
        return r.select(
            "id", zeros.alias("zeros"), est.alias("est")
        )
    finally:
        e.unpersist()
