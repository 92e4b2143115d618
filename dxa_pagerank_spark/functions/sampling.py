"""Deterministic corpus sampling for training-data pipelines.

`df.sample()` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which is useless for a 100-TB corpus
that is re-sharded between runs. Production corpus sampling keys the
decision on the ROW, not the partition: hash a stable key, keep the row
iff the hash lands under the rate. That makes the sample reproducible
across partitionings, clusters, and engines, lets two teams draw
identical samples from the same snapshot, and composes with stratified
rates (different keep-rates per language/kind/quality band — the
standard way to re-balance a web corpus for training).

The hash here is a Knuth multiplicative hash over a 64-bit key,
`(key * 2654435761) mod 2^32` (golden-ratio constant, Knuth TAOCP v3
§6.4), salted by addition before the multiply. Chosen over xxhash64
because it is closed-form arithmetic: the DuckDB oracle reproduces the
decision bit-exactly in plain SQL (xxhash64's avalanche loop is not
expressible without 64-bit wrap-around multiplication, which SQL
HUGEINTs can't do in one step). For adversarial keys a production
deployment would swap in `F.xxhash64` — the operator shape (filter on a
pure column expression, no shuffle, fully pushdown-friendly) is
unchanged; only the mixing constant differs.

Everything is a JVM-side column expression: sampling adds ZERO shuffles
and survives predicate pushdown — at 100 TB a 1% sample reads all data
once and writes 1%, with no exchange.

No reference counterpart (dxa-pageRank has no sampling); this is part
of the LLM-data-pipeline surface the north_rule adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative constant
MOD = 1 << 32
_FOLD = 1 << 31  # key folded below 2^31: (2^31-1) * KNUTH < 2^63, no overflow


def hash_bucket(key: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 2^32) from a 64-bit key column.

    `(((key + salt) mod 2^31) * KNUTH) mod 2^32` — folding the key
    below 2^31 first keeps the multiply exact in signed BIGINT
    ((2^31-1) * KNUTH < 2^63), so there is no overflow and no
    engine-specific wrap semantics to replicate in the SQL oracle.
    """
    folded = F.pmod(key.cast("long") + F.lit(salt), F.lit(_FOLD))
    return F.pmod(folded * F.lit(KNUTH), F.lit(MOD))


def hash_sample(
    df: DataFrame, key: str | Column, rate: float, salt: int = 0
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate * 2^32.

    Reproducible across partitionings/engines; expected fraction `rate`
    (exact decision per key — identical keys sample together, which is
    what you want when the key is a document id / url hash).
    """
    key = F.col(key) if isinstance(key, str) else key
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return df.filter(hash_bucket(key, salt) < int(rate * MOD))


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    stratum: str | Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. keep 100% of high-quality
    docs, 10% of medium, 1% of boilerplate) — the standard corpus
    re-balancing step. `rates` maps stratum value -> keep rate; strata
    not listed fall back to `default_rate`.

    The rate table is folded into a CASE expression (Catalyst constant
    territory), NOT a join — for the realistic case of tens of strata
    this keeps the op shuffle-free and pushdown-friendly. For thousands
    of strata, broadcast-join a rates DataFrame instead.
    """
    key = F.col(key) if isinstance(key, str) else key
    stratum = F.col(stratum) if isinstance(stratum, str) else stratum
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate {r} for stratum {s!r} outside [0, 1]")
    threshold = F.lit(int(default_rate * MOD))
    for s, r in sorted(rates.items()):
        threshold = F.when(stratum == F.lit(s), F.lit(int(r * MOD))).otherwise(
            threshold
        )
    return df.filter(hash_bucket(key, salt) < threshold)


def weighted_sample(
    df: DataFrame,
    key: str | Column,
    weight: str | Column,
    power: int = 1,
    salt: int = 0,
) -> DataFrame:
    """Per-row deterministic keep-probability = weight^power, with
    weight in [0, 1] (e.g. the composite quality score) — the standard
    quality-proportional re-weighting of a web corpus (upsample clean
    prose, downsample boilerplate) without a shuffle.

    `power` sharpens the preference (an integer temperature knob:
    power=1 keeps proportional to weight; power=2 quadratically favors
    high-quality docs). It is an INTEGER so the threshold is a fixed
    left-to-right chain of double multiplies — bit-identical in any
    IEEE-754 engine, which keeps the decision SQL-oracle-exact
    (fractional powers would route through pow/exp whose last-ulp
    behavior is libm-specific).

    Same shape as hash_sample: one pure column predicate, zero
    shuffles, pushdown-friendly.
    """
    key = F.col(key) if isinstance(key, str) else key
    weight = F.col(weight) if isinstance(weight, str) else weight
    if power < 1:
        raise ValueError(f"power {power} must be a positive integer")
    threshold = weight.cast("double")
    for _ in range(power - 1):
        threshold = threshold * weight.cast("double")
    return df.filter(
        hash_bucket(key, salt).cast("double") < threshold * F.lit(float(MOD))
    )


def weighted_sample_sql_predicate(
    key_sql: str, weight_sql: str, power: int = 1, salt: int = 0
) -> str:
    """DuckDB mirror of weighted_sample's filter: same fold, same
    multiply chain, same threshold arithmetic."""
    threshold = f"CAST(({weight_sql}) AS DOUBLE)"
    for _ in range(power - 1):
        threshold = f"({threshold} * CAST(({weight_sql}) AS DOUBLE))"
    return (
        f"CAST(((({key_sql} + {salt}) % {_FOLD} + {_FOLD}) % {_FOLD}"
        f" * {KNUTH}) % {MOD} AS DOUBLE) < {threshold} * {float(MOD)}"
    )


def sample_sql_predicate(key_sql: str, rate: float, salt: int = 0) -> str:
    """The DuckDB-side mirror of hash_sample's filter, for oracle SQL:
    same fold, same multiply, same threshold."""
    return (
        f"((({key_sql} + {salt}) % {_FOLD} + {_FOLD}) % {_FOLD} * {KNUTH}) % {MOD}"
        f" < {int(rate * MOD)}"
    )


def temperature_sample(
    df: DataFrame,
    key: str | Column,
    group: str | Column,
    alpha: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Multinomial temperature re-balancing across groups (languages /
    sources): after sampling, expected group sizes are proportional to
    n_g^alpha — the standard multilingual-pretraining mixture rule
    (Lample & Conneau 2019 XLM eq. 2; mBERT exponent 0.7, mT5 0.3).

    Realized as deterministic subsampling with per-group keep rate

        r_g = (n_min / n_g) ** (1 - alpha)

    so the smallest group keeps 100% and larger groups are downsampled
    toward the flattened target (alpha=1 keeps everything, alpha=0
    equalizes all groups). Decisions use the same engine-portable
    multiplicative hash as ``hash_sample`` — reproducible across
    partitionings, clusters, and engines.

    ``alpha=0.5`` (the default) makes r_g = sqrt(n_min / n_g): IEEE-754
    sqrt is correctly rounded, so the threshold is bit-identical in any
    engine and the SQL oracle matches exactly. Other alphas route
    through pow(), whose last-ulp behavior is libm-specific — fine in
    production, but only 0.5 is oracle-exact.

    Physical shape: ONE tiny aggregate (group counts, map-side
    combined) collected to the driver, then a pure CASE-expression
    filter — the corpus itself is never shuffled.
    """
    import math

    key = F.col(key) if isinstance(key, str) else key
    group = F.col(group) if isinstance(group, str) else group
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha {alpha} outside [0, 1]")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(group.alias("g")).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    if not counts:
        return df
    n_min = min(counts.values())
    threshold = F.lit(0)
    for g, n in sorted(counts.items()):
        if alpha == 0.5:
            r = math.sqrt(n_min / n)
        else:
            r = (n_min / n) ** (1.0 - alpha)
        threshold = F.when(group == F.lit(g), F.lit(int(r * MOD))).otherwise(
            threshold
        )
    return df.filter(hash_bucket(key, salt) < threshold)


def temperature_sample_sql(
    table_sql: str,
    key_sql: str,
    group_sql: str,
    alpha: float = 0.5,
    salt: int = 0,
) -> str:
    """DuckDB mirror of temperature_sample (alpha=0.5 form): group
    counts and sqrt thresholds computed entirely in SQL — exact because
    IEEE sqrt is correctly rounded and the int truncation (toward zero,
    positive operand) equals floor in both engines."""
    if alpha != 0.5:
        raise ValueError("only the alpha=0.5 form is oracle-exact")
    return f"""
    WITH src_t AS MATERIALIZED ({table_sql}),
    gc AS (SELECT {group_sql} AS g, count(*) AS n FROM src_t GROUP BY 1),
    thr AS (SELECT g,
                   CAST(floor(sqrt((SELECT min(n) FROM gc)::DOUBLE / n)
                              * {float(MOD)}) AS BIGINT) AS t
            FROM gc)
    SELECT src_t.* FROM src_t JOIN thr ON {group_sql} = thr.g
    WHERE ((({key_sql} + {salt}) % {_FOLD} + {_FOLD}) % {_FOLD}
           * {KNUTH}) % {MOD} < thr.t
    """


def weighted_reservoir(
    df: DataFrame,
    group_col: str,
    key: Column,
    weight: Column,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Efraimidis-Spirakis weighted reservoir sampling (IPL 2006,
    algorithm A-ES): per group, keep the k rows with the smallest
    exponential key

        e = -ln(u) / w,   u = (knuth_hash(key, salt) + 1) / 2^32

    — equivalent to keeping the k largest u^(1/w), i.e. a weighted
    sample WITHOUT replacement where selection probability is
    proportional to weight at every draw. The hash makes the "random"
    u deterministic per row (same reproducibility contract as
    hash_sample: membership survives reruns and repartitioning), so a
    SQL oracle replays every draw.

    Physical shape: the exponential key is a pure column expression
    (hash -> ln -> divide, JVM codegen); per-group top-k plans as a
    rank-filtered window — with the filter on row_number Spark
    applies WindowGroupLimit, a map-side per-group top-k heap BEFORE
    the exchange, so mega-groups never ship their full row set
    (the crawl_schedule plan shape). Rows with weight <= 0 are
    excluded up front (their draw probability is 0).

    Returns the input columns plus (res_key, res_rank), res_rank in
    1..k by ascending key (ties to ascending hash key input).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    u = (hash_bucket(key, salt).cast("double") + F.lit(1.0)) / F.lit(
        float(MOD)
    )
    e = -F.log(u) / weight.cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.asc("res_key"), F.asc(key)
    )
    return (
        df.filter(weight > 0)
        .withColumn("res_key", e)
        .withColumn("res_rank", F.row_number().over(w))
        .filter(F.col("res_rank") <= k)
    )
