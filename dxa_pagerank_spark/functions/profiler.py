"""Table profiling: per-column shape report for pipeline pre-flight.

The first thing a data lead runs against a new 100-TB crawl drop:
per column — row/null/distinct counts, native-order min/max, and the
modal value. Catches schema drift, null storms, and degenerate columns
before any downstream operator burns a cluster-day on them.

Physical shape per column: ONE value-counts groupBy (map-side partial
aggregation absorbs the heavy hitters before the exchange — a column
with few distinct values, the common case, reduces to almost nothing),
then two reductions over the counts table: a 1-row aggregate
(nulls/distinct/min/max) and a TakeOrdered(1) for the mode. Nothing
wider than the value domain ever shuffles; columns are profiled
independently so the report parallelizes across jobs.

min/max order on the NATIVE type (so bigint 2 < 10), output cast to
string for a uniform report schema; mode ties break on the smallest
native value, making the report engine-independent and
SQL-oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_SCHEMA = (
    "column string, n_rows long, n_nulls long, n_distinct long, "
    "min_value string, max_value string, top_value string, top_count long"
)


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """-> one report row per profiled column (all of ``df`` by
    default). n_distinct / min / max / mode are over NON-NULL values;
    n_nulls counts the rest."""
    cols = list(columns) if columns is not None else list(df.columns)
    spark = df.sparkSession
    out = None
    for c in cols:
        counts = (
            df.groupBy(F.col(c).alias("val"))
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        stats = counts.agg(
            F.sum("n").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("n"))), F.lit(0)
            ).alias("n_nulls"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias(
                "n_distinct"
            ),
            F.min("val").cast("string").alias("min_value"),
            F.max("val").cast("string").alias("max_value"),
        )
        top = (
            counts.filter(F.col("val").isNotNull())
            .orderBy(F.desc("n"), F.asc("val"))
            .limit(1)
            .select(
                F.col("val").cast("string").alias("top_value"),
                F.col("n").alias("top_count"),
            )
        )
        row = (
            stats.crossJoin(top)
            .select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
                "top_value",
                "top_count",
            )
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    return out


def table_profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB mirror of table_profile: one UNION ALL arm per column,
    identical null/distinct/min/max/mode-with-tie semantics."""
    arms = []
    for c in columns:
        arms.append(
            f"""
    SELECT '{c}' AS "column",
           (SELECT count(*) FROM {table}) AS n_rows,
           (SELECT count(*) FROM {table} WHERE {c} IS NULL) AS n_nulls,
           (SELECT count(DISTINCT {c}) FROM {table}) AS n_distinct,
           (SELECT CAST(min({c}) AS VARCHAR) FROM {table}) AS min_value,
           (SELECT CAST(max({c}) AS VARCHAR) FROM {table}) AS max_value,
           (SELECT CAST({c} AS VARCHAR) FROM {table}
            WHERE {c} IS NOT NULL GROUP BY {c}
            ORDER BY count(*) DESC, {c} ASC LIMIT 1) AS top_value,
           (SELECT count(*) FROM {table}
            WHERE {c} IS NOT NULL GROUP BY {c}
            ORDER BY count(*) DESC, {c} ASC LIMIT 1) AS top_count
"""
        )
    return " UNION ALL ".join(arms)


def signal_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric signal columns
    -> (signal_a, signal_b, n, r), one row per unordered pair — the
    pre-flight a mixture designer runs before BLENDING quality signals
    (rank_fusion, quality gates): two signals correlated at 0.95 are
    one signal, and weighting both double-counts it.

    ONE aggregate computes every pair's five sufficient sums
    (map-side combinable; rows with a NULL in any listed column are
    dropped first so all pairs correlate the same support); the
    pair rows are literal projections of that 1-row frame. r is NULL
    for zero-variance signals rather than a division blowup."""
    if len(cols) < 2:
        raise ValueError("signal_correlations needs >= 2 columns")
    clean = df.dropna(subset=list(cols))
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).alias(f"sx_{a}_{b}")
            )
    stats = clean.agg(*aggs)
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = F.col("n") * F.col(f"sx_{a}_{b}") - F.col(
                f"s_{a}"
            ) * F.col(f"s_{b}")
            va = F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(
                f"s_{a}"
            )
            vb = F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(
                f"s_{b}"
            )
            parts.append(
                stats.select(
                    F.lit(a).alias("signal_a"),
                    F.lit(b).alias("signal_b"),
                    F.col("n").alias("n"),
                    F.when(
                        (va > 0) & (vb > 0),
                        num / F.sqrt(va * vb),
                    ).alias("r"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
