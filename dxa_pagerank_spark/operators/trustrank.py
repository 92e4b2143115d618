"""TrustRank & spam mass estimation.

north_rule scope extension (no reference code), from the published
method (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam with
TrustRank", VLDB 2004 — public literature): run the SAME PageRank
iteration twice, once with the uniform teleport vector (ordinary
PageRank) and once teleporting only to a trusted seed set
(TrustRank).  Rank a page earned beyond what its trusted neighborhood
explains is suspected spam:

    spam_mass(v)     = PR(v) - TR(v)
    rel_spam_mass(v) = (PR(v) - TR(v)) / PR(v)

Both runs are operators/ppr.py's loop (seeds=None is the uniform
vector), so the physical story is two PageRank-shaped iterations —
adjacency partitioned+persisted once per run, per-round shuffle is the
rank table, dangling mass returns to the teleport vector — plus one
final |V|-row join.  PR(v) >= (1-d)/|V| > 0, so the relative mass is
always defined.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.ppr import personalized_pagerank


def trustrank(
    spark: SparkSession,
    edges: DataFrame,
    trusted: Sequence[int],
    damping: float = 0.85,
    rounds: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, rank): PageRank with teleport restricted to ``trusted``."""
    return personalized_pagerank(
        spark,
        edges,
        seeds=trusted,
        damping=damping,
        rounds=rounds,
        num_partitions=num_partitions,
    )


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    trusted: Sequence[int],
    damping: float = 0.85,
    rounds: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> (id, pagerank, trustrank, spam_mass, rel_spam_mass)."""
    pr = personalized_pagerank(
        spark,
        edges,
        seeds=None,
        damping=damping,
        rounds=rounds,
        num_partitions=num_partitions,
    ).withColumnRenamed("rank", "pagerank")
    tr = trustrank(
        spark,
        edges,
        trusted,
        damping=damping,
        rounds=rounds,
        num_partitions=num_partitions,
    ).withColumnRenamed("rank", "trustrank")
    return pr.join(tr, "id").select(
        "id",
        "pagerank",
        "trustrank",
        (F.col("pagerank") - F.col("trustrank")).alias("spam_mass"),
        (
            (F.col("pagerank") - F.col("trustrank")) / F.col("pagerank")
        ).alias("rel_spam_mass"),
    )
