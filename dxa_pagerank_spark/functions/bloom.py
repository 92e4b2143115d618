"""Bloom-filter membership gates. [north_rule extension — no reference
code; the Bloom filter (CACM 1970) is the standard broadcast
membership summary at web scale — a blocklist of 10^9 URLs fits in a
few GB of bits where the set itself cannot broadcast, at the price of
a bounded false-positive rate and zero false negatives. Spark's own
runtime filter pushdown uses the same construction.]

Deterministic and engine-portable, same conventions as
functions/cmsketch.py: element keys are 48-bit md5 prefixes, the k bit
positions come from the arithmetic LCG mix, and the filter is the
DISTINCT set of set bits — a pure additive-OR structure with no order
dependence, so the SQL oracle rebuilds it bit-for-bit (false
positives included: the probe output is exactly reproducible, which
is what makes an approximate structure oracle-checkable).

Plan shape: build = one explode to k bit rows + distinct (blocklist-
sized); probe = the bit table broadcast into a join against each
probe key's k positions, member iff all k bits matched — one
map-side-combinable count aggregate per probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cmsketch import _cell, _term_key


def bloom_build(
    keys: DataFrame, m: int = 4096, k: int = 4, key_col: str = "key"
) -> DataFrame:
    """-> (bit): the distinct set-bit positions of the filter over the
    key set (m bits, k hashes per key)."""
    if m < 1 or k < 1:
        raise ValueError("m and k must be >= 1")
    kk = keys.select(_term_key(F.col(key_col)).alias("h"))
    return (
        kk.select(
            F.explode(
                F.array(*[_cell(F.col("h"), r, m) for r in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    m: int = 4096,
    k: int = 4,
    key_col: str = "key",
) -> DataFrame:
    """-> probes + (hits, member): member = all k bit positions set.
    No false negatives ever; false positives at the standard
    (1 - e^(-kn/m))^k rate — deterministic, so the oracle reproduces
    them exactly."""
    pk = probes.select(
        F.col(key_col).alias("key"),
        _term_key(F.col(key_col)).alias("h"),
    ).select(
        "key",
        F.explode(
            F.array(*[_cell(F.col("h"), r, m) for r in range(k)])
        ).alias("bit"),
    )
    hits = (
        pk.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        probes.select(F.col(key_col).alias("key"))
        .distinct()
        .join(hits, "key", "left")
        .select(
            "key",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            (F.coalesce("hits", F.lit(0)) == k).alias("member"),
        )
    )
