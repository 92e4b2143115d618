"""Z-order (Morton-curve) file layout for multi-dimensional scan
pruning (Morton 1966; the Z-ORDER BY clustering Delta/Iceberg expose).

Parquet pruning is per-column min/max: a file sorted by host alone
prunes host predicates but its per-file span over any SECOND column
(crawl day, quality band, shard) covers the whole domain, so
two-dimensional slices still touch every file. Interleaving the two
keys' bits into one Morton value and range-partitioning + sorting by
it gives every file a LOCALIZED bounding box in (a, b) space —
both columns' min/max stats become selective at once. The curve's
locality is the whole trick; nothing at read time changes (plain
parquet, plain predicates, Catalyst's ordinary stats pruning).

The bit interleave is integer shifts/masks only — a pure JVM column
program on the write path, replayed digit-for-digit by a SQL oracle.

100-TB shape: one range exchange on _z (the same shuffle any
sorted-write layout pays), sortWithinPartitions, no Python, no
second pass; the sampled range boundaries keep files balanced even
when one host dominates (RangePartitioner's reservoir sampling).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative
    integer columns: a's bit i lands at position 2i, b's at 2i+1.
    Disjoint targets, so the combine is a plain sum (OR-equivalent)
    — identical arithmetic in any SQL engine."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    terms = []
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(abit, 2 * i))
        terms.append(F.shiftleft(bbit, 2 * i + 1))
    return reduce(lambda x, y: x + y, terms)


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write `df` as parquet clustered along the Morton curve of
    (a_col, b_col): range-partition by _z into num_files files, sort
    within each, drop the helper column. Readers need no cooperation
    — per-file min/max of BOTH columns are tight, so ordinary
    predicate pushdown prunes 2-D slices."""
    zdf = df.withColumn(
        "_z", z_value(F.col(a_col), F.col(b_col), bits=bits)
    )
    (
        zdf.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
