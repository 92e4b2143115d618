"""Deterministic R-MAT graph generator (Chakrabarti, Zhan & Faloutsos,
SDM'04 — the Graph500 reference generator's recursive-quadrant law).
[north_rule extension — no reference counterpart: dxa-pageRank's own
generator (datagen.py replicates it) draws near-uniform degrees, so it
never exercises skew handling. R-MAT with the canonical
(a,b,c,d) = (0.57, 0.19, 0.19, 0.05) produces the power-law hubs a web
graph actually has — the right stress input for salting / AQE skew-join
evidence at bench time.]

Construction: 2^scale vertices; each of m = edge_factor * 2^scale
edges descends `scale` levels of the adjacency matrix's recursive
quadrants. At level l one uniform draw u picks the quadrant:
u < a -> (0,0), < a+b -> (0,1), < a+b+c -> (1,0), else (1,1); the two
bits land at position scale-1-l of (src, dst). Duplicate edges and
self-loops are legitimate R-MAT output (Graph500 keeps them too).

The draw must be NONLINEAR in the key: a bare multiplicative hash is
an affine map, so sequential keys (edge*scale + level) produce
arithmetic-progression draws and the bit decisions collapse onto a few
vertices (measured: 20 distinct sources at scale 10). The portable
mix used here squares the key modulo the Mersenne prime 2^31-1 before
the Knuth multiply — u = (((k² mod (2^31-1)) + k) mod 2^31) * KNUTH
mod 2^32 — every intermediate < 2^62, so plain signed-64 arithmetic is
exact in Spark, NumPy and SQL alike. With it the per-level quadrant
marginals land on (a+b) as specified and the degree skew appears. So

  * the Spark form is a PURE COLUMN PROGRAM over spark.range(m) —
    zero shuffles, zero Python in the row path, infinitely scalable
    (range splits across the cluster; each task generates its slice);
  * a NumPy replica and a SQL oracle replay every edge bit-for-bit.

Key folding caps exact determinism at m*scale < 2^31 draws (same
documented trade as hash_sample); a production run past ~10^8 edges
swaps `F.xxhash64` for the draw — the program shape is unchanged.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.sampling import KNUTH, MOD, _FOLD

A, B, C = 0.57, 0.19, 0.19  # d = 1 - a - b - c = 0.05 (Graph500)
_P = (1 << 31) - 1  # Mersenne prime for the quadratic mix


def _thresholds(a: float, b: float, c: float) -> tuple[int, int, int]:
    if not (0 < a and 0 <= b and 0 <= c and a + b + c < 1):
        raise ValueError("need a>0, b,c>=0, a+b+c<1")
    return int(a * MOD), int((a + b) * MOD), int((a + b + c) * MOD)


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = A,
    b: float = B,
    c: float = C,
    seed: int = 0,
    num_partitions: int | None = None,
    hash_fn: str = "portable",
) -> DataFrame:
    """(src, dst) R-MAT edge table, 2^scale vertices,
    edge_factor * 2^scale edges — deterministic in (scale, edge_factor,
    a, b, c, seed, hash_fn).

    hash_fn='portable' (default) is the SQL/NumPy-replayable quadratic
    mix, exact up to m*scale < 2^31 draws; hash_fn='xxhash64' uses the
    built-in avalanche hash — not replayable outside Spark, but
    alias-free at any scale (the bench-input form)."""
    m = edge_factor << scale
    if hash_fn == "portable" and m * scale + seed >= _FOLD:
        raise ValueError(
            "m*scale >= 2^31: draws would alias under the portable hash; "
            "use hash_fn='xxhash64' (see module doc)"
        )
    if hash_fn not in ("portable", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    ta, tab, tabc = _thresholds(a, b, c)
    e = (
        spark.range(0, m, 1, num_partitions)
        if num_partitions
        else spark.range(m)
    ).select(F.col("id").alias("e"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        if hash_fn == "xxhash64":
            u = F.pmod(
                F.xxhash64(F.col("e"), F.lit(lvl), F.lit(seed)), F.lit(MOD)
            )
        else:
            k = F.col("e") * scale + F.lit(lvl) + F.lit(seed)
            mixed = F.pmod(F.pmod(k * k, F.lit(_P)) + k, F.lit(_FOLD))
            u = F.pmod(mixed * F.lit(KNUTH), F.lit(MOD))
        sbit = F.when(u < F.lit(tab), F.lit(0)).otherwise(F.lit(1))
        dbit = F.when(
            (u < F.lit(ta)) | ((u >= F.lit(tab)) & (u < F.lit(tabc))),
            F.lit(0),
        ).otherwise(F.lit(1))
        w = 1 << (scale - 1 - lvl)
        src = src + sbit.cast("long") * F.lit(w)
        dst = dst + dbit.cast("long") * F.lit(w)
    return e.select(src.alias("src"), dst.alias("dst"))


def rmat_edges_numpy(
    scale: int,
    edge_factor: int = 16,
    a: float = A,
    b: float = B,
    c: float = C,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized replica of rmat_edges — same hash, same bits."""
    m = edge_factor << scale
    ta, tab, tabc = _thresholds(a, b, c)
    e = np.arange(m, dtype=np.int64)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for lvl in range(scale):
        k = e * scale + lvl + seed
        u = ((((k * k) % _P) + k) % _FOLD) * KNUTH % MOD
        sbit = (u >= tab).astype(np.int64)
        dbit = (~((u < ta) | ((u >= tab) & (u < tabc)))).astype(np.int64)
        w = 1 << (scale - 1 - lvl)
        src += sbit * w
        dst += dbit * w
    return src, dst
