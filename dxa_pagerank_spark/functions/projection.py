"""Johnson-Lindenstrauss random projection of embeddings. [north_rule
extension — no reference code; JL sketching (Achlioptas JCSS 2003:
±1 entries suffice) is the standard dimensionality-reduction prefilter
for embedding workloads at scale — pairwise distances survive within
(1±ε), so ANN/dedup candidate generation can run on k ≪ dim
dimensions.]

The projection matrix is never materialized: entry sign(i, j) for
input dim i / output dim j comes from the same injective arithmetic
mix the walk sampler uses (two-stage LCG mod the Mersenne prime), so
the "matrix" is a pure function of (seed, i, j) — identical across
engines, partitionings, and retries, and the SQL oracle replays it
term by term:

    sign(i, j) = +1 if ((A * ((i*C + j + B + seed) % P)) % P) % 2 == 0
                 else -1
    out[j]     = ( Σ_i v[i] * sign(i, j) ) / sqrt(k)

with the inner sum folded in ascending i (index order — the same
association in both engines; all hash operands stay < 2^62, exact in
int64 anywhere).

Plan shape: a pure per-row column program — no join, no shuffle, no
Python; the projection rides whatever scan produces the vectors.
Output is exploded to scalar (id, dim, value) rows (engine-portable
comparison form; collect back with collect_list over dim if an array
is wanted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647
A = 1103515245
B = 12345
C = 2654435761  # Knuth multiplicative constant spreads the (i, j) grid


def _sign(i_col, j_col, seed: int):
    inner = (i_col * F.lit(C) + j_col + F.lit(B + seed)) % F.lit(P)
    bit = ((F.lit(A) * inner) % F.lit(P)) % F.lit(2)
    return F.when(bit == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def jl_project(
    emb: DataFrame,
    out_dim: int = 8,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, dim, value): the out_dim-dimensional JL sketch of every
    vector (0-based output dim, 6-dp values)."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    first = emb.select(vec_col).first()
    in_dim = len(first[vec_col])
    scale = F.lit(float(out_dim) ** 0.5)
    idx = F.sequence(F.lit(0), F.lit(in_dim - 1))

    def component(jj):
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), idx, lambda v, i: v * _sign(i, jj, seed)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / scale,
            6,
        )

    comps = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)), lambda jj: component(jj)
    )
    return emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(comps).alias("dim", "value"),
    )
