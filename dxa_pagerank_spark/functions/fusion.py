"""Reciprocal-rank fusion of ranked signals. [north_rule extension —
no reference code; RRF is the standard rank-combination rule
(Cormack, Clarke & Buettcher, SIGIR'09) a web search / data-curation
stack uses to blend link-based, content-based, and model-based
rankings without score calibration.]

fused(d) = sum_i 1/(k + rank_i(d)) over the signals that ranked d in
their top_m (absent signals contribute 0, the standard truncated-list
form); k=60 per the paper. Ranks are dense row_numbers under
(score DESC, id ASC), so ties are broken deterministically and the
whole fusion is an exact integer/rational program — the SQL oracle
replays it bit-for-bit.

Scale shape: each signal is truncated to top_m FIRST via sort-limit —
Spark plans that as TakeOrderedAndProject (per-partition top-m, one
merge), never a global sort — so the rank windows and the full-outer
fusion joins run on <= top_m rows per signal regardless of corpus
size. The final fused sum is a fixed-order column expression (not an
aggregate), keeping float addition order engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    signals: list[tuple[str, DataFrame]],
    k: int = 60,
    top_m: int = 100,
    n_out: int = 20,
) -> DataFrame:
    """signals: ordered [(name, df)] where df has (id, score), higher
    score = better. -> (id, rank_<name>..., rrf_score) — the n_out
    best documents by fused score; rank 0 means the signal did not
    rank the document in its top_m."""
    if not signals:
        raise ValueError("rrf_fuse needs at least one signal")
    order = [F.desc("score"), F.asc("id")]
    out = None
    terms = []
    for name, df in signals:
        col = f"rank_{name}"
        # top_m truncation (TakeOrderedAndProject), THEN the rank
        # window — the window input is bounded by top_m, so the
        # single-partition sort it implies is a constant-size job.
        top = df.select("id", "score").orderBy(*order).limit(top_m)
        r = top.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias(col)
        )
        out = r if out is None else out.join(r, "id", "full_outer")
        terms.append(
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col(col)), F.lit(0.0)
            )
        )
    fused = terms[0]
    for t in terms[1:]:
        fused = fused + t
    return (
        out.select(
            "id",
            *[
                F.coalesce(F.col(f"rank_{n}"), F.lit(0)).alias(f"rank_{n}")
                for n, _ in signals
            ],
            F.round(fused, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(n_out)
    )
