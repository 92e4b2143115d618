"""Gap-encoded adjacency size estimation (WebGraph-style layout
planning). [north_rule extension — no reference counterpart;
dxa-pageRank stores adjacency as raw 64-bit chunk-id arrays
(reference: dxgraph ChunkID[] per vertex) and never asks the storage
question. For a 10^12-edge web graph the question is existential:
8 bytes/edge is 8 TB per 10^12 edges, while gap coding of sorted
neighbor lists (Boldi & Vigna, "The WebGraph Framework I", WWW'04 —
public literature) gets real web graphs to ~2-4 bits/edge because
locality makes successor gaps tiny.]

This module PRICES that layout before anyone builds it: per source
vertex, sort the successor list, take first-gap = dst+1 and
succeeding gaps dst_i - dst_{i-1}, and charge each gap its
Elias-gamma and Elias-delta codeword lengths:

  blen(x)  = floor(log2 x) + 1          (bits in x's binary form)
  gamma(x) = 2*blen(x) - 1
  delta(x) = blen(x) - 1 + gamma(blen(x))

Everything is computed on INTEGER bit lengths via length(bin(gap)) —
no floating log2, so floor-at-a-power-of-two can never flip and any
engine replays the numbers exactly.

Plan shape at 100 TB: one shuffle — the per-src sort window (the
graph's natural partitioning; with edges bucketed by src it
disappears). The summary is a map-side-combinable global aggregate.
No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adjacency_gap_costs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Per-source adjacency coding costs -> (src, deg, gamma_bits,
    delta_bits).

    Vertex ids must be >= 0 (web-graph convention) so every gap is
    >= 1. Duplicate (src, dst) rows would produce zero gaps, so the
    input is deduplicated unless ``assume_distinct`` says the source
    already guarantees uniqueness (skips that shuffle)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_distinct:
        e = e.distinct()
    w = Window.partitionBy("src").orderBy("dst")
    prev = F.lag("dst").over(w)
    gap = F.when(prev.isNull(), F.col("dst") + 1).otherwise(
        F.col("dst") - prev
    )
    blen = F.length(F.bin(gap))
    blen2 = F.length(F.bin(blen))
    return (
        e.select(
            "src",
            (2 * blen - 1).alias("_g"),
            (blen - 1 + 2 * blen2 - 1).alias("_d"),
        )
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.sum("_g").alias("gamma_bits"),
            F.sum("_d").alias("delta_bits"),
        )
    )


def compression_summary(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    raw_bits_per_edge: int = 64,
    assume_distinct: bool = False,
) -> DataFrame:
    """One-row storage forecast for the whole edge table:
    (n_sources, n_edges, gamma_bits, delta_bits, gamma_bpe, delta_bpe,
    raw_bits, gamma_ratio) — bpe = bits/edge, ratio = raw/gamma.
    The number a capacity plan needs before committing a layout."""
    per_src = adjacency_gap_costs(
        edges, src_col=src_col, dst_col=dst_col,
        assume_distinct=assume_distinct,
    )
    ne = F.sum("deg")
    g = F.sum("gamma_bits")
    d = F.sum("delta_bits")
    raw = ne * F.lit(int(raw_bits_per_edge))
    return per_src.agg(
        F.count(F.lit(1)).alias("n_sources"),
        ne.alias("n_edges"),
        g.alias("gamma_bits"),
        d.alias("delta_bits"),
        F.round(g / ne, 6).alias("gamma_bpe"),
        F.round(d / ne, 6).alias("delta_bpe"),
        raw.alias("raw_bits"),
        F.round(raw / g, 6).alias("gamma_ratio"),
    )
