"""Host/site-level rollup of the page link graph.

Standard web-scale reduction: collapse the page graph to one vertex per
site and carry edge multiplicity as weight — host-level PageRank runs on
a graph orders of magnitude smaller than the page graph (the classic
HostRank / HostGraph construction). On a real crawl the site key is the
url host (``F.parse_url(url, 'HOST')``, JVM-side); the synthetic fixture
corpus lives on one host, so tests and oracle queries use contiguous
id-blocks of ``block_size`` pages as "sites" — the rollup operator
itself is key-agnostic.

Physical shape: a single groupBy over the edge table (one shuffle,
map-side partial counts); self-loops produced by intra-site links are
kept or dropped by flag (host PageRank conventionally drops them —
they dominate the weight mass and carry no cross-site information).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def site_rollup(
    edges: DataFrame,
    block_size: int | None = None,
    site_of=None,
    drop_self_loops: bool = True,
) -> DataFrame:
    """edges(src, dst) -> site edges (src, dst, weight).

    Site key: ``site_of`` (a Column -> Column callable applied to each
    endpoint, e.g. url-host lookup) or id-block ``floor(id /
    block_size)``. Weight = number of page edges between the two sites
    (multiplicity kept, file-ingest semantics).
    """
    if site_of is None:
        if block_size is None:
            raise ValueError("pass block_size or site_of")
        def site_of(c):  # noqa: E731 — default id-block mapping
            return F.floor(c / block_size)
    rolled = edges.select(
        site_of(F.col("src")).alias("src"), site_of(F.col("dst")).alias("dst")
    )
    if drop_self_loops:
        rolled = rolled.filter(F.col("src") != F.col("dst"))
    return rolled.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )
