"""Deterministic data generators for fixtures, tests and benchmarks.

Three tiers:

1. ``synthetic_edges`` — exact behavioral replica of the reference's
   seeded generator (CreateSyntheticGraphSeed.java:44-147): same
   java.util.Random streams, same draw order, same dedupe/self-loop
   rules, so a given (N, locality, mean_indeg, seed, n_slaves) produces
   the identical edge set the reference would build. Pure Python —
   fixture scale only (N <= ~1e4).

2. ``fast_synthetic_edges`` — NumPy-vectorized seeded generator with the
   same *law* (exponential in-degree, uniform endpoints, no self-loops,
   deduped) but not draw-for-draw reference parity. Benchmark scale
   (N up to 1e7 locally).

3. Fixture micro-graphs (FIXTURES.md F3) + the pages corpus (F1).
"""

from __future__ import annotations

import math

import numpy as np

from .javarandom import JavaRandom


# ---------------------------------------------------------------------------
# Reference-parity synthetic generator (fixture scale)
# ---------------------------------------------------------------------------

def _slave_local_vertex_cnts(n: int, n_slaves: int) -> list[int]:
    """Balanced ceil/floor split (MainPR.java:241-248)."""
    mod = n % n_slaves
    div = n / n_slaves
    return [
        int(math.ceil(div)) if i < mod else int(math.floor(div))
        for i in range(n_slaves)
    ]


def synthetic_edges(
    n: int,
    locality: float,
    mean_indeg: int,
    seed: int,
    n_slaves: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Replay the reference generator's global RNG stream; return 0-based
    (src, dst) arrays. Vertex (slave i, local j) gets global id
    offset(i) + j (block placement, CreateSyntheticGraphSeed.java:51-53).
    """
    counts = _slave_local_vertex_cnts(n, n_slaves)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    endpoint_rng = JavaRandom(seed)
    indeg_rng = JavaRandom(seed + 1)
    inv_mean = 1.0 / mean_indeg

    def rand_cid(one_based_id: int, my_slave: int) -> tuple[int, int]:
        # CreateSyntheticGraphSeed.java:119-143 — one locality draw, then
        # a local-id draw; local self-loops rejected by redraw.
        loc = 1.0 if n_slaves == 1 else locality
        other = False
        index = my_slave
        if endpoint_rng.next_double() <= loc:
            index = my_slave
        else:
            index = (index + endpoint_rng.next_int(n_slaves - 1) + 1) % n_slaves
            other = True
        lid = endpoint_rng.next_int(counts[index]) + 1
        while lid == one_based_id and not other:
            lid = endpoint_rng.next_int(counts[index]) + 1
        return index, lid

    src: list[int] = []
    dst: list[int] = []
    for i in range(n_slaves):
        for j in range(counts[i]):
            u = indeg_rng.next_double()
            indeg = int(math.log(1 - u) / -inv_mean)
            if indeg >= n:
                indeg = n - 1
            seen: set[tuple[int, int]] = set()
            k = 0
            while k < indeg:
                cid = rand_cid(j + 1, i)
                if cid not in seen:
                    seen.add(cid)
                    src.append(int(offsets[cid[0]]) + cid[1] - 1)
                    dst.append(int(offsets[i]) + j)
                    k += 1
    return np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64)


# ---------------------------------------------------------------------------
# Fast NumPy generator (bench scale; same law, not draw-parity)
# ---------------------------------------------------------------------------

def fast_synthetic_edges(
    n: int, mean_indeg: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded exponential-in-degree random digraph, vectorized. Self-loops
    removed, parallel edges deduped (generator semantics,
    CreateSyntheticGraphSeed.java:82-88, 136-140)."""
    rng = np.random.default_rng(seed)
    indeg = np.minimum(
        rng.exponential(scale=mean_indeg, size=n).astype(np.int64), n - 1
    )
    dst = np.repeat(np.arange(n, dtype=np.int64), indeg)
    src = rng.integers(0, n, size=dst.shape[0], dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedupe on a packed scalar key: one int64 sort instead of
    # np.unique(..., axis=0)'s structured sort (~10x at 1e8 vertices;
    # src*n+dst < n^2 <= 1e16 stays inside int64)
    key = np.unique(src * np.int64(n) + dst)
    return key // n, key % n


_RMAT_P = 2147483647
_RMAT_A = 1103515245
_RMAT_B = 12345


def rmat_edges(
    scale: int, n_edges: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic R-MAT graph (Chakrabarti, Zhan & Faloutsos, SDM
    2004) with the canonical (a,b,c,d) = (0.57, 0.19, 0.19, 0.05)
    quadrant law — the standard heavy-tail benchmark generator (Graph500
    uses the same recursive-quadrant construction). 2^scale vertices,
    `n_edges` directed edges (self-loops kept, duplicates kept: the
    classic multigraph form; dedupe downstream if wanted).

    Quadrant draws are NOT sampled: draw(t, level) is the same
    two-stage LCG mix the walk sampler uses, reduced mod 100 and
    compared against integer thresholds 57/76/95 — a pure integer
    function of (seed, edge index, level), so any engine (or a SQL
    oracle) regenerates the identical edge list. Vectorized: one
    (n_edges,) numpy pass per level, `scale` passes total."""
    src = np.zeros(n_edges, dtype=np.int64)
    dst = np.zeros(n_edges, dtype=np.int64)
    t = np.arange(n_edges, dtype=np.int64)
    for level in range(scale):
        inner = (t * np.int64(2654435761) + np.int64(_RMAT_B + seed)
                 + np.int64(level) * np.int64(40503)) % np.int64(_RMAT_P)
        h = ((np.int64(_RMAT_A) * inner) % np.int64(_RMAT_P)) % np.int64(100)
        # quadrants of the adjacency matrix: a=(0,0) h<57, b=(0,1)
        # 57<=h<76, c=(1,0) 76<=h<95, d=(1,1) h>=95
        bit_s = (h >= 76).astype(np.int64)                 # rows c, d
        bit_d = (((h >= 57) & (h < 76)) | (h >= 95)).astype(np.int64)
        src = (src << 1) | bit_s
        dst = (dst << 1) | bit_d
    return src, dst


# ---------------------------------------------------------------------------
# In-edge-list text format (reference graph input, README.md:49-59)
# ---------------------------------------------------------------------------

def parse_in_edge_list(text: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Parse the reference's input format: line i = space-separated
    in-neighbors of vertex i (1-based); first token '0' = none. Returns
    (n, src, dst) with 0-based ids, multiplicity preserved
    (ReadLumpInEdgeListTask.java:56-75 keeps duplicates)."""
    src: list[int] = []
    dst: list[int] = []
    lines = [ln for ln in text.strip().splitlines()]
    for v, line in enumerate(lines):
        tokens = line.split()
        if not tokens or int(tokens[0]) == 0:
            continue
        for t in tokens:
            src.append(int(t) - 1)
            dst.append(v)
    return len(lines), np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64)


# FIXTURES.md F3 golden micro-graphs, as reference-format in-edge lists.
FIXTURE_GRAPHS: dict[str, str] = {
    # the reference README's own 7-vertex example (README.md:50-59)
    "g7_readme": "2 3 4 5\n3 4\n5\n0\n3 6 1\n2 4\n3 5",
    # 6 vertices, 3 dangling (4,5,6 have out_deg 0)
    "g_dangling": "2 3\n1 3\n1\n1 2\n3\n2",
    # duplicate in-edge mentions: out_deg counts occurrences
    "g_dup": "3 3 5\n1\n2 2\n1 3\n4",
    # 12 vertices, 3 undirected components: {1..6}, {7..10}, {11,12}(2-cycle)
    "g_components": "2\n3\n4\n5\n6\n1\n8\n9\n10\n7\n12\n11",
    # 8 vertices: K4 on 1-4 (4 triangles) + triangle 5-6-7 (1) + isolated-ish 8
    "g_triangles": "2 3 4\n1 3 4\n1 2 4\n1 2 3\n6 7\n5 7\n5 6\n1",
}


def hub_graph(n: int = 1001) -> tuple[int, np.ndarray, np.ndarray]:
    """g_hub: vertex 0 receives an edge from every other vertex plus a
    ring so nothing is dangling. Super-node skew fixture."""
    others = np.arange(1, n, dtype=np.int64)
    src = np.concatenate([others, np.array([0], dtype=np.int64), others])
    ring_dst = np.concatenate([others[1:], np.array([1], dtype=np.int64)])
    dst = np.concatenate([np.zeros(n - 1, dtype=np.int64), np.array([1], dtype=np.int64), ring_dst])
    return n, src, dst


# ---------------------------------------------------------------------------
# Pages corpus (FIXTURES.md F1): deterministic Common-Crawl-style pages
# whose <a href> links encode a synthetic edge table.
# ---------------------------------------------------------------------------

def page_url(i: int) -> str:
    return f"https://site{i % 101}.example/p/{i}"


def make_pages(
    n: int,
    mean_outdeg: int = 4,
    seed: int = 42,
    lang_cycle: tuple[str, ...] = ("en", "de", "fr"),
) -> tuple[list[dict], np.ndarray, np.ndarray]:
    """Build N deterministic pages + the ground-truth edge table their
    links encode. Returns (rows, src, dst); rows have url/warc_ts_epoch/
    html/text/lang; the ``text`` column is the expected extraction output
    so tests can check byte-identical extraction.
    """
    from .functions.textextract import extract_text

    e_src, e_dst = fast_synthetic_edges(n, mean_outdeg, seed)
    out_links: dict[int, list[int]] = {}
    for s, d in zip(e_src.tolist(), e_dst.tolist()):
        out_links.setdefault(s, []).append(d)

    rows: list[dict] = []
    for i in range(n):
        links = sorted(out_links.get(i, []))
        anchors = "".join(
            f'<a href="{page_url(j)}">anchor {j}</a> ' for j in links
        )
        filler = f"Deterministic filler for page {i}: " + " ".join(
            f"w{(i * 31 + k) % 997}" for k in range(10)
        )
        html = (
            f"<html><head><title>Page {i}</title>"
            f"<style>body{{margin:0}}</style>"
            f"<script>var x={i};</script></head>"
            f"<body><h1>Page {i}</h1><p>{filler}</p>{anchors}</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": page_url(i),
                "warc_ts_epoch": 1767225600 + i,  # 2026-01-01T00:00:00Z + i s
                "html": html,
                "text": extract_text(html),
                "lang": lang_cycle[i % len(lang_cycle)],
            }
        )
    return rows, e_src, e_dst


def pages_to_spark(spark, rows: list[dict]):
    """rows from make_pages -> DataFrame with the PAGES schema."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    return df.select(
        "url",
        F.timestamp_seconds(F.col("warc_ts_epoch")).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )


def edges_to_spark(spark, src: np.ndarray, dst: np.ndarray, partitions: int | None = None):
    """(src, dst) numpy arrays -> edges DataFrame (Arrow path)."""
    import pandas as pd

    pdf = pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    df = spark.createDataFrame(pdf)
    if partitions:
        df = df.repartition(partitions, "src")
    return df


def rmat_edges_df(
    spark,
    scale: int,
    n_edges: int,
    seed: int = 0,
    hash_fn: str = "portable",
    num_partitions: int | None = None,
):
    """The same R-MAT law as ``rmat_edges`` built as a pure Spark
    column program over ``spark.range(n_edges)`` — distributed
    generation with zero data movement (each partition materializes
    its own edge range; pinned equal to the numpy form in pytest).

    hash_fn='portable' (default) is the SQL/NumPy-replayable LCG-mix
    draw above; it is exact while t * 2654435761 stays in signed 64
    bits, i.e. n_edges ≤ ~3.4e9. hash_fn='xxhash64' swaps the built-in
    avalanche hash for the draw — not replayable outside Spark, but
    unbounded (the Graph500-scale-30+ bench-input form)."""
    from pyspark.sql import functions as F

    if hash_fn not in ("portable", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    if hash_fn == "portable" and n_edges * 2654435761 >= (1 << 63):
        raise ValueError(
            "n_edges too large for the portable draw (t*KNUTH overflows "
            "int64); use hash_fn='xxhash64'"
        )
    df = (
        spark.range(0, n_edges, 1, num_partitions)
        if num_partitions
        else spark.range(n_edges)
    ).select(F.col("id").alias("t"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    t = F.col("t")
    for level in range(scale):
        if hash_fn == "xxhash64":
            h = F.pmod(
                F.xxhash64(t, F.lit(level), F.lit(seed)), F.lit(100)
            )
        else:
            inner = (
                t * F.lit(2654435761)
                + F.lit(_RMAT_B + seed + level * 40503)
            ) % F.lit(_RMAT_P)
            h = ((F.lit(_RMAT_A) * inner) % F.lit(_RMAT_P)) % F.lit(100)
        bit_s = (h >= 76).cast("long")
        bit_d = (((h >= 57) & (h < 76)) | (h >= 95)).cast("long")
        src = src * 2 + bit_s
        dst = dst * 2 + bit_d
    return df.select(src.alias("src"), dst.alias("dst"))
