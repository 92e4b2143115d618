"""Whole-graph structural statistics: reciprocity, degree
assortativity, and partition modularity.

Standard link-graph characterization metrics (Newman, "Assortative
mixing in networks", PRL 89, 2002; reciprocity is classic in web-graph
studies — the web is famously low-reciprocity vs social graphs). The
reference computes no graph statistics beyond the edge count
(MainPR.java:114); these extend the engine's analysis surface over the
same edge tables.

Physical shape, both: degree tables are one groupBy each; edges join
degrees on an equi-key (broadcastable when the degree table is small,
shuffle hash join at scale); the answer is a single global aggregate of
sums — partial map-side, 1-row result. No driver-side iteration, no
per-row Python, no cartesian anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocity(edges: DataFrame) -> DataFrame:
    """1-row (n_edges, n_reciprocal, reciprocity): of the DISTINCT
    non-loop directed edges (u,v), what fraction have (v,u) present.

    Distinct first — edge-file multiplicity (SURVEY §2.3.6) would
    otherwise double-count; self-loops are reciprocal by construction
    and excluded, the standard convention. left_semi against the
    reversed edge set: no row explosion, the join output is at most the
    distinct edge count.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        e.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .select(
            "n_edges",
            "n_reciprocal",
            (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """1-row Pearson correlation, across distinct non-loop edges (u,v),
    between out-degree(u) and in-degree(v) — the out-in directed
    assortativity coefficient. Positive: high-fanout pages link to
    popular pages; web graphs are typically slightly disassortative.

    Degrees are counted over the SAME distinct non-loop edge set being
    correlated (self-consistent, the networkx convention). Pearson is
    computed from the five sufficient sums in one aggregate — no
    centering pass, no second scan.
    """
    # Lazy result: the distinct edge set appears three times in the
    # plan (degree builds + the correlate scan). A caller holding a hot
    # edge table should persist it upstream; persisting here would have
    # to outlive this function's return (the result is unexecuted).
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    pairs = e.join(out_deg, "src").join(in_deg, "dst").select(
        F.col("x").cast("double"), F.col("y").cast("double")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).select(
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("assortativity"),
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """1-row (n_edges, n_communities, modularity): Newman modularity Q
    of the community assignment ``labels(id, label)`` over the
    undirected simple graph,

        Q = sum_c [ m_c / m  -  (d_c / (2m))^2 ]

    with m the undirected edge count, m_c the intra-community edge
    count, and d_c the community degree sum (Newman & Girvan 2004).
    Vertices missing from ``labels`` count as singleton communities
    (contributing only their degree term), so Q is total over the edge
    set regardless of labels coverage.

    Physical shape: symmetrize+dedupe once; two equi-joins attach the
    endpoint labels (the labels table shuffles, keyed by vertex — at
    web scale it is the small side per partition and AQE can broadcast
    it); then two map-side-combinable aggregates (per-community sums →
    one global row). No window functions, no driver iteration.
    """
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("cb"))
    # missing label -> singleton community keyed as -(id+1), which
    # cannot collide with real labels (vertex-id labels are >= 0).
    tagged = (
        sym.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce(F.col("ca"), -F.col("a") - F.lit(1)).alias("ca"),
            F.coalesce(F.col("cb"), -F.col("b") - F.lit(1)).alias("cb"),
        )
    )
    m = tagged.count()
    if m == 0:
        sess = edges.sparkSession
        return sess.createDataFrame(
            [(0, 0, 0.0)], "n_edges long, n_communities long, modularity double"
        )
    # per-community: intra-edge count and degree sum (each edge adds 1
    # to both endpoints' communities; an intra edge adds 2 to one).
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("mc"))
    )
    deg = (
        tagged.select(F.explode(F.array("ca", "cb")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("dc"))
    )
    per_c = deg.join(intra, "c", "left").select(
        "c",
        (
            F.coalesce(F.col("mc"), F.lit(0)) / F.lit(float(m))
            - (F.col("dc") / F.lit(2.0 * m)) * (F.col("dc") / F.lit(2.0 * m))
        ).alias("q"),
    )
    return per_c.agg(
        F.lit(m).alias("n_edges"),
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("q").alias("modularity"),
    )




def degree_skew_report(
    spark, edges: DataFrame, direction: str = "in", top_k: int = 10
) -> DataFrame:
    """1-row skew profile of the degree distribution — the diagnostic a
    100-TB job reads BEFORE picking salting / AQE-skew settings:

      (n_vertices, n_edges, max_deg, p50, p90, p99, gini, topk_share)

    over the DISTINCT non-loop directed edge set. ``direction``: "in"
    (dst degrees — hub pages) or "out" (src degrees — link farms).
    Quantiles are type-1 (smallest degree d with cumulative vertex
    count >= ceil(q * n)); zero-degree vertices of the universe are
    included. gini is the rank formula over ascending degrees,
    2*sum(i * d_i) / (n * sum(d)) - (n + 1)/n; topk_share = fraction of
    edges incident to the top_k highest-degree vertices.

    Physical shape: one degree groupBy (the only corpus-scale shuffle),
    then everything runs on the DISTINCT-DEGREE-VALUE table (thousands
    of rows at any corpus size) — the rank sum uses a single-partition
    window over that tiny table, with decimal(38,0) accumulators so the
    integer math stays exact past int64 at web scale (sum(i*d_i)
    reaches ~1e32 at 1e12 vertices). Everything is integer until the
    two final float divisions, so the SQL oracle matches exactly.
    """
    from pyspark.sql import Window

    from .pagerank import vertex_universe

    if direction not in ("in", "out"):
        raise ValueError(f"direction {direction!r} not in ('in', 'out')")
    key = "dst" if direction == "in" else "src"
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = vertex_universe(spark, e)
    deg = e.groupBy(F.col(key).alias("id")).agg(F.count(F.lit(1)).alias("d"))
    full = verts.join(deg, "id", "left").select(
        F.coalesce(F.col("d"), F.lit(0)).alias("d")
    )
    dist = full.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    c_dec, d_dec = F.col("c").cast(dec), F.col("d").cast(dec)
    prior = (F.sum("c").over(w) - F.col("c")).cast(dec)
    # sum of ranks within this degree run: c*prior + c*(c+1)/2 — the
    # product is computed in decimal (c*(c+1) overflows int64 at 1e12
    # vertices); the halving is exact (c*(c+1) is even).
    run_ranks = c_dec * prior + (c_dec * (F.col("c") + 1).cast(dec) / 2).cast(
        dec
    )
    cum = dist.select(
        "d",
        "c",
        F.sum("c").over(w).alias("cum"),
        (d_dec * run_ranks).alias("rank_term"),
    ).localCheckpoint(eager=True)
    srow = cum.agg(
        F.sum("c").alias("n"),
        F.sum(d_dec * c_dec).alias("sd"),
        F.sum("rank_term").alias("si"),
        F.max("d").alias("max_deg"),
    ).collect()[0]
    n, sd, si = int(srow["n"]), int(srow["sd"]), int(srow["si"])

    def quantile(q_pct: int) -> int:
        thresh = -(-n * q_pct // 100)  # ceil(n * q / 100), integer-exact
        return int(
            cum.filter(F.col("cum") >= thresh).agg(F.min("d")).collect()[0][0]
        )

    topk = int(
        deg.orderBy(F.desc("d"), F.asc("id"))
        .limit(top_k)
        .agg(F.coalesce(F.sum("d"), F.lit(0)))
        .collect()[0][0]
    )
    gini = 2.0 * float(si) / (float(n) * float(sd)) - (n + 1.0) / n
    out = spark.createDataFrame(
        [
            (
                n,
                sd,
                int(srow["max_deg"]),
                quantile(50),
                quantile(90),
                quantile(99),
                gini,
                float(topk) / sd,
            )
        ],
        "n_vertices long, n_edges long, max_deg long, p50 long, "
        "p90 long, p99 long, gini double, topk_share double",
    )
    # HALF_UP rounding via F.round (NOT Python round, which is
    # banker's) so the SQL oracle's round() matches tie cases too.
    return out.select(
        "n_vertices", "n_edges", "max_deg", "p50", "p90", "p99",
        F.round("gini", 6).alias("gini"),
        F.round("topk_share", 6).alias("topk_share"),
    )


def powerlaw_fit(
    spark, edges: DataFrame, direction: str = "in", dmin: int = 2
) -> DataFrame:
    """1-row (dmin, n_tail, alpha, sigma): discrete power-law exponent
    MLE over degrees >= dmin — Clauset, Shalizi & Newman (SIAM Review
    2009) eq. 3.7 approximation

        alpha = 1 + n / sum_i ln(d_i / (dmin - 1/2)),
        sigma = (alpha - 1) / sqrt(n)

    — the "is this a web-like heavy-tail graph" pre-flight check next
    to degree_skew_report (web in-degrees are the canonical alpha ~ 2.1
    case, Broder et al. WWW'00). dmin is a caller-supplied cutoff; for
    the full Clauset KS-minimizing scan, call this per candidate dmin
    and keep the best — each call is one tiny aggregate.

    Physical shape: one degree groupBy (the only corpus-scale
    shuffle), then the tail filter and a single 1-row aggregate over
    the DISTINCT-DEGREE-VALUE table (sum(c * ln(d / (dmin - 0.5))) —
    thousands of rows at any graph size), all map-side combinable.
    Raises if the tail is empty."""
    if direction not in ("in", "out"):
        raise ValueError(f"direction {direction!r} not in ('in', 'out')")
    if dmin < 1:
        raise ValueError("dmin must be >= 1")
    key = "dst" if direction == "in" else "src"
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = e.groupBy(F.col(key).alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    dist = (
        deg.filter(F.col("d") >= dmin)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = dist.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("d") / F.lit(dmin - 0.5))).alias("s"),
    )
    row = agg.collect()[0]
    if not row["n"]:
        raise ValueError(f"no vertices with degree >= dmin={dmin}")
    n, s = int(row["n"]), float(row["s"])
    out = spark.createDataFrame(
        [(dmin, n, 1.0 + n / s, (n / s) / (n ** 0.5))],
        "dmin long, n_tail long, alpha double, sigma double",
    )
    return out.select(
        "dmin",
        "n_tail",
        F.round("alpha", 6).alias("alpha"),
        F.round("sigma", 6).alias("sigma"),
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve phi(k) of the undirected simple
    graph (Zhou & Mondragon, "The rich-club phenomenon in the Internet
    topology", IEEE Comm. Lett. 2004; Colizza et al., Nat. Phys. 2006):
    for each degree threshold k, the club is the vertex set with
    degree > k and

        phi(k) = 2 * E_club / (N_club * (N_club - 1))

    — the fraction of possible intra-club edges that exist. Web/AS
    graphs famously score near 1 at the hub end (the "rich club" of
    mutually-linked hubs); the curve is the standard diagnostic next to
    degree_skew_report / powerlaw_fit. The reference computes no graph
    statistics (MainPR.java:114); spec extension per SURVEY §2.2.

    One row per threshold k in {0} union {distinct degree values},
    restricted to clubs with >= 2 members so phi is defined:
    (k, club_nodes, club_edges, phi). Exact-integer counts; the single
    division happens at output, so a SQL oracle replays bit-for-bit.

    Physical shape: distinct canonical edge set (one shuffle), one
    degree groupBy, two edge->degree equi-joins (shuffle hash at
    scale), then BOTH cumulative scans run on the merged
    DEGREE-VALUE domain — thousands of rows on any graph, so the
    final windows are a single tiny task. No per-edge windows, no
    cartesian anything; club membership is never materialized
    per-vertex (the counts come from histogram complements).
    """
    from pyspark.sql import Window

    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # per-edge club entry threshold: the edge is inside club(k) iff
    # min(deg_a, deg_b) > k
    edge_min = (
        e.join(deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b")
        .select(F.least("da", "db").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("ce"))
    )
    node_hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("cn"))
    # merged threshold domain (degree-value-sized): cumulative counts
    # at-or-below each value; club counts are the complements
    dom = (
        node_hist.select(F.col("d").alias("k"), "cn", F.lit(0).alias("ce"))
        .unionAll(
            edge_min.select(
                F.col("m").alias("k"), F.lit(0).alias("cn"), "ce"
            )
        )
        .unionAll(
            deg.sparkSession.range(1).select(
                F.lit(0).alias("k"),
                F.lit(0).alias("cn"),
                F.lit(0).alias("ce"),
            )
        )
        .groupBy("k")
        .agg(F.sum("cn").alias("cn"), F.sum("ce").alias("ce"))
    )
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = dom.select(
        "k",
        (F.sum("cn").over(tot) - F.sum("cn").over(w)).alias("club_nodes"),
        (F.sum("ce").over(tot) - F.sum("ce").over(w)).alias("club_edges"),
    )
    return cum.filter(F.col("club_nodes") >= 2).select(
        "k",
        "club_nodes",
        "club_edges",
        (
            F.lit(2.0)
            * F.col("club_edges")
            / (F.col("club_nodes") * (F.col("club_nodes") - F.lit(1)))
        ).alias("phi"),
    )


def attribute_mixing_matrix(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """-> (label_src, label_dst, n_links, share): the categorical
    mixing matrix e_ij of Newman, "Mixing patterns in networks" (PRE
    2003) — here typically language-to-language or site-category
    linking over the distinct non-loop edge set. share = n/total is
    the only division (exact-integer counts underneath).

    Physical shape: two edge->label equi-joins (label table is
    vertex-sized — shuffle hash join at scale, broadcastable when the
    attribute table is a dimension), one groupBy on the label-PAIR
    domain (|labels|^2 rows — tiny), total attached as a 1-row
    broadcast."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    la = labels.select(
        F.col("id").alias("src"), F.col("label").alias("label_src")
    )
    lb = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("label_dst")
    )
    m = (
        e.join(la, "src")
        .join(lb, "dst")
        .groupBy("label_src", "label_dst")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    tot = m.agg(F.sum("n_links").alias("t"))
    return m.crossJoin(F.broadcast(tot)).select(
        "label_src",
        "label_dst",
        "n_links",
        (F.col("n_links") / F.col("t")).alias("share"),
    )


def attribute_assortativity(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """1-row (n_links, r): Newman's categorical assortativity
    coefficient over the mixing matrix,

        r = (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i)

    with a/b the row/column marginals — +1 = perfectly assortative
    (every link stays inside its language), 0 = random mixing, < 0 =
    disassortative. All sums exact integers over the label domain;
    the divisions fold at output. r is NULL for the degenerate
    single-label graph (denominator 0)."""
    # raw count matrix (NOT attribute_mixing_matrix: its share column
    # carries a 1-row total attach, and this plan references the
    # matrix four times — each reference would replan that crossJoin)
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    m = (
        e.join(
            labels.select(
                F.col("id").alias("src"), F.col("label").alias("label_src")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("id").alias("dst"), F.col("label").alias("label_dst")
            ),
            "dst",
        )
        .groupBy("label_src", "label_dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = m.agg(F.sum("c").alias("t"))
    tr = m.filter(F.col("label_src") == F.col("label_dst")).agg(
        F.sum("c").alias("tr")
    )
    a = m.groupBy(F.col("label_src").alias("l")).agg(
        F.sum("c").alias("ra")
    )
    b = m.groupBy(F.col("label_dst").alias("l")).agg(
        F.sum("c").alias("rb")
    )
    ab = (
        a.join(b, "l")
        .agg(F.sum(F.col("ra") * F.col("rb")).alias("sab"))
    )
    joined = (
        tot.crossJoin(F.broadcast(tr)).crossJoin(F.broadcast(ab))
    )
    e_ii = F.coalesce(F.col("tr"), F.lit(0)) / F.col("t")
    sum_ab = F.col("sab") / (F.col("t") * F.col("t"))
    return joined.select(
        F.col("t").alias("n_links"),
        F.when(
            sum_ab < 1.0, (e_ii - sum_ab) / (F.lit(1.0) - sum_ab)
        ).alias("r"),
    )
