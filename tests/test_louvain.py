"""Deterministic Louvain vs an exact pure-Python replica.

The operator defines its semantics in exact 64-bit integer arithmetic
(operators/louvain.py), so the replica matches label-for-label — no
tolerance anywhere."""

import random

from pyspark.sql import functions as F

from dxa_pagerank_spark.operators.graphstats import modularity
from dxa_pagerank_spark.operators.louvain import louvain, louvain_bounded


def _louvain_ref(edge_pairs, max_move_rounds=16, max_levels=10,
                 bounded_rounds=None):
    """Exact replica of operators/louvain.py. With bounded_rounds set,
    runs that many level-0 move rounds and returns (labels, None)."""
    pairs = set()
    for s, d in edge_pairs:
        if s != d:
            pairs.add((s, d))
            pairs.add((d, s))
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0) + 1

    def move_rounds(adj, max_rounds, stop_on_idle=True):
        deg = {
            u: sum(2 * w if v == u else w for v, w in nb.items())
            for u, nb in adj.items()
        }
        m2 = sum(deg.values())
        c = {u: u for u in adj}
        level_moved = 0
        idle = 0
        for r in range(max_rounds):
            tot, csize = {}, {}
            for u in adj:
                tot[c[u]] = tot.get(c[u], 0) + deg[u]
                csize[c[u]] = csize.get(c[u], 0) + 1
            newc = {}
            moved = 0
            for v in adj:
                kin = {}
                for x, w in adj[v].items():
                    if x != v:
                        kin[c[x]] = kin.get(c[x], 0) + w
                kin.setdefault(c[v], 0)
                stay = m2 * kin[c[v]] - deg[v] * (tot[c[v]] - deg[v])
                best = None
                for cand, k in kin.items():
                    if cand == c[v]:
                        continue
                    key = (m2 * k - deg[v] * tot[cand], -cand)
                    if best is None or key > best[0]:
                        best = (key, cand)
                nc = c[v]
                if (
                    v % 2 == r % 2
                    and best is not None
                    and best[0][0] > stay
                    and not (
                        csize[c[v]] == 1
                        and csize[best[1]] == 1
                        and best[1] > c[v]
                    )
                ):
                    nc = best[1]
                newc[v] = nc
                moved += nc != c[v]
            c = newc
            level_moved += moved
            idle = idle + 1 if moved == 0 else 0
            if stop_on_idle and idle >= 2:
                break
        return c, level_moved, m2

    if bounded_rounds is not None:
        c, _, _ = move_rounds(adj, bounded_rounds, stop_on_idle=False)
        return c, None

    global_map = None
    for _ in range(max_levels):
        if not adj:
            break
        c, level_moved, m2 = move_rounds(adj, max_move_rounds)
        if m2 == 0:
            break
        if global_map is None:
            global_map = dict(c)
        else:
            global_map = {i: c[ci] for i, ci in global_map.items()}
        if level_moved == 0:
            break
        newadj = {}

        def add2(u, v, w):
            newadj.setdefault(u, {})
            newadj[u][v] = newadj[u].get(v, 0) + w

        intra, selfw = {}, {}
        for u, nb in adj.items():
            for v, w in nb.items():
                cu, cv = c[u], c[v]
                if u == v:
                    selfw[cu] = selfw.get(cu, 0) + w
                elif cu != cv:
                    add2(cu, cv, w)
                else:
                    intra[cu] = intra.get(cu, 0) + w
        for cid, w in intra.items():
            add2(cid, cid, w // 2)
        for cid, w in selfw.items():
            add2(cid, cid, w)
        adj = newadj
    return (global_map or {}), None


def _two_cliques():
    # two 5-cliques joined by one bridge edge
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))
    return edges


def _random_graph(n=60, m=180, seed=7):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def _spark_labels(df):
    return {r.id: r.community for r in df.collect()}


def test_bounded_matches_replica(spark):
    for edges in (_two_cliques(), _random_graph()):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = _spark_labels(louvain_bounded(spark, df, rounds=2))
        want, _ = _louvain_ref(edges, bounded_rounds=2)
        assert got == want


def test_full_louvain_matches_replica(spark):
    for edges in (_two_cliques(), _random_graph(n=30, m=90, seed=3)):
        df = spark.createDataFrame(edges, "src long, dst long")
        res = louvain(spark, df, max_move_rounds=6, max_levels=4)
        want, _ = _louvain_ref(edges, max_move_rounds=6, max_levels=4)
        assert _spark_labels(res.labels) == want
        assert res.levels >= 1 and res.move_rounds >= 1


def test_recovers_planted_cliques(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    labels = _spark_labels(louvain(spark, df).labels)
    assert len({labels[i] for i in range(5)}) == 1
    assert len({labels[i] for i in range(5, 10)}) == 1
    assert labels[0] != labels[5]
    # and the partition beats the all-singletons baseline on modularity
    lab_df = spark.createDataFrame(
        list(labels.items()), "id long, label long"
    )
    q = modularity(
        df.select("src", "dst"), lab_df
    ).collect()[0].modularity
    assert q > 0.3


def test_empty_and_self_loop_graphs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert louvain(spark, empty).labels.count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert louvain(spark, loops).labels.count() == 0
