"""Dense NumPy / pure-Python oracles — the executable spec for every
graph algorithm the engine implements.

The PageRank oracle replicates the reference's exact semantics
(SURVEY.md §2.3; /root/reference RunLumpPrRoundTask.java:71-116,
MainPR.java:137-197, Vertex.java:65-67, MetaChunk.java:17-22):

  * init: every vertex starts at 1/N (Vertex.java:25-30);
  * only non-dangling vertices (out_deg != 0) are updated each round
    (RunLumpPrRoundTask.java:73); dangling vertices keep 1/N until one
    final restore pass (MainPR.java:185-197);
  * PR'(v) = (1-d)/N + d*sum_{u in in(v)} PR(u)/outdeg(u)
           + d*danglingPR/N (Vertex.java:66);
  * round 1 uses danglingPR = 1/N regardless of the true dangling count
    (ingest-time MetaChunk init, MetaChunk.java:20 read at
    RunLumpPrRoundTask.java:69);
  * thereafter danglingPR = 1 - sum of updated (non-dangling) ranks
    (MainPR.java:156-161) — mass inferred by conservation;
  * the L1 stopping error sums only over non-dangling vertices
    (RunLumpPrRoundTask.java:107-108); stop when err <= threshold;
  * edge multiplicity counts (file-ingest semantics,
    ReadLumpInEdgeListTask.java:69-71, 102-107): duplicate edges both
    increment out-degree and contribute twice to the gather.

Oracles are deliberately simple, dense and single-machine; the engine
must match them (allclose 1e-6 for ranks; exact for labels/components).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PageRankTrace:
    """Per-round trajectory + final state of the oracle run."""

    ranks: np.ndarray  # final per-vertex ranks (after dangling restore)
    rounds: int
    errors: list[float] = field(default_factory=list)  # per-round L1 (non-dangling)
    dangling_mass: list[float] = field(default_factory=list)  # mass AFTER each round
    converged: bool = False


def pagerank_oracle(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    threshold: float = 1e-3,
    max_rounds: int = 50,
) -> PageRankTrace:
    """Reference-trajectory-exact PageRank. src/dst are 0-based int arrays
    (duplicates allowed and meaningful)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    nd = out_deg > 0  # non-dangling mask (the updated set)

    pr = np.full(n, 1.0 / n)
    dangling = 1.0 / n  # round-1 quirk: ingest-time MetaChunk PRsum = 1/N
    trace = PageRankTrace(ranks=pr, rounds=0)

    def gather(ranks: np.ndarray) -> np.ndarray:
        contrib = np.zeros(n)
        np.add.at(contrib, dst, ranks[src] / out_deg[src])
        return contrib

    for _ in range(max_rounds):
        contrib = gather(pr)
        new_pr = pr.copy()
        new_pr[nd] = (
            (1 - damping) / n + damping * contrib[nd] + damping * dangling / n
        )
        err = float(np.abs(new_pr[nd] - pr[nd]).sum())
        dangling = 1.0 - float(new_pr[nd].sum())
        pr = new_pr
        trace.rounds += 1
        trace.errors.append(err)
        trace.dangling_mass.append(dangling)
        if err <= threshold:
            trace.converged = True
            break

    # Final restore pass: compute dangling vertices once from converged
    # neighbor ranks, using the dangling mass from the last round.
    contrib = gather(pr)
    pr = pr.copy()
    pr[~nd] = (
        (1 - damping) / n + damping * contrib[~nd] + damping * dangling / n
    )
    trace.ranks = pr
    return trace


def connected_components_oracle(n: int, src, dst) -> np.ndarray:
    """Undirected connected components; component id = min vertex id in
    the component. Union-find. [north_rule — no reference code]"""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    # min-label: relabel each root to the min vertex id in its component
    comp_min: dict[int, int] = {}
    for v, r in enumerate(roots):
        comp_min[int(r)] = min(comp_min.get(int(r), v), v)
    return np.fromiter((comp_min[int(r)] for r in roots), dtype=np.int64, count=n)


def label_propagation_oracle(
    n: int, src, dst, max_rounds: int = 20
) -> np.ndarray:
    """Synchronous LPA over the undirected graph, deterministic
    tie-break: adopt the most frequent neighbor label; ties -> smallest
    label; vertices with no neighbors keep their own label. A vertex's
    own current label is NOT counted. Stops at fixpoint or max_rounds.
    [north_rule — no reference code; tie-break fixed for reproducibility]
    """
    adj: dict[int, list[int]] = defaultdict(list)
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj[a].append(b)
        adj[b].append(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        new = labels.copy()
        for v in range(n):
            neigh = adj.get(v)
            if not neigh:
                continue
            counts = Counter(int(labels[u]) for u in neigh)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangle_count_oracle(n: int, src, dst) -> int:
    """Global triangle count of the undirected simple graph (dedupe
    parallel edges, drop self-loops). [north_rule — no reference code]"""
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    count = 0
    for v, vn in nbrs.items():
        for u in vn:
            if u > v:
                count += sum(1 for w in (vn & nbrs[u]) if w > u)
    return count
