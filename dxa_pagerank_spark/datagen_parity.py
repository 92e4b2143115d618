"""Draw-parity synthetic graph generator at benchmark scale.

The reference generator (CreateSyntheticGraphSeed.java:44-147) draws
every slave's vertices from TWO global ``java.util.Random`` streams that
every peer replays in full (the task seeds both streams identically on
each slave and loops over *all* slaves' vertices, keeping only its own).
``datagen.synthetic_edges`` replicates that draw-for-draw in pure Python
but is fixture-scale only (~1e4 vertices). This module produces the
IDENTICAL edge set at 1e7+ vertices in seconds by replaying the same
two streams vectorized:

  * the 48-bit LCG state sequence is generated blockwise in NumPy —
    within a block, state ``s_j = a^j * s_0 + c_j (mod 2^48)`` with the
    ``(a^j, c_j)`` tables built once by doubling, and the 83-bit
    products split into 24-bit limbs so everything stays in uint64;
  * the in-degree stream (seed+1) consumes exactly two raw draws per
    vertex — trivially vectorizable;
  * the endpoint stream (seed) is branchy (locality double, optional
    cross-slave nextInt, in-slave nextInt with Java's rejection loop,
    self-loop redraws, HashSet dedup re-attempts), so positions are
    data-dependent. We compute, for EVERY stream position t, the
    position ``nxt[t]`` where the next edge attempt would start if one
    started at t — a pure function of the raw values (rejection skips
    come from a vectorized reverse running-minimum) — then walk the
    attempt chain with a 32x-strided jump table (nxt applied to itself
    5 times), so the Python-level walk is ~M/32 steps for M attempts;
  * the two vertex-dependent rarities — a local draw hitting the vertex
    itself (redraw, shifts the stream) and a HashSet duplicate (extra
    attempt, shifts the vertex's attempt window) — are handled as exact
    corrections: duplicates by re-deriving the attempt->vertex
    assignment (a cumsum + searchsorted fixpoint, verified to
    convergence), self-loops by scalar-patching the stream position and
    resuming the strided walk. Both are O(events), and events are
    O(M * indeg / n) — a handful at 1e7.

Unequal per-slave vertex counts (``n % n_slaves != 0``) are handled by
a per-slave block pipeline: the in-slave nextInt bound then depends on
the TARGET slave (ceil vs floor of n/S), so value/skip tables are built
once per distinct bound, each slave gets its own jump array selecting
between them, and blocks run sequentially, each resuming at the stream
position the previous block ended — exactly the generator's own
sequential slave loop. Verified draw-parity vs the pure replica
(tests/test_datagen_parity.py, incl. N=100001 S=2).

``synthetic_edges_distributed`` wraps the decoder in ``mapInPandas``
with one task per slave, mirroring the reference's every-peer-replays-
the-whole-stream execution model, each task emitting only its own
block's in-edges.
"""

from __future__ import annotations

import math

import numpy as np

_A = 0x5DEECE66D
_C = 0xB
_M48 = np.uint64((1 << 48) - 1)
_M24 = np.uint64((1 << 24) - 1)
_BLOCK = 1 << 20


def _mulmod48(x: np.ndarray, y: np.ndarray | int) -> np.ndarray:
    """(x * y) mod 2^48 for uint64 inputs < 2^48, via 24-bit limbs
    (the high*high limb product is ≡ 0 mod 2^48)."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    x1, x0 = x >> np.uint64(24), x & _M24
    y1, y0 = y >> np.uint64(24), y & _M24
    mid = (x1 * y0 + x0 * y1) & _M24
    return ((mid << np.uint64(24)) + x0 * y0) & _M48


def _lcg_tables(block: int) -> tuple[np.ndarray, np.ndarray]:
    """(A, C) with A[j] = a^(j+1) mod 2^48 and C[j] such that
    s_{t+j+1} = A[j]*s_t + C[j]: built by doubling
    (c_{m+j} = a^j * c_m + c_j)."""
    A = np.array([_A], dtype=np.uint64)
    C = np.array([_C], dtype=np.uint64)
    while len(A) < block:
        m = len(A)
        a_m, c_m = A[m - 1], C[m - 1]
        A = np.concatenate([A, _mulmod48(A, a_m)])
        C = np.concatenate(
            [C, (_mulmod48(A[:m], c_m) + C[:m]) & _M48]
        )
    return A[:block], C[:block]


_TABLES: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def raw_states(seed: int, count: int, block: int = _BLOCK) -> np.ndarray:
    """First `count` post-advance LCG states of java.util.Random(seed),
    as uint64. state>>17 is next(31); consecutive states make doubles."""
    if block not in _TABLES:
        _TABLES[block] = _lcg_tables(block)
    A, C = _TABLES[block]
    out = np.empty(count, dtype=np.uint64)
    s = np.uint64((seed ^ _A) & int(_M48))
    done = 0
    while done < count:
        take = min(block, count - done)
        chunk = (_mulmod48(A[:take], s) + C[:take]) & _M48
        out[done : done + take] = chunk
        s = chunk[-1]
        done += take
    return out


def _doubles_from_states(hi_states: np.ndarray, lo_states: np.ndarray) -> np.ndarray:
    """nextDouble from its two consecutive raw states:
    ((s1>>22)<<27 | s2>>21) * 2^-53, exact in float64."""
    hi = (hi_states >> np.uint64(22)).astype(np.float64)
    lo = (lo_states >> np.uint64(21)).astype(np.float64)
    return (hi * 134217728.0 + lo) * (2.0 ** -53)


def indegree_stream(n: int, mean_indeg: int, seed: int) -> np.ndarray:
    """Vectorized replica of the per-vertex in-degree draws
    (CreateSyntheticGraphSeed.java:70, getExpRandNumber): one
    nextDouble per vertex from java.util.Random(seed+1), truncated
    exponential, capped at n-1."""
    st = raw_states(seed + 1, 2 * n)
    u = _doubles_from_states(st[0::2], st[1::2])
    inv = math.pow(mean_indeg, -1)
    indeg = (np.log(1.0 - u) / -inv).astype(np.int64)
    return np.minimum(indeg, n - 1)


# ---------------------------------------------------------------------------
# Endpoint stream decode (java.util.Random(seed)) — the branchy one
# ---------------------------------------------------------------------------

class _NeedMoreStream(Exception):
    pass


def _int_decode(i31: np.ndarray, bound: int, T: int):
    """(val, skip) for nextInt(bound) at every stream position: val[t] is
    the value if the draw at t is accepted, skip[t] the position of the
    first non-rejected draw >= t (Java's rejection loop,
    java.util.Random.nextInt). Power-of-two bounds never reject."""
    if bound & (bound - 1) == 0:
        val = ((np.uint64(bound) * (i31.astype(np.uint64))) >> np.uint64(31)).astype(
            np.int32
        )
        return val, None  # skip is identity
    v = i31 % bound
    rej = (i31 - v + (bound - 1)) >= (1 << 31)
    idx = np.arange(T, dtype=np.int64)
    idx[rej] = T  # sentinel: no acceptable draw here
    # reverse running-min; the [::-1] view is copied first so the
    # accumulate runs on contiguous memory (~8x faster than strided)
    rev = np.ascontiguousarray(idx[::-1])
    np.minimum.accumulate(rev, out=rev)
    skip = np.ascontiguousarray(rev[::-1]).astype(np.int32)  # T < 2^31
    return v.astype(np.int32), skip


def _skip_at(skip, pos):
    """Positions of the accepted draw for nextInt starting at pos."""
    return pos if skip is None else skip[pos]


def _decode_endpoint_stream(
    states: np.ndarray, loc: float, S: int, c: int
) -> dict:
    """Per-position decode tables for the endpoint stream (equal
    per-slave vertex counts: the in-slave nextInt bound is the same c
    everywhere, so one table set serves every slave). Returns nxt
    (padded jump array), plus value/skip tables for lazy per-attempt
    gathers."""
    T = len(states)
    i31 = (states >> np.uint64(17)).astype(np.int64)

    if S == 1:
        loc_ok = np.ones(T - 1, dtype=bool)  # randCID forces locality=1
    else:
        d = _doubles_from_states(states[:-1], states[1:])
        loc_ok = d <= loc
        del d

    val_c, skip_c = _int_decode(i31, c, T)
    if S > 1:
        val_s, skip_s = _int_decode(i31, S - 1, T)
    else:
        val_s, skip_s = None, None

    # nxt[t]: start of the next attempt if an attempt starts at t,
    # assuming NO self-loop redraw (vertex-dependent; patched later).
    pos = np.arange(T - 2, dtype=np.int64)
    q0 = pos + 2
    lid_pos_local = np.minimum(_skip_at(skip_c, q0), T)
    if S > 1:
        sp = np.minimum(_skip_at(skip_s, q0), T - 2)
        lid_pos_other = np.minimum(_skip_at(skip_c, sp + 1), T)
        lid_pos = np.where(loc_ok[: T - 2], lid_pos_local, lid_pos_other)
    else:
        lid_pos = lid_pos_local
    nxt = np.minimum(lid_pos + 1, T).astype(np.int32)  # T < 2^31
    # pad with sentinel T -> T so chases stop at stream end
    nxt = np.concatenate([nxt, np.full(3, T, dtype=np.int32)])
    return {
        "T": T,
        "i31": i31,
        "loc_ok": loc_ok,
        "val_c": val_c,
        "skip_c": skip_c,
        "val_s": val_s,
        "skip_s": skip_s,
        "nxt": nxt,
    }


# ---------------------------------------------------------------------------
# Unequal per-slave vertex counts (n % S != 0): the in-slave nextInt
# bound is counts[target_slave] — position-dependent through the target
# slave. Tables are built once per distinct bound (there are exactly
# two: ceil and floor) and a per-slave nxt jump array selects between
# them, so the same chase/speculate/repair machinery runs per slave
# block (the generator consumes the stream slave-by-slave anyway).
# ---------------------------------------------------------------------------

def _shared_decode(states: np.ndarray, loc: float, S: int, counts) -> dict:
    """Bound-keyed value/skip tables shared by every slave's tab."""
    T = len(states)
    i31 = (states >> np.uint64(17)).astype(np.int64)
    if S == 1:
        loc_ok = np.ones(T - 1, dtype=bool)
    else:
        d = _doubles_from_states(states[:-1], states[1:])
        loc_ok = d <= loc
        del d
    val_s, skip_s = (None, None) if S == 1 else _int_decode(i31, S - 1, T)
    by_bound = {b: _int_decode(i31, b, T) for b in sorted(set(counts))}
    return {
        "T": T,
        "i31": i31,
        "loc_ok": loc_ok,
        "val_s": val_s,
        "skip_s": skip_s,
        "by_bound": by_bound,
    }


def _slave_tab(shared: dict, counts, slave: int, S: int) -> dict:
    """Decode tab for one slave: local draws use bound counts[slave];
    cross draws select the target slave's bound per position (the
    target (slave + v1 + 1) % S is a pure function of position for a
    fixed slave). Produces the same tab contract the chase machinery
    consumes, plus an ``xsel`` cross-bound selector."""
    T = shared["T"]
    mod_hi = max(counts)
    val_c, skip_c = shared["by_bound"][counts[slave]]
    val_s, skip_s = shared["val_s"], shared["skip_s"]
    loc_ok = shared["loc_ok"]

    xsel = None
    if S > 1:
        val_hi, skip_hi = shared["by_bound"][mod_hi]
        val_lo, skip_lo = shared["by_bound"][min(counts)]
        # hi_tgt[t]: does the cross draw ACCEPTED at slave-draw position
        # t target a ceil-count slave?
        v1_all = val_s.astype(np.int64)
        tgt = (slave + 1 + v1_all) % S
        hi_tgt = np.asarray(counts)[tgt] == mod_hi
        xsel = {
            "hi_tgt": hi_tgt,
            "val_hi": val_hi,
            "skip_hi": skip_hi,
            "val_lo": val_lo,
            "skip_lo": skip_lo,
        }

    pos = np.arange(T - 2, dtype=np.int64)
    q0 = pos + 2
    lid_pos_local = np.minimum(_skip_at(skip_c, q0), T)
    if S > 1:
        sp = np.minimum(_skip_at(skip_s, q0), T - 2)
        hi = xsel["hi_tgt"][sp]
        lp_hi = np.minimum(_skip_at(xsel["skip_hi"], sp + 1), T)
        lp_lo = np.minimum(_skip_at(xsel["skip_lo"], sp + 1), T)
        lid_pos_other = np.where(hi, lp_hi, lp_lo)
        lid_pos = np.where(loc_ok[: T - 2], lid_pos_local, lid_pos_other)
    else:
        lid_pos = lid_pos_local
    nxt = np.minimum(lid_pos + 1, T).astype(np.int32)
    nxt = np.concatenate([nxt, np.full(3, T, dtype=np.int32)])
    return {
        "T": T,
        "i31": shared["i31"],
        "loc_ok": loc_ok,
        "val_c": val_c,
        "skip_c": skip_c,
        "val_s": val_s,
        "skip_s": skip_s,
        "nxt": nxt,
        "xsel": xsel,
        "slave": slave,
        "S": S,
    }


_CHASE_STRIDE = 32
_STRIDE_CACHE: dict[int, np.ndarray] = {}


def _stride_table(nxt: np.ndarray) -> np.ndarray:
    """nxt self-composed log2(_CHASE_STRIDE) times (one 32-attempt jump
    per lookup), cached per nxt array so repeated chases are O(heads)."""
    key = id(nxt)
    if key not in _STRIDE_CACHE or _STRIDE_CACHE.get("_src") is not nxt:
        J = nxt
        for _ in range(5):
            J = J[J]  # nxt is padded so index T maps to T
        _STRIDE_CACHE.clear()
        _STRIDE_CACHE[key] = J
        _STRIDE_CACHE["_src"] = nxt
    return _STRIDE_CACHE[key]


def _chase(
    nxt: np.ndarray,
    start: int,
    max_attempts: int,
    T: int,
    required: int | None = None,
) -> np.ndarray:
    """Attempt-start positions from `start`, following nxt, up to
    max_attempts or stream end. Python walk is over 32-attempt strides
    (nxt self-composed 5 times); intra-stride positions are recovered
    with 31 vectorized gathers. Raises _NeedMoreStream only when fewer
    than `required` (default: max_attempts) positions fit the stream."""
    if required is None:
        required = max_attempts
    if max_attempts <= 0:
        return np.empty(0, dtype=np.int64)
    if start >= T:
        if required > 0:
            raise _NeedMoreStream
        return np.empty(0, dtype=np.int64)
    J = _stride_table(nxt)
    heads = []
    p = start
    n_heads = (max_attempts + _CHASE_STRIDE - 1) // _CHASE_STRIDE
    for _ in range(n_heads):
        heads.append(p)
        p = int(J[p])
        if p >= T:
            break
    H = np.asarray(heads, dtype=np.int64)
    cols = np.empty((len(H), _CHASE_STRIDE), dtype=np.int64)
    cols[:, 0] = H
    for k in range(1, _CHASE_STRIDE):
        cols[:, k] = nxt[cols[:, k - 1]]
    out = cols.reshape(-1)
    out = out[out < T][:max_attempts]
    if len(out) < required:
        raise _NeedMoreStream
    return out


def _attempt_decode(tab: dict, P: np.ndarray):
    """Vectorized decode of the attempts starting at positions P:
    (is_local, v1, lid, lid_pos). v1 is the cross-slave offset draw
    (0 where local). With an ``xsel`` (unequal per-slave counts) the
    cross local-id draw selects the target slave's bound tables."""
    T = tab["T"]
    xsel = tab.get("xsel")
    if (P + 2 >= T).any():
        raise _NeedMoreStream
    lo = tab["loc_ok"][P]
    q0 = P + 2
    lp_l = _skip_at(tab["skip_c"], q0)
    if tab["val_s"] is not None:
        sp = _skip_at(tab["skip_s"], q0)
        if (np.where(~lo, sp, 0) >= T - 1).any():
            raise _NeedMoreStream
        sp = np.minimum(sp, T - 2)
        v1 = tab["val_s"][sp].astype(np.int64)
        if xsel is None:
            lp_o = _skip_at(tab["skip_c"], sp + 1)
        else:
            hi = xsel["hi_tgt"][sp]
            lp_o = np.where(
                hi,
                _skip_at(xsel["skip_hi"], sp + 1),
                _skip_at(xsel["skip_lo"], sp + 1),
            )
        lid_pos = np.where(lo, lp_l, lp_o)
        v1 = np.where(lo, 0, v1)
    else:
        lid_pos = lp_l
        v1 = np.zeros(len(P), dtype=np.int64)
    if (lid_pos >= T).any():
        raise _NeedMoreStream
    if xsel is None:
        lid = tab["val_c"][lid_pos].astype(np.int64) + 1
    else:
        lid_l = tab["val_c"][lid_pos].astype(np.int64)
        # cross draws re-gather from the target-bound table; `hi`/`sp`
        # exist whenever any cross draw can (S > 1 with unequal counts)
        lid_x = np.where(
            hi, xsel["val_hi"][lid_pos], xsel["val_lo"][lid_pos]
        ).astype(np.int64)
        lid = np.where(lo, lid_l, lid_x) + 1
    return lo, v1, lid, lid_pos


def _patch_self_loop(tab: dict, lid_pos: int, local_id: int) -> tuple[int, int]:
    """Replay Java's self-loop redraw loop (scalar; the event is
    O(attempts/c)-rare): returns (new_lid, end_position) — the attempt's
    consumption now ends at end_position, the next attempt starts
    there."""
    T, val_c, skip_c = tab["T"], tab["val_c"], tab["skip_c"]
    p = lid_pos
    while True:
        if p + 1 >= T:
            raise _NeedMoreStream
        p2 = p + 1 if skip_c is None else int(skip_c[p + 1])
        if p2 >= T:
            raise _NeedMoreStream
        lid = int(val_c[p2]) + 1
        if lid != local_id:
            return lid, p2 + 1
        p = p2


def parity_synthetic_edges(
    n: int,
    locality: float,
    mean_indeg: int,
    seed: int,
    n_slaves: int = 1,
    only_slave: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized draw-parity replica of datagen.synthetic_edges /
    CreateSyntheticGraphSeed.java:44-147. Returns 0-based (src, dst)
    identical to the pure-Python replica (tested), usable at 1e7+.

    only_slave: emit only edges whose dst lives on that slave's block
    (what one reference peer materializes locally).
    """
    S = n_slaves
    indeg = indegree_stream(n, mean_indeg, seed)
    m_accept = int(indeg.sum())

    loc_eff = 1.0 if S == 1 else locality
    per_attempt = 2.0 + 1.01 + (0.0 if S == 1 else (1.0 - loc_eff) * 1.01)
    T = int(m_accept * per_attempt * 1.03) + 4096

    if S > 1 and n % S != 0:
        # unequal per-slave counts: the in-slave nextInt bound depends
        # on the TARGET slave (ceil vs floor), so decode tables are
        # built per distinct bound and each slave block runs with its
        # own jump array, resuming at the stream position the previous
        # block ended (the generator's loop is sequential over slaves).
        from .datagen import _slave_local_vertex_cnts

        counts = _slave_local_vertex_cnts(n, S)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int64
        )
        for _ in range(8):
            try:
                states = raw_states(seed, T)
                shared = _shared_decode(states, locality, S, counts)
                srcs, dsts = [], []
                p = 0
                for i in range(S):
                    tab_i = _slave_tab(shared, counts, i, S)
                    blk = indeg[offsets[i] : offsets[i] + counts[i]]
                    s_i, d_i, p = _assign_block(
                        tab_i, blk, S, counts, offsets, i, p
                    )
                    if only_slave is None or i == only_slave:
                        srcs.append(s_i)
                        dsts.append(d_i)
                return (
                    np.concatenate(srcs) if srcs else np.empty(0, np.int64),
                    np.concatenate(dsts) if dsts else np.empty(0, np.int64),
                )
            except _NeedMoreStream:
                T = int(T * 1.4) + 4096
        raise RuntimeError(
            "parity generator: stream estimate kept overflowing"
        )

    c = n // S
    for _ in range(8):  # stream-length retry loop
        try:
            states = raw_states(seed, T)
            tab = _decode_endpoint_stream(states, locality, S, c)
            return _assign_and_emit(tab, indeg, S, c, only_slave)
        except _NeedMoreStream:
            T = int(T * 1.4) + 4096
    raise RuntimeError("parity generator: stream estimate kept overflowing")


def synthetic_edges_distributed(
    spark,
    n: int,
    locality: float,
    mean_indeg: int,
    seed: int,
    n_slaves: int = 1,
):
    """Reference-execution-model distributed generation: one Spark task
    per slave, each replaying the FULL global streams (exactly what
    every DXRAM peer does, CreateSyntheticGraphSeed.java:67-107) and
    emitting only the in-edges of its own vertex block. Returns an
    edges(src, dst) DataFrame with reference draw-parity."""
    import pandas as pd
    from pyspark.sql import functions as F

    S = n_slaves
    captured = (n, locality, mean_indeg, seed, S)

    def gen(it):
        for pdf in it:
            for slave in pdf["id"].tolist():
                nn, loc, mi, sd, ss = captured
                src, dst = parity_synthetic_edges(
                    nn, loc, mi, sd, n_slaves=ss, only_slave=int(slave)
                )
                yield pd.DataFrame({"src": src, "dst": dst})

    return (
        spark.range(0, S, 1, S)
        .mapInPandas(gen, schema="src long, dst long")
        .select(F.col("src"), F.col("dst"))
    )


def _assign_and_emit(
    tab: dict, indeg: np.ndarray, S: int, c: int, only_slave: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Speculate (no dups, no self-loops), then repair by processing
    exactly ONE event per iteration — always the EARLIEST unprocessed
    one. A self-loop shifts stream positions after itself; a duplicate
    shifts attempt->vertex assignment after itself; neither can
    invalidate anything before itself, so by induction the decode and
    assignment are exact up to the first unprocessed event, which makes
    that event itself exactly identified. Iterations are O(events) =
    O(M * indeg / n); event scans run in windows from the last
    confirmed event so each iteration is far below O(M)."""
    import pandas as pd

    T = tab["T"]
    n = len(indeg)
    # confirmed events, keyed by (stable) stream position of the attempt
    dup_pos: dict[int, int] = {}  # attempt start pos -> vertex charged
    patched: dict[int, tuple[int, int]] = {}  # pos -> (redrawn lid, end)
    scan_v = 0  # vertices below this are fully resolved (exact)
    indeg = indeg.astype(np.int64)

    # decode cache, aligned with P: recomputed only for re-chased
    # suffixes (self-loop patches) and extensions, never wholesale
    P = _chase(tab["nxt"], 0, int(indeg.sum()), T)
    lo, v1, lid, _lp = _attempt_decode(tab, P)

    def decode_seg(P2: np.ndarray):
        l2, w2, d2, _ = _attempt_decode(tab, P2)
        for i, pos in enumerate(P2.tolist()):
            if pos in patched:
                d2[i] = patched[pos][0]
        return l2, w2, d2

    def extend_to(M: int) -> None:
        # extend with slack (and keep any over-chased tail) so the
        # one-attempt growth of each duplicate event never re-copies
        # the whole cache
        nonlocal P, lo, v1, lid
        while len(P) < M:
            last = int(P[-1])
            nol = patched.get(last, (0, int(tab["nxt"][last])))[1]
            want = (M - len(P)) + 4096
            P2 = _chase(tab["nxt"], nol, want, T, required=M - len(P))
            l2, w2, d2 = decode_seg(P2)
            P = np.concatenate([P, P2])
            lo = np.concatenate([lo, l2])
            v1 = np.concatenate([v1, w2])
            lid = np.concatenate([lid, d2])

    for _ in range(n + 2):  # one event VERTEX resolved per iteration
        need = indeg + np.bincount(
            np.fromiter(dup_pos.values(), dtype=np.int64, count=len(dup_pos)),
            minlength=n,
        )
        M = int(need.sum())
        extend_to(M)
        bnd = np.cumsum(need)

        a = _earliest_event(bnd, lo, v1, lid, S, c, scan_v, M, pd)
        if a is None:
            v = np.repeat(np.arange(n, dtype=np.int64), need)
            i_v = v // c
            idx_t = np.where(lo[:M], i_v, (i_v + v1[:M] + 1) % S)
            acc = ~np.isin(
                P[:M],
                np.fromiter(dup_pos, dtype=np.int64, count=len(dup_pos)),
            ) if dup_pos else np.ones(M, dtype=bool)
            src = idx_t[acc] * c + (lid[:M][acc] - 1)
            dst = v[acc]
            if only_slave is not None:
                m = i_v[acc] == only_slave
                return src[m], dst[m]
            return src, dst
        # resolve the whole event vertex by exact scalar replay (attempts
        # per vertex are few), then resume vectorized scanning after it
        w = int(np.searchsorted(bnd, a, side="right"))
        a0w = int(bnd[w - 1]) if w else 0
        n_patch = len(patched)
        starts, _pend = _resolve_vertex(
            tab, w, int(P[a0w]), int(indeg[w]), S, c, dup_pos, patched
        )
        if len(patched) > n_patch:
            # a self-loop redraw shifted the stream: positions (and the
            # decode cache) after this vertex are stale — truncate and
            # let extend_to re-chase/re-decode the suffix lazily
            seg = np.asarray(starts, dtype=np.int64)
            l2, w2, d2 = decode_seg(seg)
            P = np.concatenate([P[:a0w], seg])
            lo = np.concatenate([lo[:a0w], l2])
            v1 = np.concatenate([v1[:a0w], w2])
            lid = np.concatenate([lid[:a0w], d2])
        # duplicates don't move stream positions: P and the decode cache
        # stay valid, only `need` (recomputed at loop top) changes
        scan_v = w + 1
    raise RuntimeError("parity generator: did not converge")


def _assign_block(
    tab: dict,
    indeg: np.ndarray,
    S: int,
    counts,
    offsets: np.ndarray,
    slave: int,
    p_start: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-slave-block variant of _assign_and_emit (unequal per-slave
    counts): same speculate-then-repair loop over ONE slave's vertex
    block, starting at stream position p_start, with global ids mapped
    through ``offsets``. Returns (src, dst, stream position after the
    block) so the next slave's block resumes exactly where the
    generator's sequential loop would."""
    import pandas as pd

    T = tab["T"]
    n = len(indeg)
    maxc = max(counts)
    dup_pos: dict[int, int] = {}
    patched: dict[int, tuple[int, int]] = {}
    scan_v = 0
    indeg = indeg.astype(np.int64)
    off = np.asarray(offsets, dtype=np.int64)

    if n == 0 or int(indeg.sum()) == 0:
        # a block can still CONSUME stream (zero-indeg vertices draw
        # nothing), so p_end == p_start exactly
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            p_start,
        )

    P = _chase(tab["nxt"], p_start, int(indeg.sum()), T)
    lo, v1, lid, _lp = _attempt_decode(tab, P)

    def decode_seg(P2: np.ndarray):
        l2, w2, d2, _ = _attempt_decode(tab, P2)
        for i, pos in enumerate(P2.tolist()):
            if pos in patched:
                d2[i] = patched[pos][0]
        return l2, w2, d2

    def extend_to(M: int) -> None:
        nonlocal P, lo, v1, lid
        while len(P) < M:
            last = int(P[-1])
            nol = patched.get(last, (0, int(tab["nxt"][last])))[1]
            want = (M - len(P)) + 4096
            P2 = _chase(tab["nxt"], nol, want, T, required=M - len(P))
            l2, w2, d2 = decode_seg(P2)
            P = np.concatenate([P, P2])
            lo = np.concatenate([lo, l2])
            v1 = np.concatenate([v1, w2])
            lid = np.concatenate([lid, d2])

    for _ in range(n + 2):
        need = indeg + np.bincount(
            np.fromiter(dup_pos.values(), dtype=np.int64, count=len(dup_pos)),
            minlength=n,
        )
        M = int(need.sum())
        extend_to(M)
        bnd = np.cumsum(need)

        a = _earliest_event(
            bnd, lo, v1, lid, S, maxc, scan_v, M, pd, slave=slave
        )
        if a is None:
            v = np.repeat(np.arange(n, dtype=np.int64), need)
            idx_t = np.where(
                lo[:M], slave, (slave + v1[:M] + 1) % S
            ).astype(np.int64)
            acc = ~np.isin(
                P[:M],
                np.fromiter(dup_pos, dtype=np.int64, count=len(dup_pos)),
            ) if dup_pos else np.ones(M, dtype=bool)
            src = off[idx_t[acc]] + (lid[:M][acc] - 1)
            dst = off[slave] + v[acc]
            last = int(P[M - 1])
            p_end = patched.get(last, (0, int(tab["nxt"][last])))[1]
            return src, dst, p_end
        w = int(np.searchsorted(bnd, a, side="right"))
        a0w = int(bnd[w - 1]) if w else 0
        n_patch = len(patched)
        starts, _pend = _resolve_vertex(
            tab, w, int(P[a0w]), int(indeg[w]), S, maxc, dup_pos, patched,
            i_w=slave, local_id_w=w + 1,
        )
        if len(patched) > n_patch:
            seg = np.asarray(starts, dtype=np.int64)
            l2, w2, d2 = decode_seg(seg)
            P = np.concatenate([P[:a0w], seg])
            lo = np.concatenate([lo[:a0w], l2])
            v1 = np.concatenate([v1[:a0w], w2])
            lid = np.concatenate([lid[:a0w], d2])
        scan_v = w + 1
    raise RuntimeError("parity generator: block did not converge")


_SCAN_WINDOW = 1 << 20


def _earliest_event(bnd, lo, v1, lid, S, c, scan_v, M, pd, slave=None):
    """First (dup | self-loop) attempt index in vertices >= scan_v,
    scanning in vertex-aligned windows. Vertices below scan_v are fully
    resolved, so decode+assignment are exact up to the returned event —
    which makes the event itself exactly identified. The attempt->vertex
    map is derived per window (searchsorted), never materialized at M.
    With ``slave`` set (per-slave block run, unequal counts) vertices
    are block-local: i_v = slave, local id = vertex index + 1, and c is
    the max per-slave count (key-packing radix only)."""
    a0 = int(bnd[scan_v - 1]) if scan_v else 0
    while a0 < M:
        hi = min(M, a0 + _SCAN_WINDOW)
        if hi < M:
            # extend to the end of the vertex containing attempt hi-1
            w_hi = int(np.searchsorted(bnd, hi - 1, side="right"))
            hi = int(bnd[w_hi])
        s = slice(a0, hi)
        vs = np.searchsorted(
            bnd, np.arange(a0, hi, dtype=np.int64), side="right"
        )
        if slave is None:
            i_v = vs // c
            local_id = vs % c + 1
        else:
            i_v = np.full(len(vs), slave, dtype=np.int64)
            local_id = vs + 1
        idx_t = np.where(lo[s], i_v, (i_v + v1[s] + 1) % S)
        vk = (
            vs * np.int64(S * (c + 1) + 1)
            + idx_t * np.int64(c + 1)
            + lid[s]
        )
        dup_w = pd.Series(vk).duplicated().to_numpy()
        sl_w = lo[s] & (lid[s] == local_id)
        ev = dup_w | sl_w
        if ev.any():
            return a0 + int(np.argmax(ev))
        a0 = hi
    return None


def _scalar_attempt(tab, p: int, local_id_w: int, i_w: int, S: int):
    """Exact scalar decode of ONE randCID call starting at stream
    position p for the vertex (slave i_w, 1-based local id local_id_w):
    returns (slave_index, lid, end_position, had_self_loop_redraw).
    Mirrors CreateSyntheticGraphSeed.randCID draw-for-draw."""
    T = tab["T"]
    if p + 2 >= T:
        raise _NeedMoreStream
    lo = bool(tab["loc_ok"][p])
    q0 = p + 2
    if lo:
        lp = q0 if tab["skip_c"] is None else int(tab["skip_c"][q0])
        if lp >= T:
            raise _NeedMoreStream
        lid = int(tab["val_c"][lp]) + 1
        redrawn = False
        while lid == local_id_w:  # self-loop: redraw until different
            redrawn = True
            if lp + 1 >= T:
                raise _NeedMoreStream
            lp = lp + 1 if tab["skip_c"] is None else int(tab["skip_c"][lp + 1])
            if lp >= T:
                raise _NeedMoreStream
            lid = int(tab["val_c"][lp]) + 1
        return i_w, lid, lp + 1, redrawn
    sp = q0 if tab["skip_s"] is None else int(tab["skip_s"][q0])
    if sp >= T - 1:
        raise _NeedMoreStream
    v1 = int(tab["val_s"][sp])
    xsel = tab.get("xsel")
    if xsel is None:
        val_cx, skip_cx = tab["val_c"], tab["skip_c"]
    else:  # unequal counts: the cross draw uses the TARGET's bound
        if bool(xsel["hi_tgt"][sp]):
            val_cx, skip_cx = xsel["val_hi"], xsel["skip_hi"]
        else:
            val_cx, skip_cx = xsel["val_lo"], xsel["skip_lo"]
    lp = sp + 1 if skip_cx is None else int(skip_cx[sp + 1])
    if lp >= T:
        raise _NeedMoreStream
    lid = int(val_cx[lp]) + 1
    return (i_w + v1 + 1) % S, lid, lp + 1, False


def _resolve_vertex(
    tab, w: int, p_start: int, indeg_w: int, S: int, c: int,
    dup_pos: dict, patched: dict,
    i_w: int | None = None, local_id_w: int | None = None,
) -> tuple[list[int], int]:
    """Exact sequential replay of ALL of vertex w's draws (the Java
    HashSet loop, CreateSyntheticGraphSeed.java:85-105), recording its
    duplicate attempts and self-loop patches. Returns (attempt start
    positions, stream position after the vertex). i_w/local_id_w
    override the equal-count derivation for per-slave block runs."""
    if i_w is None:
        i_w, local_id_w = w // c, w % c + 1
    seen: set[tuple[int, int]] = set()
    k = 0
    p = p_start
    starts: list[int] = []
    while k < indeg_w:
        starts.append(p)
        idx, lid, pend, redrawn = _scalar_attempt(tab, p, local_id_w, i_w, S)
        if redrawn:
            patched[p] = (lid, pend)
        cid = (idx, lid)
        if cid in seen:
            dup_pos[p] = w
        else:
            seen.add(cid)
            k += 1
        p = pend
    return starts, p
