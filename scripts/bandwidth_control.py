"""Hardware-ceiling control for the 8 -> 32 scaling criterion.

Runs the EXACT per-partition CSR gather kernel from
operators/pagerank_csr.py (``np.add.reduceat(ranks[srcs] * w, starts)``
against a shared read-only tmpfs rank vector) in K independent OS
processes with a per-round barrier — i.e. the same arithmetic, memory
traffic and BSP shape as the Spark shm loop, but with ZERO Spark, JVM,
Python-worker or scheduler involvement. Total work is fixed (E edges
per round split evenly across the K workers), exactly like running the
same input at local[K].

Purpose (BENCH.md): if this no-framework kernel shows the same
aggregate-throughput ceiling going 8 -> 32 workers as the Spark loop
does, the measured sub-0.8 scaling efficiency is a property of this
single-socket box (one shared memory controller feeding a DRAM-random
gather), not of the dataflow — the dataflow's efficiency RELATIVE to
the hardware ceiling is what a multi-node N -> 4N comparison would
exercise.

Usage: python scripts/bandwidth_control.py [--n 100000000]
           [--edges 550000000] [--rounds 8] [--workers 8,32]
Prints one JSON line per worker-count plus an efficiency summary.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import tempfile
import time

import numpy as np

_SHM = "/dev/shm"


def _worker(
    wid: int,
    k: int,
    n: int,
    edges_per_worker: int,
    rounds: int,
    ranks_path: str,
    barrier,
    out_q,
) -> None:
    rng = np.random.default_rng(1234 + wid)
    # src draw replays the bench graph's locality law (2 slave blocks,
    # locality 0.8): 80% of reads land in one contiguous n/2 block, 20%
    # anywhere — the uniform-random variant overstates DRAM-latency cost
    # vs the real edge set and made per-core comparisons misleading.
    half = n // 2
    block_lo = half * (wid % 2)
    local = rng.random(edges_per_worker) < 0.8
    srcs = rng.integers(0, n, size=edges_per_worker, dtype=np.int64)
    srcs[local] = block_lo + (srcs[local] % half)
    # dst-sorted partition shape: fixed-width segments at the bench
    # graph's mean in-degree (~6 edges/dst) — reduceat cost is driven by
    # segment count, not placement, so strided starts are equivalent
    starts = np.arange(0, edges_per_worker, 6, dtype=np.int64)
    w = rng.random(edges_per_worker)
    ranks = np.load(ranks_path, mmap_mode="r")
    # preallocated round buffers: the measurement targets the memory
    # system, not glibc's large-allocation churn
    gath = np.empty(edges_per_worker)
    round_s = []
    # warm-up outside the timed loop: fault in every page this worker's
    # gather touches (the Spark loop's discarded first rounds do this)
    np.take(ranks, srcs, out=gath)
    barrier.wait()
    for _ in range(rounds):
        t0 = time.monotonic()
        np.take(ranks, srcs, out=gath)
        gath *= w
        contrib = np.add.reduceat(gath, starts)
        s = float(contrib.sum())  # keep the result live
        barrier.wait()
        round_s.append(time.monotonic() - t0)
    out_q.put((wid, s, round_s))


def run_config(k: int, n: int, edges: int, rounds: int, ranks_path: str):
    epw = edges // k
    barrier = mp.Barrier(k)
    out_q = mp.Queue()
    procs = [
        mp.Process(
            target=_worker,
            args=(i, k, n, epw, rounds, ranks_path, barrier, out_q),
        )
        for i in range(k)
    ]
    for p in procs:
        p.start()
    results = [out_q.get() for _ in range(k)]
    for p in procs:
        p.join()
    # per-round wall = slowest worker that round (BSP barrier semantics)
    per_round = [
        max(results[w][2][r] for w in range(k)) for r in range(rounds)
    ]
    steady = per_round[2:] if rounds > 4 else per_round
    med = statistics.median(steady)
    mn = min(steady)
    return {
        "workers": k,
        "edges": epw * k,
        "rounds": rounds,
        "round_s": [round(x, 3) for x in per_round],
        "sec_per_round_median": round(med, 3),
        "sec_per_round_min": round(mn, 3),
        "edges_per_sec_median": int(epw * k / med),
        "edges_per_sec_min": int(epw * k / mn),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--edges", type=int, default=550_000_000)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--workers", default="8,32")
    args = ap.parse_args()

    fd, ranks_path = tempfile.mkstemp(suffix=".npy", dir=_SHM)
    os.close(fd)
    try:
        mm = np.lib.format.open_memmap(
            ranks_path, mode="w+", dtype=np.float64, shape=(args.n,)
        )
        mm[:] = 1.0 / args.n
        mm.flush()
        del mm
        rows = []
        for k in [int(x) for x in args.workers.split(",")]:
            row = run_config(k, args.n, args.edges, args.rounds, ranks_path)
            rows.append(row)
            print(json.dumps(row), flush=True)
        if len(rows) >= 2:
            for a, b in zip(rows, rows[1:]):
                ratio = b["workers"] / a["workers"]
                for est in ("median", "min"):
                    eff = (
                        b[f"edges_per_sec_{est}"]
                        / a[f"edges_per_sec_{est}"]
                        / ratio
                    )
                    print(
                        json.dumps(
                            {
                                "pair": f"{a['workers']}->{b['workers']}",
                                "estimator": est,
                                "hw_ceiling_efficiency": round(eff, 3),
                            }
                        ),
                        flush=True,
                    )
    finally:
        os.unlink(ranks_path)


if __name__ == "__main__":
    main()
