"""Spark-free experiment: per-round cost of the shm CSR kernel at P
workers, isolating mmap/page-fault contention from Spark scheduling.

Builds per-partition CSR blocks from the cached bench edge table, forks
P processes, and times rounds under two write strategies:
  scatter — np.memmap r+ on the shared 80MB out file, random writes
  pwrite  — dense per-bucket slice assembled privately, one os.pwrite

Usage: python scripts/shm_kernel_experiment.py P [rounds] [strategy]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow.parquet as pq

N = 10_000_000
CACHE = f"/tmp/dxa_bench_edges_n{N}"


def build_blocks(workdir: str, P: int, mode: str) -> np.ndarray:
    t = pq.read_table(CACHE)
    src = t.column("src").to_numpy().astype(np.int32)
    dst = t.column("dst").to_numpy().astype(np.int32)
    if mode == "hash":
        part = (dst.astype(np.int64) * 2654435761 % 2**32 % P).astype(np.int32)
    else:  # range buckets
        part = (dst.astype(np.int64) * P // N).astype(np.int32)
    order = np.lexsort((dst, part))
    src, dst, part = src[order], dst[order], part[order]
    bounds = np.searchsorted(part, np.arange(P + 1))
    out_deg = np.bincount(src, minlength=N).astype(np.float64)
    invd = np.zeros(N)
    invd[out_deg > 0] = 1.0 / out_deg[out_deg > 0]
    np.save(f"{workdir}/invd.npy", invd)
    for p in range(P):
        s, e = bounds[p], bounds[p + 1]
        d = dst[s:e]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        np.save(f"{workdir}/blk_{p}_uq.npy", d[starts])
        np.save(f"{workdir}/blk_{p}_starts.npy", starts.astype(np.int64))
        np.save(f"{workdir}/blk_{p}_src.npy", src[s:e])
        np.save(f"{workdir}/blk_{p}_w.npy", invd[src[s:e]])
    return invd


def worker(workdir, pid, P, rounds, strategy, barrier, times):
    uq = np.asarray(np.load(f"{workdir}/blk_{pid}_uq.npy"))
    starts = np.load(f"{workdir}/blk_{pid}_starts.npy", mmap_mode="r")
    srcs = np.load(f"{workdir}/blk_{pid}_src.npy", mmap_mode="r")
    w = np.load(f"{workdir}/blk_{pid}_w.npy", mmap_mode="r")
    invd = np.load(f"{workdir}/invd.npy", mmap_mode="r")
    iv_uq = invd[uq]
    sel = iv_uq > 0.0
    ids = uq[sel]
    lo, hi = (pid * N) // P, ((pid + 1) * N) // P  # range mode only
    for r in range(rounds):
        barrier.wait()
        t0 = time.monotonic()
        in_path = f"{workdir}/ranks_{r % 2}.npy"
        out_path = f"{workdir}/ranks_{(r + 1) % 2}.npy"
        ranks_v = np.load(in_path, mmap_mode="r")
        vals = ranks_v[srcs] * w
        contrib = np.add.reduceat(vals, starts)
        new_vals = 0.15e-7 + 0.85 * contrib[sel] + 1e-9
        t1 = time.monotonic()
        if strategy == "scatter":
            out = np.lib.format.open_memmap(out_path, mode="r+")
            out[ids] = new_vals
            out.flush()
        else:  # pwrite: dense slice for [lo, hi)
            dense = np.empty(hi - lo)
            dense[:] = 0.15e-7
            nd_r = invd[lo:hi] > 0
            old = np.asarray(ranks_v[lo:hi])
            dense[~nd_r] = old[~nd_r]
            dense[ids - lo] = new_vals
            with open(out_path, "r+b") as f:
                f.seek(128 + lo * 8)
                f.write(dense.tobytes())
        t2 = time.monotonic()
        err = float(np.abs(new_vals - ranks_v[ids]).sum())
        t3 = time.monotonic()
        times.put((pid, r, t1 - t0, t2 - t1, t3 - t2, err))


def main():
    P = int(sys.argv[1])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    strategy = sys.argv[3] if len(sys.argv) > 3 else "scatter"
    mode = "hash" if strategy == "scatter" else "range"
    workdir = tempfile.mkdtemp(prefix="dxa_exp_", dir="/dev/shm")
    try:
        print(f"building blocks (mode={mode})...", flush=True)
        build_blocks(workdir, P, mode)
        for i in range(2):
            mm = np.lib.format.open_memmap(
                f"{workdir}/ranks_{i}.npy", mode="w+", dtype=np.float64,
                shape=(N,),
            )
            mm[:] = 1.0 / N
            del mm
        barrier = mp.Barrier(P + 1)
        times = mp.Queue()
        procs = [
            mp.Process(
                target=worker,
                args=(workdir, p, P, rounds, strategy, barrier, times),
            )
            for p in range(P)
        ]
        for pr in procs:
            pr.start()
        for r in range(rounds):
            t0 = time.monotonic()
            barrier.wait()
            rows = [times.get() for _ in range(P)]
            wall = time.monotonic() - t0
            g = max(x[2] for x in rows)
            wr = max(x[3] for x in rows)
            er = max(x[4] for x in rows)
            print(
                f"round {r}: wall={wall:.3f}s gather(max)={g:.3f} "
                f"write(max)={wr:.3f} err(max)={er:.3f}", flush=True,
            )
        for pr in procs:
            pr.join()
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
