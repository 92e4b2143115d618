"""Per-round serial-vs-parallel breakdown of the CSR PageRank superstep.

Times each driver-side phase of one superstep at a given core count:
  broadcast   — pickle + torrent-publish of the dense rank vector
  map+collect — the mapInArrow gather job incl. Arrow collect
  assemble    — driver scatter of per-partition (ids, contribs)
  update      — rank formula + L1 + dangling bookkeeping (NumPy)

Usage: python scripts/profile_csr_round.py [cores] [n_rounds]
Reads the cached bench edge table (/tmp/dxa_bench_edges_n10000000).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
N = 10_000_000
CACHE = f"/tmp/dxa_bench_edges_n{N}"


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from dxa_pagerank_spark.session import get_spark

    spark = get_spark(app_name="csr_prof", cores=CORES, shuffle_partitions=CORES)
    sc = spark.sparkContext
    edges = spark.read.parquet(CACHE)

    adj = (
        edges.select(F.col("src").cast("int"), F.col("dst").cast("int"))
        .repartition(CORES, "dst")
        .sortWithinPartitions("dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t0 = time.monotonic()
    ne = adj.count()
    print(f"build {time.monotonic() - t0:.1f}s edges={ne}", flush=True)

    deg_pdf = adj.groupBy("src").agg(F.count(F.lit(1)).alias("c")).toPandas()
    inv_deg = np.zeros(N)
    nz = deg_pdf["src"].to_numpy()
    inv_deg[nz] = 1.0 / deg_pdf["c"].to_numpy()
    bci = sc.broadcast(inv_deg)

    ranks = np.full(N, 1.0 / N)
    for r in range(ROUNDS):
        t0 = time.monotonic()
        bc = sc.broadcast(ranks)
        t_bc = time.monotonic() - t0

        def gather(it, bc=bc):
            rv = bc.value
            iv = bci.value
            ids, sums = [], []
            for rb in it:
                srcs = rb.column(0).to_numpy(zero_copy_only=True)
                dsts = rb.column(1).to_numpy(zero_copy_only=True)
                vals = rv[srcs] * iv[srcs]
                starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
                ids.append(dsts[starts].astype(np.int64, copy=False))
                sums.append(np.add.reduceat(vals, starts))
            uq = np.concatenate(ids) if ids else np.empty(0, dtype=np.int64)
            sm = np.concatenate(sums) if sums else np.empty(0)
            if len(ids) > 1:
                starts = np.flatnonzero(np.r_[True, uq[1:] != uq[:-1]])
                uq = uq[starts]
                sm = np.add.reduceat(sm, starts)
            yield pa.RecordBatch.from_pydict(
                {"ids": [uq.tobytes()], "contribs": [sm.tobytes()]}
            )

        t0 = time.monotonic()
        parts = adj.mapInArrow(
            gather, schema="ids binary, contribs binary"
        ).toPandas()
        t_map = time.monotonic() - t0

        t0 = time.monotonic()
        contrib = np.zeros(N)
        for ids_b, sums_b in zip(parts["ids"], parts["contribs"]):
            contrib[np.frombuffer(ids_b, dtype=np.int64)] = np.frombuffer(
                sums_b, dtype=np.float64
            )
        t_asm = time.monotonic() - t0

        t0 = time.monotonic()
        nd = inv_deg > 0
        new = ranks.copy()
        new[nd] = 0.15 / N + 0.85 * contrib[nd] + 0.85 * (1.0 / N) / N
        err = float(np.abs(new[nd] - ranks[nd]).sum())
        ranks = new
        t_upd = time.monotonic() - t0
        bc.destroy()
        total = t_bc + t_map + t_asm + t_upd
        print(
            f"round {r}: total={total:.2f}s bc={t_bc:.2f} map={t_map:.2f} "
            f"assemble={t_asm:.2f} update={t_upd:.2f} (err={err:.2e})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
