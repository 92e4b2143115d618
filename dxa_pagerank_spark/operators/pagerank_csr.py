"""CSR-in-Arrow PageRank hot loop (north_star vectorized variant).

Same reference-exact semantics as operators.pagerank (round-1 quirk,
frozen dangling, non-dangling L1, restore pass — SURVEY.md §2.3), but
the gather is a NumPy segment-sum over per-partition CSR blocks instead
of a join+hash-agg. Two exchange modes for the per-superstep rank
vector:

``exchange="shm"`` (default on local masters — the single-box
accelerator path):
  * ONE Spark pass builds the CSR blocks: the edge table is
    hash-partitioned by ``dst``, sorted within partitions, and each
    partition task writes its (dst_ids, segment_starts, srcs) arrays
    to ``/dev/shm`` — after that the static adjacency never crosses
    the JVM→Python boundary again;
  * the WHOLE iteration is ONE barrier-mode job (the Spark API built
    for gang-scheduled iterative workloads): task i memory-maps its CSR
    block and the two alternating shared rank vectors, computes
    ``contrib = reduceat(ranks[src] * invd[src], starts)``, writes its
    (dst-disjoint, so race-free) slice of updated ranks directly into
    the output map, and the per-superstep BSP barrier exchanges two
    hex-exact scalars (partial L1 error, partial rank sum) through
    atomically-renamed tmpfs files with sub-ms polling (allGather's
    runBarrier hard-sleeps 1s per poll — see run_loop) — every task
    derives the identical global error/dangling mass and convergence
    decision, and the fixed per-job scheduling cost is paid once, not
    per superstep;
  * rank vectors live in two alternating memory-mapped files on tmpfs:
    one physical copy in the page cache shared by all workers
    (vs. sc.broadcast: pickle + one deserialized copy PER worker).
    On a multi-executor cluster the same dataflow is "executor-local
    CSR cache + torrent-broadcast ranks"; this module implements the
    local[] realization of it, and operators.pagerank (the shuffle
    loop, no replicated vector) remains the 100-TB default.

``exchange="broadcast"`` (fallback, any master): per round the dense
rank vector is sc.broadcast to executors and per-partition partials
are collected and scatter-assembled at the driver. Correct anywhere,
but the driver-serial O(|V|) assembly is the measured Amdahl floor
that caps single-box core-scaling (BENCH.md round 1).

Scale envelope — be honest about it: both variants replicate the rank
vector (8 bytes/vertex), so they apply while 8B x |V| fits in executor
memory (~10^9 vertices at 8 GB). Past that, operators.pagerank's
shuffle loop is the right plan; `pagerank()` stays the default API and
this is the opt-in accelerator for the common web-graph regime.
Requires contiguous vertex ids [0, N).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .pagerank import PageRankResult

_ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"
_ARROW_BATCH_ROWS = 1 << 20
_SHM_DIR = "/dev/shm"


def pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    num_vertices: int,
    damping: float = 0.85,
    threshold: float = 1e-3,
    max_rounds: int = 50,
    num_partitions: int | None = None,
    exchange: str = "auto",
    max_broadcast_vertices: int | None = None,
) -> PageRankResult:
    """Reference-semantics PageRank with the Arrow/NumPy gather kernel.
    Returns ranks as a DataFrame like pagerank().

    exchange: "shm" (tmpfs memory-mapped rank exchange, local masters
    only), "broadcast" (sc.broadcast + driver assembly, any master),
    or "auto" (shm when available, else broadcast).

    max_broadcast_vertices bounds the broadcast exchange's
    driver-side degree/rank materialization (default
    _MAX_BROADCAST_VERTICES); above it the call fails loudly and
    points at operators.pagerank, the shuffle-loop 100-TB path.
    """
    if exchange == "auto":
        exchange = "shm" if _shm_available(spark) else "broadcast"
        # shm runs as a barrier gang: all num_partitions tasks must be
        # co-resident. In auto mode an oversized partition count falls
        # back to the broadcast exchange (correct at any partition
        # count); the hard error is reserved for explicit "shm".
        if (
            exchange == "shm"
            and num_partitions is not None
            and num_partitions > spark.sparkContext.defaultParallelism
        ):
            exchange = "broadcast"
    try:
        old_batch = spark.conf.get(_ARROW_BATCH_CONF)
    except Exception:
        old_batch = None
    spark.conf.set(_ARROW_BATCH_CONF, str(_ARROW_BATCH_ROWS))
    try:
        if exchange == "shm":
            return _pagerank_csr_shm(
                spark, edges, num_vertices, damping, threshold, max_rounds,
                num_partitions,
            )
        if exchange == "broadcast":
            return _pagerank_csr_broadcast(
                spark, edges, num_vertices, damping, threshold, max_rounds,
                num_partitions,
                max_vertices=(
                    max_broadcast_vertices
                    if max_broadcast_vertices is not None
                    else _MAX_BROADCAST_VERTICES
                ),
            )
        raise ValueError(f"unknown exchange mode {exchange!r}")
    finally:
        if old_batch is None:
            spark.conf.unset(_ARROW_BATCH_CONF)
        else:
            spark.conf.set(_ARROW_BATCH_CONF, old_batch)


def _shm_available(spark: SparkSession) -> bool:
    """shm exchange needs driver+executors on one host (local master)
    and a writable tmpfs."""
    master = spark.sparkContext.master or ""
    return (
        master.startswith("local")
        and os.path.isdir(_SHM_DIR)
        and os.access(_SHM_DIR, os.W_OK)
    )


# ---------------------------------------------------------------------------
# shm exchange: CSR blocks + rank vectors in tmpfs memory-maps
# ---------------------------------------------------------------------------

def _sweep_stale_workdirs() -> None:
    """Remove tmpfs workdirs whose owning driver process is dead — a
    SIGKILLed driver never reaches its rmtree, and leaked /dev/shm is
    resident RAM on a long-lived node. Each live run writes its pid to
    ``owner.pid``; dirs with a dead (or missing) owner are reclaimed."""
    try:
        names = os.listdir(_SHM_DIR)
    except OSError:
        return
    for name in names:
        if not name.startswith("dxa_csr_"):
            continue
        d = os.path.join(_SHM_DIR, name)
        try:
            with open(os.path.join(d, "owner.pid")) as f:
                pid = int(f.read().strip())
            alive = os.path.exists(f"/proc/{pid}")
        except (OSError, ValueError):
            # no/garbled pidfile: only reclaim if old enough that the
            # owner (which writes the pidfile immediately) must be gone
            try:
                alive = (time.time() - os.path.getmtime(d)) < 3600
            except OSError:
                continue
        if not alive:
            shutil.rmtree(d, ignore_errors=True)


def _pagerank_csr_shm(
    spark: SparkSession,
    edges: DataFrame,
    num_vertices: int,
    damping: float,
    threshold: float,
    max_rounds: int,
    num_partitions: int | None,
) -> PageRankResult:
    sc = spark.sparkContext
    P = num_partitions or sc.defaultParallelism
    n = num_vertices
    inv_n = 1.0 / n
    idx_t = "int" if n < 2**31 else "long"
    _sweep_stale_workdirs()
    workdir = tempfile.mkdtemp(prefix="dxa_csr_", dir=_SHM_DIR)
    with open(os.path.join(workdir, "owner.pid"), "w") as f:
        f.write(str(os.getpid()))

    def blk(pid: int, what: str) -> str:
        return os.path.join(workdir, f"blk_{pid}_{what}.npy")

    def write_blocks(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        srcs_l: list[np.ndarray] = []
        dsts_l: list[np.ndarray] = []
        for rb in it:
            srcs_l.append(
                rb.column(rb.schema.get_field_index("src")).to_numpy(
                    zero_copy_only=True
                )
            )
            dsts_l.append(
                rb.column(rb.schema.get_field_index("dst")).to_numpy(
                    zero_copy_only=True
                )
            )
        if not srcs_l:
            yield pa.RecordBatch.from_pydict(
                {"part": [pid], "n_dst": [0], "n_edge": [0]}
            )
            return
        srcs = np.concatenate(srcs_l)
        dsts = np.concatenate(dsts_l)
        # the partition is globally dst-sorted (sortWithinPartitions), so
        # segment starts are one linear scan over the concatenation
        starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
        uq = dsts[starts]
        np.save(blk(pid, "uq"), uq)
        np.save(blk(pid, "starts"), starts.astype(np.int64))
        np.save(blk(pid, "src"), srcs)
        yield pa.RecordBatch.from_pydict(
            {"part": [pid], "n_dst": [len(uq)], "n_edge": [len(srcs)]}
        )

    try:
        adj = (
            edges.select(
                F.col("src").cast(idx_t).alias("src"),
                F.col("dst").cast(idx_t).alias("dst"),
            )
            .repartition(P, "dst")
            .sortWithinPartitions("dst")
        )
        stats = adj.mapInArrow(
            write_blocks, schema="part long, n_dst long, n_edge long"
        ).collect()
        num_edges = int(sum(r["n_edge"] for r in stats))

        # out-degrees / dangling / coverage — one driver pass over the
        # saved per-partition arrays (page-cache reads, no second shuffle)
        out_deg = np.zeros(n, dtype=np.float64)
        covered = np.zeros(n, dtype=bool)
        for r in stats:
            if r["n_edge"] == 0:
                continue
            pid = r["part"]
            srcs = np.load(blk(pid, "src"), mmap_mode="r")
            # accumulate into the ONE buffer: bincount would allocate a
            # fresh n-width array per partition (P x 800 MB of driver
            # allocations at n=1e8); ufunc.at is in-place
            np.add.at(out_deg, srcs, 1.0)
            covered[np.load(blk(pid, "uq"))] = True
        nd = out_deg > 0
        invd = np.zeros(n)
        invd[nd] = 1.0 / out_deg[nd]
        invd_path = os.path.join(workdir, "invd.npy")
        np.save(invd_path, invd)
        # vertices whose rank no kernel writes: non-dangling without
        # in-edges (driver updates each round — their contrib is 0, one
        # shared scalar) and dangling (frozen at 1/N: written once below)
        unc_nd = np.flatnonzero(nd & ~covered)

        rank_paths = [
            os.path.join(workdir, "ranks_0.npy"),
            os.path.join(workdir, "ranks_1.npy"),
        ]
        maps = []
        for p in rank_paths:
            mm = np.lib.format.open_memmap(
                p, mode="w+", dtype=np.float64, shape=(n,)
            )
            mm[:] = inv_n
            mm.flush()
            maps.append(mm)

        # per-task slices of the vertices no kernel covers, so the loop
        # needs ZERO driver work per round
        unc_dang = np.flatnonzero(~nd & ~covered)
        for pid, sl in enumerate(np.array_split(unc_nd, P)):
            np.save(blk(pid, "uncnd"), sl)
        for pid, sl in enumerate(np.array_split(unc_dang, P)):
            np.save(blk(pid, "uncdg"), sl)

        wd, d, thr, mr = workdir, damping, threshold, max_rounds
        os.makedirs(os.path.join(wd, "sync"), exist_ok=True)

        def run_loop(it):
            """The ENTIRE iteration as one barrier-mode gang (Spark's
            API for co-scheduled iterative workloads): one job for all
            rounds, so the per-job scheduling floor is paid once, not
            per superstep. The per-superstep BSP barrier exchanges two
            hex-exact scalars (partial L1 error, partial rank sum)
            through atomically-renamed tmpfs files with sub-ms polling —
            NOT BarrierTaskContext.allGather, whose runBarrier polls its
            RPC future with a hardcoded Thread.sleep(1000) (verified in
            the spark-core bytecode), i.e. >=1s per superstep. Barrier
            scheduling still guarantees all P tasks are co-resident, so
            the file sync cannot deadlock; all tasks reduce the same
            pid-ordered scalars, so every task's float state and
            convergence decision is bitwise-identical."""
            from pyspark import BarrierTaskContext

            ctx = BarrierTaskContext.get()
            pid = ctx.partitionId()
            # A failed barrier stage is retried WHOLE by Spark, but the
            # retry reuses this workdir: ranks_0/ranks_1 hold
            # mid-iteration state and sync/r{round}_p{pid} files from
            # the failed attempt still exist, so a silent retry would
            # compute wrong ranks from corrupted buffers. Detect any
            # re-execution via an exclusive-create sentinel (PySpark
            # exposes no stageAttemptNumber, and task attemptNumber
            # resets to 0 on a stage resubmit) and fail loudly — the
            # caller reruns pagerank_csr (setup rebuilds a fresh
            # workdir) or falls back to the df loop.
            try:
                with open(
                    os.path.join(wd, f"attempt_p{pid}"), "x"
                ) as sf:
                    sf.write(str(ctx.taskAttemptId()))
            except FileExistsError:
                raise RuntimeError(
                    "pagerank_csr shm loop cannot be retried in place: "
                    f"partition {pid} already ran in this workdir and "
                    "would reuse mid-iteration rank buffers and stale "
                    "sync files; rerun the job (fresh workdir) instead"
                ) from None

            def sync_scalars(r, err_p, sum_p, timeout=600.0):
                mine = os.path.join(wd, "sync", f"r{r}_p{pid}")
                tmp = mine + ".tmp"
                with open(tmp, "w") as f:
                    f.write(f"{err_p.hex()} {sum_p.hex()}")
                os.rename(tmp, mine)  # atomic publish
                vals = {}
                deadline = time.monotonic() + timeout
                while len(vals) < P:
                    for q in range(P):
                        if q in vals:
                            continue
                        path = os.path.join(wd, "sync", f"r{r}_p{q}")
                        try:
                            with open(path) as f:
                                a, b = f.read().split()
                            vals[q] = (float.fromhex(a), float.fromhex(b))
                        except (FileNotFoundError, ValueError):
                            continue
                    if len(vals) < P:
                        if time.monotonic() > deadline:
                            raise RuntimeError(
                                f"superstep sync timed out at round {r}"
                            )
                        time.sleep(0.0005)
                err = 0.0
                nd_sum = 0.0
                for q in range(P):  # fixed reduction order
                    err += vals[q][0]
                    nd_sum += vals[q][1]
                return err, nd_sum

            def p(what):
                return os.path.join(wd, f"blk_{pid}_{what}.npy")

            have = os.path.exists(p("uq"))
            if have:
                uq = np.asarray(np.load(p("uq"), mmap_mode="r"))
                starts = np.load(p("starts"), mmap_mode="r")
                srcs = np.load(p("src"), mmap_mode="r")
                iv = np.load(os.path.join(wd, "invd.npy"), mmap_mode="r")
                # per-edge 1/out_deg is static: materialize once,
                # sequential reads every round afterwards
                w = iv[srcs]
                iv_uq = iv[uq]
                sel = iv_uq > 0.0
                ids = uq[sel]
            unc = np.load(p("uncnd")) if os.path.exists(p("uncnd")) else np.empty(0, np.int64)
            udg = np.load(p("uncdg")) if os.path.exists(p("uncdg")) else np.empty(0, np.int64)
            rp = [os.path.join(wd, "ranks_0.npy"), os.path.join(wd, "ranks_1.npy")]

            cur = 0
            dangling = inv_n  # round-1 quirk (MetaChunk.java:20)
            prev_unc = inv_n
            errors, masses, round_ms = [], [], []
            converged = False
            for rnd in range(mr):
                t0 = time.monotonic()
                # arithmetic identical (left-to-right) to the broadcast
                # variant and oracle.py:75-77
                a = (1 - d) * inv_n
                dd = d * dangling * inv_n
                unc_val = (a + d * 0.0) + dd
                ranks_v = np.load(rp[cur], mmap_mode="r")
                out = np.lib.format.open_memmap(rp[1 - cur], mode="r+")
                if len(unc):
                    out[unc] = unc_val
                if have:
                    contrib = np.add.reduceat(ranks_v[srcs] * w, starts)
                    new_vals = (a + d * contrib[sel]) + dd
                    old_vals = ranks_v[ids]
                    out[ids] = new_vals
                    err_p = float(np.abs(new_vals - old_vals).sum())
                    sum_p = float(new_vals.sum())
                else:
                    err_p, sum_p = 0.0, 0.0
                err_p += abs(unc_val - prev_unc) * len(unc)
                sum_p += unc_val * len(unc)
                out.flush()  # publish rank writes before the barrier
                err, nd_sum = sync_scalars(rnd, float(err_p), float(sum_p))
                dangling = 1.0 - nd_sum
                prev_unc = unc_val
                cur = 1 - cur
                errors.append(err)
                masses.append(dangling)
                round_ms.append(int((time.monotonic() - t0) * 1000))
                if err <= thr:
                    converged = True
                    break

            # restore pass: dangling vertices from converged neighbor
            # ranks, in place on the current buffer (srcs are
            # non-dangling, so no task reads what any task writes)
            a = (1 - d) * inv_n
            dd = d * dangling * inv_n
            ranks_v = np.load(rp[cur], mmap_mode="r")
            out = np.lib.format.open_memmap(rp[cur], mode="r+")
            if have:
                contrib = np.add.reduceat(ranks_v[srcs] * w, starts)
                seld = iv_uq == 0.0
                out[uq[seld]] = (a + d * contrib[seld]) + dd
            if len(udg):
                out[udg] = (a + d * 0.0) + dd
            out.flush()
            yield (pid, cur, converged, errors, masses, round_ms)

        # barrier mode gang-schedules all P tasks at once: P must not
        # exceed the executor slots or the job cannot be scheduled
        if P > sc.defaultParallelism:
            raise ValueError(
                f"shm exchange runs as a barrier gang: num_partitions={P} "
                f"exceeds the {sc.defaultParallelism} available slots"
            )
        rows = (
            sc.parallelize(range(P), P).barrier().mapPartitions(run_loop)
        ).collect()
        first = min(rows, key=lambda r: r[0])
        _, cur, converged, errors, masses, round_ms = first

        result = PageRankResult(
            ranks=None,
            rounds=len(errors),
            converged=converged,
            errors=errors,
            dangling_mass=masses,
            round_ms=round_ms,
            num_vertices=n,
            num_edges=num_edges,
        )
        final = np.array(
            np.load(rank_paths[cur], mmap_mode="r")
        )  # copy out of tmpfs before rmtree
        out = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "rank": final})
        result.ranks = spark.createDataFrame(out)
        return result
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# broadcast exchange (any master): sc.broadcast ranks, driver assembly
# ---------------------------------------------------------------------------

# The broadcast exchange materializes the full degree table and the
# dense rank vector on the driver (O(|V|) rows / 8 B per vertex). Cap
# it loudly rather than letting a 100-TB-scale graph silently OOM the
# driver; override via pagerank_csr(..., max_broadcast_vertices=...).
_MAX_BROADCAST_VERTICES = 200_000_000  # ~1.6 GB rank vector


def _pagerank_csr_broadcast(
    spark: SparkSession,
    edges: DataFrame,
    num_vertices: int,
    damping: float,
    threshold: float,
    max_rounds: int,
    num_partitions: int | None,
    max_vertices: int = _MAX_BROADCAST_VERTICES,
) -> PageRankResult:
    if num_vertices > max_vertices:
        raise ValueError(
            f"pagerank_csr broadcast exchange: num_vertices="
            f"{num_vertices:,} exceeds the driver-materialization cap "
            f"({max_vertices:,}). This single-box accelerator collects "
            "the degree table and assembles the dense rank vector on "
            "the driver; beyond the cap use operators.pagerank (the "
            "shuffle df loop — the 100-TB path) or raise "
            "max_broadcast_vertices explicitly."
        )
    sc = spark.sparkContext
    num_partitions = num_partitions or sc.defaultParallelism
    n = num_vertices
    inv_n = 1.0 / n
    idx_t = "int" if n < 2**31 else "long"

    adj = (
        edges.select(
            F.col("src").cast(idx_t).alias("src"),
            F.col("dst").cast(idx_t).alias("dst"),
        )
        .repartition(num_partitions, "dst")
        .sortWithinPartitions("dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    num_edges = adj.count()

    deg_pdf = adj.groupBy("src").agg(F.count(F.lit(1)).alias("c")).toPandas()
    out_deg = np.zeros(n, dtype=np.float64)
    out_deg[deg_pdf["src"].to_numpy()] = deg_pdf["c"].to_numpy()
    nd = out_deg > 0
    inv_deg = np.zeros(n)
    inv_deg[nd] = 1.0 / out_deg[nd]
    bc_inv_deg = sc.broadcast(inv_deg)

    def make_gather(bc_ranks, emit_ids: bool):
        def gather(
            it: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            ranks_v = bc_ranks.value
            invd = bc_inv_deg.value
            ids: list[np.ndarray] = []
            sums: list[np.ndarray] = []
            for rb in it:
                srcs = rb.column(rb.schema.get_field_index("src")).to_numpy(
                    zero_copy_only=True
                )
                dsts = rb.column(rb.schema.get_field_index("dst")).to_numpy(
                    zero_copy_only=True
                )
                vals = ranks_v[srcs] * invd[srcs]
                # dsts are pre-sorted within the partition, so segment
                # starts are a linear scan.
                starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
                # ids keep the (int32/int64) width they arrived with —
                # the driver decodes with the matching dtype.
                ids.append(dsts[starts])
                sums.append(np.add.reduceat(vals, starts))
            uq = (
                np.concatenate(ids) if ids else np.empty(0, dtype=np.int64)
            )
            sm = (
                np.concatenate(sums) if sums else np.empty(0, dtype=np.float64)
            )
            if len(ids) > 1:
                # a dst straddling two Arrow batches yields two entries;
                # merge them HERE (cheap, parallel) so the driver can
                # scatter-assign instead of bincount-add: the partition's
                # concatenated ids are still sorted, and partitions are
                # dst-disjoint (hash-partitioned by dst).
                starts = np.flatnonzero(np.r_[True, uq[1:] != uq[:-1]])
                uq = uq[starts]
                sm = np.add.reduceat(sm, starts)
            # the per-partition dst-id layout is STATIC across rounds
            # (same cached adjacency, same partitioning): ship it only
            # when the driver asks (round 1), afterwards contribs alone —
            # at N=10M that removes ~40 MB of driver collect per round.
            cells = {"contribs": [sm.tobytes()]}
            if emit_ids:
                cells["ids"] = [uq.tobytes()]
            yield pa.RecordBatch.from_pydict(cells)

        return gather

    # collected per-partition dst-id arrays (decoded once, reused)
    part_ids: list[np.ndarray] = []
    id_dtype = np.int32 if n < 2**31 else np.int64

    def full_contrib(ranks_np: np.ndarray) -> np.ndarray:
        bc = sc.broadcast(ranks_np)
        try:
            first = not part_ids
            schema = (
                "contribs binary, ids binary" if first else "contribs binary"
            )
            partials = adj.mapInArrow(
                make_gather(bc, emit_ids=first), schema=schema
            ).toPandas()
            if first:
                # toPandas concatenates partitions in order and each
                # partition emits exactly one row, so row i is partition
                # i in every round — the cached layout stays aligned.
                part_ids.extend(
                    np.frombuffer(b, dtype=id_dtype) for b in partials["ids"]
                )
            # partitions are dst-disjoint and in-partition duplicates are
            # merged in the kernel, so assembly is a pure scatter — O(|V|)
            # assignment, ~10x cheaper than bincount's add-accumulate.
            contrib = np.zeros(n)
            for idx, sums_b in zip(part_ids, partials["contribs"]):
                contrib[idx] = np.frombuffer(sums_b, dtype=np.float64)
            return contrib
        finally:
            bc.destroy()

    ranks = np.full(n, inv_n)
    dangling = inv_n  # round-1 quirk (MetaChunk.java:20)
    result = PageRankResult(
        ranks=None, rounds=0, converged=False,
        num_vertices=n, num_edges=num_edges,
    )

    for _ in range(max_rounds):
        t0 = time.monotonic()
        contrib = full_contrib(ranks)
        new = ranks.copy()
        new[nd] = (1 - damping) * inv_n + damping * contrib[nd] + damping * dangling * inv_n
        err = float(np.abs(new[nd] - ranks[nd]).sum())
        dangling = 1.0 - float(new[nd].sum())
        ranks = new
        result.rounds += 1
        result.errors.append(err)
        result.dangling_mass.append(dangling)
        result.round_ms.append(int((time.monotonic() - t0) * 1000))
        if err <= threshold:
            result.converged = True
            break

    # restore pass: dangling vertices from converged neighbor ranks
    contrib = full_contrib(ranks)
    ranks = ranks.copy()
    ranks[~nd] = (
        (1 - damping) * inv_n + damping * contrib[~nd] + damping * dangling * inv_n
    )

    out = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "rank": ranks})
    result.ranks = spark.createDataFrame(out)
    adj.unpersist()
    bc_inv_deg.destroy()
    return result
