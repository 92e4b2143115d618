"""Real `spark-submit --py-files dxa_pagerank_spark.zip` launch contract.

north_rule: "jobs launch via spark-submit --py-files on multi-executor
clusters at N and 4N executors". Every other job test invokes the job
module in-process or via `python jobs/...`; this one goes through the
actual launcher binary with the package shipped as a zip, the way a
cluster submit would:

* the zip is built fresh into a temp dir (no repo files leak in),
* the job script is COPIED to the temp dir and run from there with a
  scrubbed PYTHONPATH, so its repo-relative sys.path fallback points at
  nothing and `dxa_pagerank_spark` can only resolve from --py-files,
* the same job runs at two parallelism levels (local[2] and local[8],
  the sandbox stand-in for N and 4N executors per the round brief) and
  the per-vertex ranks must agree to 1e-9 — the determinism-across-
  cluster-size property that makes the N->4N scaling measurement
  meaningful in the first place.

Reference CLI being exercised: MainPR N damping threshold maxRounds
printPR locality meanInDeg seed (reference README.md:43-47).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_pyfiles_zip(dest: str) -> str:
    """Zip the package the way a deploy step would (zip -r, no pyc)."""
    pkg = os.path.join(REPO, "dxa_pagerank_spark")
    zip_path = os.path.join(dest, "dxa_pagerank_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in files:
                if name.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zip_path


def _submit(
    tmp_path, zip_path: str, job_copy: str, cores: int, master: str | None = None
) -> dict[int, float]:
    master = master or f"local[{cores}]"
    out = str(tmp_path / f"out_{master.replace('[', '_').replace(']', '').replace(',', '_')}")
    env = {
        k: v
        for k, v in os.environ.items()
        # scrub anything that could let the driver import the repo copy
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", master,
            "--py-files", zip_path,
            job_copy,
            "40", "0.85", "1e-10", "30", "true",
            "0.5", "3", "42",
            "--out", out,
            "--cores", str(cores),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-3000:])
    # statistics.out parity artifact must exist alongside the ranks
    assert os.path.isfile(os.path.join(out, "statistics.out"))
    ranks: dict[int, float] = {}
    pr_dir = os.path.join(out, "pageRank")
    for slave_dir in sorted(os.listdir(pr_dir)):
        full = os.path.join(pr_dir, slave_dir)
        if not os.path.isdir(full):
            continue
        for part in os.listdir(full):
            if not part.endswith(".pageRank"):
                continue
            with open(os.path.join(full, part)) as f:
                for line in f:
                    name, rank = line.split()
                    # synthetic mode writes hex ChunkIDs 0x(slave<<48|lid)
                    ranks[int(name, 16)] = float(rank)
    return ranks


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_spark_submit_pyfiles_two_parallelism_levels(tmp_path):
    zip_path = _build_pyfiles_zip(str(tmp_path))
    job_copy = str(tmp_path / "pagerank_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "pagerank_job.py"), job_copy)
    # the repo package must NOT be importable from the job's directory —
    # only the zip can supply it
    assert not os.path.exists(str(tmp_path / "dxa_pagerank_spark"))

    ranks_small = _submit(tmp_path, zip_path, job_copy, cores=2)
    ranks_big = _submit(tmp_path, zip_path, job_copy, cores=8)

    assert len(ranks_small) == 40
    assert ranks_small.keys() == ranks_big.keys()
    # probability mass conserved at both cluster sizes
    assert abs(sum(ranks_small.values()) - 1.0) < 1e-9
    assert abs(sum(ranks_big.values()) - 1.0) < 1e-9
    # per-vertex scores identical across parallelism (north_rule allclose
    # is 1e-6; the engine is deterministic well past that)
    for k, v in ranks_small.items():
        assert abs(v - ranks_big[k]) < 1e-9, (k, v, ranks_big[k])


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_spark_submit_local_cluster_n_and_4n_executors(tmp_path):
    """north_rule, taken literally: the job submits unchanged onto a
    MULTI-EXECUTOR cluster at two cluster sizes (N and 4N executors) and
    produces identical per-vertex ranks.

    `local-cluster[E, c, mem]` spawns E real standalone-mode executor
    JVMs (separate processes and heaps; shuffle blocks and broadcasts
    cross JVM boundaries) — the sandbox's closest realization of a
    multi-executor cluster. The package still ships via --py-files only;
    get_spark must respect the launcher's master rather than forcing
    local[cores] (dxa_pagerank_spark/session.py master resolution).
    Throughput at these two cluster sizes is measured by
    scripts/cluster_scaling.py (BENCH.md); this test pins the
    correctness half: determinism across executor counts.
    """
    zip_path = _build_pyfiles_zip(str(tmp_path))
    job_copy = str(tmp_path / "pagerank_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "pagerank_job.py"), job_copy)

    ranks_1 = _submit(
        tmp_path, zip_path, job_copy, cores=2, master="local-cluster[1,2,1536]"
    )
    ranks_4 = _submit(
        tmp_path, zip_path, job_copy, cores=8, master="local-cluster[4,2,1536]"
    )

    assert len(ranks_1) == 40
    assert ranks_1.keys() == ranks_4.keys()
    assert abs(sum(ranks_1.values()) - 1.0) < 1e-9
    assert abs(sum(ranks_4.values()) - 1.0) < 1e-9
    for k, v in ranks_1.items():
        assert abs(v - ranks_4[k]) < 1e-9, (k, v, ranks_4[k])
