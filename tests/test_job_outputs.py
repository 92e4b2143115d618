"""Output-format parity for the spark-submit job (PRInfoTask.java:83-86,
PrStatisticsJob.java:66-92): statistics.out line layout golden test and
plain-decimal rank formatting."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from jobs.pagerank_job import write_statistics  # noqa: E402


def test_statistics_out_shape(tmp_path):
    """Exact reference layout: header comment, blank line, key\\tvalue
    block incl. MEM_USAGE, ROUNDS table with NO separating blank line
    (PrStatisticsJob.java:66-92)."""
    p = tmp_path / "statistics.out"
    write_statistics(
        str(p),
        out_dir="/out/pageRank_x",
        graph_input="SYNTHETIC",
        num_slaves=2,
        vertex_cnt=10,
        num_edges=20,
        damping=0.85,
        threshold=0.001,
        locality=0.8,
        mean_indeg=6,
        input_time_s=1.23456,
        mem_usage_mb=755.91579,
        errors=[0.1, 0.01],
        round_ms=[1000, 2500],
    )
    lines = p.read_text().splitlines()
    assert lines[0] == "#Statistics for PageRank Run /out/pageRank_x | SYNTHETIC"
    assert lines[1] == ""
    assert lines[2] == "NUM_SLAVES\t2"
    assert lines[3] == "NUM_VERTICES\t10"
    assert lines[4] == "NUM_EDGES\t20"
    assert lines[5] == "DAMPING_VAL\t0.85"
    assert lines[6] == "THRESHOLD\t0.001"
    assert lines[7] == "LOCALITY\t0.8"
    assert lines[8] == "MEAN_INDEG\t6"
    assert lines[9] == "NUM_ROUNDS\t2"
    assert lines[10] == "INPUT_TIME\t1.2346s"
    assert lines[11] == "EXECUTION_TIME\t3.5000s"
    assert lines[12] == "MEM_USAGE\t755.9158MB"
    # reference writes the ROUNDS banner immediately after MEM_USAGE
    assert lines[13] == "--------ROUNDS--------"
    assert lines[14] == "Round\tError\tTime"
    assert lines[15] == "1\t0.100000000000\t1.0000s"
    assert lines[16] == "2\t0.010000000000\t2.5000s"


def test_job_s2_file_input_matches_s1(spark, tmp_path):
    """S>1 end-to-end (SURVEY §2.3.8): file input is the same graph at
    any S, so ranks must be identical; only the vertex->slave placement
    of the output files changes (round-robin,
    ReadLumpInEdgeListTask.java:59)."""
    from dxa_pagerank_spark.datagen import FIXTURE_GRAPHS
    from jobs.pagerank_job import main

    g = tmp_path / "g.txt"
    g.write_text(FIXTURE_GRAPHS["g7_readme"] + "\n")
    outs = {}
    for s in (1, 2):
        out = tmp_path / f"out_s{s}"
        main([
            "7", "0.85", "1e-10", "60", "true", str(g),
            "--out", str(out), "--cores", "4", "--slaves", str(s),
        ])
        lines = []
        for p in sorted(out.glob("pageRank/**/*.pageRank")):
            lines += p.read_text().splitlines()
        outs[s] = dict(ln.split(" ") for ln in lines)
    assert outs[1] == outs[2]  # identical ranks, byte-for-byte
    # placement law: slave=k dir holds exactly the names with (v-1)%2==k
    for k in (0, 1):
        names = set()
        for p in (tmp_path / "out_s2/pageRank" / f"slave={k}").glob("*.pageRank"):
            names |= {ln.split(" ")[0] for ln in p.read_text().splitlines()}
        assert names == {str(v) for v in range(1, 8) if (v - 1) % 2 == k}
    stats = (tmp_path / "out_s2/statistics.out").read_text()
    assert "NUM_SLAVES\t2" in stats


def test_job_s2_synthetic_runs_parity_generator(spark, tmp_path):
    """Synthetic source at S=2 goes through the distributed draw-parity
    generator, block placement, and the hex-ChunkID name mode
    (PRInfoTask.java:86: synthetic output names are
    ChunkID.toHexString((nodeID<<48)|LID), vertices at LID 1..cnt)."""
    from dxa_pagerank_spark.datagen import synthetic_edges
    from dxa_pagerank_spark.oracle import pagerank_oracle
    from jobs.pagerank_job import main

    out = tmp_path / "out_synth"
    main([
        "100", "0.85", "1e-8", "50", "true", "0.6", "4", "21",
        "--out", str(out), "--cores", "4", "--slaves", "2",
    ])
    src, dst = synthetic_edges(100, 0.6, 4, 21, n_slaves=2)
    oracle = pagerank_oracle(100, src, dst, 0.85, 1e-8, 50)
    got = {}
    for p in sorted(out.glob("pageRank/**/*.pageRank")):
        for ln in p.read_text().splitlines():
            name, val = ln.split(" ")
            assert name.startswith("0x") and len(name) == 18  # 0x + 16 hex
            cid = int(name, 16)
            slave, lid = cid >> 48, cid & ((1 << 48) - 1)
            got[slave * 50 + lid - 1] = float(val)  # block start = s*50
    assert len(got) == 100
    for i in range(100):
        assert abs(got[i] - oracle.ranks[i]) < 1e-9
    # block placement: slave=0 holds global ids 0..49 (LIDs 1..50, node 0)
    names0 = set()
    for p in (out / "pageRank/slave=0").glob("*.pageRank"):
        names0 |= {ln.split(" ")[0] for ln in p.read_text().splitlines()}
    assert names0 == {f"0x{lid:016X}" for lid in range(1, 51)}


def test_synthetic_block_placement_uneven(spark):
    """Uneven N % S split: first `mod` slaves take ceil-sized blocks
    (CreateSyntheticGraphSeed.java:149-163). N=7, S=3 -> blocks
    [0..2], [3..4], [5..6]; LIDs restart at 1 inside each block."""
    from pyspark.sql import functions as F

    from jobs.pagerank_job import _local_pos_of, _slave_of

    df = spark.range(7).select(F.col("id").cast("long"))
    s = _slave_of(F.col("id"), 7, 3, synthetic=True)
    rows = (
        df.select("id", s.alias("slave"),
                  (_local_pos_of(F.col("id"), s, 7, 3) + 1).alias("lid"))
        .orderBy("id").collect()
    )
    assert [(r.slave, r.lid) for r in rows] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (2, 1), (2, 2)]


def test_statistics_out_file_input_omits_synth_lines(tmp_path):
    p = tmp_path / "statistics.out"
    write_statistics(
        str(p),
        out_dir="/out/r",
        graph_input="/data/g.txt",
        num_slaves=1,
        vertex_cnt=7,
        num_edges=12,
        damping=0.85,
        threshold=1e-6,
        locality=0.0,
        mean_indeg=0,
        input_time_s=0.5,
        mem_usage_mb=10.0,
        errors=[0.2],
        round_ms=[100],
    )
    text = p.read_text()
    assert "LOCALITY" not in text and "MEAN_INDEG" not in text
    assert "| /data/g.txt" in text.splitlines()[0]
