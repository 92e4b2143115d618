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
