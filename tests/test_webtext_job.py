"""End-to-end webtext curation job (jobs/webtext_job.py): documents
mode over the sf0.001 fixture and pages mode over a synthetic crawl —
funnel must be monotone non-increasing and the output parquet readable
with the promised columns."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_documents_mode_funnel(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import webtext_job

    args = webtext_job.argparse.Namespace(
        mode="documents", boiler_frac=0.5, min_quality=0.5,
        sample_power=1, benchmark=None, ngram=3, salt=5,
    )
    df = spark.read.parquet(DOCS)
    curated, funnel = webtext_job.run_pipeline(spark, df, args)
    order = ["input", "exact_dedup", "repetition", "quality_floor", "sampled"]
    counts = [funnel[k] for k in order]
    assert counts == sorted(counts, reverse=True)  # monotone funnel
    assert funnel["sampled"] == curated.count()
    assert {"doc_id", "text", "quality", "n_tokens"} <= set(curated.columns)
    assert funnel["sampled"] > 0


def test_pages_mode_with_decontamination(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import webtext_job
    from dxa_pagerank_spark.sources.pages_synth import synth_pages

    docs = spark.read.parquet(DOCS).select("doc_id")
    n = docs.count()
    pages = synth_pages(docs, n).select("url", "warc_ts", "text")
    bench_path = str(tmp_path / "bench")
    spark.read.parquet(DOCS).filter(F.col("doc_id") < 2).select(
        "doc_id", "text"
    ).write.parquet(bench_path)

    args = webtext_job.argparse.Namespace(
        mode="pages", boiler_frac=0.5, min_quality=0.0,
        sample_power=1, benchmark=bench_path, ngram=3, salt=5,
    )
    curated, funnel = webtext_job.run_pipeline(spark, pages, args)
    assert funnel["snapshot_merge"] == n  # one capture per url
    assert funnel["line_dedup"] == n
    assert funnel["decontamination"] <= funnel["quality_floor"]
    assert "canonical_url" in curated.columns
    # boilerplate lines are gone from every surviving page text
    texts = [r["text"] for r in curated.select("text").collect()]
    assert texts and all("mail" not in t.split("\n") for t in texts)


def test_cli_writes_corpus_and_report(tmp_path):
    out = str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "webtext_job.py"),
         DOCS, "--out", out, "--mode", "documents", "--cores", "4"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(os.path.join(out, "report.json")))
    assert rep["sampled"] <= rep["input"]
    assert os.path.isdir(os.path.join(out, "corpus"))


def test_documents_mode_cdc_and_span_gates(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import webtext_job

    df = spark.read.parquet(DOCS)
    bench_path = str(tmp_path / "bench")
    df.filter(F.col("doc_id") < 2).select("doc_id", "text").write.parquet(
        bench_path
    )
    args = webtext_job.argparse.Namespace(
        mode="documents", boiler_frac=0.5, min_quality=0.0,
        sample_power=1, benchmark=bench_path, ngram=3, salt=5,
        max_dup_frac=0.9, span_contam_frac=0.2,
    )
    curated, funnel = webtext_job.run_pipeline(spark, df, args)
    assert funnel["cdc_dedup"] <= funnel["exact_dedup"]
    assert funnel["decontamination"] <= funnel["quality_floor"]
    # span gate keeps lightly-overlapping docs the any-n-gram drop
    # would kill, but must still drop the benchmark docs themselves
    # (verbatim copies = 100% contaminated)
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 0 not in kept and 1 not in kept

    strict = webtext_job.argparse.Namespace(
        mode="documents", boiler_frac=0.5, min_quality=0.0,
        sample_power=1, benchmark=bench_path, ngram=3, salt=5,
    )
    _, strict_funnel = webtext_job.run_pipeline(spark, df, strict)
    # the fraction gate is never stricter than the any-n-gram drop
    assert funnel["decontamination"] >= strict_funnel["decontamination"]
