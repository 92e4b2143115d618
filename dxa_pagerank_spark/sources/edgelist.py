"""Reference in-edge-list text format source (README.md:49-59,
ReadLumpInEdgeListTask.java:41-140).

Format: line i = space-separated in-neighbors of vertex i (1-based);
a first token '0' means no in-edges. Duplicate mentions are preserved
(out-degree counts occurrences, SURVEY.md §2.3 item 6).

The format is inherently line-number-addressed, so ingestion needs a
stable line index. ``zipWithIndex`` over the text RDD provides it with
one extra pass to count per-partition lines — the single justified RDD
use in the engine (everything downstream is DataFrames). The reference
instead re-reads the whole file on every node and holds an O(N) array
per node (ReadLumpInEdgeListTask.java:48-79) — the scan here is
partitioned and needs O(N/P) per task.

Emitted ids are 0-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_in_edge_list(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """-> (edges(src, dst), num_vertices)."""
    lines = spark.read.text(path).rdd.map(lambda r: r.value).zipWithIndex()
    df = spark.createDataFrame(lines, "line string, vertex long")
    num_vertices = df.count()
    edges = (
        df.select(
            F.col("vertex").alias("dst"),
            F.explode(F.split(F.trim(F.col("line")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "0")
        .select((F.col("tok").cast("long") - 1).alias("src"), "dst")
    )
    return edges.select("src", "dst"), num_vertices


def write_in_edge_list(edges: DataFrame, num_vertices: int, path: str) -> None:
    """Emit the reference text format (fixture interop; driver-side —
    the format is a single ordered file, not a 100-TB sink)."""
    rows = (
        edges.groupBy("dst")
        .agg(F.sort_array(F.collect_list(F.col("src") + 1)).alias("ins"))
        .collect()
    )
    by_dst = {r["dst"]: r["ins"] for r in rows}
    with open(path, "w") as f:
        for v in range(num_vertices):
            ins = by_dst.get(v)
            f.write((" ".join(str(i) for i in ins) if ins else "0") + "\n")
