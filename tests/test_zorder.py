"""Z-order layout (plans/zorder.py): Morton values vs a replica, and
the measurable pruning claim — per-file 2-D bounding boxes of the
z-ordered layout are far tighter than a single-column sort's, so a
2-D slice query touches fewer files (checked via real parquet
row-group statistics)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from dxa_pagerank_spark.plans.zorder import write_zordered, z_value


def _morton(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_replica(spark):
    rows = [(i, (i * 37) % 256, (i * 101) % 256) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", z_value(F.col("a"), F.col("b"), bits=8).alias("z")
        ).collect()
    }
    for i, a, b in rows:
        assert got[i] == _morton(a, b, 8)


def test_z_value_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        z_value(F.lit(1), F.lit(2), bits=0)


def _file_boxes(path, a_col, b_col):
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        amin = amax = bmin = bmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == a_col:
                    amin = st.min if amin is None else min(amin, st.min)
                    amax = st.max if amax is None else max(amax, st.max)
                elif name == b_col:
                    bmin = st.min if bmin is None else min(bmin, st.min)
                    bmax = st.max if bmax is None else max(bmax, st.max)
        boxes.append((amin, amax, bmin, bmax))
    return boxes


def test_zorder_layout_prunes_2d_slices(spark, tmp_path):
    # 64x64 grid of (a, b) points
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zord")
    npath = str(tmp_path / "naive")
    write_zordered(df, zpath, "a", "b", bits=6, num_files=16)
    # naive layout: sorted by a alone, same file count
    (
        df.repartitionByRange(16, "a", "b")
        .sortWithinPartitions("a", "b")
        .write.mode("overwrite")
        .parquet(npath)
    )
    zb = _file_boxes(zpath, "a", "b")
    nb = _file_boxes(npath, "a", "b")
    assert len(zb) == len(nb) == 16

    # both layouts tile the grid (total area ties at 4096); the
    # z-order win is box SHAPE: Morton quadrants are ~square, while
    # the 1-D sort's boxes are strips spanning the entire b domain
    assert max(b2 - b1 for _, _, b1, b2 in zb) <= 31
    assert max(b2 - b1 for _, _, b1, b2 in nb) == 63

    def touched(boxes, q):
        qa1, qa2, qb1, qb2 = q
        return sum(
            1
            for a1, a2, b1, b2 in boxes
            if not (a2 < qa1 or a1 > qa2 or b2 < qb1 or b1 > qb2)
        )

    # small 2-D slices along the diagonal: z-order must touch
    # strictly fewer files in aggregate
    queries = [(x, x + 3, x, x + 3) for x in range(2, 60, 8)]
    z_cost = sum(touched(zb, q) for q in queries)
    n_cost = sum(touched(nb, q) for q in queries)
    assert z_cost < n_cost
    # correctness: the z-ordered table still returns the exact slice
    got = (
        spark.read.parquet(zpath)
        .filter(
            (F.col("a").between(10, 13)) & (F.col("b").between(10, 13))
        )
        .count()
    )
    assert got == 16
