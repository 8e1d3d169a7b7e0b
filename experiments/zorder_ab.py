#!/usr/bin/env python3
"""A/B/C the MULTI-DIMENSIONAL ingest layout: linear sort serves ONE
predicate column's row-group pruning perfectly and any other column's
not at all; a Z-ORDER (Morton) interleave of two columns buys useful
pruning on BOTH — the layout trade every lakehouse OPTIMIZE ZORDER
command encodes, measured here structurally from parquet footers.

  arm A (linear orderkey): repartitionByRange + sortWithinPartitions
                           on l_orderkey.
  arm B (linear suppkey):  same, on l_suppkey.
  arm C (z-order):         both keys min-max-scaled to 16 bits,
                           bit-interleaved into one 32-bit Morton key,
                           range-partitioned + sorted on it.

Probes (row-group min/max overlap fraction, deterministic — what a
100 TB scan would skip regardless of this box's timing noise):
  P1: 5% band on l_orderkey only
  P2: 5% band on l_suppkey only
  P3: 20% x 20% box on both
  P4: 5% x 5% box on both

Expected shape (and the 100 TB recommendation it supports): linear wins
its own column outright (~5% of groups read) and loses the other
completely (~100%); z-order reads ~sqrt-ish fractions on each single
column and dominates on the 2-D box. Choose linear when one pruning key
dominates the query mix; z-order when two (or more) keys share it.

Run: python experiments/zorder_ab.py   (~1-2 min, local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BITS = 16
FILES = 24
RECORDS_PER_FILE = 16384  # one row group per file at this size


def morton(xcol, ycol):
    """Interleave the low BITS bits of two integer columns (x even,
    y odd positions) — pure shift/and/or, stays in codegen."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xcol, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ycol, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def overlap(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) row groups for predicate col in [lo, hi)."""
    hit = total = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, fname)).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            ci = idx[col]
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(ci).statistics
                total += 1
                if not (st.max < lo or st.min >= hi):
                    hit += 1
    return hit, total


def overlap2(path: str, c1, b1, c2, b2) -> tuple[int, int]:
    """Row groups overlapping BOTH bands (2-D box)."""
    hit = total = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, fname)).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            i1, i2 = idx[c1], idx[c2]
            for g in range(meta.num_row_groups):
                s1 = meta.row_group(g).column(i1).statistics
                s2 = meta.row_group(g).column(i2).statistics
                total += 1
                ok1 = not (s1.max < b1[0] or s1.min >= b1[1])
                ok2 = not (s2.max < b2[0] or s2.min >= b2[1])
                if ok1 and ok2:
                    hit += 1
    return hit, total


def main() -> None:
    spark = get_spark("zorder-ab")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(RECORDS_PER_FILE))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    bounds = li.agg(
        F.min("l_orderkey").alias("olo"),
        F.max("l_orderkey").alias("ohi"),
        F.min("l_suppkey").alias("slo"),
        F.max("l_suppkey").alias("shi"),
    ).collect()[0]
    olo, ohi, slo, shi = bounds["olo"], bounds["ohi"], bounds["slo"], bounds["shi"]
    scale = (1 << BITS) - 1
    xn = ((F.col("l_orderkey") - olo) * scale / (ohi - olo)).cast("long")
    yn = ((F.col("l_suppkey") - slo) * scale / (shi - slo)).cast("long")
    liz = li.withColumn("z", morton(xn, yn))

    work = tempfile.mkdtemp(prefix="zorder_ab_")
    arms = {
        "linear_orderkey": liz.repartitionByRange(FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey"),
        "linear_suppkey": liz.repartitionByRange(FILES, "l_suppkey")
        .sortWithinPartitions("l_suppkey"),
        "zorder": liz.repartitionByRange(FILES, "z").sortWithinPartitions("z"),
    }
    # probe bands: 5% single-column, 20% x 20% box
    ob5 = (olo + (ohi - olo) * 40 // 100, olo + (ohi - olo) * 45 // 100)
    sb5 = (slo + (shi - slo) * 40 // 100, slo + (shi - slo) * 45 // 100)
    ob20 = (olo + (ohi - olo) * 40 // 100, olo + (ohi - olo) * 60 // 100)
    sb20 = (slo + (shi - slo) * 40 // 100, slo + (shi - slo) * 60 // 100)

    print(f"fixture {SF_DIR}  orderkey [{olo},{ohi}]  suppkey [{slo},{shi}]")
    for name, df in arms.items():
        path = os.path.join(work, name)
        df.write.mode("overwrite").parquet(path)
        h1, t = overlap(path, "l_orderkey", *ob5)
        h2, _ = overlap(path, "l_suppkey", *sb5)
        h3, _ = overlap2(path, "l_orderkey", ob20, "l_suppkey", sb20)
        h4, _ = overlap2(path, "l_orderkey", ob5, "l_suppkey", sb5)
        print(
            f"{name:16s}  groups={t:3d}  "
            f"P1 orderkey-5%: {h1}/{t} ({h1 / t:.0%})  "
            f"P2 suppkey-5%: {h2}/{t} ({h2 / t:.0%})  "
            f"P3 2D-20%box: {h3}/{t} ({h3 / t:.0%})  "
            f"P4 2D-5%box: {h4}/{t} ({h4 / t:.0%})"
        )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
