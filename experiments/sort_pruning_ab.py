#!/usr/bin/env python3
"""A/B the ingest SORT LAYOUT's effect on parquet row-group pruning —
the cheapest scan-bandwidth lever at 100 TB: a time-banded query over
data sorted by the band key should read only the overlapping row
groups, while the same query over hash-scattered data reads them all
(every group's min/max straddles the predicate).

  arm A (scattered): lineitem repartitioned by hash(l_orderkey) — the
                     layout a key-bucketed ingest produces.
  arm B (sorted):    repartitionByRange(l_shipdate) +
                     sortWithinPartitions — the time-ordered ingest.

Two measurements per arm for a 1-month shipdate band:
  1. STRUCTURAL (deterministic): fraction of row groups whose
     [min, max] l_shipdate statistics overlap the band, read from the
     parquet footers with pyarrow — this is what a 100 TB scan would
     skip, independent of this box's timing noise.
  2. wall-clock of the banded aggregate on each layout.

Run: python experiments/sort_pruning_ab.py   (~1 min, local[32])
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LO, HI = "1995-06-01", "1995-07-01"


def rowgroup_overlap(path: str) -> tuple[int, int]:
    """(overlapping, total) row groups for the [LO, HI) shipdate band."""
    import datetime

    lo = datetime.datetime.fromisoformat(LO)
    hi = datetime.datetime.fromisoformat(HI)
    hit = total = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        ci = idx["l_shipdate"]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            total += 1
            mn, mx = st.min, st.max
            if not (mx < lo or mn >= hi):
                hit += 1
    return hit, total


def timed_scan(spark, path: str) -> float:
    t0 = time.perf_counter()
    (
        spark.read.parquet(path)
        .filter((F.col("l_shipdate") >= LO) & (F.col("l_shipdate") < HI))
        .agg(F.count(F.lit(1)), F.sum("l_extendedprice"))
        .collect()
    )
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("sort-pruning-ab")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    tmp = tempfile.mkdtemp(prefix="sortab_")
    a_path, b_path = f"{tmp}/scattered", f"{tmp}/sorted"
    try:
        li.repartition(16, "l_orderkey").write.parquet(a_path)
        (
            li.repartitionByRange(16, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.parquet(b_path)
        )
        print(f"# sort-layout pruning A/B at {SF_DIR}, band [{LO}, {HI})")
        for label, path in (("scattered", a_path), ("sorted", b_path)):
            hit, total = rowgroup_overlap(path)
            # warm-up then time
            timed_scan(spark, path)
            secs = min(timed_scan(spark, path) for _ in range(3))
            print(
                f"{label:>9}: {hit}/{total} row groups overlap the band "
                f"({100 * hit / total:.0f}% must be read); "
                f"banded agg {secs:.3f} s"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
