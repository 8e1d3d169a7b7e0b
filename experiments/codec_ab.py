#!/usr/bin/env python3
"""Measure the parquet compression-codec trade: bytes on disk vs write
cost vs scan cost — the storage decision a 100 TB lake makes once and
pays for forever.  lineitem at sf0.1 is written with each codec (same
row order, one file per 32 partitions), then each copy is (a) fully
aggregated and (b) scanned through a pushed-down filter, median of 3.

Run: python experiments/codec_ab.py   (~2 min, local[32])
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CODECS = ("uncompressed", "snappy", "zstd", "gzip")
RUNS = 3


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark("codec-ab")
    tune(spark)
    li = load(spark, SF_DIR, "lineitem")
    li.cache().count()
    base = tempfile.mkdtemp(prefix="codec_ab_")

    print(f"# sf_dir={SF_DIR}  rows={li.count()}")
    print("# codec  mb_on_disk  write_s  full_agg_s  filtered_s")
    for codec in CODECS:
        out = os.path.join(base, codec)
        t = time.time()
        li.write.option("compression", codec).parquet(out)
        write_s = time.time() - t
        mb = du(out) / 1e6

        back = spark.read.parquet(out)
        full, filt = [], []
        for _ in range(RUNS):
            t = time.time()
            back.agg(F.sum("l_quantity"), F.count(F.lit(1))).collect()
            full.append(time.time() - t)
            t = time.time()
            back.filter(F.col("l_shipdate") > "1998-01-01").agg(
                F.sum("l_extendedprice")
            ).collect()
            filt.append(time.time() - t)
        row = {
            "codec": codec,
            "mb": round(mb, 1),
            "write_s": round(write_s, 2),
            "full_agg_s": round(statistics.median(full), 3),
            "filtered_s": round(statistics.median(filt), 3),
        }
        print(f"{codec:>13} {mb:>10.1f} {write_s:>8.2f}"
              f" {row['full_agg_s']:>11} {row['filtered_s']:>10}")
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
