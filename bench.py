#!/usr/bin/env python3
"""Bench harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed by full materialization (count of the action via
``df.write.format("noop")`` — pulls every row through the plan without
driver-side collection overhead).  One warm-up run of the flagship
excluded from timings (JVM + codegen warm-up).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("cdp-spark-bench")
    reg = load_all()

    # warm-up (not timed): JVM, codegen, parquet footer caches
    materialize(reg["agg_groupby"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(reg):
        t0 = time.perf_counter()
        try:
            materialize(reg[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # record failures without killing the bench
            timings[name] = -1.0
            print(f"# BENCH FAIL {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total wall-clock, all declared queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
