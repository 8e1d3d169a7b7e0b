#!/usr/bin/env python3
"""Strong-scaling study: the same representative queries at sf0.1 on
local[4] / local[8] / local[16] / local[32] — does each operator family
actually use the cores it is given?  A fresh SparkSession per core
count (master can't change in-session); per-query median of 3 after one
untimed warm-up.  Representatives chosen to separate the bound
resources: scan-bound (agg_groupby), shuffle-bound (join_multikey_chain,
dedup_exact), compute-bound JVM (dedup_near_jaccard verification),
compute-bound Python/state (stream_dedup_simhash), and
driver-interactive (sim_kmeans_lloyd model rounds).

Run: python experiments/cpu_scaling.py   (~8 min)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = (4, 8, 16, 32)
QUERIES = (
    "agg_groupby",
    "join_multikey_chain",
    "dedup_exact",
    "dedup_near_jaccard",
    "stream_dedup_simhash",
    "sim_kmeans_lloyd",
)
RUNS = 3


def main() -> None:
    from covid_data_pipeline_spark.registry import load_all
    from covid_data_pipeline_spark.session import get_spark

    reg = load_all()
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for cores in CORES:
        os.environ["SPARK_GRAFT_SHUFFLE"] = str(cores)
        spark = get_spark(f"cpu-scaling-{cores}", cpus=cores)
        for q in QUERIES:
            reg[q].fn(spark, SF_DIR).count()  # warm-up, untimed
            times = []
            for _ in range(RUNS):
                t = time.time()
                reg[q].fn(spark, SF_DIR).count()
                times.append(time.time() - t)
            results[q][cores] = statistics.median(times)
        spark.stop()
    os.environ.pop("SPARK_GRAFT_SHUFFLE", None)

    print(f"# sf_dir={SF_DIR}  median of {RUNS} (1 warm-up), seconds")
    header = "# query".ljust(24) + "".join(f"{c:>8}c" for c in CORES) + "  speedup(4c->32c)"
    print(header)
    for q in QUERIES:
        row = results[q]
        su = row[CORES[0]] / row[CORES[-1]]
        print(q.ljust(24)
              + "".join(f"{row[c]:>9.2f}" for c in CORES)
              + f"  {su:>6.2f}x")
        print(json.dumps({"query": q,
                          **{f"s_{c}": round(row[c], 3) for c in CORES},
                          "speedup": round(su, 2)}), flush=True)


if __name__ == "__main__":
    main()
