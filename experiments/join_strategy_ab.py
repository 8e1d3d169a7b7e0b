#!/usr/bin/env python3
"""Measure the join-strategy crossover: broadcast-hash vs shuffle-hash
vs sort-merge on the same fact join as the build side grows — the
decision AQE + autoBroadcastJoinThreshold make automatically, here
measured so the SCALE.md join policies carry numbers instead of folklore.

Fact side: lineitem at sf0.1 (600k rows).  Build side: the orders table
sampled (deterministic modulo on o_orderkey) to ~1k / ~15k / ~150k rows,
then WIDENED past the fixture (x10 / x50 = 1.5M / 7.5M rows) by salting
the key space on BOTH sides — build key' = key*W + i, fact key' = key*W
+ (key-hash % W) — so the build side grows without join fan-out (output
row count is unchanged; only the hash-map / sort / broadcast volume
scales).  Joined on the salted key with each strategy FORCED via join
hints, then a count(*)+sum aggregate so the join executes.  Each (size,
strategy) cell is the median of 3 runs.

Expected shape (the numbers verify it): broadcast wins while the build
side ships cheaply to every task and stays out of the shuffle entirely;
shuffle-hash beats sort-merge when the build side fits a task hash map
(no sort on either side); sort-merge wins only when both sides are too
big to hash — on a 1000-executor cluster the same crossovers move with
executor memory, not with this box, but their ORDER is the portable
fact.

Run: python experiments/join_strategy_ab.py   (~3 min, local[32])
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODS = (150, 10, 1)  # orders sampled ~1/150, ~1/10, full
HINTS = ("BROADCAST", "SHUFFLE_HASH", "MERGE")
RUNS = 3


def main() -> None:
    spark = get_spark("join-strategy-ab")
    tune(spark)
    # measure the strategies themselves, not AQE's re-planning of them
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li.cache().count()

    print(f"# sf_dir={SF_DIR}  lineitem={li.count()} rows")
    print("# build_rows  strategy  median_s  (3 runs)")

    def bench_cell(fact, dim, n_dim):
        for hint in HINTS:
            times = []
            for _ in range(RUNS):
                t = time.time()
                (
                    fact.join(dim.hint(hint), fact.jk == dim.jk)
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("l_quantity").alias("s"),
                    )
                    .collect()
                )
                times.append(time.time() - t)
            med = statistics.median(times)
            print(f"{n_dim:>11} {hint:>12} {med:>9.3f}", flush=True)
            print(json.dumps({
                "build_rows": n_dim, "strategy": hint,
                "median_s": round(med, 3),
            }), flush=True)

    fact1 = li.withColumn("jk", F.col("l_orderkey"))
    for mod in MODS:
        dim = orders.filter(F.col("o_orderkey") % mod == 0).withColumn(
            "jk", F.col("o_orderkey")
        )
        dim.cache()
        bench_cell(fact1, dim, dim.count())
        dim.unpersist()

    # widen past the fixture: salt the key space on both sides (no
    # fan-out — each fact row matches exactly one salted build row)
    for w in (10, 50):
        dim = (
            orders.select(
                F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("i"),
                "o_orderkey",
                "o_custkey",
            )
            .withColumn("jk", F.col("o_orderkey") * w + F.col("i"))
        )
        dim.cache()
        factw = li.withColumn(
            "jk",
            F.col("l_orderkey") * w
            + F.pmod(F.xxhash64("l_orderkey"), F.lit(w)),
        )
        bench_cell(factw, dim, dim.count())
        dim.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
