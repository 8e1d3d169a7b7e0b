#!/usr/bin/env python3
"""Optimization-round profiler (guide §1): isolate queries with the noop
sink, time N reps after a warm-up, and dump .explain("formatted") to
plans/r12/<name>_<tag>.txt.

Usage:
    python experiments/opt_r12_profile.py [--tag before] [--reps 3] q1 q2 ...
    python experiments/opt_r12_profile.py --top N          # N most expensive from BENCH_FULL.json

Prints one line per query: median / min / max over reps, plus Exchange
count and Python-eval node count parsed from the formatted plan.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        bf = json.load(open(os.path.join(os.path.dirname(PLANS_DIR), "..", "BENCH_FULL.json")))
        names += [
            n
            for n, _ in sorted(bf["queries"].items(), key=lambda kv: -kv[1])[: args.top]
            if n not in names
        ]

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("opt-r12-profile")
    reg = load_all()
    print(f"# load1m at start: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    # warm-up: JVM/codegen/parquet-footer + python worker pool
    from pyspark.sql import functions as F

    reg["agg_groupby"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.range(1000).select(
        F.pandas_udf(lambda s: s + 1, "long")("id").alias("x")
    ).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        spec = reg[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        if not args.no_plans:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        else:
            plan = ""
        times.sort()
        med = times[len(times) // 2]
        nex = len(re.findall(r"\bExchange\b", plan))
        npy = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas", plan))
        results[name] = round(med, 3)
        print(
            f"{name:40s} med={med:7.3f} min={times[0]:7.3f} max={times[-1]:7.3f}"
            f"  exchanges={nex} python_nodes={npy}"
        )
    print(f"# load1m at end: {os.getloadavg()[0]:.2f}", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
