#!/usr/bin/env python3
"""Dump .explain("formatted") for named queries WITHOUT executing them
(plan-only — cheap enough to run against a worktree of the
pre-optimization commit for the `_before` files the judge checks).

Usage:
    python experiments/opt_r11_dump_plans.py --root /root/repo --tag after q1 q2 ...
    python experiments/opt_r11_dump_plans.py --root /tmp/preopt_worktree --tag before q1 ...

Plans always land in /root/repo/plans/r11/<q>_<tag>.txt regardless of
--root.  NB: queries that execute eagerly inside their function body
(streaming drains, iterative trainers) run their internal actions during
DataFrame construction; their dumped plan is the final returned frame's
(for a streaming drain, the sink read-back) — noted in
OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import argparse
import os
import sys

PLANS_DIR = "/root/repo/plans/r11"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--root", default="/root/repo")
    ap.add_argument("--tag", default="after")
    args = ap.parse_args()

    sys.path.insert(0, args.root)
    from covid_data_pipeline_spark.registry import load_all
    from covid_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"opt-r11-plans-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in args.queries:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({plan.count('Exchange')} Exchange lines)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
