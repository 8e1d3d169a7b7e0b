#!/usr/bin/env python3
"""r12: udf_cogroup_merge — batch the per-group Python boundary.

r11 measured ~3.4 s clean for 15k per-group pandas calls (~1.5 ms each:
two pandas DataFrame constructions + one result frame per key).  The
cogrouped-map rung stays (both sides shuffled on the key, Python sees
both per-key frames simultaneously), but the per-group payload moves
from pandas to Arrow: ``applyInArrow`` hands each group a pair of
pyarrow.Tables, whose construction is a buffer slice instead of a
BlockManager build.

This script checks exact result equality old-vs-new on sf0.1 and runs
an interleaved perf A/B.

Run: python experiments/opt_r12_cogroup_ab.py [--perf-only|--correct-only]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 5


def old_df(spark):
    from covid_data_pipeline_spark.queries.udfs import (
        _COGROUP_SCHEMA,
        _cogroup_merge,
    )

    tune(spark)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    o = load(spark, SF_DIR, "orders").select("o_custkey", "o_orderdate")
    e = load(spark, SF_DIR, "events").select("user_id", "ts")
    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(_cogroup_merge, schema=_COGROUP_SCHEMA)
    )


def _cogroup_merge_arrow(key, orders_t, events_t):
    import pyarrow as pa
    import pyarrow.compute as pc

    n_orders = orders_t.num_rows
    n_events = events_t.num_rows
    if n_orders:
        last_dom = pc.max(orders_t.column("o_orderdate")).as_py().day
        if n_events:
            after = pc.sum(
                pc.greater(pc.day(events_t.column("ts")), last_dom)
            ).as_py()
            n_after = int(after) if after is not None else 0
        else:
            n_after = 0
    else:
        n_after = None
    return pa.table(
        {
            "cust_id": pa.array([key[0].as_py() if hasattr(key[0], "as_py") else key[0]], pa.int64()),
            "n_orders": pa.array([n_orders], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "n_after_last_dom": pa.array([n_after], pa.int64()),
        }
    )


def new_df(spark):
    tune(spark)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    o = load(spark, SF_DIR, "orders").select("o_custkey", "o_orderdate")
    e = load(spark, SF_DIR, "events").select("user_id", "ts")
    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInArrow(
            _cogroup_merge_arrow,
            schema="cust_id long, n_orders long, n_events long, n_after_last_dom long",
        )
    )


def main() -> None:
    spark = get_spark("opt-r12-cogroup-ab")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    ok = True
    if "--perf-only" not in args:
        spark.sparkContext.setJobDescription("cogroup: correctness")
        a = {tuple(r) for r in old_df(spark).collect()}
        b = {tuple(r) for r in new_df(spark).collect()}
        only_a, only_b = a - b, b - a
        print(f"old rows={len(a)} new rows={len(b)} only_old={len(only_a)} only_new={len(only_b)}")
        for r in list(only_a)[:5]:
            print("  only_old:", r)
        for r in list(only_b)[:5]:
            print("  only_new:", r)
        ok = not only_a and not only_b
        print(f"CORRECTNESS: {'PASS' if ok else 'FAIL'}")
    if "--correct-only" not in args:
        spark.sparkContext.setJobDescription("cogroup: perf A/B")
        arms = {"old pandas": old_df, "new arrow": new_df}
        for fn in arms.values():  # warm
            fn(spark).write.format("noop").mode("overwrite").save()
        tot = {k: [] for k in arms}
        for _ in range(ROUNDS):
            for k, fn in arms.items():
                t0 = time.perf_counter()
                fn(spark).write.format("noop").mode("overwrite").save()
                tot[k].append(time.perf_counter() - t0)
        for k, ts in tot.items():
            ts.sort()
            print(f"{k:12s} med={ts[len(ts)//2]:6.3f}s  min={ts[0]:6.3f}  max={ts[-1]:6.3f}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
