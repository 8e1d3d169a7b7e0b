#!/usr/bin/env python3
"""A/B: LATERAL ORDER BY..LIMIT (decorrelated to partial+final
WindowGroupLimit) vs the explicit window row_number()<=k spelling of
the same per-customer top-2 — quantifies the "map-side group-limit
pruning beats rank-after-shuffle" claim in SCALE.md.

Both spellings produce identical rows (asserted); interleaved timing
over N rounds.  The structural difference: the lateral plan's PARTIAL
WindowGroupLimit caps each map task's output at k rows per group
BEFORE the exchange, while the window spelling shuffles every order
row and ranks afterwards.  At sf0.1 the fixture is small enough that
the delta is mostly the avoided sort amplification; the shuffle-volume
ratio is the number that scales.

Run: python experiments/lateral_grouplimit_ab.py   (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 5


def main() -> None:
    spark = get_spark("cdp-lateral-ab")
    tune(spark)
    load(spark, SF_DIR, "customer").createOrReplaceTempView("ab_customer")
    load(spark, SF_DIR, "orders").createOrReplaceTempView("ab_orders")

    def lateral():
        return spark.sql(
            """
            SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            FROM ab_customer c, LATERAL (
                SELECT o_orderkey, o_totalprice FROM ab_orders o
                WHERE o.o_custkey = c.c_custkey
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
            ) t
            WHERE c.c_mktsegment = 'BUILDING'
            """
        )

    def window():
        o = load(spark, SF_DIR, "orders")
        c = load(spark, SF_DIR, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        ).select(F.col("c_custkey"))
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), "o_orderkey"
        )
        ranked = (
            o.select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
        )
        return c.join(
            ranked, c["c_custkey"] == ranked["o_custkey"]
        ).select("c_custkey", "o_orderkey", "o_totalprice")

    a = {tuple(r) for r in lateral().collect()}
    b = {tuple(r) for r in window().collect()}
    assert a == b and len(a) > 0, (len(a), len(b))
    print(f"identical result sets: {len(a)} rows")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(lateral())  # warm-up
    ta = tb = 0.0
    for _ in range(ROUNDS):
        ta += run(lateral())
        tb += run(window())
    print(
        f"lateral(WindowGroupLimit)={ta / ROUNDS:6.3f}s  "
        f"window(row_number<=2)={tb / ROUNDS:6.3f}s  "
        f"ratio={tb / ta:4.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
