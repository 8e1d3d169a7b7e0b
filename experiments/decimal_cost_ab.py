#!/usr/bin/env python3
"""Measure the cost of the decimal-exact reduction doctrine.

Every float reduction in this repo sums via DECIMAL(28,6) instead of
raw double (queries/_helpers.py) so results are bit-identical under any
partitioning.  The helper's docstring claims "~2x a double sum but
stays inside whole-stage codegen" — this measures the actual ratio at
sf0.1 on three aggregate shapes (ungrouped global sum, low-cardinality
groupBy, high-cardinality groupBy), interleaved A/B/A/B over N rounds
so box drift hits both arms equally.

Run: python experiments/decimal_cost_ab.py   (~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 5


def main() -> None:
    spark = get_spark("cdp-decimal-ab")
    tune(spark)
    ev = load(spark, SF_DIR, "events")
    li = load(spark, SF_DIR, "lineitem")

    double_sum = F.sum("value")
    dec_sum = F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
    li_double = F.sum("l_extendedprice")
    li_dec = F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double")

    shapes = {
        "global": lambda agg: ev.agg(agg.alias("s")),
        "by_type(5)": lambda agg: ev.groupBy("event_type").agg(agg.alias("s")),
        "by_user(~15k)": lambda agg: ev.groupBy("user_id").agg(agg.alias("s")),
        "li_by_orderkey(~1.5M)": None,  # special-cased below
    }

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up both tables
    run(ev.agg(double_sum.alias("s")))
    run(li.agg(li_double.alias("s")))

    for name, mk in shapes.items():
        ta = tb = 0.0
        for _ in range(ROUNDS):
            if name == "li_by_orderkey(~1.5M)":
                ta += run(li.groupBy("l_orderkey").agg(li_double.alias("s")))
                tb += run(li.groupBy("l_orderkey").agg(li_dec.alias("s")))
            else:
                ta += run(mk(double_sum if "li" not in name else li_double))
                tb += run(mk(dec_sum if "li" not in name else li_dec))
        print(
            f"{name:24s} double={ta / ROUNDS:6.3f}s  "
            f"decimal={tb / ROUNDS:6.3f}s  ratio={tb / ta:4.2f}x"
        )

    spark.stop()


if __name__ == "__main__":
    main()
