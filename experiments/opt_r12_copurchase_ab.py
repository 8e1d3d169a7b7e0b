#!/usr/bin/env python3
"""analytics_copurchase_lift pre-checkpoint repartition A/B at sf0.1.

Same single-file trap as the r11 dedup/similarity fixes and this
round's _knn_edges: the checkpointed distinct inherits the scan's 1-2
partitions, so the pair self-join (the quadratic stage) enumerates on
those few cores.  Hash-partitioning by l_orderkey is exactly the
self-join's requirement, so both aliased sides reuse the one exchange.

Arms interleaved in one session (guide §1):
  plain   .distinct().localCheckpoint(eager=False)          (current)
  repart  .distinct().repartition(par, "l_orderkey").localCheckpoint(...)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402
from covid_data_pipeline_spark.queries.pipeline import (  # noqa: E402
    _BASKET_MIN_SUPPORT,
    _BASKET_TOPK,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 9


def lift(spark, repart: bool):
    op = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").distinct()
    if repart:
        op = op.repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    op = op.localCheckpoint(eager=False)
    n = op.select(F.countDistinct("l_orderkey").alias("n_orders"))
    part_n = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    pa = part_n.select(F.col("l_partkey").alias("p1"), F.col("n_part").alias("na"))
    pb = part_n.select(F.col("l_partkey").alias("p2"), F.col("n_part").alias("nb"))
    return (
        pairs.join(F.broadcast(pa), "p1")
        .join(F.broadcast(pb), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "support",
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(_BASKET_TOPK)
    )


def main():
    spark = get_spark("opt-r12-copurchase-ab")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    ref = [tuple(r) for r in lift(spark, False).collect()]
    got = [tuple(r) for r in lift(spark, True).collect()]
    assert got == ref, f"repart arm diverged: {got[:3]} vs {ref[:3]}"
    print("# exactness: repart == plain on all rows")

    t = {False: [], True: []}
    for r in range(ROUNDS):
        for arm in (False, True):
            spark.sparkContext.setJobDescription(
                f"lift {'repart' if arm else 'plain'} r{r}"
            )
            t0 = time.perf_counter()
            lift(spark, arm).write.format("noop").mode("overwrite").save()
            t[arm].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for arm in (False, True):
        xs = sorted(t[arm])
        print(
            f"{'repart' if arm else 'plain ':6s} med={statistics.median(xs):6.3f}"
            f" min={xs[0]:6.3f} max={xs[-1]:6.3f}  all={[round(x, 2) for x in t[arm]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
