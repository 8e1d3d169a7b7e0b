#!/usr/bin/env python3
"""graph_pagerank loop restructure A/B at sf0.1 (guide §1, §3.1, §3.3).

The r11 before-plan showed the exponential-lineage problem: pr_{k+1}
references pr_k TWICE (inside contrib and as the update join's left
side), so pr_0's subtree is replayed 2^ITERS times, each replay
re-running edges-sized SortMergeJoins (50 ExistingRDD scans in the
static plan).  Variants:

  A (current)  pairs lazily checkpointed; loop as in source
  B            + per-iteration pr localCheckpoint(eager=False)
               (kills the 2^k replay; plan is linear in ITERS)
  C            B + broadcast(pr)/broadcast(deg) in contrib
               (node-sized vectors broadcast; edges never shuffled)
  D            C + edges repartition(par,"dst")+checkpoint
               (groupBy(dst) reuses the partitioning; one exchange total)

Exactness: contrib's sum is the quantized decimal(38,0) integer sum
(order-free) and every join is an equi-join whose strategy cannot
change the row multiset, so all variants must produce the identical
top-20 — asserted by collecting and comparing against A.
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
from covid_data_pipeline_spark.queries.tpch_extra import (  # noqa: E402
    _PR_CUST_OFFSET,
    _PR_DAMP,
    _PR_ITERS,
    _PR_Q,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 7


def pagerank(spark, variant: str):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("s").alias("src"), (F.col("c") + _PR_CUST_OFFSET).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("c") + _PR_CUST_OFFSET).alias("src"), F.col("s").alias("dst")
        )
    )
    if variant == "D":
        par = spark.sparkContext.defaultParallelism
        edges = edges.repartition(par, "dst").localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "id", "n", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    q = float(_PR_Q)
    bcast = variant in ("C", "D")
    for _ in range(_PR_ITERS):
        pr_side = pr.select(F.col("id").alias("src"), "pr")
        deg_side = deg
        if bcast:
            pr_side = F.broadcast(pr_side)
            deg_side = F.broadcast(deg_side)
        contrib = (
            edges.join(pr_side, "src")
            .join(deg_side, "src")
            .groupBy("dst")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("pr") / F.col("deg") * q + 0.5).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    / q
                ).alias("mass")
            )
        )
        pr = (
            pr.select("id", "n")
            .join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "n",
                (
                    (1 - _PR_DAMP) / F.col("n")
                    + _PR_DAMP * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        if variant in ("B", "C", "D"):
            pr = pr.localCheckpoint(eager=False)
    out = pr.select(
        F.col("id").alias("node_id"),
        F.floor(F.col("pr") * q + 0.5).alias("pr_q"),
    )
    return out.orderBy(F.col("pr_q").desc(), "node_id").limit(20)


def main():
    spark = get_spark("opt-r12-pagerank-ab")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    # exactness gate first: every variant's rows == A's
    ref = [tuple(r) for r in pagerank(spark, "A").collect()]
    for v in ("B", "C", "D"):
        got = [tuple(r) for r in pagerank(spark, v).collect()]
        assert got == ref, f"variant {v} diverged: {got[:3]} vs {ref[:3]}"
    print(f"# exactness: B/C/D == A on all 20 rows")

    t = {v: [] for v in "ABCD"}
    for r in range(ROUNDS):
        for v in "ABCD":
            spark.sparkContext.setJobDescription(f"pagerank {v} r{r}")
            t0 = time.perf_counter()
            pagerank(spark, v).write.format("noop").mode("overwrite").save()
            t[v].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for v in "ABCD":
        xs = sorted(t[v])
        print(
            f"{v} med={statistics.median(xs):6.3f} min={xs[0]:6.3f}"
            f" max={xs[-1]:6.3f}  all={[round(x, 2) for x in t[v]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
