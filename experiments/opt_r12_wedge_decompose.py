#!/usr/bin/env python3
"""Decompose the graph wedge family's shared prefix (_knn_edges) at sf0.1
(guide §1): time each stage in isolation with the noop sink, count rows,
and A/B candidate rewrites of the co-purchase projection.

Stages:
  sc      = (lineitem ⋈ orders).select(s,c).distinct()
  proj    = sc self-join on c, s1<s2, groupBy(s1,s2).count
  knn     = full _knn_edges (window top-k + symmetrize + distinct)
  query   = graph_knn_triangles end to end

Variants of proj:
  A (current)  self-join on c
  B            repartition(par, c) both sides before the join
  C            groupBy(c).collect_list + explode pairs map-side (HOF)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def bench(spark, name, make_df):
    times = []
    for rep in range(REPS):
        spark.sparkContext.setJobDescription(f"{name} rep{rep}")
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    times.sort()
    print(
        f"{name:34s} med={statistics.median(times):7.3f}"
        f" min={times[0]:7.3f} max={times[-1]:7.3f}"
    )
    return statistics.median(times)


def sc_frame(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )


def proj_a(spark):
    sc = sc_frame(spark)
    a = sc.select(F.col("s").alias("s1"), "c")
    b = sc.select(F.col("s").alias("s2"), "c")
    return (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def proj_b(spark):
    par = spark.sparkContext.defaultParallelism
    sc = sc_frame(spark).repartition(par, "c")
    a = sc.select(F.col("s").alias("s1"), "c")
    b = sc.select(F.col("s").alias("s2"), "c")
    return (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def proj_c(spark):
    par = spark.sparkContext.defaultParallelism
    sc = sc_frame(spark)
    lists = (
        sc.repartition(par, "c")
        .groupBy("c")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ss",
                    lambda x, i: F.transform(
                        F.slice("ss", i + 2, F.size("ss")),
                        lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2")).agg(
        F.count(F.lit(1)).alias("shared")
    )


def knn_from_proj(proj):
    directed = proj.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst"), "shared"
    ).unionByName(
        proj.select(F.col("s2").alias("src"), F.col("s1").alias("dst"), "shared")
    )
    w = Window.partitionBy("src").orderBy(F.col("shared").desc(), "dst")
    knn = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("src", "dst")
    )
    return knn.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


def main():
    spark = get_spark("opt-r12-wedge")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    # warm-up
    sc_frame(spark).write.format("noop").mode("overwrite").save()

    # volumes
    sc = sc_frame(spark)
    n_sc = sc.count()
    n_cust = sc.select("c").distinct().count()
    n_proj = proj_a(spark).count()
    wedge_rows = sc.groupBy("c").count().agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)
    ).collect()[0][0]
    print(f"# sc rows={n_sc}, customers={n_cust}, proj pairs={n_proj}, wedge rows={wedge_rows}")

    bench(spark, "sc (join+distinct)", lambda: sc_frame(spark))
    bench(spark, "proj A: self-join (current)", lambda: proj_a(spark))
    bench(spark, "proj B: repartition+self-join", lambda: proj_b(spark))
    bench(spark, "proj C: collect_list+HOF pairs", lambda: proj_c(spark))
    bench(spark, "knn A (current full)", lambda: knn_from_proj(proj_a(spark)))
    bench(spark, "knn C", lambda: knn_from_proj(proj_c(spark)))

    # sanity: identical pair multisets A vs C
    diff = (
        proj_a(spark).exceptAll(proj_c(spark)).count()
        + proj_c(spark).exceptAll(proj_a(spark)).count()
    )
    print(f"# A-vs-C exceptAll diff rows: {diff}")
    spark.stop()


if __name__ == "__main__":
    main()
