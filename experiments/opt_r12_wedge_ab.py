#!/usr/bin/env python3
"""Interleaved A/B of the _knn_edges pre-join repartition at sf0.1:
run the full graph_knn_triangles census with and without the
repartition(par, "c") ALTERNATING in one session (guide §1), so GC/JIT/
page-cache drift hits both arms equally.
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
ROUNDS = 15


def knn_edges(spark, repart: bool):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    if repart:
        sc = sc.repartition(spark.sparkContext.defaultParallelism, "c")
    a = sc.select(F.col("s").alias("s1"), "c")
    b = sc.select(F.col("s").alias("s2"), "c")
    proj = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
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


def census(spark, repart: bool):
    edges = knn_edges(spark, repart).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


def main():
    spark = get_spark("opt-r12-wedge-ab")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)
    # warm-up both arms once
    for arm in (False, True):
        census(spark, arm).write.format("noop").mode("overwrite").save()

    t = {False: [], True: []}
    for r in range(ROUNDS):
        for arm in (False, True):
            spark.sparkContext.setJobDescription(
                f"census {'repart' if arm else 'plain'} r{r}"
            )
            t0 = time.perf_counter()
            census(spark, arm).write.format("noop").mode("overwrite").save()
            t[arm].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for arm in (False, True):
        xs = sorted(t[arm])
        print(
            f"{'repart' if arm else 'plain ':6s} med={statistics.median(xs):6.3f}"
            f" min={xs[0]:6.3f} max={xs[-1]:6.3f}  all={[round(x,2) for x in t[arm]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
