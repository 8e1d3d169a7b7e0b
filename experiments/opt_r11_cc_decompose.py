#!/usr/bin/env python3
"""Stage-attribution for dedup_cluster_cc: simhash -> band edges ->
CC rounds, each timed; prints round count and per-round wall."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.io import load, tune
from covid_data_pipeline_spark.session import get_spark
from covid_data_pipeline_spark.queries.llm_dedup import _simhash, _CC_BAND_MASK, _CC_BAND_BITS

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("opt-cc-decompose")
    tune(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    d = load(spark, SF_DIR, "documents")

    t0 = time.perf_counter()
    sh = _simhash(spark, d)
    sh.write.format("noop").mode("overwrite").save()
    print(f"simhash pass: {time.perf_counter()-t0:.3f}s (warm incl.)")
    t0 = time.perf_counter()
    sh.write.format("noop").mode("overwrite").save()
    print(f"simhash pass (warm): {time.perf_counter()-t0:.3f}s")

    lo = sh.select("doc_id", "lang", F.lit(0).alias("band"),
                   F.expr(f"simhash & {_CC_BAND_MASK}").alias("val"))
    hi = sh.select("doc_id", "lang", F.lit(1).alias("band"),
                   F.shiftright("simhash", _CC_BAND_BITS).alias("val"))
    bands = lo.unionByName(hi)
    gmin = bands.groupBy("lang", "band", "val").agg(F.min("doc_id").alias("root"))
    edges = (
        bands.join(gmin, ["lang", "band", "val"])
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("doc_id").alias("src"), F.col("root").alias("dst"))
        .distinct()
    )
    t0 = time.perf_counter()
    n_edges = edges.count()
    print(f"edges: {time.perf_counter()-t0:.3f}s ({n_edges} edges)")

    # CC loop with per-round timing
    t0 = time.perf_counter()
    sym = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        .union(edges.select(F.col("dst").alias("s"), F.col("src").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    print(f"sym checkpoint: {time.perf_counter()-t0:.3f}s")
    t0 = time.perf_counter()
    labels = d.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("component")
    ).localCheckpoint(eager=True)
    print(f"labels checkpoint: {time.perf_counter()-t0:.3f}s")
    prev_sum = None
    for rnd in range(25):
        t0 = time.perf_counter()
        msgs = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), "component"
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        comp_of = new.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        new = new.join(comp_of, new["component"] == comp_of["c_node"]).select(
            "node", F.col("c_comp").alias("component")
        )
        new = new.localCheckpoint(eager=True)
        cur_sum = new.agg(F.sum("component")).collect()[0][0]
        labels = new
        print(f"round {rnd}: {time.perf_counter()-t0:.3f}s sum={cur_sum}")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    spark.stop()


if __name__ == "__main__":
    main()
