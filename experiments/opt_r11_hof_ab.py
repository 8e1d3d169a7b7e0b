#!/usr/bin/env python3
"""A/B: interpreted HOF dot/norm (zip_with+aggregate fold) vs unrolled
64-term codegen sum with IDENTICAL left-fold IEEE order, on the
sim_cosine_pairs shape; crossed with probe-side repartition.  Also
verifies the variants return bit-identical rows (exceptAll both ways).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.io import load, tune
from covid_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = 0.25
DIM = 64


def t(label, df, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"{label:48s} med={times[len(times)//2]:7.3f} min={times[0]:7.3f} max={times[-1]:7.3f}")


def vec(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_hof(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def dot_unrolled(a, b):
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    acc = F.lit(0.0)
    for i in range(DIM):
        acc = acc + a[i] * b[i]
    return acc


def main():
    spark = get_spark("opt-hof-ab")
    tune(spark)
    e = load(spark, SF_DIR, "embeddings")

    def pairs_df(dot, norm_per_row, repart):
        base = e.select("vec_id", "label", vec("embedding").alias("v"))
        if repart:
            base = base.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        if norm_per_row:
            base = base.select("vec_id", "label", "v", F.sqrt(dot("v", "v")).alias("nrm"))
            a = base.select(F.col("vec_id").alias("a_id"), "label",
                            F.col("v").alias("a_vec"), F.col("nrm").alias("a_n"))
            b = base.select(F.col("vec_id").alias("b_id"), "label",
                            F.col("v").alias("b_vec"), F.col("nrm").alias("b_n"))
            cos = dot("a_vec", "b_vec") / (F.col("a_n") * F.col("b_n"))
        else:
            a = base.select(F.col("vec_id").alias("a_id"), "label", F.col("v").alias("a_vec"))
            b = base.select(F.col("vec_id").alias("b_id"), "label", F.col("v").alias("b_vec"))
            cos = dot("a_vec", "b_vec") / (
                F.sqrt(dot("a_vec", "a_vec")) * F.sqrt(dot("b_vec", "b_vec"))
            )
        return (
            a.join(b, on="label")
            .filter(F.col("a_id") < F.col("b_id"))
            .withColumn("cos_raw", cos)
            .filter(F.col("cos_raw") > THRESH)
            .select("a_id", "b_id", "label", F.round("cos_raw", 6).alias("cosine"))
        )

    committed = pairs_df(dot_hof, False, False)
    t("warmup", committed.limit(1), reps=1)

    t("A. committed: HOF, per-pair norms, no repart", committed)
    t("B. HOF, per-row norms, no repart", pairs_df(dot_hof, True, False))
    t("C. HOF, per-row norms, repart", pairs_df(dot_hof, True, True))
    t("D. unrolled, per-pair norms, no repart", pairs_df(dot_unrolled, False, False))
    t("E. unrolled, per-row norms, no repart", pairs_df(dot_unrolled, True, False))
    t("F. unrolled, per-row norms, repart", pairs_df(dot_unrolled, True, True))

    best = pairs_df(dot_unrolled, True, True)
    diff = committed.exceptAll(best).count() + best.exceptAll(committed).count()
    print("A-vs-F symmetric diff rows:", diff, "(must be 0)")
    print("rows:", best.count())
    spark.stop()


if __name__ == "__main__":
    main()
