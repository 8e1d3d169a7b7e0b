#!/usr/bin/env python3
"""Decompose sim_pq_adc_rerank at sf0.1 (guide §1): the corpus is only
2000 vectors (32k subvector rows), so ~9 s is machinery, not flops.
Time each pipeline stage in isolation and report per-stage wall plus
the job count it schedules.
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
from covid_data_pipeline_spark.queries.llm_similarity import (  # noqa: E402
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _PQ_MOD,
    _PQ_MULT,
    _PQ_NQ,
    _PQ_SUB,
    _PQ_TOPK,
    _l2,
    _norm,
    _vec,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self, spark):
        self.spark = spark
        self.t0 = time.perf_counter()
        self.jobs0 = self._next_job_id()

    def _next_job_id(self):
        v = self.spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    def lap(self, label):
        t = time.perf_counter()
        j = self._next_job_id()
        print(f"{label:38s} {t - self.t0:7.3f}s  jobs+{j - self.jobs0}")
        self.t0 = t
        self.jobs0 = j


def run(spark, rep):
    tm = T(spark)
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", _vec("embedding").alias("vec")
    )
    en = (
        e.select("vec_id", "vec", _norm("vec").alias("n0"))
        .select("vec_id", "vec", F.explode(F.array("n0")).alias("n"))
        .select("vec_id", F.transform("vec", lambda x: x / F.col("n")).alias("nvec"))
    )
    subs = en.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice("nvec", s * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
                    )
                    for s in range(_PQ_M)
                ]
            )
        ).alias("sub"),
    ).select("vec_id", F.col("sub.s").alias("s"), F.col("sub.sv").alias("sv"))
    par = spark.sparkContext.defaultParallelism
    en = en.repartition(par, "vec_id").localCheckpoint(eager=False)
    subs = subs.repartition(par, "vec_id").localCheckpoint(eager=False)
    en.write.format("noop").mode("overwrite").save()
    subs.write.format("noop").mode("overwrite").save()
    tm.lap("en+subs checkpoint materialize")

    seed_ids = (
        en.select("vec_id", ((F.col("vec_id") * _PQ_MULT) % _PQ_MOD).alias("h"))
        .orderBy("h", "vec_id")
        .limit(_PQ_K)
        .select(
            "vec_id",
            F.row_number().over(Window.orderBy("h", "vec_id")).alias("code"),
        )
    )
    centroids = subs.join(F.broadcast(seed_ids), "vec_id").select(
        "s", "code", F.col("sv").alias("cv")
    )
    for i in range(_PQ_ITERS):
        assign = subs.join(F.broadcast(centroids), "s").select(
            "vec_id", "s", "sv", _l2("sv", "cv").alias("d"), "code"
        )
        best = assign.groupBy("vec_id", "s").agg(
            F.min(F.struct("d", "code")).alias("b"), F.first("sv").alias("sv")
        ).select("vec_id", "s", F.col("b.code").alias("code"), "sv")
        dim_means = best.select(
            "s", "code", F.posexplode("sv").alias("pos", "x")
        ).groupBy("s", "code", "pos").agg(
            (
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                / F.count("x")
            ).alias("m")
        )
        centroids = dim_means.groupBy("s", "code").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda st: st.getField("m"),
            ).alias("cv")
        )
    rows = centroids.collect()
    tm.lap(f"train {_PQ_ITERS} rounds + collect")

    book = spark.createDataFrame(
        [(r["s"], r["code"], r["cv"]) for r in rows],
        "s int, code int, cv array<double>",
    )
    codes = (
        subs.join(F.broadcast(book), "s")
        .select("vec_id", "s", _l2("sv", "cv").alias("d"), "code")
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "code")).alias("b"))
        .select("vec_id", "s", F.col("b.code").alias("code"))
    )
    codes.write.format("noop").mode("overwrite").save()
    tm.lap("encode corpus (noop)")

    adc = (
        subs.filter(F.col("vec_id") < _PQ_NQ)
        .select(F.col("vec_id").alias("query_id"), "s", F.col("sv").alias("qsv"))
        .join(F.broadcast(book), "s")
        .select("query_id", "s", "code", _l2("qsv", "cv").alias("pd"))
    )
    n_corpus = en.count()
    tm.lap("n_corpus count")
    shortlist = max(50, (n_corpus + 9) // 10)
    cand = (
        codes.join(F.broadcast(adc), ["s", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd").alias("adc_dist"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        cand.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    short.write.format("noop").mode("overwrite").save()
    tm.lap("adc+cand+shortlist (noop)")

    nv = en.select(F.col("vec_id").alias("neighbor_id"), F.col("nvec").alias("c_vec"))
    qv = en.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("nvec").alias("q_vec")
    )
    from covid_data_pipeline_spark.queries.llm_similarity import _dot

    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    out = (
        short.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("q_vec", "c_vec"), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _PQ_TOPK)
    )
    out.write.format("noop").mode("overwrite").save()
    tm.lap("rerank (noop, incl. upstream)")


def main():
    spark = get_spark("opt-r12-pq-decompose")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)
    for rep in range(3):
        print(f"--- rep {rep}")
        run(spark, rep)
    spark.stop()


if __name__ == "__main__":
    main()
