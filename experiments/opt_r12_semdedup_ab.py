#!/usr/bin/env python3
"""dedup_semdedup_kmeans argmin-rewrite A/B at sf0.1, interleaved in one
session (guide §1): OLD = 16x broadcast-join blowup + groupBy(vec_id)
min(struct) argmin + two-level posexplode means; NEW = map-side
array_min over the collected candidate array + one groupBy(cid) with 64
decimal-sum buffers.  Exactness asserted (identical output rows).  Both
arms use the same _corpus_par width so the A/B isolates the argmin/means
rewrite itself.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402
from covid_data_pipeline_spark.queries.llm_similarity import (  # noqa: E402
    _DUP_OFFSET_1,
    _DUP_OFFSET_2,
    _DUP_SEED_MOD,
    _EMB_DIM,
    _PQ_MOD,
    _PQ_MULT,
    _SEM_ITERS,
    _SEM_K,
    _corpus_par,
    _dot,
    _l2,
    _norm,
    _vec,
)
from covid_data_pipeline_spark.queries.llm_similarity import DUP_COSINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 7


def semdedup(spark, new: bool):
    base = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", _vec("embedding").alias("vec")
    )
    seed = base.filter(F.col("vec_id") % _DUP_SEED_MOD == 0)

    def scaled(offset, factor):
        return seed.select(
            (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
            "label",
            F.transform("vec", lambda x: x * F.lit(factor)).alias("vec"),
        )

    e = base.unionByName(scaled(_DUP_OFFSET_1, 2.0)).unionByName(
        scaled(_DUP_OFFSET_2, 3.0)
    )
    en = (
        e.select("vec_id", "vec", _norm("vec").alias("n0"))
        .select("vec_id", "vec", F.explode(F.array("n0")).alias("n"))
        .select("vec_id", F.transform("vec", lambda x: x / F.col("n")).alias("nvec"))
    )
    par = _corpus_par(spark, SF_DIR)
    en = en.repartition(par, "vec_id").localCheckpoint(eager=False)
    seeds = (
        en.select("vec_id", ((F.col("vec_id") * _PQ_MULT) % _PQ_MOD).alias("h"))
        .orderBy("h", "vec_id")
        .limit(_SEM_K)
        .select(
            "vec_id",
            F.row_number().over(Window.orderBy("h", "vec_id")).alias("cid"),
        )
    )
    cent = en.join(F.broadcast(seeds), "vec_id").select(
        "cid", F.col("nvec").alias("cv")
    )

    def nearest(cands, vcol):
        return F.array_min(
            F.transform(
                cands,
                lambda c: F.struct(
                    _l2(vcol, c.getField("cv")).alias("d"),
                    c.getField("cid").alias("cid"),
                ),
            )
        ).getField("cid")

    mean_cv = F.array(
        *[
            (
                F.sum(F.col("nvec")[i].cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            )
            for i in range(_EMB_DIM)
        ]
    )
    for _ in range(_SEM_ITERS):
        if new:
            cands = cent.agg(F.collect_list(F.struct("cid", "cv")).alias("cands"))
            best = en.crossJoin(F.broadcast(cands)).select(
                "vec_id", "nvec", nearest(F.col("cands"), "nvec").alias("cid")
            )
            cent = best.groupBy("cid").agg(mean_cv.alias("cv"))
        else:
            asg = en.crossJoin(F.broadcast(cent)).select(
                "vec_id", "nvec", _l2("nvec", "cv").alias("d"), "cid"
            )
            best = asg.groupBy("vec_id").agg(
                F.min(F.struct("d", "cid")).alias("b"),
                F.first("nvec").alias("nvec"),
            ).select("vec_id", F.col("b.cid").alias("cid"), "nvec")
            cent = (
                best.select("cid", F.posexplode("nvec").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(
                    (
                        F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                        / F.count("x")
                    ).alias("m")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "m"))),
                        lambda s: s.getField("m"),
                    ).alias("cv")
                )
            )
    book = spark.createDataFrame(
        [(r["cid"], r["cv"]) for r in cent.collect()], "cid int, cv array<double>"
    )
    if new:
        book_arr = book.agg(F.collect_list(F.struct("cid", "cv")).alias("cands"))
        clustered = en.crossJoin(F.broadcast(book_arr)).select(
            "vec_id", "nvec", nearest(F.col("cands"), "nvec").alias("cid")
        )
    else:
        asg = en.crossJoin(F.broadcast(book)).select(
            "vec_id", "nvec", _l2("nvec", "cv").alias("d"), "cid"
        )
        clustered = (
            asg.groupBy("vec_id")
            .agg(F.min(F.struct("d", "cid")).alias("b"), F.first("nvec").alias("nvec"))
            .select("vec_id", F.col("b.cid").alias("cid"), "nvec")
        )
    a = clustered.select(
        F.col("vec_id").alias("a_id"), "cid", F.col("nvec").alias("a_vec")
    )
    b = clustered.select(
        F.col("vec_id").alias("b_id"), "cid", F.col("nvec").alias("b_vec")
    )
    pairs = (
        a.join(b, "cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(_dot("a_vec", "b_vec") > DUP_COSINE)
        .select("a_id", "b_id")
    )
    return pairs.groupBy(F.col("b_id").alias("dup_id")).agg(
        F.min("a_id").alias("canon_id")
    )


def main():
    spark = get_spark("opt-r12-semdedup-ab")
    tune(spark)
    print(f"# load1m: {os.getloadavg()[0]:.2f}", file=sys.stderr)

    ref = sorted(tuple(r) for r in semdedup(spark, False).collect())
    got = sorted(tuple(r) for r in semdedup(spark, True).collect())
    assert got == ref, "new arm diverged"
    print(f"# exactness: new == old on all {len(ref)} rows")

    t = {False: [], True: []}
    for r in range(ROUNDS):
        for arm in (False, True):
            spark.sparkContext.setJobDescription(
                f"semdedup {'new' if arm else 'old'} r{r}"
            )
            t0 = time.perf_counter()
            semdedup(spark, arm).write.format("noop").mode("overwrite").save()
            t[arm].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for arm in (False, True):
        xs = sorted(t[arm])
        print(
            f"{'new' if arm else 'old'} med={statistics.median(xs):6.3f}"
            f" min={xs[0]:6.3f} max={xs[-1]:6.3f}  all={[round(x, 2) for x in t[arm]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
