#!/usr/bin/env python3
"""Stage-attribution for dedup_near_jaccard (guide §1): time each
sub-plan with the noop sink — tokenize, prefix-explode, candidate join,
pair-dedup, verification — plus A/B variants of the suspect operators
(keys-only distinct vs first(lang) SortAggregate; single-eval intersect
behind a Generate barrier vs inlined 4x)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from covid_data_pipeline_spark.io import load, tune
from covid_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
JT = 0.7


def t(label, df, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"{label:45s} med={times[len(times)//2]:7.3f} min={times[0]:7.3f} max={times[-1]:7.3f}")
    return times[len(times) // 2]


def main():
    spark = get_spark("opt-nj-decompose")
    tune(spark)
    d = load(spark, SF_DIR, "documents")

    tok = d.select(
        "doc_id",
        "lang",
        F.sort_array(
            F.array_distinct(F.transform(F.split("text", " "), lambda tk: F.xxhash64(tk)))
        ).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))

    plen = (F.col("n_toks") - F.floor((F.col("n_toks") * 7 + 9) / 10) + 1).cast("int")
    pe = tok.select(
        "doc_id", "lang", "n_toks", F.posexplode(F.slice("toks", 1, plen)).alias("pos0", "ptok")
    )
    ca = pe.select(
        F.col("doc_id").alias("a_id"), "lang", "ptok",
        F.col("n_toks").alias("a_n"), (F.col("pos0") + 1).alias("ai"),
    )
    cb = pe.select(
        F.col("doc_id").alias("b_id"), "lang", "ptok",
        F.col("n_toks").alias("b_n"), (F.col("pos0") + 1).alias("bj"),
    )
    ratio_ok = (F.col("a_n") * 10 >= F.col("b_n") * 7) & (F.col("b_n") * 10 >= F.col("a_n") * 7)
    ub = (
        F.least(F.col("ai") - 1, F.col("bj") - 1)
        + 1
        + F.least(F.col("a_n") - F.col("ai"), F.col("b_n") - F.col("bj"))
    )
    o_min = F.floor((F.col("a_n") + F.col("b_n")) * 7 / 17) + 1
    matched = ca.join(cb, on=["lang", "ptok"]).filter(
        (F.col("a_id") < F.col("b_id")) & ratio_ok & (ub >= o_min)
    )

    # warm-up
    t("warmup tokenize", tok, reps=1)

    t("1. tokenize only", tok)
    t("2. prefix explode", pe)
    t("3. candidate join (pre-dedup)", matched.select("a_id", "b_id", "lang"))
    print("   candidate rows:", matched.count())

    cand_first = matched.select("a_id", "b_id", "lang").dropDuplicates(["a_id", "b_id"])
    t("4a. pair-dedup via first(lang)", cand_first)
    cand_dist = matched.select("a_id", "b_id", "lang").distinct()
    t("4b. pair-dedup keys-only distinct", cand_dist)
    print("   dedup rows:", cand_dist.count())

    sa = tok.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    sb = tok.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))

    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size("a_toks") + F.size("b_toks") - inter
    jac = inter.cast("double") / union
    full_a = (
        cand_first.join(sa, "a_id").join(sb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") > JT)
        .select("a_id", "b_id", "lang", F.round("jaccard", 6).alias("jaccard"))
    )
    t("5a. FULL query as committed", full_a)

    # B: keys-only distinct + Generate barrier single-eval intersect
    joined = cand_dist.join(sa, "a_id").join(sb, "b_id")
    barrier = joined.select(
        "a_id", "b_id", "lang",
        F.size("a_toks").alias("na"), F.size("b_toks").alias("nb"),
        F.explode(F.array(F.size(F.array_intersect("a_toks", "b_toks")))).alias("inter"),
    )
    jac_b = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    full_b = (
        barrier.withColumn("jaccard", jac_b)
        .filter(F.col("jaccard") > JT)
        .select("a_id", "b_id", "lang", F.round("jaccard", 6).alias("jaccard"))
    )
    t("5b. FULL distinct+barrier", full_b)

    # equality check of the two full variants
    n_sym = full_a.exceptAll(full_b).count() + full_b.exceptAll(full_a).count()
    print("   A-vs-B symmetric diff rows:", n_sym)
    spark.stop()


def variant_c():
    """Parallelized probe side: hash-repartition ca by a_id before the
    candidate join so join+filters+partial-distinct use every core."""
    spark = get_spark("opt-nj-variant-c")
    tune(spark)
    d = load(spark, SF_DIR, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.sort_array(
            F.array_distinct(F.transform(F.split("text", " "), lambda tk: F.xxhash64(tk)))
        ).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    plen = (F.col("n_toks") - F.floor((F.col("n_toks") * 7 + 9) / 10) + 1).cast("int")
    par = spark.sparkContext.defaultParallelism
    pe = tok.repartition(par, "doc_id").select(
        "doc_id", "lang", "n_toks", F.posexplode(F.slice("toks", 1, plen)).alias("pos0", "ptok")
    )
    ca = pe.select(
        F.col("doc_id").alias("a_id"), "lang", "ptok",
        F.col("n_toks").alias("a_n"), (F.col("pos0") + 1).alias("ai"),
    )
    cb = pe.select(
        F.col("doc_id").alias("b_id"), "lang", "ptok",
        F.col("n_toks").alias("b_n"), (F.col("pos0") + 1).alias("bj"),
    )
    ratio_ok = (F.col("a_n") * 10 >= F.col("b_n") * 7) & (F.col("b_n") * 10 >= F.col("a_n") * 7)
    ub = (
        F.least(F.col("ai") - 1, F.col("bj") - 1)
        + 1
        + F.least(F.col("a_n") - F.col("ai"), F.col("b_n") - F.col("bj"))
    )
    o_min = F.floor((F.col("a_n") + F.col("b_n")) * 7 / 17) + 1
    matched = ca.join(cb, on=["lang", "ptok"]).filter(
        (F.col("a_id") < F.col("b_id")) & ratio_ok & (ub >= o_min)
    )
    t("warmup", tok, reps=1)
    t("3c. candidate join repart (pre-dedup)", matched.select("a_id", "b_id", "lang"))
    cand_dist = matched.select("a_id", "b_id", "lang").distinct()
    t("4c. pair-dedup distinct, repart probe", cand_dist)
    sa = tok.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    sb = tok.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    joined = cand_dist.join(sa, "a_id").join(sb, "b_id")
    barrier = joined.select(
        "a_id", "b_id", "lang",
        F.size("a_toks").alias("na"), F.size("b_toks").alias("nb"),
        F.explode(F.array(F.size(F.array_intersect("a_toks", "b_toks")))).alias("inter"),
    )
    jac_b = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    full_c = (
        barrier.withColumn("jaccard", jac_b)
        .filter(F.col("jaccard") > JT)
        .select("a_id", "b_id", "lang", F.round("jaccard", 6).alias("jaccard"))
    )
    t("5c. FULL repart+distinct+barrier", full_c)
    print("   full_c rows:", full_c.count())
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "c":
        variant_c()
    else:
        main()
