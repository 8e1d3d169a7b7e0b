#!/usr/bin/env python3
"""A/B/C the skew-join strategies, to put measured numbers on the
recommendation join_skew_salted's docstring makes without evidence
("with AQE on, prefer skewJoin.enabled and keep joins unsalted"):

  arm A (AQE skew split): plain join, spark.sql.adaptive.skewJoin on
                          with thresholds scaled to this box (the same
                          scaling tests/test_plans.py uses — production
                          defaults assume 256 MB partitions).
  arm B (no mitigation):  plain join, skew split disabled — the
                          straggler baseline.
  arm C (manual salting): the join_skew_salted rewrite (8 salt buckets,
                          build side replicated 8x).

Corpus: synthetic fact of N rows where a single hot key owns a swept
share (10% / 50% / 90%), joined to a 100k-row dim, aggregated to one
row.  All three arms must produce the identical aggregate (asserted).
Every row carries a 64-byte payload so a skewed partition is
byte-heavy, not just row-heavy.

Run: python experiments/skew_join_ab.py   (~3 min, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from covid_data_pipeline_spark.session import get_spark  # noqa: E402

N_FACT = 24_000_000
N_DIM = 100_000
SALT = 8
SHARES = (0.1, 0.5, 0.9)
HOT_KEY = 7


def build(spark, share: float) -> tuple[DataFrame, DataFrame]:
    fact = spark.range(N_FACT).select(
        F.when(
            (F.col("id") % 100) < int(share * 100), F.lit(HOT_KEY)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
        F.repeat(F.lit("x"), 64).alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("dk"), (F.col("id") % 13).alias("w")
    )
    return fact, dim


def agg(joined: DataFrame) -> list:
    return (
        joined.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("vw"),
        )
        .collect()
    )


def arm_plain(fact, dim) -> list:
    # no join hint: a merge hint measured ~2x slower by pinning SMJ
    # where AQE would pick a shuffled hash join
    return agg(fact.join(dim, fact["k"] == dim["dk"]))


def arm_salted(fact, dim, spark) -> list:
    sf = fact.withColumn("salt", F.pmod(F.xxhash64("k", "v"), F.lit(SALT)))
    salts = spark.range(SALT).select(F.col("id").alias("salt"))
    sd = dim.crossJoin(salts)
    j = sf.join(
        sd, (sf["k"] == sd["dk"]) & (sf["salt"] == sd["salt"])
    )
    return agg(j)


def main() -> None:
    spark = get_spark("skew-ab")
    # scale AQE's skew thresholds to this box (prod defaults assume
    # 256 MB partitions); same approach as tests/test_plans.py
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", str(1 << 20)
    )
    # THE gating conf (measured): without also scaling advisory
    # partition size, OptimizeSkewedJoin never fires at this data size
    # and the "AQE arm" silently degenerates to no-mitigation
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(1 << 20)
    )
    # keep the dim out of broadcast range so the join actually shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # warm-up: one untimed join absorbs codegen/Python-worker start-up
    # (the bench discipline BASELINE.md documents)
    wf, wd = build(spark, 0.5)
    agg(wf.sample(0.05, seed=1).join(wd, wf["k"] == wd["dk"]))
    print(f"# skew-join A/B/C: {N_FACT} fact rows, {N_DIM} dim rows, 64B payload")
    print(f"{'hot%':>5} {'aqe_skew_s':>10} {'no_mitig_s':>10} {'salted_s':>9}")
    for share in SHARES:
        fact, dim = build(spark, share)
        results, times = [], []
        for mode in ("aqe", "off", "salt"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if mode == "aqe" else "false",
            )
            t0 = time.perf_counter()
            r = (
                arm_salted(fact, dim, spark)
                if mode == "salt"
                else arm_plain(fact, dim)
            )
            times.append(time.perf_counter() - t0)
            results.append(tuple(r[0]))
        assert results[0] == results[1] == results[2], results
        print(
            f"{int(share * 100):>5} {times[0]:>10.2f} {times[1]:>10.2f} "
            f"{times[2]:>9.2f}"
        )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
