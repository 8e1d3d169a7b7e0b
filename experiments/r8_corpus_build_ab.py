"""A/B evidence for the round-8 flagship claim that composing the
pretraining-data build as ONE fused Catalyst plan beats the naive
orchestration (materialize every stage boundary to parquet and read it
back — what a step-per-task workflow engine does).

Arms, each timed REPS times after a shared warm-up:
  fused   — pipeline_corpus_build as registered (one DAG, no barrier).
  staged  — the same stage semantics with a parquet write+read barrier
            after (1) the clean/langid/quality gates, (2) exact dedup,
            (3) near dedup; funnel aggregates run per stage off the
            materialized snapshots (re-reading each one).

The staged arm is NOT a straw man: per-stage snapshots are what you get
from "one Airflow task per stage", and re-reading them is how its
funnel metrics are actually computed.  The fused arm's win is Catalyst
collapsing the three document gates into one scan pass and never
parking intermediate corpora on disk.

Run on an otherwise-idle box: python experiments/r8_corpus_build_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load  # noqa: E402
from covid_data_pipeline_spark.queries.llm_dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    _PCB_MULT,
    _PCB_MOD,
    _PCB_PACK_BUDGET,
    _PCB_STOPWORDS,
)
from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def staged_build(spark, sf_dir: str, scratch: str):
    """pipeline_corpus_build's semantics with parquet barriers."""
    d = load(spark, sf_dir, "documents")
    cleaned = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    base = d.select(
        "doc_id",
        "lang",
        "n_chars",
        cleaned.alias("cleaned"),
        F.ceil(F.col("n_chars").cast("double") / 4).cast("long").alias("tokens"),
    )
    toks_raw = F.split("cleaned", " ")
    stop_arr = F.array(*[F.lit(w) for w in _PCB_STOPWORDS])
    en_score = F.size(
        F.filter(toks_raw, lambda x: F.array_contains(stop_arr, x))
    ).cast("double") / F.size(toks_raw)
    distinct_ratio = F.size(F.array_distinct(toks_raw)).cast("double") / F.size(
        toks_raw
    )
    gated = (
        base.filter(F.length("cleaned") >= 1)
        .filter(en_score >= 0.05)
        .filter(F.col("n_chars").between(50, 1000) & (distinct_ratio > 0.1))
    )
    p1 = os.path.join(scratch, "gated")
    gated.write.mode("overwrite").parquet(p1)  # BARRIER 1
    gated = spark.read.parquet(p1)

    w = Window.partitionBy(F.sha2("cleaned", 256)).orderBy("doc_id")
    toks_raw2 = F.split("cleaned", " ")
    exact = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            "tokens",
            F.sort_array(
                F.array_distinct(
                    F.transform(toks_raw2, lambda tok: F.xxhash64(tok))
                )
            ).alias("toks"),
        )
        .withColumn("n_toks", F.size("toks"))
    )
    p2 = os.path.join(scratch, "exact")
    exact.write.mode("overwrite").parquet(p2)  # BARRIER 2
    exact = spark.read.parquet(p2)

    prefix = F.slice(
        "toks",
        1,
        (F.col("n_toks") - F.floor((F.col("n_toks") * 7 + 9) / 10) + 1).cast(
            "int"
        ),
    )
    pe = exact.select("doc_id", "lang", "n_toks", F.explode(prefix).alias("ptok"))
    ca = pe.select(
        F.col("doc_id").alias("a_id"), "lang", "ptok", F.col("n_toks").alias("a_n")
    )
    cb = pe.select(
        F.col("doc_id").alias("b_id"), "lang", "ptok", F.col("n_toks").alias("b_n")
    )
    ratio_ok = (F.col("a_n") * 10 >= F.col("b_n") * 7) & (
        F.col("b_n") * 10 >= F.col("a_n") * 7
    )
    cand = (
        ca.join(cb, on=["lang", "ptok"])
        .filter((F.col("a_id") < F.col("b_id")) & ratio_ok)
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    sa = exact.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    sb = exact.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size("a_toks") + F.size("b_toks") - inter
    dropped = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(inter.cast("double") / union > JACCARD_THRESHOLD)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    near = exact.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "tokens"
    )
    p3 = os.path.join(scratch, "near")
    near.write.mode("overwrite").parquet(p3)  # BARRIER 3
    near = spark.read.parquet(p3)

    wp = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bins = near.select(
        "lang",
        F.floor((F.sum("tokens").over(wp) - F.col("tokens")) / _PCB_PACK_BUDGET)
        .cast("long")
        .alias("bin_id"),
    ).distinct()
    b = (F.col("doc_id") * _PCB_MULT) % _PCB_MOD % 100
    splits = near.select(
        F.when(b < 80, "split_train")
        .when(b < 90, "split_valid")
        .otherwise("split_test")
        .alias("split"),
        "tokens",
    )
    # funnel rows re-read the snapshots, as a per-task workflow would
    for df in (
        base.agg(F.count(F.lit(1)), F.sum("tokens")),
        spark.read.parquet(p1).agg(F.count(F.lit(1)), F.sum("tokens")),
        spark.read.parquet(p2).agg(F.count(F.lit(1)), F.sum("tokens")),
        spark.read.parquet(p3).agg(F.count(F.lit(1)), F.sum("tokens")),
        bins.agg(F.count(F.lit(1))),
        splits.groupBy("split").agg(F.count(F.lit(1)), F.sum("tokens")),
    ):
        materialize(df)


def main() -> None:
    spark = get_spark("r8-corpus-build-ab")
    fused = load_all()["pipeline_corpus_build"].fn
    scratch = tempfile.mkdtemp(prefix="cdp_ab_")
    # warm-up (uncounted)
    materialize(fused(spark, SF_DIR))
    staged_build(spark, SF_DIR, scratch)
    t_fused, t_staged = [], []
    for _ in range(REPS):
        t0 = time.monotonic()
        materialize(fused(spark, SF_DIR))
        t_fused.append(time.monotonic() - t0)
        t0 = time.monotonic()
        staged_build(spark, SF_DIR, scratch)
        t_staged.append(time.monotonic() - t0)
    shutil.rmtree(scratch, ignore_errors=True)
    out = {
        "fused_median": round(statistics.median(t_fused), 2),
        "fused_all": [round(t, 2) for t in t_fused],
        "staged_median": round(statistics.median(t_staged), 2),
        "staged_all": [round(t, 2) for t in t_staged],
        "speedup": round(
            statistics.median(t_staged) / statistics.median(t_fused), 2
        ),
    }
    print(
        f"fused median {out['fused_median']}s vs staged median "
        f"{out['staged_median']}s -> {out['speedup']}x"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
