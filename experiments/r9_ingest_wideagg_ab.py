"""Round-9 plan-shape evidence: pipeline_incremental_ingest's docstring
claims its ONE-wide-conditional-aggregate report shape improves on the
branch-per-stage union idiom (pipeline_corpus_build's shape, where
every funnel row re-instantiates the aggregate subtree and re-scans
the input).  This harness times BOTH shapes of the SAME ingest
pipeline at sf0.1 and prints medians + the physical scan counts, so
the claim carries paired same-box numbers (the r8_corpus_build_ab
method).

The staged arm is built from the registered query's own stage
DataFrames — identical filters, window, and joins — differing ONLY in
report assembly: nine .agg() branches unioned (each branch re-derives
its stage subtree) vs per-row flags folded once and exploded.

Run on an otherwise-idle box: python experiments/r9_ingest_wideagg_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.registry import load_all  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def staged_union_report(spark):
    """The branch-per-stage union shape: same stages, report assembled
    as nine single-row aggregates unioned (subtree per branch)."""
    d = load(spark, SF_DIR, "documents")
    clean = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    corpus = d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.sha2(clean(F.col("text")), 256).alias("h")
    )
    corpus_hashes = corpus.select("h").distinct()
    inc = d.filter(
        (F.col("doc_id") % 5 != 0)
        | (F.col("doc_id") % 20 == 0)
        | (F.col("doc_id") % 20 == 10)
    ).select(
        "doc_id",
        clean(
            F.when(
                F.col("doc_id") % 20 == 0,
                F.concat(F.upper("text"), F.lit(" UPDATE")),
            ).otherwise(F.col("text"))
        ).alias("cleaned"),
    ).unionByName(
        d.filter(F.col("doc_id") % 15 == 1).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            clean(F.col("text")).alias("cleaned"),
        )
    )
    hashed = inc.select(
        "doc_id",
        F.sha2("cleaned", 256).alias("h"),
        F.length("cleaned").alias("L"),
        (F.col("doc_id") % 5 == 0).alias("id_in_corpus"),
    )
    s_clean = hashed.filter(F.col("L") >= 1)
    s_quality = s_clean.filter(F.col("L").between(50, 1000))
    w = Window.partitionBy("h").orderBy("doc_id")
    s_intra = (
        s_quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    s_admit = s_intra.join(corpus_hashes, "h", "left_anti")
    s_new = s_admit.filter(~F.col("id_in_corpus"))
    s_upd = s_admit.filter(F.col("id_in_corpus"))

    def one(df, idx, name):
        return df.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    n_corpus = corpus.agg(
        F.lit(0).cast("long").alias("stage_idx"),
        F.lit("corpus_base").alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    merged = corpus.agg(F.count(F.lit(1)).alias("nc")).crossJoin(
        s_new.agg(F.count(F.lit(1)).alias("nn"))
    ).select(
        F.lit(6).cast("long").alias("stage_idx"),
        F.lit("merged_total").alias("stage"),
        (F.col("nc") + F.col("nn")).cast("long").alias("n_docs"),
    )
    return (
        n_corpus.unionByName(one(hashed, 1, "offered"))
        .unionByName(one(s_clean, 2, "clean"))
        .unionByName(one(s_quality, 3, "quality"))
        .unionByName(one(s_intra, 4, "dedup_intra"))
        .unionByName(one(s_admit, 5, "dedup_vs_corpus"))
        .unionByName(merged)
        .unionByName(one(s_new, 7, "merged_new"))
        .unionByName(one(s_upd, 8, "merged_updated"))
    )


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("r9-ingest-ab")
    tune(spark)
    fused_fn = load_all()["pipeline_incremental_ingest"].fn

    fused_df = fused_fn(spark, SF_DIR)
    staged_df = staged_union_report(spark)
    # equivalence first: both shapes must report the same funnel
    fused = {(r["stage_idx"], r["stage"], r["n_docs"]) for r in fused_df.collect()}
    staged = {(r["stage_idx"], r["stage"], r["n_docs"]) for r in staged_df.collect()}
    assert fused == staged, (sorted(fused), sorted(staged))

    scans = {
        "fused_documents_scans": fused_df._jdf.queryExecution()
        .executedPlan().toString().count("documents.parquet"),
        "staged_documents_scans": staged_df._jdf.queryExecution()
        .executedPlan().toString().count("documents.parquet"),
    }
    out = {}
    for label, build in (
        ("fused", lambda: fused_fn(spark, SF_DIR)),
        ("staged", lambda: staged_union_report(spark)),
    ):
        materialize(build())  # warm-up
        ts = []
        for _ in range(REPS):
            t0 = time.monotonic()
            materialize(build())
            ts.append(time.monotonic() - t0)
        out[label] = {
            "median_sec": round(statistics.median(ts), 3),
            "all_sec": [round(t, 3) for t in ts],
        }
    print(json.dumps({"scan_counts": scans, "timings": out}))


if __name__ == "__main__":
    main()
