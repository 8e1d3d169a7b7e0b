"""Round-10 plan-shape evidence: pipeline_merged_snapshot truncates its
``admitted`` subtree with an increment-sized lazy localCheckpoint so the
window + increment scans + index join run ONCE instead of once per merge
arm (Catalyst duplicates non-shuffle subtrees referenced by multiple
union branches; AQE's ReusedExchange only dedupes shuffles — the r8
union lesson).  This harness times BOTH shapes of the SAME snapshot at
sf0.1 and prints medians + the physical documents-scan counts, so the
docstring's "computes it once, not once per arm" claim carries paired
same-box numbers (the r9_ingest_wideagg_ab method).

The duplicated arm is built from identical expressions, differing ONLY
in the one localCheckpoint call.  Output equality of both shapes is
asserted before any timing.

Run on an otherwise-idle box: python experiments/r10_snapshot_checkpoint_ab.py
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
REPS = 7


def snapshot(spark, checkpoint: bool, parts: dict | None = None):
    """pipeline_merged_snapshot's exact stages; ``checkpoint`` toggles
    the one admitted-subtree truncation under test.  When ``parts`` is
    given, the PRE-truncation ``admitted`` frame is stashed into it so
    callers can statically inspect the plan the checkpoint hides."""
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
    qual = inc.filter(F.length("cleaned").between(50, 1000)).select(
        "doc_id",
        F.sha2("cleaned", 256).alias("h"),
        (F.col("doc_id") % 5 == 0).alias("id_in_corpus"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    admitted = (
        qual.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(
            F.broadcast(corpus_hashes.withColumn("hic", F.lit(True))),
            "h",
            "left",
        )
        .filter(F.col("hic").isNull())
        .select("doc_id", "h", "id_in_corpus")
    )
    if parts is not None:
        parts["admitted"] = admitted
    if checkpoint:
        admitted = admitted.localCheckpoint(eager=False)
    upd = admitted.filter(F.col("id_in_corpus")).select(
        "doc_id", F.col("h").alias("h_new")
    )
    carried = corpus.join(F.broadcast(upd), "doc_id", "left").select(
        "doc_id",
        F.coalesce("h_new", "h").alias("h"),
        F.when(F.col("h_new").isNotNull(), F.lit("updated"))
        .otherwise(F.lit("carried"))
        .alias("provenance"),
    )
    new = admitted.filter(~F.col("id_in_corpus")).select(
        "doc_id", "h", F.lit("new").alias("provenance")
    )
    return carried.unionByName(new)


def scan_count(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "documents.parquet"
    )


def static_scan_count(df) -> int:
    """Documents scans in the OPTIMIZED (un-executed) plan — visible even
    for subtrees a localCheckpoint would later hide from executedPlan."""
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "documents.parquet"
    )


def main() -> None:
    spark = get_spark("r10-snapshot-ab")
    tune(spark)

    rows = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["h"], r["provenance"]) for r in df.collect()
    )
    reg = rows(load_all()["pipeline_merged_snapshot"].fn(spark, SF_DIR))
    assert rows(snapshot(spark, True)) == reg, "checkpoint arm != registered"
    assert rows(snapshot(spark, False)) == reg, "duplicated arm != registered"

    out = {}
    for label, ckpt in [("checkpoint", True), ("duplicated", False)]:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            snapshot(spark, ckpt).collect()
            times.append(time.time() - t0)
        parts: dict = {}
        df = snapshot(spark, ckpt, parts)
        df.collect()
        out[label] = {
            "median_s": round(statistics.median(times), 3),
            "times": [round(t, 3) for t in times],
            # executed-plan scans AFTER an action (AQE-finalized); the
            # checkpoint arm's truncated plan hides its build-side scans,
            # so also report the pre-truncation count measured statically
            "final_plan_doc_scans": scan_count(df),
            # the admitted subtree's own scans, from its optimized
            # (un-executed) plan — what the truncation hides
            "static_admitted_doc_scans": static_scan_count(parts["admitted"]),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
