"""The reference's end-to-end scan run, composed as ONE declarative
dataflow (SURVEY §3.1 step list): load source snapshots -> clean the
volatile content -> fingerprint -> compare each snapshot to the
previous one per source -> emit the per-run change report.

The individual stages exist as standalone operators
(``str_clean_pipeline``, ``str_hash_digest``, ``win_lag_change_detect``,
``agg_pivot``); this module proves they compose into the reference's
actual product — the daily change list — in a single Catalyst plan with
exactly one shuffle for the window and one for the report aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load, tune
from ..registry import query


@query(
    "pipeline_change_report",
    oracle="""
    WITH cleaned AS (
        SELECT user_id AS source_key, ts, event_id,
               sha256(trim(regexp_replace(lower(props), '\\s+', ' ', 'g')))
                   AS content_hash
        FROM events
    ),
    versioned AS (
        SELECT source_key, ts, content_hash,
               LAG(content_hash) OVER (PARTITION BY source_key
                                       ORDER BY ts, event_id) AS prev_hash
        FROM cleaned
    ),
    statused AS (
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               source_key,
               CASE WHEN prev_hash IS NULL THEN 'new'
                    WHEN prev_hash <> content_hash THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM versioned
    )
    SELECT day,
           COUNT(DISTINCT source_key) AS n_sources,
           COUNT(*) FILTER (WHERE status = 'new') AS n_new,
           COUNT(*) FILTER (WHERE status = 'changed') AS n_changed,
           COUNT(*) FILTER (WHERE status = 'unchanged') AS n_unchanged
    FROM statused
    GROUP BY day
    """,
)
def pipeline_change_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-run pipeline: events stand in for (source, scan_ts, raw
    content); clean = lowercase + whitespace collapse + trim (the
    volatile-content strip), fingerprint = sha256, change detection =
    lag over the per-source scan sequence, report = per-day counts of
    new / changed / unchanged sources — the change list the reference
    published after every run.

    Scale: one shuffle on source_key for the window (the same partition
    a real deployment keys its snapshot store on), one for the daily
    rollup; everything between is narrow."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    cleaned = F.sha2(
        F.trim(F.regexp_replace(F.lower("props"), r"\s+", " ")), 256
    )
    w = Window.partitionBy("source_key").orderBy("ts", "event_id")
    versioned = ev.select(
        F.col("user_id").alias("source_key"),
        "ts",
        "event_id",
        cleaned.alias("content_hash"),
    ).withColumn("prev_hash", F.lag("content_hash").over(w))
    statused = versioned.select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        "source_key",
        F.when(F.col("prev_hash").isNull(), "new")
        .when(F.col("prev_hash") != F.col("content_hash"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return statused.groupBy("day").agg(
        F.countDistinct("source_key").alias("n_sources"),
        F.count(F.when(F.col("status") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("status") == "changed", 1)).alias("n_changed"),
        F.count(F.when(F.col("status") == "unchanged", 1)).alias("n_unchanged"),
    )
