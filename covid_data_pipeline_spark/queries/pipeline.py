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


@query(
    "analytics_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped composite: the unshipped-orders-by-value report —
    3-way join (customer selective-filtered, orders date-banded,
    lineitem date-banded), revenue aggregate, global top-10.

    The plan Catalyst should produce and tests/test_plans.py audits:
    both date filters PUSHED to the parquet scans, customer broadcast
    (small after the segment filter), partial aggregation before the
    group shuffle, TakeOrderedAndProject for the limit (never a global
    sort).  Top-10 carries the l_orderkey tiebreaker in BOTH engines —
    a LIMIT without a unique sort key is nondeterministic under ties
    (SURVEY §2.6 discipline)."""
    tune(spark)
    pivot = "1998-01-01"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < pivot)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > pivot)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "analytics_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def analytics_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped composite: revenue by nation where the supplier
    and customer share a nation, one region, one order-year — a 6-table
    join with a non-equi-ish second key (s_nationkey = c_nationkey)
    folded into the supplier join.

    Join order is deliberate: facts joined first on their keys, then the
    three tiny dims (supplier/nation/region) as broadcasts — region's
    filter prunes nation, which prunes the supplier match, so the big
    intermediate never widens.  At 100 TB the c_nationkey = s_nationkey
    condition is the classic trap: as a standalone join it's a 25-key
    near-cross-product (massive skew); folded into the equi-join on
    s_suppkey it costs nothing extra."""
    tune(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"))
    )
