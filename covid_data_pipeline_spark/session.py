"""SparkSession builder for tests and bench (the driver brings its own)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .io import tune


def _warehouse_dir() -> str | None:
    """Session warehouse for the catalog-table DEMO operators
    (join_bucketed, sink tables): every such table is dropped and
    rewritten inside one query invocation, so its durability is
    worthless — put the warehouse on tmpfs when the box has one (r11;
    the same ephemeral-scratch policy as streaming.runner.scratch_dir).
    Override with $SPARK_GRAFT_WAREHOUSE (set it to ./spark-warehouse
    for the old layout); a REAL deployment's catalog tables are
    durable state and belong on real storage."""
    env = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        d = os.path.join(shm, "cdp_warehouse")
        os.makedirs(d, exist_ok=True)
        return d
    return None  # Spark's default ./spark-warehouse


def get_spark(app: str = "covid-data-pipeline-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    wh = _warehouse_dir()
    builder = SparkSession.builder.master(f"local[{cpus}]")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    spark = (
        builder
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local-mode driver == the only executor.  8g vs 32g was A/B'd at
        # r3 on the heavy dedup queries: no consistent difference (run
        # variance dominates), so the smaller footprint stays the default
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
