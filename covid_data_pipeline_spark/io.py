"""Schema-checked parquet readers for the fixture tables.

Every read carries an explicit StructType (schemas.py) so Catalyst plans
are stable and column pruning / predicate pushdown reach the parquet
scan.  At 100 TB the same pattern holds: one logical table = one
partitioned parquet root; the explicit schema avoids footer sampling
across thousands of files, and readers never force materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import SCHEMAS


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table with its explicit schema."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime SQL confs safe to (re)set on an externally-owned session.

    The driver owns the SparkSession it passes us, so only runtime-settable
    confs go here.  ``shuffle.partitions`` sized for the local bench scale
    (32 cores / sub-GB shuffles); AQE coalescing takes it down further at
    runtime, and on a real 1000-executor cluster AQE + a larger initial
    value are the policy instead of this constant.
    """
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # conf locked down — proceed with session defaults
        pass
    return spark
