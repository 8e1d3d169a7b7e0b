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

from pyspark.sql import functions as F

from .schemas import EVENTS_RAW_NS, SCHEMAS


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_TS_NANOS_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """One cached footer sniff: is events.ts stored as TIMESTAMP(NANOS)?

    The fixture generator has shipped both ns and µs files across rounds;
    Spark's vectorized reader needs different handling for each (it has
    no native nanos type), so we branch on the actual footer rather than
    assuming.  One footer read per (path) per process — at 100 TB this is
    one file's metadata, not a directory listing."""
    if path not in _TS_NANOS_CACHE:
        import glob
        import os

        import pyarrow.parquet as pq

        # Spark-written tables are DIRECTORIES of part files; the
        # footer sniff needs one actual file (all parts share a schema)
        probe = path
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                raise FileNotFoundError(f"no parquet part files under {path}")
            probe = parts[0]
        unit = getattr(pq.read_schema(probe).field("ts").type, "unit", "us")
        _TS_NANOS_CACHE[path] = unit == "ns"
    return _TS_NANOS_CACHE[path]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table with its explicit schema.

    ``events.ts`` needs a footer sniff: when stored as TIMESTAMP(NANOS)
    (which Spark's reader rejects) we read epoch-nanos int64 (legacy
    nanosAsLong conf) and truncate ns -> µs, matching DuckDB's
    TIMESTAMP_NS -> TIMESTAMP cast; when stored as µs it reads directly.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    path = table_path(sf_dir, name)
    if name == "events" and _events_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW_NS).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime SQL confs safe to (re)set on an externally-owned session.

    The driver owns the SparkSession it passes us, so only runtime-settable
    confs go here.  ``shuffle.partitions`` sized for the local bench scale
    (32 cores / sub-GB shuffles); AQE coalescing takes it down further at
    runtime, and on a real 1000-executor cluster AQE + a larger initial
    value are the policy instead of this constant.
    """
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # lake write default: zstd strictly dominated snappy/gzip/raw on
        # size AND write AND scan in experiments/codec_ab.py (SCALE.md)
        spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
        # reset confs that single operators (join_bloom_runtime) override
        # for their own plan, so they never leak into the next query
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        )
    except Exception:  # conf locked down — proceed with session defaults
        pass
    return spark
