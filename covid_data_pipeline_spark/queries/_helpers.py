"""Cross-engine determinism helpers shared by all query modules.

Double summation is order-dependent, and Spark's partial aggregation
order differs from DuckDB's — a raw ``SUM(double)`` can drift in the
last ulps and fail the driver's value-hash.  Fix: sum via exact DECIMAL
arithmetic (associative, order-independent) and cast the final value
back to double.  The double->decimal cast itself is deterministic and
identical in both engines (doubles are essentially never exactly at a
half-of-1e-6 boundary), so the result is bit-identical regardless of
partitioning.  Per-row double arithmetic (IEEE 754) needs no such
treatment — both engines produce identical bits for the same expression
shape — so projections stay plain doubles and only reductions go through
decimal.

Cost note for 100 TB: decimal aggregation is ~2x a double sum but stays
inside whole-stage codegen with map-side partial aggregation; the
shuffle still carries one row per (group, partition).  It's the price of
an exactly-reproducible pipeline — same answer on 1 or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits minus 6 fractional leaves 1e31 of headroom — no overflow
# risk for any fixture aggregate (and Spark widens sums to precision 38).
DEC = "decimal(28,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"
