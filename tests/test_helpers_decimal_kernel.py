"""Pin the r12 two-long exact-sum kernel to the old decimal(28,6) path.

``_helpers.dsum``/``davg`` replaced ``SUM(CAST(x AS DECIMAL(28,6)))``
with a two-long split sum (module doc in _helpers.py).  These tests pin
bit-equality against the old formulation on adversarial inputs — any
drift here is an oracle-hash break across ~380 queries.  The full sweep
(368k rows, 7 input families) lives in
experiments/opt_r12_decimal_kernel_ab.py; this is the fast regression
subset.
"""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from covid_data_pipeline_spark.queries._helpers import DEC, davg, dsum


def _old_dsum(c):
    return F.sum(c.cast(DEC)).cast("double")


def _bits(v):
    return None if v is None else struct.pack("<d", v)


def _adversarial_values():
    rnd = random.Random(20260817)
    vals = []
    # price-like 2dp values (the fixture regime)
    vals += [round(rnd.uniform(-1e5, 1e6), 2) for _ in range(4000)]
    # raw random bit-pattern doubles inside the per-row domain
    k = 0
    while k < 3000:
        (x,) = struct.unpack("<d", struct.pack("<Q", rnd.getrandbits(64)))
        if x == x and abs(x) < 1e11:
            vals.append(x)
            k += 1
    # dyadic exact .5-at-6dp ties (must take the fallback, then HALF_UP)
    vals += [
        ((2 * rnd.randrange(1, 1 << 40) + 1) * (1 if rnd.random() < 0.5 else -1))
        / 128.0
        for _ in range(1500)
    ]
    # boundary-stress: nearest double to (m + 0.5) micro units — where
    # string-based and binary-exact rounding can disagree
    for _ in range(1500):
        m = rnd.randrange(1, int(4.3e15))
        vals.append((1 if rnd.random() < 0.5 else -1) * (m + 0.5) / 1e6)
    # fast-path edge, tiny, and exact specials
    vals += [4.4e9 * (1 - rnd.random() * 1e-9) for _ in range(100)]
    vals += [rnd.uniform(-1e-6, 1e-6) for _ in range(500)]
    vals += [0.0, -0.0, 5e-7, -5e-7, 1.5e-6, -1.5e-6, 0.0234375, 6e5 + 0.105]
    return vals


def test_dsum_bits_match_old_decimal_path(spark):
    vals = _adversarial_values()
    df = spark.createDataFrame(
        [(i, v, i % 101) for i, v in enumerate(vals)], "id long, x double, g int"
    )
    res = (
        df.groupBy("g")
        .agg(
            _old_dsum(F.col("x")).alias("old"),
            dsum(F.col("x")).alias("new"),
            (_old_dsum(F.col("x")) / F.count("x")).alias("old_avg"),
            davg(F.col("x")).alias("new_avg"),
        )
        .collect()
    )
    assert len(res) == 101
    for r in res:
        assert _bits(r.old) == _bits(r.new), f"dsum drift in group {r.g}: {r}"
        assert _bits(r.old_avg) == _bits(r.new_avg), f"davg drift: {r}"


def test_dsum_degenerate_inputs_match_old_decimal_path(spark):
    df = spark.createDataFrame(
        [
            (0, None),
            (1, float("nan")),
            (2, float("inf")),
            (3, float("-inf")),
            (4, 1.25),
            (5, -0.0),
        ],
        "id long, x double",
    )
    r = df.agg(
        _old_dsum(F.col("x")).alias("old"), dsum(F.col("x")).alias("new")
    ).collect()[0]
    assert _bits(r.old) == _bits(r.new) and r.new == pytest.approx(1.25)
    # all-degenerate group stays NULL, exactly like the decimal sum
    n = (
        df.where("x IS NULL OR isnan(x) OR abs(x) = double('inf')")
        .agg(_old_dsum(F.col("x")).alias("old"), dsum(F.col("x")).alias("new"))
        .collect()[0]
    )
    assert n.old is None and n.new is None


def test_dsum_aggregates_with_primitive_buffers(spark):
    """The point of the kernel: the sum buffers are longs (codegen,
    primitive hash-agg), not Decimals — pin that the plan carries the
    two long partial sums and no decimal(38,6) sum buffer."""
    df = spark.range(10).select(
        (F.col("id") * 1.5).alias("x"), (F.col("id") % 2).alias("g")
    )
    plan = (
        df.groupBy("g")
        .agg(dsum(F.col("x")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "sum(units" in plan or "sum(CASE" in plan.replace("\n", " ") or (
        plan.count("sum(") >= 2
    ), plan
    assert "decimal(38,6)" not in plan, f"decimal sum buffer survived:\n{plan}"
