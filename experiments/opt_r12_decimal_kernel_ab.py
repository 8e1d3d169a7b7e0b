#!/usr/bin/env python3
"""r12: exact two-long split sum vs the decimal(28,6) doctrine.

The repo's cross-engine exactness contract sums doubles via
``SUM(CAST(x AS DECIMAL(28,6)))`` (queries/_helpers.py).  r11 measured
that kernel at 4x a plain double sum on the Q1 shape (1.40 vs 0.34 s)
because the sum buffer is a BigDecimal (precision 38 > 18) and the
per-row double->decimal cast goes through BigDecimal.valueOf (a
Double.toString parse per row).

Candidate replacement: represent each value as exact micro-units
(the unscaled long of CAST(x AS DECIMAL(.,6)) — identical rounding by
construction), split per row into (units = trunc-toward-zero long of x,
frac = micro - units*1e6, |frac| <= 1e6), sum BOTH as plain longs
(codegen, primitive hash-agg buffers), and reconstruct the exact
decimal once per group before the final double cast.  The final double
is bit-identical to the old path because both convert the SAME exact
rational (total_micro / 1e6, materialized as an exact Spark decimal)
to double via BigDecimal.doubleValue.

Overflow bounds (to be documented in _helpers.py): per group,
|sum(units)| < 9.2e18 (i.e. sum |x| < 9.2e18 — 100 TB-safe: a full
lineitem sum at ~sf1e5 is ~2.3e16) and n_rows < 9.2e12 (frac sum).
Per row |x| < 1e12 (decimal(18,6) extraction domain; fixture columns
top out ~6e5).

Two micro-extraction kernels are tested:

K1 (decimal extraction)  micro = CAST(CAST(x AS DECIMAL(18,6)) * 1e6 AS LONG)
    — per-row BigDecimal cast stays, BigDecimal SUM buffer removed.
K2 (Dekker two-product)  pure double flops: Veltkamp-split x, compute
    p = x*1e6 and its exact residual e (1e6 has a 14-bit mantissa so
    both partial products are exact), round half-away-from-zero with
    exact boundary tests ((frac-1)+e and frac+e cannot round across
    zero: subnormal addition is exact); decimal fallback branch for
    |x| >= 2^52/1e6 (~4.5e9) keeps the domain identical to K1.
    No BigDecimal anywhere on the fast path.

This script:
 1. proves per-row bit-equality of K1/K2 micros against Python-exact
    Decimal(x).quantize(1e-6, ROUND_HALF_UP) — the same rounding as
    Spark's HALF_UP double->decimal cast — over adversarial data:
    dyadic half-boundary values (x*1e6 = odd/2 exactly), raw random
    bit-pattern doubles, near-fast-path-edge and near-domain-edge
    magnitudes, tiny/subnormal, +-0.0, NaN/Inf/NULL;
 2. proves group-sum double bit-equality old-vs-new over groupings of
    that data (and null/NaN/Inf groups);
 3. interleaved perf A/B on the Q1 kernel (low- and high-cardinality).

Run: python experiments/opt_r12_decimal_kernel_ab.py [--perf-only|--correct-only]
"""

from __future__ import annotations

import os
import random
import struct
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid_data_pipeline_spark.io import load, tune  # noqa: E402
from covid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 7

SPLIT = 134217729.0  # 2^27 + 1, Veltkamp split constant
DD_MAX = float(2**52) / 1e6  # |x| bound for the pure-double fast path
# K3 fast-path bound, safely below 2^52/1e6 so p = |x|*1e6 < 2^52 and
# t = p + 0.5 is exact (ulp(p) <= 0.5)
K3_MAX = 4.4e9
# Boundary band (micro units): Spark's double->decimal cast rounds the
# SHORTEST-ROUND-TRIP STRING value (BigDecimal.valueOf -> Double.toString),
# which differs from x's exact binary value by at most ulp(x)/2, i.e. by
# at most |x|*2^-53*1e6 micro units.  When the exact product is further
# than that from every .5 rounding boundary, binary rounding == string
# rounding; inside the band, fall back to the decimal cast itself.
# 1.12e-10 > 2^-53*1e6 = 1.1102e-10 (margin); +1e-12 absorbs the one
# rounding of g = frac + e (|err| <= 2^-53) and of the band product.
BAND_REL = 1.12e-10
BAND_ABS = 1e-12


def micro_k1(c):
    """Unscaled micro-units via decimal extraction (|x| < 1e12)."""
    return (c.cast("decimal(18,6)") * F.lit(1000000)).cast("long")


def micro_k2(c):
    """Unscaled micro-units via Dekker two-product: exact, no BigDecimal
    on the |x| < 2^52/1e6 fast path; K1 decimal fallback above (also
    catches NaN/Inf: the fast-path comparison is false for both)."""
    a = F.abs(c)
    cc = a * F.lit(SPLIT)
    a_hi = cc - (cc - a)
    a_lo = a - a_hi
    p = a * F.lit(1000000.0)
    # exact residual: p + e == a*1e6 (26-bit x 14-bit and 27-bit x
    # 14-bit partial products are exact; the theorem for an unsplit
    # second factor with <= 26 significant bits)
    e = (a_hi * F.lit(1000000.0) - p) + a_lo * F.lit(1000000.0)
    # round half up (away from zero; we are on |x|) of v = p + e:
    # t = p + 0.5 is exact (ulp(p) <= 0.5 since p < 2^52), f = floor(t)
    # long, frac = t - f exact in [0,1).  v + 0.5 = f + frac + e, so
    # result = f+1 iff frac+e >= 1, f-1 iff frac+e < 0, else f.  Both
    # boundary tests are computed exactly: (frac-1) is exact and the
    # final additions cannot round across zero or one.
    t = p + F.lit(0.5)
    f = F.floor(t)
    frac = t - f.cast("double")
    adj = (
        F.when((frac - F.lit(1.0)) + e >= F.lit(0.0), F.lit(1).cast("long"))
        .when(frac + e < F.lit(0.0), F.lit(-1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    m_abs = f + adj
    m = F.when(c < 0, -m_abs).otherwise(m_abs)
    return F.when(a < F.lit(DD_MAX), m).otherwise(micro_k1(c))


def micro_k3(c):
    """Hybrid: Dekker two-product fast path, falling back to the decimal
    cast (K1) whenever the exact product sits within an ulp-width band of
    a rounding boundary — exactly where string-based (Spark/Java) and
    binary-exact rounding can disagree.  Outside the band the Dekker
    decision provably equals the string decision, so K3 == K1 == old
    path on every row."""
    a = F.abs(c)
    cc = a * F.lit(SPLIT)
    a_hi = cc - (cc - a)
    a_lo = a - a_hi
    p = a * F.lit(1000000.0)
    e = (a_hi * F.lit(1000000.0) - p) + a_lo * F.lit(1000000.0)
    t = p + F.lit(0.5)
    f = F.floor(t)
    frac = t - f.cast("double")
    g = frac + e  # decision quantity vs the boundaries {0, 1}
    band = a * F.lit(BAND_REL) + F.lit(BAND_ABS)
    safe = (
        (a < F.lit(K3_MAX))
        & (F.abs(g) > band)
        & (F.abs(g - F.lit(1.0)) > band)
    )
    adj = F.when(g >= F.lit(1.0), F.lit(1).cast("long")).when(
        g < F.lit(0.0), F.lit(-1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    m_abs = f + adj
    m = F.when(c < 0, -m_abs).otherwise(m_abs)
    return F.when(safe, m).otherwise(micro_k1(c))


def micro_k4(c):
    """Naive-product fast path: floor(|x|*1e6 + 0.5), with the fallback
    band widened to also absorb the product's own rounding error.
    p = fl(|x|*1e6) differs from the exact product by <= p*2^-53, and the
    string value's product differs from the exact product by <= ~p*2^-53,
    so when frac = (p+0.5) - floor(p+0.5) is further than p*2.5e-16 + 1e-12
    from both 0 and 1, the string-rounded result is exactly floor(p+0.5).
    No Veltkamp split, no residual, no adjustment cases."""
    a = F.abs(c)
    p = a * F.lit(1000000.0)
    t = p + F.lit(0.5)
    f = F.floor(t)
    frac = t - f.cast("double")
    band = p * F.lit(2.5e-16) + F.lit(BAND_ABS)
    safe = (
        (a < F.lit(K3_MAX))
        & (frac > band)
        & (frac < F.lit(1.0) - band)
    )
    m = F.when(c < 0, -f).otherwise(f)
    return F.when(safe, m).otherwise(micro_k1(c))


def _parts(c, micro):
    """Per-row (units, frac) longs with micro == units*1e6 + frac and
    |frac| <= 1e6.  units forced to 0 where micro is NULL so NaN/Inf
    rows contribute exact zeros to the units sum (harmless) instead of
    cast(Inf as long) garbage; the frac sum stays NULL-skipping, which
    keeps all-null groups NULL."""
    units = F.when(micro.isNotNull(), c.cast("long")).otherwise(F.lit(0).cast("long"))
    frac = micro - units * F.lit(1000000).cast("long")
    return units, frac


def dsum_new(c, micro_fn):
    micro = micro_fn(c)
    units, frac = _parts(c, micro)
    su = F.sum(units).cast("decimal(38,0)")
    sf = F.sum(frac).cast("decimal(38,0)")
    tot = su * F.lit(1000000) + sf  # exact micro total as decimal
    # tot/1e6: Spark division result is decimal(38,6) here — exact (the
    # true value has <= 6 dp) — then Decimal.toDouble goes through
    # BigDecimal.doubleValue, same as the old path's final cast.
    return (tot / F.lit(1000000)).cast("double")


def dsum_old(c):
    return F.sum(c.cast("decimal(28,6)")).cast("double")


def gen_adversarial(spark, n=400_000, seed=12061):
    """Doubles that stress every rounding/boundary path."""
    rnd = random.Random(seed)
    vals = []
    # 1. price-like 2dp values
    vals += [round(rnd.uniform(-1e5, 1e6), 2) for _ in range(n // 4)]
    # 2. raw random bit-pattern doubles clamped into |x| < 1e11
    k = 0
    while k < n // 4:
        (x,) = struct.unpack("<d", struct.pack("<Q", rnd.getrandbits(64)))
        if x == x and abs(x) < 1e11:  # not NaN, in domain
            vals.append(x)
            k += 1
    # 3. dyadic exact half-boundary values: odd * 2^-7 => x*1e6 = odd/2
    vals += [
        ((2 * rnd.randrange(1, 1 << 40) + 1) * (1 if rnd.random() < 0.5 else -1))
        / 128.0
        for _ in range(n // 8)
    ]
    # and odd * 2^-e for e in 1..7 (exact .5 or exact ints at 6dp)
    for e in range(1, 8):
        vals += [
            (2 * rnd.randrange(1, 1 << 30) + 1) / float(1 << e)
            for _ in range(n // 64)
        ]
    # 4. near the fast-path edge 2^52/1e6 and the domain edge 1e12
    for base in (DD_MAX, 1e12 * 0.99999):
        vals += [
            base * (1 - rnd.random() * 1e-6) * (1 if rnd.random() < 0.5 else -1)
            for _ in range(n // 32)
        ]
    # 5. tiny magnitudes and exact edge values
    vals += [rnd.uniform(-1e-6, 1e-6) for _ in range(n // 16)]
    vals += [0.0, -0.0, 5e-7, -5e-7, 4.999999999e-7, 1.5e-6, -1.5e-6, 0.0234375]
    # 6. boundary-stress: nearest double to m+0.5 micro units — the exact
    # product lands within an ulp of a rounding boundary, so string-based
    # and binary-exact rounding frequently disagree here; K3 must take
    # its fallback on every one of these
    for _ in range(n // 16):
        mm = rnd.randrange(1, int(4.3e15))
        s = 1 if rnd.random() < 0.5 else -1
        vals.append(s * (mm + 0.5) / 1e6)
    # and the K3 fast-path edge
    vals += [K3_MAX * (1 - rnd.random() * 1e-9) for _ in range(64)]
    rows = [(i, v, i % 997) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "id long, x double, g int")


def check_correct(spark) -> bool:
    df = gen_adversarial(spark).repartition(16).cache()
    df.count()
    ok = True

    # --- per-row: K1 and K3 micros vs STRING-based HALF_UP rounding —
    # Spark's double->decimal cast goes through BigDecimal.valueOf, i.e.
    # Double.toString's shortest-round-trip value; Python's repr() yields
    # the same value, so Decimal(repr(x)) is the per-row reference.
    got = df.select(
        "x",
        micro_k1(F.col("x")).alias("m1"),
        micro_k3(F.col("x")).alias("m3"),
        micro_k4(F.col("x")).alias("m4"),
    ).collect()
    bad = 0
    q6 = Decimal("0.000001")
    for r in got:
        exact = int(
            Decimal(repr(r.x)).quantize(q6, rounding=ROUND_HALF_UP) * 1_000_000
        )
        if r.m1 != exact or r.m3 != exact or r.m4 != exact:
            bad += 1
            if bad <= 10:
                print(
                    f"MISMATCH x={r.x!r} ({struct.pack('<d', r.x).hex()}) "
                    f"exact={exact} k1={r.m1} k3={r.m3} k4={r.m4}"
                )
    print(f"per-row micro check: {len(got)} rows, {bad} mismatches")
    ok &= bad == 0

    # --- NULL / NaN / Inf handling must match old path
    spec = spark.createDataFrame(
        [(0, None), (1, float("nan")), (2, float("inf")), (3, float("-inf")), (4, 1.25)],
        "id long, x double",
    )
    srow = spec.agg(
        dsum_old(F.col("x")).alias("old"),
        dsum_new(F.col("x"), micro_k1).alias("k1"),
        dsum_new(F.col("x"), micro_k3).alias("k3"),
    ).collect()[0]
    print(f"null/nan/inf: old={srow.old!r} k1={srow.k1!r} k3={srow.k3!r}")
    ok &= (srow.old, srow.old) == (srow.k1, srow.k3) and struct.pack(
        "<d", srow.old
    ) == struct.pack("<d", srow.k1) == struct.pack("<d", srow.k3)
    nrow = (
        spec.where("x IS NULL OR isnan(x) OR abs(x) = double('inf')")
        .agg(
            dsum_old(F.col("x")).alias("old"),
            dsum_new(F.col("x"), micro_k3).alias("k3"),
        )
        .collect()[0]
    )
    print(f"all-degenerate group: old={nrow.old!r} k3={nrow.k3!r} (must both be None)")
    ok &= nrow.old is None and nrow.k3 is None

    # --- group sums bit-equal, grouped and global
    for gb in (["g"], []):
        base = df.groupBy(*gb) if gb else df
        res = base.agg(
            dsum_old(F.col("x")).alias("old"),
            dsum_new(F.col("x"), micro_k1).alias("k1"),
            dsum_new(F.col("x"), micro_k3).alias("k3"),
            dsum_new(F.col("x"), micro_k4).alias("k4"),
        ).collect()
        gbad = 0
        for r in res:
            pk = lambda v: None if v is None else struct.pack("<d", v)
            if not (pk(r.old) == pk(r.k1) == pk(r.k3) == pk(r.k4)):
                gbad += 1
                if gbad <= 5:
                    print(f"GROUP MISMATCH {r}")
        print(
            f"group-sum check ({'by g, 997 groups' if gb else 'global'}): "
            f"{len(res)} groups, {gbad} mismatches"
        )
        ok &= gbad == 0
    df.unpersist()
    return ok


def perf(spark) -> None:
    li = load(spark, SF_DIR, "lineitem")
    q1 = li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))

    def mk(agg_fn, keys):
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc * (1 + F.col("l_tax"))
        return q1.groupBy(*keys).agg(
            agg_fn(F.col("l_quantity")).alias("sum_qty"),
            agg_fn(F.col("l_extendedprice")).alias("sum_base_price"),
            agg_fn(disc).alias("sum_disc_price"),
            agg_fn(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("n"),
        )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for keys, label in ((["l_returnflag", "l_linestatus"], "6 groups"), (["l_orderkey"], "~150k groups")):
        arms = {
            "double(floor)": mk(lambda c: F.sum(c).cast("double"), keys),
            "old decimal": mk(dsum_old, keys),
            "new K1": mk(lambda c: dsum_new(c, micro_k1), keys),
            "new K2": mk(lambda c: dsum_new(c, micro_k2), keys),
            "new K3": mk(lambda c: dsum_new(c, micro_k3), keys),
            "new K4": mk(lambda c: dsum_new(c, micro_k4), keys),
        }
        for df in arms.values():
            run(df)  # warm
        tot = {k: 0.0 for k in arms}
        for _ in range(ROUNDS):
            for k, df in arms.items():
                tot[k] += run(df)
        base = tot["old decimal"] / ROUNDS
        for k, v in tot.items():
            v /= ROUNDS
            print(f"Q1[{label}]  {k:14s} {v:6.3f}s  vs-old={base / v:4.2f}x")


def main() -> None:
    spark = get_spark("opt-r12-decimal-ab")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    ok = True
    if "--perf-only" not in args:
        spark.sparkContext.setJobDescription("decimal kernel: correctness sweep")
        ok = check_correct(spark)
        print(f"CORRECTNESS: {'PASS' if ok else 'FAIL'}")
    if "--correct-only" not in args:
        spark.sparkContext.setJobDescription("decimal kernel: perf A/B")
        perf(spark)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
