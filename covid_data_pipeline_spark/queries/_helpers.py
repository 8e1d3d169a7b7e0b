"""Cross-engine determinism helpers shared by all query modules.

Double summation is order-dependent, and Spark's partial aggregation
order differs from DuckDB's — a raw ``SUM(double)`` can drift in the
last ulps and fail the driver's value-hash.  Fix: sum via exact
fixed-point arithmetic (associative, order-independent) and cast the
final value back to double.  The contract (unchanged since round 1):
every value is first rounded to 6 decimal places exactly the way
``CAST(x AS DECIMAL(28,6))`` rounds it, the rounded values are summed
exactly, and the exact total is converted to double once — so the
result is bit-identical regardless of partitioning, and bit-identical
to DuckDB's ``SUM(CAST(x AS DECIMAL(28,6)))``.

r12 kernel (guide §1.2 "per-task work"): the old implementation summed
``CAST(x AS DECIMAL(28,6))`` directly — correct, but 4x the cost of a
plain double sum, because the per-row cast allocates a BigDecimal via
``Double.toString`` and the sum buffer (precision 38 > 18) is
BigDecimal-backed.  The replacement keeps the identical per-row
rounding but carries the sum in TWO LONG buffers (whole units and
micro-unit remainders — primitive, codegen-friendly, exact):

- per row, ``micro = round_half_up(x, 6dp) * 1e6`` as a long.  Fast
  path: ``floor(|x|*1e6 + 0.5)`` in pure double arithmetic.  Spark's
  double->decimal cast rounds the SHORTEST-ROUND-TRIP STRING value
  (``BigDecimal.valueOf`` -> ``Double.toString``), which differs from
  x's exact binary value by at most ulp(x)/2; the naive product
  ``p = fl(|x|*1e6)`` differs from the exact product by at most
  ``p * 2^-53``.  Both uncertainties together are under
  ``p * 2^-52``, so whenever ``frac = (p+0.5) - floor(p+0.5)`` is
  further than ``p*2.5e-16 + 1e-12`` from both 0 and 1, the string
  rounding provably equals ``floor(p+0.5)``.  Inside that band (an
  O(1e-10) fraction of price-like inputs, plus exact .5 ties), and for
  ``|x| >= 4.4e9`` (so ``p + 0.5`` stays exact), NaN/Inf, the row
  falls back to the decimal cast itself — so the per-row value is the
  OLD path's value on every input, by construction on the fallback and
  by the band argument on the fast path.
- the micro value splits into ``units = cast(x as long)`` (truncation
  toward zero — exact for |x| < 2^62) and ``frac = micro - units*1e6``
  with |frac| <= 1e6; both sums are plain long hash-agg buffers.
- per group, ``total_micro = sum(units)*1e6 + sum(frac)`` is
  reconstructed exactly in decimal(38,0), divided by 1e6 (exact — the
  true value has <= 6 dp), and cast to double via the same
  ``BigDecimal.doubleValue`` the old path's final cast used.

Bit-equality old-vs-new is proven in
``experiments/opt_r12_decimal_kernel_ab.py`` (per-row micros vs the
string-rounding reference and whole-group double bits, over 368k
adversarial rows: random bit patterns, dyadic .5 ties, boundary-stress
values at ``(m+0.5)/1e6``, subnormals, ±0.0, NaN/Inf/NULL, all-null
groups) and pinned by ``tests/test_helpers_decimal_kernel.py``; the
full oracle sweep re-verified at both SFs in round 12.

Overflow bounds (documented, not checked — same posture as the old
path's decimal(38,6) sum): per group, |sum(x)| < 9.2e18 (the units
buffer; a full lineitem revenue sum at ~sf1e5 is ~2.3e16) and
n_rows < 9.2e12 (the frac buffer at |frac| <= 1e6).  Per row
|x| < 1e12 (the decimal(18,6) fallback domain; fixture columns top
out ~6e5).

Per-row double arithmetic (IEEE 754) needs no such treatment — both
engines produce identical bits for the same expression shape — so
projections stay plain doubles and only reductions go through the
exact kernel.

Cost note for 100 TB: the two-long kernel measures 2.2-3.1x faster
than the decimal(28,6) sum on the TPC-H Q1 shape (0.38 vs 1.18 s at
sf0.1 low-cardinality, 0.73 vs 1.64 s at ~150k groups) and shuffles
two 8-byte partials per (group, column) instead of a 16-byte Decimal —
still inside whole-stage codegen with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits minus 6 fractional leaves 1e31 of headroom — no overflow
# risk for any fixture aggregate (and Spark widens sums to precision 38).
# Still used by inline `.cast(DEC)` sites (window sums, weighted means).
DEC = "decimal(28,6)"

# Fast-path bound: |x| < 4.4e9 keeps p = |x|*1e6 safely under 2^52, so
# t = p + 0.5 is exact (ulp(p) <= 0.5) and floor/frac are exact.
_FAST_MAX = 4.4e9
# Ambiguity band around the rounding boundaries, in micro units relative
# to p: 2.5e-16 > 2^-52 covers the product rounding plus the
# string-vs-binary deviation; 1e-12 absolute covers the small-|x| regime.
_BAND_REL = 2.5e-16
_BAND_ABS = 1e-12


def _micro(c: Column) -> Column:
    """round_half_up(x, 6dp) * 1e6 as a long — bit-identical to the
    unscaled value of ``CAST(x AS DECIMAL(28,6))`` on every input (see
    module doc for the band argument).  NULL for NULL/NaN/±Inf, exactly
    like the decimal cast."""
    a = F.abs(c)
    p = a * F.lit(1000000.0)
    t = p + F.lit(0.5)
    f = F.floor(t)
    frac = t - f.cast("double")
    band = p * F.lit(_BAND_REL) + F.lit(_BAND_ABS)
    safe = (
        (a < F.lit(_FAST_MAX)) & (frac > band) & (frac < F.lit(1.0) - band)
    )
    fast = F.when(c < 0, -f).otherwise(f)
    exact = (c.cast("decimal(18,6)") * F.lit(1000000)).cast("long")
    return F.when(safe, fast).otherwise(exact)


def _micro_sum(c: Column) -> Column:
    """Exact SUM of the 6dp-rounded values, as double (two-long split)."""
    micro = _micro(c)
    # units forced to 0 (not NULL) where micro is NULL so NaN/Inf rows
    # contribute exact zeros to the units sum instead of cast(Inf as
    # long) garbage; the frac sum stays NULL-skipping, which keeps
    # all-null groups NULL (sum(frac) is NULL -> total is NULL).
    units = F.when(micro.isNotNull(), c.cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    frac = micro - units * F.lit(1000000).cast("long")
    su = F.sum(units).cast("decimal(38,0)")
    sf = F.sum(frac).cast("decimal(38,0)")
    tot = su * F.lit(1000000) + sf  # exact micro total as a decimal
    # tot/1e6 is exact (the true value has <= 6 dp; result scale >= 6),
    # then Decimal.toDouble == BigDecimal.doubleValue — the same final
    # conversion the old decimal(38,6) sum's cast performed.
    return (tot / F.lit(1000000)).cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return _micro_sum(c)


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact 6dp sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return _micro_sum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"
