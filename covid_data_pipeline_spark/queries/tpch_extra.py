"""TPC-H shape completion (§2.11): the 7 query shapes of the classic 22
not yet covered by ``pipeline.py``'s analytics family — Q2, Q8, Q9,
Q11, Q16, Q20, Q21.

The fixtures carry no ``partsupp`` table (TESTDATA.md), so the four
shapes built on it (Q2/Q11/Q16/Q20) keep their STRUCTURE — correlated
min subquery, scalar-threshold subquery, distinct-relationship count
with NOT-IN exclusion, nested-aggregate semi-join — over the
supplier-part relationships that DO exist in ``lineitem``
(l_partkey × l_suppkey), with unit cost / stock value derived from
shipped lines.  Q8 and Q21 are faithful to the original shape modulo
column availability (lateness is ship-vs-order+60d, as in the Q4
adaptation; no commit/receipt dates in the fixture).

With these, every one of the 22 TPC-H query shapes has a registered,
oracle-checked representative (Q1 = agg_groupby, the flagship).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load, tune
from ..registry import query
from ._helpers import DEC, dsum, sql_dsum


@query(
    "analytics_market_share",
    oracle=f"""
    WITH sales AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                   AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p      ON p.p_partkey = l.l_partkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
        JOIN region r    ON r.r_regionkey = cn.n_regionkey
        JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_18'
                               THEN volume ELSE CAST(0 AS DECIMAL(28,6)) END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM sales GROUP BY o_year
    """,
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: NATION_18's share of the ASIA market's
    ECONOMY-part revenue per order year — the national-market-share
    report.  An 8-table join in which ``nation`` plays two roles
    (customer's nation locates the MARKET, supplier's nation claims the
    SHARE) and the share is a conditional-sum ratio.

    NATION_18, not the original NATION_2: sf0.001 has zero NATION_2
    suppliers, so the numerator was identically 0 there — vacuous
    golden evidence, the same fixture-honesty class as the
    analytics_waiting_suppliers r4 fix (round-4 review find).
    NATION_18 has filtered-set sales at every fixture sf (9/28/224
    qualifying line items).

    Both numerator and denominator go through exact decimal sums, the
    division is the last step — bit-stable at any partitioning.  Plan:
    every dim broadcasts; lineitem shuffles once for the year aggregate;
    the date filter pushes to the orders scan."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    sales = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_region"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(DEC)
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_18", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "analytics_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_19'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
)
def analytics_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who kept finished orders waiting —
    for multi-supplier orders, the supplier whose line shipped late
    (ship > order date + 60d, the fixture's lateness convention) while
    EVERY other supplier on the order shipped on time.  The famous
    double-correlated EXISTS / NOT EXISTS shape.

    Spark formulation: the EXISTS is a LEFT SEMI join on (orderkey,
    suppkey <>), the NOT EXISTS a LEFT ANTI join on (orderkey,
    suppkey <>, late) — both non-equi conditions ride inside equi-joins
    on l_orderkey, so candidates co-locate on one shuffle key and
    nothing is quadratic.  At 100 TB the order key is uniform — no
    skew; all of orders' columns needed later are carried through the
    first join instead of re-joined."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    s = load(spark, sf_dir, "supplier")
    # NATION_19, not NATION_2: the sf0.001 fixture has zero NATION_2
    # suppliers, which made the golden digest vacuously empty; NATION_19
    # has suppliers (and waiting ones) at every fixture scale.
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    l1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter((F.col("o_orderstatus") == "F") & late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    # EXISTS: some other supplier participated in the order
    l1 = l1.join(
        l2,
        (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was late on the order
    l3 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(late)
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    l1 = l1.join(
        l3,
        (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))),
                F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "analytics_product_profit",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount) "
                     "- 0.6 * p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY sn.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: product-line profit by supplier nation and order
    year for parts matching a name pattern.  The fixture has no
    ``partsupp.ps_supplycost``, so unit cost is the standard retail
    margin proxy (60% of p_retailprice) — the SHAPE (revenue minus
    cost over a 5-table join, grouped by nation x year) is Q9's.

    Profit goes through one exact decimal sum; part/supplier/nation
    broadcast; lineitem and orders shuffle once on the order key and
    once for the (nation, year) aggregate."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "analytics_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
        SELECT c.l_partkey AS p_key, e.s_suppkey, e.s_name, e.s_acctbal,
               e.n_name, c.unit_cost
        FROM cost c JOIN eu e ON e.s_suppkey = c.l_suppkey
    )
    SELECT o.s_acctbal, o.s_name, o.n_name,
           p.p_partkey,
           CAST(FLOOR(o.unit_cost * 1000000 + 0.5) AS BIGINT) AS unit_cost_micro
    FROM offers o
    JOIN part p ON p.p_partkey = o.p_key
    WHERE p.p_size = 15
      AND o.unit_cost = (SELECT MIN(o2.unit_cost) FROM offers o2
                         WHERE o2.p_key = o.p_key)
    """,
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for every size-15 part, the EUROPE supplier
    offering it at the lowest unit cost (min observed
    l_extendedprice/l_quantity standing in for ps_supplycost — no
    partsupp in the fixture).  The correlated min-subquery shape,
    decorrelated the way Catalyst does it: a per-part min joined back
    on (part, cost) equality; ties return every tied supplier, exactly
    like Q2.

    The unit-cost division is a single IEEE op on identical inputs —
    deterministic cross-engine, so the equality join is safe; the
    min re-rank shuffles only (part, supplier) aggregates, never raw
    lines.

    The emitted cost is INTEGER MICRO-UNITS via floor(x*1e6 + 0.5), not
    ROUND(x, 6): a round-4 sf0.1 sweep caught a half-boundary value
    (1027.3478125) where Spark's round (exact BigDecimal of the double,
    HALF_UP) and DuckDB's (float-space) disagreed by one ulp in the 6th
    decimal.  floor(x*1e6+0.5) is one IEEE multiply + add + floor on
    identical inputs — bit-identical in any engine, no decimal
    semantics involved (costs are positive, so floor(+0.5) == half-up)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = cost.join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        offers.join(
            best,
            (F.col("bp") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.floor(F.col("unit_cost") * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("unit_cost_micro"),
        )
    )


@query(
    "analytics_important_stock",
    oracle=f"""
    WITH v AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_19'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 6) AS part_value
    FROM v
    WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,6)))
                                    AS DOUBLE) / COUNT(*) * 1.5 FROM v)
    """,
)
def analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: the parts representing a significant share of
    NATION_19's shipped value (shipped l_extendedprice standing in
    for ps_supplycost*ps_availqty — no partsupp in the fixture).  The
    scalar-threshold-subquery shape: the same aggregate feeds both the
    per-part rows and the global cutoff.

    The cutoff is RELATIVE TO THE MEAN part value (1.5x), not a fixed
    fraction of the total — TPC-H itself scales Q11's fraction as
    0.0001/SF for exactly this reason: a constant fraction-of-total
    empties out as part cardinality grows (measured: 0 rows at sf0.1
    under the old 0.001 cutoff) while mean-relative is scale-invariant
    (~20% of parts pass at every fixture sf).  NATION_19 rather than
    NATION_2 because the sf0.001 fixture has zero NATION_2 suppliers,
    which made the golden digest vacuously empty.

    Both sides of the comparison come from one exact decimal aggregate
    (the per-part values), so the > cutoff is deterministic; the global
    threshold is a 1-row broadcast, and Spark's exchange reuse computes
    the per-part aggregate once for both consumers."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    v = (
        li.join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("part_value"))
    )
    # the cutoff itself goes through the decimal trick too: a raw double
    # SUM is an order-sensitive reduction and a part within an ulp of the
    # threshold would flip membership between engines/partitionings
    # mean = exact-decimal sum / count, same op order as the oracle
    # ((double / bigint) * 1.5) so the two engines compute bit-identical
    # cutoffs
    thresh = v.agg(
        (dsum("part_value") / F.count(F.lit(1)) * 1.5).alias("cutoff")
    )
    return (
        v.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", F.round("part_value", 6).alias("part_value"))
    )


@query(
    "analytics_parts_supplier_dist",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (5, 11, 17, 23, 28, 37, 42, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def analytics_parts_supplier_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: how many distinct suppliers can provide each
    (brand, type, size) of interest, excluding blacklisted suppliers —
    the supplier-diversity report.  Part-supplier relationships come
    from DISTINCT lineitem pairs (the fixture's partsupp equivalent);
    the complaint-supplier NOT IN is stood in by negative-balance
    suppliers.

    The NOT IN compiles to a broadcast LEFT ANTI join (the blacklist
    has no NULLs by construction — s_suppkey is a key — so anti-join
    and NOT IN agree); the distinct-pair projection and the distinct
    count share one shuffle on the part key."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(5, 11, 17, 23, 28, 37, 42, 49)
    )
    return (
        pairs.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "analytics_excess_shipments",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    ),
    dominant AS (
        SELECT s.l_suppkey
        FROM shipped s
        JOIN tot t ON t.l_partkey = s.l_partkey
        JOIN part p ON p.p_partkey = s.l_partkey
        WHERE p.p_name LIKE '%bolt%' AND s.qty > 0.5 * t.total_qty
        GROUP BY s.l_suppkey
    )
    SELECT sup.s_name, n.n_name
    FROM supplier sup
    JOIN nation n ON n.n_nationkey = sup.s_nationkey
    JOIN dominant d ON d.l_suppkey = sup.s_suppkey
    WHERE n.n_name = 'NATION_3'
    """,
)
def analytics_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: NATION_3 suppliers who dominated a bolt-like
    part's 1997 shipments (more than half the part's total — shipped
    quantity standing in for ps_availqty, no partsupp in the fixture).
    The nested-aggregate-feeding-a-semi-join shape: an inner aggregate
    per (part, supplier), a second per part, their join producing the
    supplier id list that prunes the supplier table.

    Quantities go through exact decimal sums so the 0.5x comparison is
    deterministic; the dominant-supplier set is tiny and broadcasts
    into the final semi-join-style prune."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("qty")
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("qty").alias("total_qty")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    dominant = (
        shipped.join(tot, F.col("tp") == F.col("l_partkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        sup.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dominant), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name")
    )


@query(
    "analytics_revenue_concentration",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_nationkey AS nationkey,
               o.o_custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    )
    SELECT CAST(nationkey AS INTEGER) AS nationkey,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(rev * rev AS DECIMAL(38,6))) AS DOUBLE)
                 / (CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE)
                    * CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE)), 6)
               AS hhi,
           ROUND(MAX(rev) / CAST(SUM(CAST(rev AS DECIMAL(28,6))) AS DOUBLE), 6)
               AS top_share
    FROM per_cust GROUP BY nationkey
    """,
)
def analytics_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market (nation): the Herfindahl index
    Σ share_i² and the single largest customer's share — the
    dependency-risk report behind every 'top customer concentration'
    board slide.

    Exactness discipline: HHI = Σ rev_i² / (Σ rev_i)² with BOTH sums
    decimal-exact (rev_i itself is a decimal sum; its square fits
    DECIMAL(38,6) since per-customer revenue < 1e10), so no
    order-sensitive float reduction exists anywhere — the alternative
    Σ(share_i²) would sum pre-divided doubles in partition order and
    drift.  Two combinable aggregates, both on uniform keys."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_cust = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(dsum("o_totalprice").alias("rev"))
    )
    rev = F.col("rev")
    s1 = F.sum(rev.cast(DEC)).cast("double")
    s2 = F.sum((rev * rev).cast("decimal(38,6)")).cast("double")
    return per_cust.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(s2 / (s1 * s1), 6).alias("hhi"),
        F.round(F.max(rev) / s1, 6).alias("top_share"),
    )


# Exact fixed-iteration PageRank over the supplier<->customer trade
# graph.  All cross-engine float hazards are removed by construction:
# per-edge contributions are quantized to integer units of 1e-12
# (floor(x*1e12+0.5) — floor of a double is exact, and the repo's
# standard half-up construction sidesteps engine ROUND modes), summed
# as DECIMAL(38,0) integers (order-free, exact: total mass <= 1e12 <<
# 2^53), then returned to double by one exact /1e12.  Identical inputs
# + identical IEEE ops per iteration => bit-identical ranks on both
# engines, which is what lets an ITERATIVE algorithm be hash-checked.
_PR_ITERS = 3
_PR_DAMP = 0.85
_PR_CUST_OFFSET = 1_000_000
_PR_Q = "1000000000000"  # 1e12 as exact integer literal


def _pr_oracle() -> str:
    it = """
    pr{k1} AS (
        SELECT n.id, nn.n,
               (1 - {d}) / nn.n + {d} * COALESCE(m.mass, 0) AS pr
        FROM nodes n CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(SUM(CAST(floor(p.pr / dg.deg * {q} + 0.5)
                                 AS DECIMAL(38,0))) AS DOUBLE) / {q} AS mass
            FROM edges e
            JOIN pr{k0} p ON e.src = p.id
            JOIN deg dg ON e.src = dg.src
            GROUP BY e.dst
        ) m ON n.id = m.id
    )"""
    iters = ",".join(
        it.format(k0=k, k1=k + 1, d=_PR_DAMP, q=_PR_Q) for k in range(_PR_ITERS)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT s AS src, c + {_PR_CUST_OFFSET} AS dst FROM pairs
        UNION ALL
        SELECT c + {_PR_CUST_OFFSET} AS src, s AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT id, nn.n, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
    {iters}
    SELECT id AS node_id,
           CAST(floor(pr * {_PR_Q} + 0.5) AS BIGINT) AS pr_q
    FROM pr{_PR_ITERS}
    ORDER BY pr_q DESC, node_id LIMIT 20
    """


def _pr_step(pr: DataFrame, edges: DataFrame, deg: DataFrame, q: float) -> DataFrame:
    """One PageRank iteration over checkpoint-truncated inputs (module
    level so tests/test_plans.py can pin the SINGLE-step plan shape —
    the per-iteration checkpoints hide it from the final plan): edges
    join the broadcast rank/degree vectors map-side, the mass sum
    groups by destination, and the rank update is a node-sized left
    join.  Equi-join strategy cannot change the row multiset and the
    mass sum is the order-free quantized decimal, so this step is
    bit-identical to the pre-r12 SortMergeJoin form."""
    contrib = (
        edges.join(F.broadcast(pr.select(F.col("id").alias("src"), "pr")), "src")
        .join(F.broadcast(deg), "src")
        .groupBy("dst")
        .agg(
            (
                F.sum(
                    F.floor(F.col("pr") / F.col("deg") * q + 0.5).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / q
            ).alias("mass")
        )
    )
    return (
        pr.select("id", "n")
        .join(contrib.withColumnRenamed("dst", "id"), "id", "left")
        .select(
            "id",
            "n",
            (
                (1 - _PR_DAMP) / F.col("n")
                + _PR_DAMP * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("pr"),
        )
    )


@query("graph_pagerank", oracle=_pr_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-shape none — the iterative-graph-algorithm representative:
    3-iteration damped PageRank (d=0.85) over the undirected
    supplier<->customer trade graph (an edge per distinct supplier,
    customer trading pair from lineitem x orders; customers offset into
    their own id space).  Unlike dedup_cluster_cc (whose driver loop
    pulls one convergence scalar per round), PageRank's state is a
    full VECTOR over nodes — the iterations are statically unrolled
    into ONE Catalyst plan: per iteration, contributions = edges ⋈
    ranks ⋈ degrees, grouped by destination, every sum an order-free
    quantized-integer decimal (see module note), so the result is
    hash-exact cross-engine — the property that makes an iterative
    algorithm externally witnessable at all.  Output ranks are emitted
    in the same integer quantization (pr_q = rank units of 1e-12):
    deterministic top-20 via TakeOrdered.

    At 100 TB: the rank and degree vectors are node-sized — broadcast
    while they fit (as here), shuffled on node id each iteration once
    they don't (the unavoidable per-iteration exchange of any
    distributed PageRank at full scale); edges are re-read from their
    cached/bucketed layout; no driver materialization at any point.  The graph here
    has no dangling nodes by construction (every edge is mirrored), so
    no dangling-mass redistribution term is needed — on a general
    graph that term is one extra 1-row aggregate per iteration."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # edges feed every unrolled iteration plus deg/nodes — without
    # lineage truncation the lineitem⋈orders distinct replayed ~28x in
    # one plan (r11 measurement: 112 parquet scans / 162 static
    # exchanges, ~5.8 s at sf0.1).  Truncate once at the distinct trade
    # pairs (the graph_knn_triangles localCheckpoint idiom).
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("s").alias("src"), (F.col("c") + _PR_CUST_OFFSET).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("c") + _PR_CUST_OFFSET).alias("src"), F.col("s").alias("dst")
        )
    )
    # deg is re-executed by every iteration's checkpoint materialization
    # (exchange reuse does not cross executions) — truncate the
    # node-sized vector once instead of re-aggregating 940k edges 3x
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "id", "n", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    q = float(_PR_Q)
    # r12 loop restructure (guide §3.1/§3.3, A/B in
    # experiments/opt_r12_pagerank_ab.py): pr_{k+1} references pr_k TWICE
    # (contrib + the update join's left side), so without truncation the
    # unrolled plan replays pr_0's subtree 2^ITERS times, each replay
    # re-running edge-sized SortMergeJoins (the before-plan's 50
    # ExistingRDD scans).  A lazy localCheckpoint per iteration makes the
    # plan linear in ITERS, and broadcasting the NODE-sized rank/degree
    # vectors (16k rows here) turns the per-iteration edge joins into
    # map-side BroadcastHashJoins — edges are never shuffled.  Equi-join
    # strategy cannot change the row multiset and the mass sum is the
    # order-free quantized decimal, so the result is bit-identical
    # (asserted in the A/B; oracle hash unchanged).  4.39 -> 3.65 s
    # interleaved median; repartitioning edges by dst to also kill the
    # groupBy exchange measured WORSE (5.03 s — the 940k-row exchange
    # costs more than it saves) and was rejected.  At node counts where
    # the rank vector outgrows broadcast, the SMJ path returns — the
    # checkpoint-per-iteration half of this fix is what survives scale.
    for _ in range(_PR_ITERS):
        pr = _pr_step(pr, edges, deg, q).localCheckpoint(eager=False)
    out = pr.select(
        F.col("id").alias("node_id"),
        F.floor(F.col("pr") * q + 0.5).alias("pr_q"),
    )
    return out.orderBy(F.col("pr_q").desc(), "node_id").limit(20)


_KNN_K = 5


def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kNN-sparsified co-purchase graph (pre-checkpoint plan —
    tests/test_plans.py asserts its shape here, where the lineage is
    still visible): supplier pairs weighted by shared customers, each
    node keeping its top-_KNN_K partners, symmetrized to oriented
    a < b edges."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sc = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        # r11 A/B NOTE: a localCheckpoint here (to stop the wedge
        # join's two aliased sides replaying this subtree) measured a
        # WASH interleaved at sf0.1 (5.56 vs 5.80 s median) — the
        # broadcast build is already reused across sides and the scans
        # are page-cached, so the duplicate distinct costs about what
        # the checkpoint barrier does.  Left un-truncated.
        #
        # r12: explicit repartition on the basket key BEFORE the pair
        # self-join (guide §2.4/§2.5): the distinct's 4 MB output gets
        # AQE-coalesced to a handful of partitions, pinning the 12.5M-row
        # wedge enumeration to those few cores; hash-partitioning by c is
        # exactly the join's requirement, so BOTH aliased sides reuse this
        # one exchange and the join itself adds none.  Explicit
        # repartitions are exempt from AQE coalescing (the r11 idiom).
        # A/B at sf0.1: projection 3.17 -> 2.06 s median
        # (experiments/opt_r12_wedge_decompose.py).
        .repartition(spark.sparkContext.defaultParallelism, "c")
    )
    a = sc.select(F.col("s").alias("s1"), "c")
    b = sc.select(F.col("s").alias("s2"), "c")
    proj = (
        a.join(b, "c")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    directed = proj.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst"), "shared"
    ).unionByName(
        proj.select(F.col("s2").alias("src"), F.col("s1").alias("dst"), "shared")
    )
    w = Window.partitionBy("src").orderBy(F.col("shared").desc(), "dst")
    knn = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .select("src", "dst")
    )
    return knn.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


@query(
    "graph_knn_triangles",
    oracle=f"""
    WITH sc AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    proj AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
        FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT s1 AS src, s2 AS dst, shared FROM proj
        UNION ALL
        SELECT s2 AS src, s1 AS dst, shared FROM proj
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM directed
        ) WHERE rn <= {_KNN_K}
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM knn
    ),
    deg AS (
        SELECT v, COUNT(*) AS d FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
        ) GROUP BY v
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles
    """,
)
def graph_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph construction + exact triangle census: the
    co-purchase projection (suppliers weighted by shared customers) is
    a NEAR-CLIQUE on this fixture (measured: every supplier pair
    shares >= 8 customers at sf0.1 — 499,500 edges over 1,000 nodes),
    so counting its triangles would be both vacuous (~C(n,3)) and
    quadratic-blind; the scale-honest graph is the kNN sparsification
    every similarity-graph pipeline uses: keep each node's top-5
    partners (shared-count desc, id tiebreak — all-integer, so the
    selection is deterministic), symmetrize, then census.  Output is
    one all-integer row (nodes, edges, wedges, triangles) — the inputs
    to the global clustering coefficient 3T/W — making the hash
    compare exact with no float anywhere.

    Scale shape: the projection groupBy bounds at (pairs sharing a
    customer); kNN is one row_number window partitioned by node (never
    a global sort); the triangle join is edge ⋈ edge ⋈ edge on the
    oriented a<b representation — each edge travels by its endpoints,
    the standard distributed triangle-count formulation whose cost is
    O(sum of deg^2) on the SPARSIFIED graph (bounded by k^2 per node),
    not on the raw clique."""
    tune(spark)
    # edges feed FIVE consumers (e1/e2/e3, degrees, edge count); without
    # lineage truncation each one replays the projection + kNN upstream
    # (measured: 76 static exchanges, ~5 s at sf0.1).  localCheckpoint
    # materializes the sparsified graph once — the operators/graph.py
    # idiom; ~5k rows at sf0.1, k*n rows in general
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


@query(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH sc AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    proj AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
        FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT s1 AS src, s2 AS dst, shared FROM proj
        UNION ALL
        SELECT s2 AS src, s1 AS dst, shared FROM proj
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM directed
        ) WHERE rn <= {_KNN_K}
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM knn
    ),
    adj AS (
        SELECT a AS v, b AS n FROM edges
        UNION ALL
        SELECT b AS v, a AS n FROM edges
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    common AS (
        SELECT x.v AS u, y.v AS v, CAST(COUNT(*) AS BIGINT) AS cn
        FROM adj x JOIN adj y ON x.n = y.n AND x.v < y.v
        GROUP BY 1, 2
    )
    SELECT c.u, c.v, c.cn AS common_neighbors,
           du.d AS deg_u, dv.d AS deg_v,
           CAST(floor(1000000.0 * CAST(c.cn AS DOUBLE)
                      / (du.d + dv.d - c.cn) + 0.5) AS BIGINT) AS jac_micro
    FROM common c
    JOIN deg du ON c.u = du.v
    JOIN deg dv ON c.v = dv.v
    ORDER BY jac_micro DESC, c.u, c.v LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard node similarity over the kNN-sparsified
    co-purchase graph — the classic link-prediction / entity-resolution
    score: J(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|, top-20 pairs.
    (Same sparsified graph as graph_knn_triangles; same reason — on the
    raw near-clique projection every Jaccard is ~1 and the score is
    vacuous.)

    The scale discipline is candidate generation: pairs are generated
    ONLY through shared neighbors (the adjacency self-join on the
    common endpoint — a wedge enumeration bounded by sum-of-deg²,
    k²·|V| on the sparsified graph), never by pairing all nodes.
    Everything until the final division is exact integers (common
    count, two degrees; union size by inclusion-exclusion), then one
    double division + micro quantization — the ts_autocorrelation
    doctrine.  Top-20 is TakeOrderedAndProject.  The edge set is
    localCheckpoint-truncated once and feeds both the adjacency and
    degree consumers (the graph_knn_triangles idiom)."""
    tune(spark)
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    x = adj.select(F.col("v").alias("u"), "n")
    y = adj.select(F.col("v").alias("v"), "n")
    common = (
        x.join(y, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("v").alias("v"), F.col("d").alias("deg_v"))
    jac = F.floor(
        F.lit(1000000.0)
        * F.col("common_neighbors").cast("double")
        / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors"))
        + F.lit(0.5)
    ).cast("long")
    return (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "common_neighbors", "deg_u", "deg_v",
            jac.alias("jac_micro"),
        )
        .orderBy(F.col("jac_micro").desc(), "u", "v")
        .limit(20)
    )


@query(
    "agg_gini_coefficient",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation, c.c_custkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
        SELECT nation, rev_c,
               ROW_NUMBER() OVER (PARTITION BY nation
                                  ORDER BY rev_c, c_custkey) AS i,
               COUNT(*) OVER (PARTITION BY nation) AS n
        FROM cust
    )
    SELECT nation,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(floor(1000000.0
                      * CAST(2 * SUM(i * rev_c) - (MAX(n) + 1) * SUM(rev_c)
                             AS DOUBLE)
                      / (MAX(n) * SUM(rev_c)) + 0.5) AS BIGINT)
               AS gini_micro
    FROM ranked GROUP BY nation
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per nation — the standard
    inequality/concentration index ("is this market a few whales or a
    broad base?"), the continuous companion to
    analytics_revenue_concentration's top-k share.  Closed form over
    ascending ranks: G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx).

    ALL-INTEGER until the final division: revenues in cents, ranks from
    a deterministic (revenue, custkey) order — ties broken by key so the
    rank assignment is engine-stable, and Σ i·x_i is an exact BIGINT
    (bounded ~n²·max_rev; rescale to euros past ~10⁷ customers/group,
    stated like the CUSUM bound).  One ranked pass per nation (the
    exact-median cost class; at unbounded group size bracket G from the
    mergeable histogram's Lorenz curve instead).  The per-customer
    revenue rollup is the only corpus-sized stage."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    w = Window.partitionBy("nation").orderBy("rev_c", "c_custkey")
    ranked = cust.select(
        "nation",
        "rev_c",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("nation")).alias("n"),
    )
    gini = F.floor(
        F.lit(1000000.0)
        * (
            2 * F.sum(F.col("i") * F.col("rev_c"))
            - (F.max("n") + 1) * F.sum("rev_c")
        ).cast("double")
        / (F.max("n") * F.sum("rev_c"))
        + F.lit(0.5)
    ).cast("long")
    return ranked.groupBy("nation").agg(
        F.max("n").cast("long").alias("n_customers"),
        gini.alias("gini_micro"),
    )


@query(
    "analytics_rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    cust AS (
        SELECT o_custkey AS c,
               CAST(datediff('day', MAX(o_orderdate), anchor.mx) AS BIGINT)
                   AS rec,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                          / 10000) AS BIGINT) AS mon
        FROM orders CROSS JOIN anchor GROUP BY o_custkey, anchor.mx
    ),
    rh AS (SELECT rec AS v, COUNT(*) AS cnt FROM cust GROUP BY rec),
    fh AS (SELECT freq AS v, COUNT(*) AS cnt FROM cust GROUP BY freq),
    mh AS (SELECT mon AS v, COUNT(*) AS cnt FROM cust GROUP BY mon),
    rcut AS (
        SELECT MAX(CASE WHEN run >= floor((CAST(n AS DOUBLE) + 3) / 4)
                        THEN v END) AS q1,
               MAX(CASE WHEN run >= floor((2 * CAST(n AS DOUBLE) + 2) / 4)
                        THEN v END) AS q2,
               MAX(CASE WHEN run >= floor((3 * CAST(n AS DOUBLE) + 1) / 4)
                        THEN v END) AS q3
        FROM (SELECT v, SUM(cnt) OVER (ORDER BY v DESC) AS run,
                     SUM(cnt) OVER () AS n FROM rh)
    ),
    fcut AS (
        SELECT MAX(CASE WHEN run >= floor((CAST(n AS DOUBLE) + 3) / 4)
                        THEN v END) AS q1,
               MAX(CASE WHEN run >= floor((2 * CAST(n AS DOUBLE) + 2) / 4)
                        THEN v END) AS q2,
               MAX(CASE WHEN run >= floor((3 * CAST(n AS DOUBLE) + 1) / 4)
                        THEN v END) AS q3
        FROM (SELECT v, SUM(cnt) OVER (ORDER BY v DESC) AS run,
                     SUM(cnt) OVER () AS n FROM fh)
    ),
    mcut AS (
        SELECT MAX(CASE WHEN run >= floor((CAST(n AS DOUBLE) + 3) / 4)
                        THEN v END) AS q1,
               MAX(CASE WHEN run >= floor((2 * CAST(n AS DOUBLE) + 2) / 4)
                        THEN v END) AS q2,
               MAX(CASE WHEN run >= floor((3 * CAST(n AS DOUBLE) + 1) / 4)
                        THEN v END) AS q3
        FROM (SELECT v, SUM(cnt) OVER (ORDER BY v DESC) AS run,
                     SUM(cnt) OVER () AS n FROM mh)
    ),
    scored AS (
        SELECT
            CASE WHEN rec >= rcut.q1 THEN 1
                 WHEN rec >= rcut.q2 THEN 2
                 WHEN rec >= rcut.q3 THEN 3
                 ELSE 4 END AS r_score,
            CASE WHEN freq >= fcut.q1 THEN 4
                 WHEN freq >= fcut.q2 THEN 3
                 WHEN freq >= fcut.q3 THEN 2
                 ELSE 1 END AS f_score,
            CASE WHEN mon >= mcut.q1 THEN 4
                 WHEN mon >= mcut.q2 THEN 3
                 WHEN mon >= mcut.q3 THEN 2
                 ELSE 1 END AS m_score,
            mon
        FROM cust CROSS JOIN rcut CROSS JOIN fcut CROSS JOIN mcut
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(mon) AS BIGINT) AS total_monetary_h
    FROM scored GROUP BY 1, 2, 3
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic CRM / retention analysis:
    score every customer 1-4 on Recency (days since last order, lower
    better), Frequency (order count), Monetary (lifetime revenue at a
    $100 grain), then report segment sizes and value per (R,F,M) cell
    (<=64 bounded rows — "champions" 444 down to "hibernating" 111).

    Scale discipline = quality_percentile_buckets': NO ntile over raw
    customers — quartile cutoffs come from the bounded per-dimension
    value HISTOGRAMS (recency <= calendar days, frequency <= max orders
    per customer, monetary quantized to $100 grains), each with a
    running sum over that bounded table, then one broadcast 1-row
    cutoff frame and a map-only CASE per dimension.  All values exact
    integers; bucket boundary ties land whole-grain on the better-score
    side (>= cutoff), deterministic on both engines.  Recency scores
    invert (small = recent = 4) by bucketing on the DESC running sum of
    days-ago, mirrored exactly in the oracle."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("c"), "mx")
        .agg(
            F.datediff("mx", F.max("o_orderdate")).cast("long").alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.floor(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                / 10000
            )
            .cast("long")
            .alias("mon"),
        )
        .drop("mx")
    )
    # four consumers (three cutoff branches + the scoring join):
    # truncate so the per-customer rollup runs once (the
    # graph_knn_triangles idiom; one row per customer)
    cust = cust.localCheckpoint(eager=False)

    def cutoffs(df, col):
        h = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        wd = Window.orderBy(F.col("v").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        # bounded window: one row per distinct integer grain (calendar
        # days / order counts / $100 revenue grains — closed domains)
        rs = h.select(
            "v",
            F.sum("cnt").over(wd).alias("run"),
            F.sum("cnt").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        def t(mult, add):
            return F.floor((mult * F.col("n").cast("double") + add) / 4)
        return rs.agg(
            F.max(F.when(F.col("run") >= t(1, 3), F.col("v"))).alias("q1"),
            F.max(F.when(F.col("run") >= t(2, 2), F.col("v"))).alias("q2"),
            F.max(F.when(F.col("run") >= t(3, 1), F.col("v"))).alias("q3"),
        )

    rcut = cutoffs(cust, "rec").select(
        F.col("q1").alias("rq1"), F.col("q2").alias("rq2"), F.col("q3").alias("rq3")
    )
    fcut = cutoffs(cust, "freq").select(
        F.col("q1").alias("fq1"), F.col("q2").alias("fq2"), F.col("q3").alias("fq3")
    )
    mcut = cutoffs(cust, "mon").select(
        F.col("q1").alias("mq1"), F.col("q2").alias("mq2"), F.col("q3").alias("mq3")
    )
    r_score = (
        F.when(F.col("rec") >= F.col("rq1"), 1)
        .when(F.col("rec") >= F.col("rq2"), 2)
        .when(F.col("rec") >= F.col("rq3"), 3)
        .otherwise(4)
    )
    f_score = (
        F.when(F.col("freq") >= F.col("fq1"), 4)
        .when(F.col("freq") >= F.col("fq2"), 3)
        .when(F.col("freq") >= F.col("fq3"), 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("mon") >= F.col("mq1"), 4)
        .when(F.col("mon") >= F.col("mq2"), 3)
        .when(F.col("mon") >= F.col("mq3"), 2)
        .otherwise(1)
    )
    return (
        cust.crossJoin(F.broadcast(rcut))
        .crossJoin(F.broadcast(fcut))
        .crossJoin(F.broadcast(mcut))
        .select(
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
            "mon",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon").cast("long").alias("total_monetary_h"),
        )
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation, c.c_custkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(floor(10000000000.0
                      * CAST(SUM(CAST(rev_c AS DECIMAL(19,0))
                                 * CAST(rev_c AS DECIMAL(19,0))) AS DOUBLE)
                      / (CAST(SUM(rev_c) AS DOUBLE) * SUM(rev_c))
                      + 0.5) AS BIGINT) AS hhi_e10
    FROM cust GROUP BY nation
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of customer revenue per nation — the
    antitrust-standard concentration measure (Σ share², 1/n for a flat
    market, 1.0 for a monopoly), the square-law companion to
    agg_gini_coefficient: HHI weights the head, Gini the whole curve,
    and screening rules quote HHI.

    NO ranking needed (unlike Gini) — HHI is Σ rev² / (Σ rev)², two
    plain sums, so this one stays a pure two-level aggregate with
    map-side partials at any scale: the exact-median cost class does
    not apply.  Σ rev² MUST accumulate in DECIMAL — cents² overflows
    int64 at just ~$40M of lifetime revenue (measured: the BIGINT
    formulation threw ARITHMETIC_OVERFLOW at sf0.1), so the exact
    square-sum rides decimal(38,0) on both engines, still partial-agg
    mergeable; the single division quantizes at 1e-10
    (HHI lives in [1/n, 1], so micro units would crush small markets).
    The two SUM(rev_c) references are the identical expression — one
    aggregate buffer, squared once in the final projection, same shape
    both engines."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    rev_dec = F.col("rev_c").cast("decimal(19,0)")
    hhi = F.floor(
        F.lit(10000000000.0)
        * F.sum(rev_dec * rev_dec).cast("double")
        / (F.sum("rev_c").cast("double") * F.sum("rev_c"))
        + F.lit(0.5)
    ).cast("long")
    return cust.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_customers"),
        hhi.alias("hhi_e10"),
    )


@query(
    "analytics_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand AS brand, p.p_partkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rev_c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_partkey
    ),
    ranked AS (
        SELECT brand, rev_c,
               SUM(rev_c) OVER (PARTITION BY brand
                                ORDER BY rev_c DESC, p_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(rev_c) OVER (PARTITION BY brand) AS tot
        FROM rev
    ),
    classed AS (
        SELECT brand, rev_c,
               CASE WHEN 100 * cum <= 80 * tot THEN 'A'
                    WHEN 100 * cum <= 95 * tot THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked
    )
    SELECT brand, abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY brand, abc
    """,
)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification per brand — the
    operations-management classic: rank parts by revenue, class A =
    parts inside the top 80% of cumulative brand revenue, B = next 15%,
    C = tail; purchasing policies key off exactly these classes.

    ALL-INTEGER class boundaries: revenues in cents, the 80%/95% tests
    are the cross-multiplied comparisons 100·cum <= 80·tot (no share
    division, no float anywhere before the output — the hash compare is
    exact by construction; overflow bound ~100·tot stated like the
    CUSUM rule, rescale to dollars past ~10^16 cents/brand).  Ranking
    ties break by part key, so class assignment is engine-stable.  Cost
    class: exact-median (one ranked pass per brand); at unbounded parts
    per group, classify against histogram-bracketed cumulative cutoffs
    instead (the RFM discipline)."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "p_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("rev_c")
        )
    )
    wrun = (
        Window.partitionBy("brand")
        .orderBy(F.col("rev_c").desc(), "p_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.select(
        "brand",
        "rev_c",
        F.sum("rev_c").over(wrun).alias("cum"),
        F.sum("rev_c").over(Window.partitionBy("brand")).alias("tot"),
    )
    abc = (
        F.when(100 * F.col("cum") <= 80 * F.col("tot"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        ranked.select("brand", "rev_c", abc.alias("abc"))
        .groupBy("brand", "abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_c").cast("long").alias("revenue_cents"),
        )
    )


@query(
    "analytics_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM part
    )
    SELECT p.p_partkey, p.p_brand, p.p_size, p.price_c
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE (q.price_c < p.price_c AND q.p_size >= p.p_size)
           OR (q.price_c <= p.price_c AND q.p_size > p.p_size)
    )
    """,
)
def analytics_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) of the part catalog — minimize price,
    maximize size: the parts no other part beats on both axes (the
    classic "best hotels" operator relational engines lack).  A part is
    dominated by any strictly-cheaper part of at least its size, or any
    strictly-larger part at no higher price; ties on both axes
    co-survive.

    Scale design — NO all-pairs: p_size is a closed integer domain
    (1..50, pinned in tests), so dominance collapses to a bounded
    sweep: per-size MIN price (one map-side-combinable shuffle), a
    suffix-min over the <=50-row size histogram (bounded partition-less
    window, by construction) yielding, per size s, the cheapest price
    at size >= s and at size > s, then ONE broadcast join back and a
    map-only filter.  The corpus never self-joins — at 100 TB the only
    data-sized stages are the histogram aggregate and the broadcast
    filter; the same pattern grids both axes when neither domain is
    closed.  The DuckDB oracle is the INDEPENDENT quadratic NOT EXISTS
    formulation, so the bounded-sweep rewrite is verified against the
    definition itself, not a mirror of its own arithmetic.  Prices
    compare as exact centi-integers."""
    tune(spark)
    pts = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    hist = pts.groupBy("p_size").agg(F.min("price_c").alias("minp"))
    w_ge = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_gt = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cut = hist.select(
        "p_size",
        F.min("minp").over(w_ge).alias("best_ge"),
        F.min("minp").over(w_gt).alias("best_gt"),
    )
    j = pts.join(F.broadcast(cut), "p_size")
    dominated = (F.col("best_ge") < F.col("price_c")) | (
        F.col("best_gt").isNotNull() & (F.col("best_gt") <= F.col("price_c"))
    )
    return j.filter(~dominated).select(
        "p_partkey", "p_brand", "p_size", "price_c"
    )


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH sc AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    proj AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
        FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT s1 AS src, s2 AS dst, shared FROM proj
        UNION ALL
        SELECT s2 AS src, s1 AS dst, shared FROM proj
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM directed
        ) WHERE rn <= {_KNN_K}
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM knn
    ),
    adj AS (
        SELECT a AS v, b AS n FROM edges
        UNION ALL
        SELECT b AS v, a AS n FROM edges
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    wedges AS (
        SELECT x.v AS u, y.v AS v,
               CAST(floor(1000000.0 / ln(dz.d) + 0.5) AS BIGINT)
                   AS contrib_micro
        FROM adj x
        JOIN adj y ON x.n = y.n AND x.v < y.v
        JOIN deg dz ON dz.v = x.n
    )
    SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
           CAST(SUM(contrib_micro) AS BIGINT) AS aa_micro
    FROM wedges GROUP BY u, v
    ORDER BY aa_micro DESC, u, v LIMIT 20
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction score over the kNN-sparsified
    co-purchase graph (Adamic & Adar 2003): AA(u,v) =
    Sum over common neighbors z of 1/ln(deg(z)) — rare shared partners
    count more than hubs, which is exactly what neighborhood Jaccard
    (graph_jaccard_neighbors) cannot express.  Top-20 predicted pairs.

    Float-reduction discipline: each wedge's 1/ln(deg(z)) is
    micro-quantized to BIGINT BEFORE the sum, so the per-pair score is
    an EXACT integer sum (order-free) — raw double sums over wedges
    would be partial-aggregation-order dependent and could never
    hash-match.  A shared neighbor is adjacent to both endpoints, so
    deg(z) >= 2 and ln is never zero.

    Scale: identical wedge-enumeration bound as the Jaccard twin
    (sum-of-deg^2, k^2|V| on the sparsified graph); the degree lookup
    joins on the wedge's CENTER — one broadcastable |V|-row dim."""
    tune(spark)
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    x = adj.select(F.col("v").alias("u"), "n")
    y = adj.select(F.col("v").alias("v"), "n")
    dz = deg.select(F.col("v").alias("n"), F.col("d").alias("dz"))
    contrib = F.floor(
        F.lit(1000000.0) / F.log(F.col("dz").cast("double")) + F.lit(0.5)
    ).cast("long")
    wedges = (
        x.join(y, "n")
        .filter(F.col("u") < F.col("v"))
        .join(F.broadcast(dz), "n")
        .select("u", "v", contrib.alias("contrib_micro"))
    )
    return (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("contrib_micro").cast("long").alias("aa_micro"),
        )
        .orderBy(F.col("aa_micro").desc(), "u", "v")
        .limit(20)
    )


@query(
    "agg_theil_index",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    tot AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS s
        FROM cust GROUP BY nation
    ),
    terms AS (
        SELECT c.nation, t.n, t.s,
               CAST(floor(1000000.0
                    * (CAST(c.rev_c * t.n AS DOUBLE) / t.s)
                    * ln(CAST(c.rev_c * t.n AS DOUBLE) / t.s)
                    + 0.5) AS BIGINT) AS t_micro,
               CAST(floor(1000000.0
                    * ln(CAST(c.rev_c * t.n AS DOUBLE) / t.s)
                    + 0.5) AS BIGINT) AS m_micro
        FROM cust c JOIN tot t USING (nation)
    )
    SELECT nation, CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(floor(CAST(SUM(t_micro) AS DOUBLE) / MAX(n) + 0.5)
                AS BIGINT) AS theil_t_micro,
           CAST(floor(-CAST(SUM(m_micro) AS DOUBLE) / MAX(n) + 0.5)
                AS BIGINT) AS theil_l_micro
    FROM terms GROUP BY nation
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and Theil L (mean log deviation) of customer revenue per
    nation — the DECOMPOSABLE inequality indices beside
    agg_gini_coefficient: unlike Gini, Theil splits exactly into
    within-group + between-group terms, which is what a marketplace
    health dashboard wants when it asks "is inequality rising inside
    segments or between them?".  T = (1/n) sum (x/mu) ln(x/mu);
    L = (1/n) sum ln(mu/x).

    Order-free: revenue is exact cents, the ratio x/mu = x*n/S is an
    integer product over an integer sum, and each row's ln term is
    micro-quantized to BIGINT BEFORE the per-group sum (the adamic-adar
    float-reduction doctrine) — so the index is partitioning-invariant
    and needs no ranked pass (Gini ranks; Theil is ONE unordered
    aggregate plus a broadcast-back, strictly cheaper at scale).

    Scale: per-customer rollup is the only corpus-sized stage; the
    group-total dim broadcasts; per-shard (n, S, sum t_micro) partials
    ADD."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    tot = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").cast("long").alias("s"),
    )
    ratio = (F.col("rev_c") * F.col("n")).cast("double") / F.col("s")
    micro = lambda col: F.floor(F.lit(1000000.0) * col + F.lit(0.5)).cast(
        "long"
    )
    terms = cust.join(F.broadcast(tot), "nation").select(
        "nation",
        "n",
        micro(ratio * F.log(ratio)).alias("t_micro"),
        micro(F.log(ratio)).alias("m_micro"),
    )
    return terms.groupBy("nation").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.floor(
            F.sum("t_micro").cast("double") / F.max("n") + F.lit(0.5)
        )
        .cast("long")
        .alias("theil_t_micro"),
        F.floor(
            -F.sum("m_micro").cast("double") / F.max("n") + F.lit(0.5)
        )
        .cast("long")
        .alias("theil_l_micro"),
    )


@query(
    "agg_atkinson_index",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    sums AS (
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS s,
               CAST(SUM(CAST(floor(1000000.0
                    * ln(CAST(rev_c AS DOUBLE)) + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_ln_micro,
               CAST(SUM(CAST(floor(1000000.0
                    * sqrt(CAST(rev_c AS DOUBLE)) + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_sq_micro
        FROM cust GROUP BY nation
    )
    SELECT nation, n AS n_customers,
           CAST(floor(1000000.0
                * (1.0 - exp(CAST(sum_ln_micro AS DOUBLE)
                             / 1000000.0 / n)
                         / (CAST(s AS DOUBLE) / n))
                + 0.5) AS BIGINT) AS atkinson_e1_micro,
           CAST(floor(1000000.0
                * (1.0 - (CAST(sum_sq_micro AS DOUBLE) / 1000000.0 / n)
                         * (CAST(sum_sq_micro AS DOUBLE) / 1000000.0 / n)
                         / (CAST(s AS DOUBLE) / n))
                + 0.5) AS BIGINT) AS atkinson_e05_micro
    FROM sums
    """,
)
def agg_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index of customer revenue per nation at
    epsilon = 1 (A = 1 - geomean/mean) and epsilon = 0.5
    (A = 1 - (mean sqrt x)^2 / mean x) — the WELFARE-weighted member of
    the inequality family (Gini weights by rank, Theil by share; Atkinson
    makes the analyst's aversion-to-inequality parameter explicit, so two
    dashboards can disagree on epsilon without disagreeing on data).

    One unordered pass: exact-cent revenues, each row's ln and sqrt
    micro-quantized to BIGINT before the group sums (ln via each
    engine's libm agrees far below the 1e-6 quantum; sqrt is
    IEEE-exact), then both indices evaluate one identical expression
    shape per engine.  Revenue is strictly positive so no domain guard
    is needed — customers with no orders never enter the join.

    Scale: additive (n, S, sum_ln, sum_sqrt) partials — the index of
    any rollup grain is four-integer arithmetic, no ranked pass."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    micro = lambda col: F.floor(F.lit(1000000.0) * col + F.lit(0.5)).cast(
        "long"
    )
    x = F.col("rev_c").cast("double")
    sums = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").cast("long").alias("s"),
        F.sum(micro(F.log(x))).cast("long").alias("sum_ln_micro"),
        F.sum(micro(F.sqrt(x))).cast("long").alias("sum_sq_micro"),
    )
    n = F.col("n")
    mean = F.col("s").cast("double") / n
    mean_ln = F.col("sum_ln_micro").cast("double") / F.lit(1000000.0) / n
    mean_sq = F.col("sum_sq_micro").cast("double") / F.lit(1000000.0) / n
    return sums.select(
        "nation",
        n.alias("n_customers"),
        micro(F.lit(1.0) - F.exp(mean_ln) / mean).alias(
            "atkinson_e1_micro"
        ),
        micro(F.lit(1.0) - mean_sq * mean_sq / mean).alias(
            "atkinson_e05_micro"
        ),
    )


@query(
    "analytics_lorenz_points",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation, c.c_custkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    deciled AS (
        SELECT nation, rev_c,
               NTILE(10) OVER (PARTITION BY nation
                               ORDER BY rev_c, c_custkey) AS decile
        FROM cust
    ),
    per AS (
        SELECT nation, decile,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(rev_c) AS BIGINT) AS cents_i
        FROM deciled GROUP BY nation, decile
    )
    SELECT nation, decile, n_i, cents_i,
           CAST(floor(1000000.0
                * CAST(SUM(cents_i) OVER (PARTITION BY nation
                                          ORDER BY decile) AS DOUBLE)
                / SUM(cents_i) OVER (PARTITION BY nation)
                + 0.5) AS BIGINT) AS cum_share_micro
    FROM per
    """,
)
def analytics_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve sampled at revenue deciles per nation — the CURVE
    the scalar inequality family (Gini/Theil/Atkinson) summarizes:
    cumulative revenue share held by the bottom k/10 of customers.  The
    dashboard artifact itself ("the bottom half holds 9% of revenue"),
    and the mergeable bracket for Gini at unbounded scale (SCALE.md).

    ALL-INTEGER: exact-cent revenues, NTILE over the deterministic
    (revenue, custkey) order (both engines fill leading buckets first —
    SQL-standard NTILE), per-decile sums and the cumulative window are
    BIGINT; one final share division, micro-quantized.  Groups smaller
    than 10 fill only their first n buckets, identically on both
    engines.

    Scale: the ranked pass is per-nation (the Gini cost class); past
    that, swap NTILE for bucketed histogram cut points — the decile
    table itself is O(groups x 10) forever."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    wd = Window.partitionBy("nation").orderBy("rev_c", "c_custkey")
    per = (
        cust.select(
            "nation", "rev_c", F.ntile(10).over(wd).alias("decile")
        )
        .groupBy("nation", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum("rev_c").cast("long").alias("cents_i"),
        )
    )
    wc = Window.partitionBy("nation").orderBy("decile")
    wp = Window.partitionBy("nation")
    return per.select(
        "nation",
        "decile",
        "n_i",
        "cents_i",
        F.floor(
            F.lit(1000000.0)
            * F.sum("cents_i").over(wc).cast("double")
            / F.sum("cents_i").over(wp)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cum_share_micro"),
    )


@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH sc AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    proj AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
        FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT s1 AS src, s2 AS dst, shared FROM proj
        UNION ALL
        SELECT s2 AS src, s1 AS dst, shared FROM proj
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM directed
        ) WHERE rn <= {_KNN_K}
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM knn
    ),
    adj AS (
        SELECT a AS v, b AS n FROM edges
        UNION ALL
        SELECT b AS v, a AS n FROM edges
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    pairs AS (
        SELECT da.d AS x, db.d AS y
        FROM edges e
        JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
        UNION ALL
        SELECT db.d AS x, da.d AS y
        FROM edges e
        JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0 THEN
               CAST(floor(1000000.0
                    * CAST(m * sxy - sx * sy AS DOUBLE)
                    / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                       * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
                    + 0.5) AS BIGINT)
           END AS assortativity_micro
    FROM sums
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the kNN-sparsified co-purchase graph —
    Newman's r: the Pearson correlation of endpoint degrees over
    directed edge stubs.  The one-number topology summary the graph
    family was missing: hub-to-hub wiring (r > 0, social-network-like)
    vs hub-to-leaf (r < 0, infrastructure-like) changes which
    partitioning strategy survives at scale — disassortative graphs
    salt their hubs, assortative ones bucket cleanly.

    Each undirected edge contributes both stub orientations, so the
    moment sums are exact BIGINTs over a deterministic pair set; r is
    one closed-form expression per engine against two sqrts,
    micro-quantized; degenerate regular graphs (zero degree variance)
    emit NULL identically.  Same edge set as graph_knn_triangles
    (localCheckpoint-truncated once), same k**2*|V| sparsification bound.

    Scale: degrees broadcast onto edges; moment sums are additive
    partials — the correlation of any subgraph rollup merges from six
    integers."""
    tune(spark)
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("dxa"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("dxb"))
    ed = edges.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    pairs = ed.select(
        F.col("dxa").alias("x"), F.col("dxb").alias("y")
    ).unionByName(ed.select(F.col("dxb").alias("x"), F.col("dxa").alias("y")))
    sums = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    j = sums.crossJoin(F.broadcast(nn))
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    vx = m * F.col("sxx") - sx * sx
    vy = m * F.col("syy") - sy * sy
    return j.select(
        "n_nodes",
        (m / 2).cast("long").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                F.lit(1000000.0)
                * (m * F.col("sxy") - sx * sy).cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
                + F.lit(0.5)
            ).cast("long"),
        ).alias("assortativity_micro"),
    )


@query("graph_kcore", oracle=None)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core decomposition of the kNN-sparsified co-purchase graph by
    iterative degree peeling — the ITERATIVE-algorithm showpiece beside
    dedup_cluster_cc's pointer jumping: repeatedly drop nodes of degree
    < 3 (each round one aggregate + one semi-join, lineage truncated by
    localCheckpoint) until the node set is stable.  The 3-core is the
    standard "dense backbone" extraction before community detection or
    influence ranking.

    Driver state is O(1) per round (the surviving-node count); data
    never collects.  Convergence is bounded by the peel depth (the
    degeneracy ordering's layer count — single digits on sparsified
    kNN graphs; a 50-round safety cap turns a logic bug into a loud
    error, never an infinite loop).  Rows-only by design: recursive
    peeling has no fixed-depth ANSI-SQL twin (DuckDB's recursive CTEs
    are append-only and cannot express simultaneous set shrinkage);
    correctness is pinned by an imperative Python replay test
    (tests/test_properties.py) asserting the exact surviving set and
    the in-core degree invariant.

    Driver sees (sf0.01): 100 rows; columns (v, core_deg).

    Scale: each round touches only surviving edges (monotonically
    shrinking); at 100 TB the peel runs the same plan with the edge
    set hash-partitioned on v — no broadcast of corpus-sized state."""
    tune(spark)
    k = 3
    edges = _knn_edges(spark, sf_dir).select("a", "b").localCheckpoint(
        eager=True
    )
    for _ in range(50):
        adj = edges.select(F.col("a").alias("v")).unionByName(
            edges.select(F.col("b").alias("v"))
        )
        deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("v")
        nxt = (
            edges.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == edges.count():
            edges = nxt
            break
        edges = nxt
    else:
        raise RuntimeError("k-core peel failed to converge in 50 rounds")
    adj = edges.select(F.col("a").alias("v")).unionByName(
        edges.select(F.col("b").alias("v"))
    )
    return (
        adj.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        .orderBy("v")
    )


@query(
    "analytics_pareto_8020",
    oracle="""
    WITH cust AS (
        SELECT c.c_nationkey AS nation, c.c_custkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
        SELECT nation, rev_c,
               ROW_NUMBER() OVER w AS rk,
               CAST(SUM(rev_c) OVER (PARTITION BY nation
                                     ORDER BY rev_c DESC, c_custkey)
                    AS BIGINT) AS cum_c,
               CAST(SUM(rev_c) OVER (PARTITION BY nation) AS BIGINT)
                   AS tot_c,
               COUNT(*) OVER (PARTITION BY nation) AS n
        FROM cust
        WINDOW w AS (PARTITION BY nation ORDER BY rev_c DESC, c_custkey)
    )
    SELECT nation,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(MIN(CASE WHEN 10 * cum_c >= 8 * tot_c THEN rk END)
                AS BIGINT) AS k_80,
           CAST(floor(1000000.0
                * CAST(MIN(CASE WHEN 10 * cum_c >= 8 * tot_c
                           THEN rk END) AS DOUBLE) / MAX(n) + 0.5)
                AS BIGINT) AS k_share_micro
    FROM ranked GROUP BY nation
    """,
)
def analytics_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto 80/20 point per nation: the SMALLEST number of customers
    whose combined revenue reaches 80% of the nation's total, and the
    share of the base they represent — the inverse question to
    analytics_revenue_concentration's fixed-k share, and the scalar a
    sales team actually quotes ("11% of accounts are 80% of revenue").

    ALL-INTEGER threshold: 10*cum_cents >= 8*total_cents avoids any
    share double before the single quantized k/n division; the rank
    order ties on custkey (engine-stable, the Gini discipline); the
    Lorenz-curve machinery (analytics_lorenz_points) is its graphical
    twin from the same ranked pass.

    Scale: one per-nation ranked pass (the Gini cost class); at
    unbounded group size bracket the 80% point from the mergeable
    revenue histogram instead of the exact rank."""
    tune(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_c")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("rev_c").desc(), "c_custkey"
    )
    wp = Window.partitionBy("nation")
    ranked = cust.select(
        "nation",
        F.row_number().over(w).alias("rk"),
        F.sum("rev_c")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_c"),
        F.sum("rev_c").over(wp).cast("long").alias("tot_c"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    hit = F.when(
        F.lit(10) * F.col("cum_c") >= F.lit(8) * F.col("tot_c"),
        F.col("rk"),
    )
    return ranked.groupBy("nation").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.min(hit).cast("long").alias("k_80"),
        F.floor(
            F.lit(1000000.0) * F.min(hit).cast("double") / F.max("n")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("k_share_micro"),
    )


@query(
    "analytics_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(CAST(EXTRACT(year FROM o_orderdate) * 12
                        + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT))
                   AS m0
        FROM orders GROUP BY o_custkey
    ),
    sized AS (
        SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY m0
    ),
    aged AS (
        SELECT f.m0,
               CAST(EXTRACT(year FROM o.o_orderdate) * 12
                    + EXTRACT(month FROM o.o_orderdate) - 1 - f.m0
                    AS BIGINT) AS age,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT a.m0 AS cohort_month, a.age, a.n_orders, s.cohort_size,
           CAST(SUM(a.cents) OVER (PARTITION BY a.m0 ORDER BY a.age)
                AS BIGINT) AS cum_cents,
           CAST(floor(1000000.0
                * CAST(SUM(a.cents) OVER (PARTITION BY a.m0
                                          ORDER BY a.age) AS DOUBLE)
                / 100.0 / s.cohort_size + 0.5) AS BIGINT)
               AS ltv_per_customer_micro
    FROM aged a JOIN sized s ON a.m0 = s.m0
    """,
)
def analytics_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, cumulative revenue per customer tracked by months-since-
    first-order — the growth team's core artifact ("does the March
    cohort monetize faster than January's?"), the revenue-weighted
    sibling of win_retention_cohort's activity matrix.

    Month arithmetic is pure integers (year*12 + month), revenue is
    exact cents, the cumulative window runs over the bounded age axis
    per cohort, and the only division is the final per-customer
    normalization, micro-quantized.  Cohort sizes join back from the
    firsts table, so denominators are the TRUE cohort population, not
    just buyers active at that age (the classic LTV-inflation bug,
    stated here because dashboards keep shipping it).

    Scale: one first-order aggregate + one (cohort, age) rollup — both
    map-side combined; the curve table is |cohorts| x |ages|."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    firsts = o.groupBy("o_custkey").agg(F.min(m).alias("m0"))
    sized = firsts.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    aged = (
        o.join(firsts, "o_custkey")
        .groupBy("m0", (m - F.col("m0")).cast("long").alias("age"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
    )
    wc = Window.partitionBy("m0").orderBy("age")
    cum = F.sum("cents").over(wc).cast("long")
    return (
        aged.join(F.broadcast(sized), "m0")
        .select(
            F.col("m0").alias("cohort_month"),
            "age",
            "n_orders",
            "cohort_size",
            cum.alias("cum_cents"),
            F.floor(
                F.lit(1000000.0)
                * cum.cast("double")
                / F.lit(100.0)
                / F.col("cohort_size")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ltv_per_customer_micro"),
        )
    )


@query(
    "analytics_leadtime_percentiles",
    oracle="""
    WITH lt AS (
        SELECT o.o_orderpriority,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS days
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    ranked AS (
        SELECT o_orderpriority, days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY days) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM lt
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                    THEN days END) AS BIGINT) AS p90_days,
           CAST(MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN days END) AS BIGINT) AS p99_days
    FROM ranked GROUP BY o_orderpriority
    """,
)
def analytics_leadtime_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time percentiles (p50/p90/p99 days) per order
    priority — the fulfillment-SLA report ("URGENT orders ship in 3
    days at p50, but p99 is 40 — the tail is the problem"), the
    supply-chain sibling of analytics_late_orders' binary lateness.

    Type-DISC order statistics on integer day counts: row_number over
    days alone is tie-ambiguous between engines, but the VALUE at the
    ceil(q*n)-th position is the q-th order statistic regardless of how
    equal days are interleaved — the selected column IS the ordering
    key (the standard order-statistic argument, relied on here instead
    of a tiebreak).  No floats anywhere; interpolating percentiles on
    DAYS would manufacture fractional days no warehouse can ship in.

    Scale: one join + one per-priority rank window (the exact-median
    cost class); at unbounded group size swap the exact rank for the
    GK sketch in exact-bracket mode (agg_approx_percentile's path)."""
    tune(spark)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lt = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("days")
    wp = Window.partitionBy("o_orderpriority")
    ranked = lt.select(
        "o_orderpriority",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    pick = lambda q: F.max(
        F.when(
            F.col("rn")
            == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("days"),
        )
    ).cast("long")
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lines"),
        pick(0.5).alias("p50_days"),
        pick(0.9).alias("p90_days"),
        pick(0.99).alias("p99_days"),
    )


@query(
    "analytics_state_dwell_time",
    oracle="""
    WITH iv AS (
        SELECT event_type,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                   - epoch_us(ts) AS dwell_us
        FROM events
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dwell_us) AS BIGINT) AS dwell_us_total
        FROM iv WHERE dwell_us IS NOT NULL GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(dwell_us_total) AS BIGINT) AS t FROM agg)
    SELECT a.event_type, a.n_intervals, a.dwell_us_total,
           CAST(floor(1000000.0 * CAST(a.dwell_us_total AS DOUBLE) / t.t
                + 0.5) AS BIGINT) AS share_micro
    FROM agg a CROSS JOIN tot t
    """,
)
def analytics_state_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State dwell-time occupancy: treating each user's latest event as
    their current STATE, how much wall-clock time does the population
    spend in each state?  The duration-weighted companion to
    analytics_markov_transitions' count-weighted matrix — counts say
    'error' is 20% of transitions; dwell time says users sit in the
    error state 3x longer than in view, which is the actual UX pain
    metric.  Each user's final open-ended interval is excluded (no
    LEAD), identically on both engines.

    Integer epoch-microsecond arithmetic end-to-end; the single share
    division quantizes against a broadcast total (no partition-less
    window).

    Scale: one shuffle on user_id with a partition-local sort (the
    sessionize cost class); the state rollup is |types|-sized."""
    tune(spark)
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "event_type",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
            "dwell_us"
        ),
    ).filter(F.col("dwell_us").isNotNull())
    agg = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dwell_us").cast("long").alias("dwell_us_total"),
    )
    tot = agg.agg(F.sum("dwell_us_total").cast("long").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_intervals",
        "dwell_us_total",
        F.floor(
            F.lit(1000000.0)
            * F.col("dwell_us_total").cast("double")
            / F.col("t")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("share_micro"),
    )


@query(
    "analytics_priority_mix_shift",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                    + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
               o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    tot AS (
        SELECT m, CAST(SUM(n) AS BIGINT) AS t FROM monthly GROUP BY m
    ),
    shares AS (
        SELECT mo.m, mo.pri, mo.n, t.t,
               CAST(floor(1000000.0 * CAST(mo.n AS DOUBLE) / t.t + 0.5)
                    AS BIGINT) AS share_micro
        FROM monthly mo JOIN tot t ON mo.m = t.m
    ),
    prevs AS (
        SELECT m + 1 AS m, pri, share_micro FROM shares
    ),
    paired AS (
        SELECT COALESCE(cur.m, pv.m) AS m,
               COALESCE(cur.pri, pv.pri) AS pri,
               COALESCE(cur.share_micro, 0) AS p,
               COALESCE(pv.share_micro, 0) AS q
        FROM shares cur
        FULL OUTER JOIN prevs pv ON pv.m = cur.m AND pv.pri = cur.pri
    ),
    terms AS (
        SELECT m, pri, p, q,
               -- JS divergence cell terms, micro-quantized before the sum
               CAST(CASE WHEN p > 0 THEN
                   CAST(floor(0.5 * p
                        * ln(2.0 * CAST(p AS DOUBLE) / (p + q)) + 0.5)
                        AS BIGINT)
               ELSE 0 END
               + CASE WHEN q > 0 THEN
                   CAST(floor(0.5 * q
                        * ln(2.0 * CAST(q AS DOUBLE) / (p + q)) + 0.5)
                        AS BIGINT)
               ELSE 0 END AS BIGINT) AS js_term_micro
        FROM paired pa
        WHERE EXISTS (SELECT 1 FROM tot t2 WHERE t2.m = pa.m - 1)
          AND EXISTS (SELECT 1 FROM tot t3 WHERE t3.m = pa.m)
    )
    SELECT m AS month_idx,
           CAST(COUNT(*) AS BIGINT) AS n_priorities,
           CAST(SUM(js_term_micro) AS BIGINT) AS js_divergence_micro
    FROM terms GROUP BY m
    """,
)
def analytics_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order-priority MIX-SHIFT alarm: the
    Jensen-Shannon divergence between each month's priority share
    vector and the previous month's — the composition-drift detector
    volume metrics can't see (total orders flat while the urgent share
    doubles is a supply-chain fire with a quiet dashboard).  The
    temporal sibling of quality_distribution_drift (which compares
    value distributions) applied at the categorical-mix grain.

    Shares are quantized to micro BIGINT first, each JS cell term
    0.5*p*ln(2p/(p+q)) is quantized BEFORE the cross-priority sum
    (already micro-scaled — the terms carry the 1e6 share scale), and
    first-month rows (no predecessor) are excluded via an engine-
    identical EXISTS.  The month pair is a FULL OUTER join on (m, pri)
    over the union support (round-7 advisor fix): a priority APPEARING
    in month m enters with q = 0, and one VANISHING after month m-1
    enters with p = 0 — both directions contribute their finite JS
    term (JS, unlike KL, is finite on disjoint support — why it's the
    right alarm).  n_priorities therefore counts the union support of
    the two months, not just the current month's.

    Scale: one monthly aggregate, month-grain self-join on (m-1, pri)
    — calendar-bounded; the alarm table is |months|-sized."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    monthly = o.groupBy(
        m.alias("m"), F.col("o_orderpriority").alias("pri")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = monthly.groupBy("m").agg(F.sum("n").cast("long").alias("t"))
    shares = monthly.join(F.broadcast(tot), "m").select(
        "m",
        "pri",
        F.floor(
            F.lit(1000000.0) * F.col("n").cast("double") / F.col("t")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("share_micro"),
    )
    prev = shares.select(
        (F.col("m") + 1).alias("m"),
        F.col("pri").alias("pri"),
        F.col("share_micro").alias("q"),
    )
    months_with_prev = tot.select((F.col("m") + 1).alias("m"))
    months_present = tot.select("m")
    paired = (
        shares.withColumnRenamed("share_micro", "p")
        .join(prev, ["m", "pri"], "full")
        .join(months_with_prev, "m", "left_semi")
        .join(months_present, "m", "left_semi")
        .select(
            "m",
            "pri",
            F.coalesce(F.col("p"), F.lit(0)).alias("p"),
            F.coalesce(F.col("q"), F.lit(0)).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    term = (
        F.when(
            p > 0,
            F.floor(
                F.lit(0.5)
                * p
                * F.log(F.lit(2.0) * p.cast("double") / (p + q))
                + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0))
        + F.when(
            q > 0,
            F.floor(
                F.lit(0.5)
                * q
                * F.log(F.lit(2.0) * q.cast("double") / (p + q))
                + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0))
    ).cast("long")
    return paired.select(
        "m", "pri", term.alias("js_term_micro")
    ).groupBy(F.col("m").alias("month_idx")).agg(
        F.count(F.lit(1)).cast("long").alias("n_priorities"),
        F.sum("js_term_micro").cast("long").alias("js_divergence_micro"),
    )


@query(
    "analytics_shift_share",
    oracle="""
    WITH rev AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS y,
               n.n_name AS nation,
               CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS r
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT y, CAST(SUM(r) AS BIGINT) AS total FROM rev GROUP BY y),
    paired AS (
        SELECT cur.y, cur.nation,
               prv.r AS prev_cents, cur.r AS cur_cents,
               pt.total AS prev_total, ct.total AS cur_total
        FROM rev cur
        JOIN rev prv ON prv.nation = cur.nation AND prv.y = cur.y - 1
        JOIN tot ct ON ct.y = cur.y
        JOIN tot pt ON pt.y = cur.y - 1
    )
    SELECT y, nation, prev_cents, cur_cents,
           cur_cents - prev_cents AS delta_cents,
           CASE WHEN prev_total > 0 THEN
               CAST(floor(prev_cents
                    * (CAST(cur_total AS DOUBLE) / prev_total - 1.0)
                    + 0.5) AS BIGINT)
           END AS national_effect_cents,
           CASE WHEN prev_total > 0 THEN
               CAST((cur_cents - prev_cents)
                    - CAST(floor(prev_cents
                          * (CAST(cur_total AS DOUBLE) / prev_total - 1.0)
                          + 0.5) AS BIGINT) AS BIGINT)
           END AS competitive_effect_cents
    FROM paired
    """,
)
def analytics_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIFT-SHARE decomposition of year-over-year nation revenue — the
    regional-economics classic (Dunn 1960) every BI team reinvents:
    each nation's revenue change splits into the NATIONAL effect (what
    the nation would have gained had it merely tracked total growth:
    prev * (T_y/T_{y-1} - 1)) and the COMPETITIVE effect (the residual
    — how much the nation out- or under-performed the tide).  The two
    effects sum exactly to the observed delta by construction, which
    makes the report self-auditing.

    Money is exact cents BIGINT end-to-end; the only float is the
    single national-growth ratio, applied in ONE identical IEEE
    expression shape per engine and rounded to whole cents
    (floor(x+0.5)) so the competitive residual is again exact integer
    subtraction.  First year has no predecessor and emits no row
    (inner join on y-1).

    Scale: one fact-table aggregate to (year, nation) grain — the
    dims broadcast; everything after is |years x nations| arithmetic."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(cents).cast("long").alias("r"))
    )
    tot = rev.groupBy("y").agg(F.sum("r").cast("long").alias("total"))
    prv = rev.select(
        (F.col("y") + 1).alias("y"), "nation", F.col("r").alias("prev_cents")
    )
    ct = tot.select("y", F.col("total").alias("cur_total"))
    pt = tot.select((F.col("y") + 1).alias("y"), F.col("total").alias("prev_total"))
    paired = (
        rev.withColumnRenamed("r", "cur_cents")
        .join(prv, ["y", "nation"])
        .join(F.broadcast(ct), "y")
        .join(F.broadcast(pt), "y")
    )
    prev_c, cur_c = F.col("prev_cents"), F.col("cur_cents")
    nat = F.when(
        F.col("prev_total") > 0,
        F.floor(
            prev_c
            * (F.col("cur_total").cast("double") / F.col("prev_total") - F.lit(1.0))
            + F.lit(0.5)
        ).cast("long"),
    )
    return paired.select(
        "y",
        "nation",
        prev_c,
        cur_c,
        (cur_c - prev_c).alias("delta_cents"),
        nat.alias("national_effect_cents"),
        F.when(F.col("prev_total") > 0, (cur_c - prev_c) - nat)
        .cast("long")
        .alias("competitive_effect_cents"),
    )


@query(
    "graph_clustering_coeff",
    oracle=f"""
    WITH sc AS (
        SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    proj AS (
        SELECT a.s AS s1, b.s AS s2, COUNT(*) AS shared
        FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
        GROUP BY 1, 2
    ),
    directed AS (
        SELECT s1 AS src, s2 AS dst, shared FROM proj
        UNION ALL
        SELECT s2 AS src, s1 AS dst, shared FROM proj
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY shared DESC, dst) AS rn
            FROM directed
        ) WHERE rn <= {_KNN_K}
    ),
    edges AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM knn
    ),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
        ) GROUP BY v
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tri_per_node AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT x AS v FROM tri
            UNION ALL SELECT y AS v FROM tri
            UNION ALL SELECT z AS v FROM tri
        ) GROUP BY v
    )
    SELECT deg.v AS node_id, deg.d AS degree,
           COALESCE(t.t, CAST(0 AS BIGINT)) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
               CAST(floor(1000000.0
                    * CAST(2 * COALESCE(t.t, 0) AS DOUBLE)
                    / (deg.d * (deg.d - 1))
                    + 0.5) AS BIGINT)
           END AS local_coeff_micro
    FROM deg LEFT JOIN tri_per_node t ON deg.v = t.v
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient per node on the kNN-sparsified
    co-purchase graph — the per-node drill-down of
    graph_knn_triangles' global census: c_v = 2*t_v / (d_v*(d_v-1)),
    the fraction of each supplier's partner pairs that also partner
    with each other (Watts & Strogatz 1998).  High-degree, low-c nodes
    are the BROKERS between communities; high-c nodes sit inside
    cliques — the standard community-structure signal.

    Per-node triangle counts come from the same oriented a<b
    edge^3 join as the census, with each triangle credited to all
    three corners via a 3-way union; degrees and triangle counts are
    exact integers and the coefficient is the only float, one
    identical expression shape per engine, micro-quantized
    (degree-<2 nodes emit NULL on both).

    Scale: identical to graph_knn_triangles — the sparsified graph
    bounds the triangle join at O(k^2) per node; the per-node rollup
    adds two skinny aggregates.  Output is |V|-sized."""
    tune(spark)
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tpn = (
        tri.select(F.col("x").alias("v"))
        .unionByName(tri.select(F.col("y").alias("v")))
        .unionByName(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    j = deg.join(tpn, "v", "left").select(
        F.col("v").alias("node_id"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("d") >= 2,
            F.floor(
                F.lit(1000000.0)
                * (2 * F.coalesce(F.col("t"), F.lit(0))).cast("double")
                / (F.col("d") * (F.col("d") - 1))
                + F.lit(0.5)
            ).cast("long"),
        ).alias("local_coeff_micro"),
    )
    return j


@query(
    "analytics_price_elasticity",
    oracle="""
    WITH pts AS (
        SELECT p.p_type,
               CAST(floor(10000.0 * ln(1.0 - l.l_discount) + 0.5) AS BIGINT)
                   AS x4,
               CAST(floor(10000.0 * ln(l.l_quantity) + 0.5) AS BIGINT) AS y4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_discount < 1.0 AND l.l_quantity > 0
    ),
    sums AS (
        SELECT p_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x4) AS BIGINT) AS sx,
               CAST(SUM(y4) AS BIGINT) AS sy,
               CAST(SUM(x4 * x4) AS BIGINT) AS sxx,
               CAST(SUM(x4 * y4) AS BIGINT) AS sxy
        FROM pts GROUP BY p_type
    )
    SELECT p_type, n,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST(floor(1000000.0
                    * CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    + 0.5) AS BIGINT)
           END AS elasticity_micro
    FROM sums
    """,
)
def analytics_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY of demand per part type — the log-log OLS slope
    of ln(quantity) on ln(effective price factor 1 - discount), the
    textbook elasticity estimate (a slope of -2 means a 1% discount
    deepening moves volume +2%).  The economics twin of ts_theil_sen's
    robust slope, on the discount-response axis pricing teams actually
    tune.

    Doctrine: the per-row logs are quantized to 1e-4 BIGINT BEFORE any
    cross-row summation (floats never aggregate), so the five OLS power
    sums are exact integers and the slope is ONE final ratio of exact
    integers, micro-quantized.  Degenerate groups (zero x-variance —
    e.g. a type sold only at one discount) emit NULL on both engines.

    Scale: one fact scan with the part dim broadcast, map-side-combined
    integer sums per type.  Int64 envelope: |x4| <= 1.1e3, |y4| <=
    3.9e4, so n*sxy stays under 2^63 through ~2e8 rows per type (~30x
    this fixture at sf1); past that, shard the power sums by month and
    merge — they are additive partials, the agg_welch_ttest recipe."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pts = (
        li.filter((F.col("l_discount") < 1.0) & (F.col("l_quantity") > 0))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            "p_type",
            F.floor(
                F.lit(10000.0) * F.log(F.lit(1.0) - F.col("l_discount"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("x4"),
            F.floor(
                F.lit(10000.0) * F.log(F.col("l_quantity")) + F.lit(0.5)
            )
            .cast("long")
            .alias("y4"),
        )
    )
    sums = pts.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x4").cast("long").alias("sx"),
        F.sum("y4").cast("long").alias("sy"),
        F.sum(F.col("x4") * F.col("x4")).cast("long").alias("sxx"),
        F.sum(F.col("x4") * F.col("y4")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    den = n * F.col("sxx") - sx * sx
    num = n * F.col("sxy") - sx * sy
    return sums.select(
        "p_type",
        "n",
        F.when(
            den > 0,
            F.floor(
                F.lit(1000000.0) * num.cast("double") / den.cast("double")
                + F.lit(0.5)
            ).cast("long"),
        ).alias("elasticity_micro"),
    )
