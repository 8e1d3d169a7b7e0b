"""§2.6 Sorts / limits / top-k (SURVEY.md).

Reference analogue: the ordered change-list report and top-changed-
sources summaries.  The driver's value-hash is order-insensitive, so
sort correctness is made checkable by materializing the rank as a
column (row_number over the same ordering); top-k uses a unique sort
key (primary-key tiebreaker) so the SELECTED SET is deterministic.

Scale note: global ORDER BY is a range-partitioned total sort —
fine for reports; ORDER BY + LIMIT k is TakeOrderedAndProject (per-
partition top-k then merge of k·p rows on the driver), which is the
shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load, tune
from ..registry import query


@query(
    "sort_multi_nulls",
    oracle="""
    SELECT o_orderkey, o_totalprice, delayed_priority,
           ROW_NUMBER() OVER (ORDER BY delayed_priority ASC NULLS FIRST,
                              o_totalprice DESC, o_orderkey) AS sort_pos
    FROM (
        SELECT o_orderkey, o_totalprice,
               NULLIF(o_orderpriority, '3-MEDIUM') AS delayed_priority
        FROM orders
    )
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort, mixed asc/desc with explicit NULLS FIRST; the
    ordering is proven to the (order-insensitive) oracle by emitting the
    global position as a column."""
    tune(spark)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("delayed_priority"),
    )
    w = Window.orderBy(
        F.col("delayed_priority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return o.withColumn("sort_pos", F.row_number().over(w)).orderBy(
        F.col("delayed_priority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )


@query(
    "limit_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price (reference: top changed sources).
    o_orderkey tiebreaker makes the sort key unique — REQUIRED for a
    deterministic result set.  Plan: TakeOrderedAndProject (no full
    sort)."""
    tune(spark)
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical per-group top-k: 2 priciest parts per brand via
    row_number + filter — no global sort, one shuffle on the group key."""
    tune(spark)
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )
