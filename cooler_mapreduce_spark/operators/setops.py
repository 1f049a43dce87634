"""Set operators: UNION [ALL] / INTERSECT / EXCEPT.

Absent from the reference — it cannot even take two input files
(single-path submit, reference coordinator/server.py:464). Spark set ops
are plan-level: UNION ALL is free (concatenated partitions, no shuffle);
INTERSECT/EXCEPT plan as semi/anti joins with partial dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources.catalog import table


def _year_custkeys(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    # fan_out=False: the set-op re-partitions (dedup agg / semi join)
    # immediately after the filter+project, so the fan-out shuffle was
    # redundant on BOTH legs (r11 window-family A/B; one leg is also a
    # broadcast build at test SF)
    o = table(spark, sf_dir, "orders", fan_out=False)
    return o.filter(F.year("o_orderdate") == year).select("o_custkey")


@query(
    "union_all_high_low_value_orders",
    oracle="""
    SELECT o_orderkey, 'high' AS tier FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, 'low' AS tier FROM orders WHERE o_totalprice < 1000
    """,
    tags=("setop", "union"),
)
def union_all_high_low_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged filters — pure partition concatenation,
    zero shuffle; both branches share one cached scan under AQE."""
    o = table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", F.lit("high").alias("tier"))
    lo = o.filter(F.col("o_totalprice") < 1000).select("o_orderkey", F.lit("low").alias("tier"))
    return hi.unionAll(lo)


@query(
    "intersect_repeat_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop", "intersect"),
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1996 and 1997 — INTERSECT plans as a
    left-semi join over pre-deduplicated sides (single-column shuffle)."""
    return _year_custkeys(spark, sf_dir, 1996).intersect(_year_custkeys(spark, sf_dir, 1997))


@query(
    "except_churned_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop", "except"),
)
def except_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1996 but gone in 1997 — EXCEPT (distinct
    semantics) = dedup + left-anti join; ``subtract`` is Spark's EXCEPT."""
    return _year_custkeys(spark, sf_dir, 1996).subtract(_year_custkeys(spark, sf_dir, 1997))


@query(
    "intersect_all_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    tags=("setop", "intersect", "multiset"),
)
def intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: a customer appearing 3× on the
    urgent side and 2× on the high side contributes min(3,2)=2 rows
    (``intersectAll``, planned as a counted semi-join; the DISTINCT
    variant collapses to one). The reference has no notion of multiset
    ops at all."""
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.intersectAll(high)


@query(
    "except_all_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    tags=("setop", "except", "multiset"),
)
def except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: occurrence counts subtract
    (3 urgent − 2 high = 1 surviving row), vs the DISTINCT variant's
    all-or-nothing membership (``exceptAll``)."""
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.exceptAll(high)
