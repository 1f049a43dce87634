"""Operator-specific behavior tests beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources.catalog import table

SPECS = load_all()


def test_approx_distinct_within_error(spark, oracle_sf_dir):
    """HLL++ at rsd=1% must land within 5% of the exact distinct count."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in SPECS["approx_distinct_users"].fn(spark, oracle_sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in table(spark, oracle_sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_asof_join_clicks_precede_purchases(spark, sf_dir):
    """Every matched click timestamp is <= its purchase timestamp."""
    df = SPECS["join_asof_last_click"].fn(spark, sf_dir)
    bad = df.filter(F.col("last_click_ts") > F.col("ts")).count()
    assert bad == 0


def test_topk_is_prefix_of_full_sort(spark, sf_dir):
    """TakeOrdered(10) equals the first 10 rows of the full sort."""
    top = [r["o_orderkey"] for r in SPECS["top_k_orders"].fn(spark, sf_dir).collect()]
    full = [
        r["o_orderkey"]
        for r in table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .collect()
    ]
    assert top == full
