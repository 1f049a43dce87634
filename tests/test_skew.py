"""Salting must be invisible in results — only the plan changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cooler_mapreduce_spark.operators.skew import salted_agg, salted_join
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources.catalog import table

SPECS = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    got = salted_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count("*"), F.sum("n")),
            "mx": (F.max("value"), F.max("mx")),
            "mn": (F.min("value"), F.min("mn")),
        },
    )
    want = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.max("value").alias("mx"), F.min("value").alias("mn")
    )
    assert _rows(got) == _rows(want)


def test_salted_join_equals_plain(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = salted_join(orders, cust, on="o_custkey", salt=8)
    want = orders.join(cust, "o_custkey")
    assert got.count() == want.count()
    assert _rows(got.select("o_orderkey", "c_name")) == _rows(want.select("o_orderkey", "c_name"))


def test_salted_join_rejects_outer_variants(spark, sf_dir):
    """right/full outer would emit each unmatched compact row once per
    salt replica — the rewrite must refuse instead of silently
    duplicating; left (fact-preserving) stays allowed."""
    import pytest

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(orders, cust, on="o_custkey", how=how)
    # left is fact-side preserving: row count must equal the unsalted left join
    got = salted_join(orders, cust, on="o_custkey", how="left")
    assert got.count() == orders.join(cust, "o_custkey", "left").count()


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The hot key's rows must actually land in multiple salt shards."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    salted = ev.withColumn("__salt", (F.rand(seed=42) * 16).cast("int"))
    hot = (
        salted.groupBy("event_type", "__salt")
        .count()
        .groupBy("event_type")
        .agg(F.count("*").alias("shards"))
    )
    assert all(r["shards"] > 1 for r in hot.collect())
