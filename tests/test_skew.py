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


def test_aqe_splits_skewed_join_partition(spark):
    """The OTHER half of the skew story (SCALING.md: 'AQE handles the
    runtime-detected rest'): with skew-join enabled and a hot key, the
    final adaptive plan must mark the join skew=true and read the hot
    partition as split sub-reads (AQEShuffleRead ... skewed).

    Two non-obvious requirements this test pins so future refactors
    keep AQE's remedy reachable: (1) the final plan only exists on the
    executed DataFrame's OWN QueryExecution (df.count()/noop-write run a
    different one — assert after collect()); (2) the consumer above the
    join must NOT require the join key's hash distribution — a
    groupBy(join_key) directly on the join output forbids the split
    (AQE won't break the required co-partitioning), which is exactly
    when the planned salting tier (salted_join) takes over.
    """
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = (
            spark.range(0, 200000)
            .select((F.col("id") * 0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(1, 100).select(F.col("id").alias("k"), F.col("id").alias("v"))
            )
        )
        right = spark.range(0, 50000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum("w").alias("sw")
        )
        [row] = j.collect()
        # correctness of the split join: hot key 0 pairs 200000x500,
        # plus 99 cold keys pairing 1x500 each
        assert row["n"] == 200000 * 500 + 99 * 500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
