"""Result invariance under physical re-configuration — SURVEY.md §5's
generalization of the reference's combiner-on/off A/B test: the partition
count is a pure performance knob, so results must be bit-identical at any
``spark.sql.shuffle.partitions`` (decimal float aggregates make this true
even for sums — see functions/numeric.py).
"""

from __future__ import annotations

import pytest

from cooler_mapreduce_spark.registry import load_all

SPECS = load_all()

#: Representative wide-plan queries: shuffle agg, multi-join, LSH dedup
#: pipeline, salted two-stage agg, window rank.
CASES = [
    "pricing_summary",
    "revenue_by_nation",
    "word_count",
    "dedup_minhash_lsh",
    "skew_salted_event_stats",
    "window_top_orders_per_customer",
    "stat_corr_qty_price",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        low = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high


#: Queries whose results would shift if timestamp handling leaked the
#: session timezone: cutoff filters at midnight boundaries, date windows,
#: SCD2 sentinel coalesce, lag-gap sessionization, tumbling windows.
_TZ_CASES = [
    "pricing_summary",
    "forecast_revenue_change",
    "scd2_customer_history",
    "date_functions",
    "sessionize_events",
    "stream_tumbling_counts",
    "dedup_keep_latest",
    "yoy_revenue_by_month",
    "gapfill_hourly_events",
    "rolling_7d_distinct_users",
    "join_full_outer_hourly",
]


@pytest.mark.parametrize("name", _TZ_CASES)
def test_result_invariant_under_session_timezone(spark, sf_dir, name):
    """The driver runs queries in ITS session, whose timezone we don't
    control — event time is TIMESTAMP_NTZ-native and filter literals
    coerce to the column's own type, so results must be bit-identical
    under any spark.sql.session.timeZone (a leaked LTZ cast would shift
    midnight-boundary cutoffs by the UTC offset)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = _rows(SPECS[name].fn(spark, sf_dir))
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
        ktm = _rows(SPECS[name].fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny == ktm
