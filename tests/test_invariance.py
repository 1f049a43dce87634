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
