"""Runtime bloom-filter join pruning — the 100 TB shuffle-join reducer.

When a selective filter sits on one side of a shuffle join, Spark's
runtime-filter optimizer can build a bloom filter of the filtered side's
join keys and push a ``might_contain`` probe into the OTHER side's scan,
discarding non-joining fact rows BEFORE the exchange — at 100 TB this is
the difference between shuffling the whole fact table and shuffling the
~1 % that survives. The feature is size-gated (creation side small
enough to aggregate, application side big enough to bother), so at test
SF it never triggers on defaults; these tests pin the knobs, prove the
optimizer injects the filter, and prove values are unchanged — the
documented recipe for enabling it on a real cluster.

Engine-side the injection is `InjectRuntimeFilter`: a
``bloom_filter_agg`` aggregate over the creation side feeds a
``might_contain`` predicate in the application side's filter. Both are
visible in the executed-plan text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cooler_mapreduce_spark.sources.catalog import table

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # at test SF nothing clears the 10 GB application-side default: drop
    # the gate so the optimizer treats the fact side as worth pruning.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # bloom filters only help SHUFFLE joins; keep the small side from
    # broadcasting so the demonstration exercises the real shape.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    o = table(spark, sf_dir, "orders", fan_out=False).filter(
        F.col("o_totalprice") > 450000
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def test_bloom_filter_injected_and_values_unchanged(spark, oracle_sf_dir):
    baseline = sorted(tuple(r) for r in _join(spark, oracle_sf_dir).collect())
    saved = _with_confs(spark, _CONFS)
    try:
        j = _join(spark, oracle_sf_dir)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "runtime bloom filter was not injected — the fact side would "
            "shuffle unpruned"
        )
        assert "bloom_filter_agg" in plan.lower()
        rows = sorted(tuple(r) for r in j.collect())
    finally:
        _restore(spark, saved)
    assert rows == baseline, "bloom pruning must be value-neutral"


def test_bloom_filter_not_injected_on_defaults(spark, oracle_sf_dir):
    """On default thresholds the tiny test tables never qualify — the
    size gates exist so small joins don't pay the bloom build. This
    pins the OTHER half of the contract: the knobs are opt-in."""
    plan = _join(spark, oracle_sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan
