"""Skew mitigation: salted aggregation and salted joins.

AQE's runtime skew-join splitting handles most cases (enabled in
``session.py``); these operators are the *planned* form for keys known to
be pathological — the 100 TB reality where one event type or one join key
holds 30% of all rows and a single reducer would run for hours.

- **Salted aggregation**: shard each hot key across ``salt`` sub-keys,
  aggregate partially per shard, then combine shards — two small shuffles
  instead of one skewed one. Works for any algebraic aggregate (sum,
  count, min, max, and any merge-able partial).
- **Salted join**: salt the skewed (fact) side, replicate the compact
  side once per salt value, join on (key, salt) — the hot key's rows
  spread over ``salt`` reducers. The replication factor prices the fix:
  compact side bytes × salt.

The reference has no answer to skew at all — a hot key simply lands on
one worker (hash % R, reference task_executor.py:147-149) and serializes
the job. These operators exist to make the engine's answer explicit and
testable: results must be IDENTICAL to the unsalted plan (the oracle is
the unsalted SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.numeric import dsum, sql_davg, sql_dsum
from ..registry import query
from ..sources.catalog import table

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation sharding hot keys over ``salt`` sub-keys.

    ``aggs`` maps output-column name → (partial_agg, final_agg) where the
    partial runs per (keys, salt) shard and the final merges shards —
    e.g. ``{"n": (F.count("*"), F.sum("n"))}``. Each aggregate's merge
    algebra is the caller's contract (count→sum, sum→sum, min→min...),
    exactly the combine_fn/reduce_fn split of the reference's designed
    combiner (reference design.md:197-245).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(name) for name, (p, _f) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[f.alias(name) for name, (_p, f) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    compact: DataFrame,
    on: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt the fact side, replicate the
    compact side ``salt``×, join on (key, salt). Use when the compact
    side is too big to broadcast but small enough to replicate.

    Only ``inner`` and fact-side-preserving ``left`` semantics survive
    the rewrite: a right/full outer join would emit each *unmatched*
    compact row once per salt replica (``salt`` duplicates). Those
    variants raise rather than silently multiply rows — express them as
    an unsalted join, or swap sides so the preserved side is the fact.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "right/full outer would duplicate unmatched compact rows "
            "(one per salt replica)"
        )
    f_s = fact.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    c_s = compact.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f_s.join(c_s, [on, "__salt"], how).drop("__salt")


@query(
    "skew_salted_event_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_davg('value', 6)} AS avg_value
    FROM events GROUP BY event_type
    """,
    tags=("aggregation", "skew", "salting"),
)
def skew_salted_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats through the salted two-stage plan — the hot
    event type shards over 16 sub-keys before merging. The oracle is the
    UNSALTED SQL: salting must be invisible in the result, bit for bit
    (decimal partials make the sum merge order-independent)."""
    ev = table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", (F.rand(seed=42) * DEFAULT_SALT).cast("int"))
        .groupBy("event_type", "__salt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("s"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        (F.sum("s").cast("double") / F.sum("n")).alias("avg_value"),
    )

@query(
    "skew_salted_join_tiers",
    oracle=f"""
    WITH tiers AS (
        SELECT user_id,
               CASE WHEN COUNT(*) >= 80 THEN 'heavy'
                    WHEN COUNT(*) >= 50 THEN 'mid'
                    ELSE 'light' END AS tier
        FROM events GROUP BY user_id
    )
    SELECT tier, COUNT(*) AS n_events, {sql_dsum('value', 6)} AS total_value
    FROM events e JOIN tiers t ON e.user_id = t.user_id
    GROUP BY tier
    """,
    tags=("join", "skew", "salting"),
)
def skew_salted_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-tier enrichment through the SALTED JOIN path: the fact
    side salts each user across {DEFAULT_SALT} sub-keys and the compact
    tier table replicates once per salt value, so a pathological user
    spreads over {DEFAULT_SALT} reducers instead of melting one.  The
    oracle is the plain unsalted join — salting is a physical rewrite
    that must be invisible in the result, bit for bit (the downstream
    sum is decimal-staged, so merge order cannot leak through).

    This is the 100 TB fix when the compact side is too big to
    broadcast but cheap to replicate; AQE's runtime skew-join split
    (enabled in session defaults) covers the keys nobody predicted.
    """
    ev = table(spark, sf_dir, "events")
    tiers = ev.groupBy("user_id").agg(
        F.when(F.count("*") >= 80, "heavy")
        .when(F.count("*") >= 50, "mid")
        .otherwise("light")
        .alias("tier")
    )
    enriched = salted_join(ev.select("user_id", "value"), tiers, "user_id")
    return enriched.groupBy("tier").agg(
        F.count("*").alias("n_events"), dsum("value", 6).alias("total_value")
    )
