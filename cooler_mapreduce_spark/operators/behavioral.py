"""Behavioral analytics — cohort retention and funnel conversion.

The event-stream workloads every product-analytics stack runs daily,
expressed as two-phase aggregations over the ``events`` table. Both
reduce the fact table to per-user rows FIRST (a partial-aggregable
groupBy), then analyze the tiny per-user table — the fact table is
scanned once and never self-joined at full width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import query
from ..sources.catalog import table


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(datediff('day', DATE '1970-01-01', ts) // 7) AS cohort_w
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_w,
               (datediff('day', DATE '1970-01-01', e.ts) // 7) - f.cohort_w AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_w, week_offset, COUNT(*) AS n_active_users
    FROM activity GROUP BY cohort_w, week_offset
    """,
    tags=("analytics", "cohort", "retention"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent week they remained active.

    Phase 1 collapses events to one (user, cohort_week) row — a
    partial-aggregable min(). Phase 2 joins that per-user table (tiny:
    one row per user, broadcastable at most scales) back to events,
    distinct-s (user, cohort, offset), and counts. Week numbering is
    pure integer arithmetic (epoch-days // 7), so every value is exact.
    """
    ev = table(spark, sf_dir, "events")
    week_num = lambda c: F.floor(F.datediff(c, F.lit("1970-01-01")) / 7)  # noqa: E731
    firsts = ev.groupBy("user_id").agg(F.min(week_num(F.col("ts"))).alias("cohort_w"))
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_w",
            (week_num(F.col("ts")) - F.col("cohort_w")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_w", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        FROM events GROUP BY user_id
    ),
    with_click AS (
        SELECT p.user_id, p.t_signup,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > p.t_signup
                        THEN e.ts END) AS t_click
        FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
        GROUP BY p.user_id, p.t_signup
    ),
    with_purchase AS (
        SELECT c.user_id, c.t_signup, c.t_click,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click
                             AND e.ts <= c.t_click + INTERVAL 24 HOUR
                        THEN e.ts END) AS t_purchase
        FROM with_click c LEFT JOIN events e ON e.user_id = c.user_id
        GROUP BY c.user_id, c.t_signup, c.t_click
    )
    SELECT COUNT(t_signup) AS n_signup,
           COUNT(t_click) AS n_signup_then_click,
           COUNT(t_purchase) AS n_full_funnel
    FROM with_purchase
    """,
    tags=("analytics", "funnel", "sequence"),
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: signup → later click → purchase
    within 24 h of that click, counted per stage.

    Each stage is a conditional min-aggregate keyed by user — the
    "earliest qualifying event after the previous stage" recurrence.
    All three stages shuffle on user_id, so under one fixed
    partitioning the whole funnel is a single exchange followed by
    co-partitioned joins; per-user state is three timestamps, never an
    event list. (The window-function alternative — sort each user's
    full history — shuffles every event's payload; this form reduces
    first.)
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    with_click = (
        per_user.join(ev, "user_id", "left")
        .groupBy("user_id", "t_signup")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    with_purchase = (
        with_click.join(ev, "user_id", "left")
        .groupBy("user_id", "t_signup", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOURS")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return with_purchase.agg(
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_signup_then_click"),
        F.count("t_purchase").alias("n_full_funnel"),
    )


@query(
    "rolling_7d_distinct_users",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
    ),
    contrib AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) + to_days(CAST(k.k AS INTEGER)) AS TIMESTAMP) AS day,
               user_id
        FROM events, (SELECT unnest(generate_series(0, 6)) AS k) k
    )
    SELECT d.day, COUNT(*) AS n_active_7d
    FROM days d JOIN contrib c ON c.day = d.day
    GROUP BY d.day
    """,
    tags=("analytics", "rolling-window", "distinct"),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the WAU curve).

    COUNT(DISTINCT) over a sliding window cannot be expressed as a
    window frame (distinct state doesn't merge by frame); the scalable
    formulation EXPLODES each event into the 7 day-buckets it
    contributes to, dedups (day, user), and counts — turning the
    sliding-distinct into two ordinary hash aggregations at a bounded
    7× row amplification of (day, user) pairs, never of payloads. The
    join restricts output to observed days.
    """
    ev = table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
    contrib = (
        ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            F.date_trunc("day", "ts").alias("d0"),
            "user_id",
        )
        .select(
            (F.col("d0") + F.col("k").cast("int") * F.expr("INTERVAL 1 DAY")).alias("day"),
            "user_id",
        )
        .distinct()
    )
    return (
        contrib.join(days, "day")
        .groupBy("day")
        .agg(F.count("*").alias("n_active_7d"))
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    ),
    counts AS (
        SELECT event_type, next_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           round(n / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 9)
               AS transition_prob
    FROM counts
    """,
    tags=("behavioral", "sequence", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each (type → next-type) pair, the count and the conditional
    transition probability — the what-happens-after-X statistic behind
    next-action prediction and funnel discovery (the ordered-sequence
    generalization of :func:`funnel_signup_click_purchase`).

    ``lead`` needs one shuffle on user_id (each user's history sorted
    within its partition — bounded by per-user event counts, not total
    rows); the pair count is a second map-side-combined aggregate over
    |types|² ≪ n rows, and the probability normalization windows over
    that tiny result.  Ordering is made total with (ts, event_id) so the
    successor of every event is deterministic.  100 TB: identical shape
    — the only wide exchange carries (user, type, ts), three narrow
    columns.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("event_type", F.lead("event_type").over(w).alias("next_type"))
    counts = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 9).alias("transition_prob"),
    )
