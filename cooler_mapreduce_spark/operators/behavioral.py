"""Behavioral analytics — cohort retention and funnel conversion.

Absent from the reference (SURVEY.md §2.4: no windows, no joins — each of
these would be a chain of hand-written MapReduce jobs with intermediate
files). The event-stream workloads every product-analytics stack runs daily,
expressed as two-phase aggregations over the ``events`` table. Both
reduce the fact table to per-user rows FIRST (a partial-aggregable
groupBy), then analyze the tiny per-user table — the fact table is
scanned once and never self-joined at full width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
from ..functions.numeric import dsum, sql_dsum
from ..functions.timeutil import us_between, wall_trunc
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
    partial-aggregable min(). Phase 2 joins that per-user table (one
    narrow row per user — SF-scaled, so no broadcast hint: size-based
    planning broadcasts at test SF, shuffles at scale) back to events,
    distinct-s (user, cohort, offset), and counts. Week numbering is
    pure integer arithmetic (epoch-days // 7), so every value is exact.
    """
    ev = table(spark, sf_dir, "events")
    week_num = lambda c: F.floor(F.datediff(c, F.lit("1970-01-01")) / 7)  # noqa: E731
    firsts = ev.groupBy("user_id").agg(F.min(week_num(F.col("ts"))).alias("cohort_w"))
    activity = (
        ev.join(firsts, "user_id")
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
    # fan_out=False: every leg re-partitions on user_id at its join
    # (two are broadcast builds at test SF) — redundant fan-out shuffle
    ev = table(spark, sf_dir, "events", fan_out=False)
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
    days = ev.select(wall_trunc("ts", "day").alias("day")).distinct()
    contrib = (
        ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            wall_trunc("ts", "day").alias("d0"),
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
    # fan_out=False: redundant pre-window shuffle; r11 A/B 0.959 -> 0.502 s
    ev = table(spark, sf_dir, "events", fan_out=False)
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


@query(
    "session_conversion_rate",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microseconds', lag(ts) OVER w, ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM gapped
    ),
    per AS (
        SELECT user_id, session_seq,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click_us,
               MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase_us
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN first_click_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_click,
           CAST(SUM(CASE WHEN last_purchase_us > first_click_us THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted
    FROM per
    """,
    tags=("behavioral", "session", "funnel"),
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped conversion: of all 30-minute-gap sessions, how many
    contain a click, and how many convert (a purchase strictly after the
    session's first click) — the funnel restricted to one visit, where
    cross-day conversions (which :func:`funnel_signup_click_purchase`
    counts) don't.

    Same two-window sessionization as ``sessionize_events`` (one shuffle
    on user_id), then per-session first-click/last-purchase reduce to
    exact microsecond integers and a 3-counter global rollup.  100 TB:
    state is two bigints per session; the final single-row aggregate is
    a partial-aggregated O(partitions) merge.
    """
    # fan_out=False: redundant pre-window shuffle (r11 window-family A/B)
    ev = table(spark, sf_dir, "events", fan_out=False)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = us_between(F.lag("ts").over(wo), F.col("ts"))
    gapped = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    sess = gapped.withColumn("session_seq", F.sum("is_start").over(wrun))
    per = sess.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click_ts"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase_ts"
        ),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("first_click_ts").isNotNull(), 1).otherwise(0)).alias("n_with_click"),
        F.sum(
            F.when(F.col("last_purchase_ts") > F.col("first_click_ts"), 1).otherwise(0)
        ).alias("n_converted"),
    )


@query(
    "user_event_paths",
    oracle="""
    WITH paths AS (
        SELECT user_id,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path5
        FROM events GROUP BY user_id
    )
    SELECT path5, COUNT(*) AS n_users
    FROM paths GROUP BY path5
    ORDER BY n_users DESC, path5 LIMIT 20
    """,
    tags=("behavioral", "sequence", "ordered-collect"),
)
def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: each user's first five event types as an ordered
    '>'-joined path, counted across users — the onboarding-flow
    discovery query.  Demonstrates DETERMINISTIC ordered collection:
    ``collect_list`` alone has no order guarantee post-shuffle, so the
    list is collected as (ts, event_id, type) structs and sorted
    in-expression (``sort_array``) before slicing — order is imposed by
    data, not by partition layout.

    100 TB: the collect shuffles (user, ts-key, type) narrow rows; the
    5-slice caps the carried array; path counting is a second tiny
    aggregate.  Top-20 is TakeOrdered.
    """
    ev = table(spark, sf_dir, "events")
    collected = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_id", "event_type")).alias("evs")
    )
    path5 = collected.select(
        F.array_join(
            F.slice(F.transform(F.sort_array("evs"), lambda s: s.event_type), 1, 5), ">"
        ).alias("path5")
    )
    return (
        path5.groupBy("path5")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path5"))
        .limit(20)
    )


def _streaks(pdf):
    """Per-user longest consecutive-day streak (plain-int arithmetic —
    deterministic regardless of row arrival order)."""
    import pandas as pd

    days = sorted(set(int(d) for d in pdf["day_idx"]))
    best = cur = 1
    for prev, nxt in zip(days, days[1:]):
        cur = cur + 1 if nxt == prev + 1 else 1
        best = max(best, cur)
    return pd.DataFrame(
        [
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "n_active_days": len(days),
                "longest_streak": best,
            }
        ]
    )


@query(
    "longest_daily_streak",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
        SELECT user_id, day,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM d
    ),
    isl AS (
        SELECT user_id, COUNT(*) AS len
        FROM r GROUP BY user_id, day - CAST(rn AS INTEGER)
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM isl GROUP BY user_id
    """,
    tags=("behavioral", "grouped-map", "pandas-udf"),
)
def longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — engagement-streak
    analytics, implemented with GROUPED ``applyInPandas``: one Arrow
    batch per user, arbitrary imperative Python per group.  This is the
    modern form of the reference's ``reduce_fn`` generality (a user
    function over one key's full value list, task_executor.py:230-241)
    — and the oracle proves it against the declarative gaps-and-islands
    SQL (row_number difference groups runs), so the imperative and
    relational formulations pin each other.

    The UDF sees pre-deduped (user, day-index) ints — the shuffle
    carries two integer columns, Arrow-batched, and per-group state is
    O(active days).  100 TB: grouped-map cost is one hash shuffle on
    user_id, the same as any per-user aggregate; the Python stage is
    the price of imperative logic, which is exactly why only this op
    pays it.
    """
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("day_idx")
    ).distinct()
    return days.groupBy("user_id").applyInPandas(
        _streaks, "user_id bigint, n_active_days bigint, longest_streak bigint"
    )


@query(
    "event_cooccurrence_lift",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    marg AS (
        SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ),
    total AS (
        SELECT COUNT(DISTINCT user_id) AS n_total FROM ut
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both,
           round(COUNT(*) * CAST(n_total AS DOUBLE)
                 / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE)), 9) AS lift
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN marg ma ON ma.event_type = a.event_type
    JOIN marg mb ON mb.event_type = b.event_type
    CROSS JOIN total
    GROUP BY a.event_type, b.event_type, ma.n, mb.n, n_total
    """,
    tags=("behavioral", "affinity", "market-basket"),
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: for each unordered event-type pair, how
    many users did both, and the lift over independence
    (P(a,b)/(P(a)·P(b))) — the did-X-also-did-Y signal behind
    recommendations, computed on users-as-baskets.

    Events collapse to DISTINCT (user, type) first; each user's type
    set then yields its C(k,2) pairs JVM-side from ONE user-keyed
    exchange (k ≤ |types|, a constant). Marginals are an O(types)
    broadcast, lift is
    exact-count rational arithmetic, deterministic everywhere.
    """
    ev = table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    marg = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    total = ut.agg(F.countDistinct("user_id").alias("n_total"))
    # Pair generation as ONE user-keyed exchange, not a self-join (the
    # census-derivation pattern, graph.py): collect each user's
    # distinct type set sorted, emit the C(k,2) ordered pairs JVM-side.
    # The self-join exchanged the distinct frame twice; identical pair
    # multiset since ``ut`` is distinct-first.
    pairs = (
        ut.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("ts"))
        .select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ts, (x, i) -> transform("
                        "slice(ts, i + 2, size(ts)),"
                        " y -> struct(x AS type_a, y AS type_b)))"
                    )
                )
            ).alias("p")
        )
        .select("p.type_a", "p.type_b")
    )
    counted = pairs.groupBy("type_a", "type_b").agg(F.count("*").alias("n_both"))
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        counted.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both") * F.col("n_total").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                9,
            ).alias("lift"),
        )
    )


@query(
    "attribution_linear_touch",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id AS p_id, user_id, ts AS pt, value AS pv
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts AS tt, event_type AS channel
        FROM events WHERE event_type IN ('click', 'view')
    ),
    joined AS (
        SELECT p_id, pv, channel,
               COUNT(*) OVER (PARTITION BY p_id) AS n
        FROM purchases JOIN touches USING (user_id)
        WHERE tt >= pt - INTERVAL 3 DAY AND tt < pt
    )
    SELECT channel, {sql_dsum('pv / n', 6)} AS attributed_revenue,
           COUNT(*) AS n_rows
    FROM joined GROUP BY channel
    UNION ALL
    SELECT 'direct', {sql_dsum('pv', 6)}, COUNT(*)
    FROM purchases WHERE p_id NOT IN (SELECT p_id FROM joined)
    """,
    tags=("behavioral", "attribution", "join", "window"),
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue is split
    evenly across the user's click/view touchpoints in the preceding
    3 days; purchases with no qualifying touch credit a synthetic
    'direct' channel (for which n_rows counts unattributed purchases,
    not touches).

    The candidate join is user-keyed with the time window as a residual
    predicate — per-user event counts are bounded, so the fan-out is
    O(touches-in-window) per purchase, never a time-range cross join
    (the same bounded-theta shape as join_asof_last_click). The
    per-purchase touch count is a COUNT window over the purchase id —
    it reuses the join output's partitioning profile, no second scan.
    Unattributed purchases fall out of a LEFT ANTI join against the
    attributed ids (decorrelated NOT IN; purchase ids are non-null by
    construction). Credit = value/n is one exact IEEE division and the
    rollup is decimal-staged — bit-deterministic at any partition
    count.
    """
    # fan_out=False: both filtered legs re-partition on user_id at the
    # candidate join (broadcast builds at test SF) — redundant fan-out
    ev = table(spark, sf_dir, "events", fan_out=False)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pt"),
        F.col("value").alias("pv"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tt"),
        F.col("event_type").alias("channel"),
    )
    joined = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("tt") >= F.col("pt") - F.expr("INTERVAL 3 DAYS"))
        & (F.col("tt") < F.col("pt")),
    )
    w = Window.partitionBy("p_id")
    credited = joined.withColumn("n", F.count("*").over(w))
    attributed = credited.groupBy("channel").agg(
        dsum(F.col("pv") / F.col("n"), 6).alias("attributed_revenue"),
        F.count("*").alias("n_rows"),
    )
    # the attributed-id set needs only the JOIN output — probing the
    # pre-window frame keeps the anti-join branch from re-deriving the
    # window pass
    direct = (
        purchases.join(
            joined.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(
            dsum("pv", 6).alias("attributed_revenue"),
            F.count("*").alias("n_rows"),
        )
        .select(F.lit("direct").alias("channel"), "attributed_revenue", "n_rows")
    )
    return attributed.unionAll(direct)


@query(
    "rfm_customer_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS frequency,
               {sql_dsum('o_totalprice')} AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM per_cust
    )
    SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    tags=("behavioral", "segmentation", "window", "aggregation"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing partition of a customer
    base into quintiles of Recency (latest order), Frequency (order
    count), and Monetary (decimal-staged revenue), rolled up to segment
    sizes (≤125 cells).

    Determinism is the interesting part: NTILE over a non-unique metric
    is implementation-defined at ties, so every quintile ranking
    carries the customer key as a total-order tiebreak — both engines
    then assign identical quintiles. Plan: the fact table
    partial-aggregates to one row per customer FIRST; each quintile is
    then an :func:`~cooler_mapreduce_spark.operators.windows.exact_global_rank`
    (range-partitioned parallel rank — billions of customers never meet
    a single-task sort) fed through NTILE's bucket closed form, the
    three scores equi-join back on the customer key, and a tiny
    (≤125-group) rollup finishes.  Before r6 this used three
    unpartitioned NTILE windows with a docstring apologizing for the
    single-partition sort; `exact_global_rank` retired the apology.
    """
    from .windows import exact_global_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    ).localCheckpoint(eager=True)

    def quintile(metric: str, out: str) -> DataFrame:
        ranked, n = exact_global_rank(
            per_cust.select("o_custkey", metric),
            [F.desc(metric), F.asc("o_custkey")],
        )
        return ranked.select(
            "o_custkey", ntile_from_rank(F.col("_rank0"), n, 5).alias(out)
        )

    scored = (
        quintile("last_order", "r_score")
        .join(quintile("frequency", "f_score"), "o_custkey")
        .join(quintile("monetary", "m_score"), "o_custkey")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers")
    )


@query(
    "basket_association_rules",
    oracle="""
    WITH item_orders AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM item_orders),
    pairs AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS c_uv
        FROM item_orders a JOIN item_orders b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    items AS (
        SELECT l_partkey, COUNT(*) AS c_i FROM item_orders GROUP BY 1
    )
    SELECT u, v, c_uv,
           CAST(c_uv AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
           CAST(c_uv AS DOUBLE) / CAST(iu.c_i AS DOUBLE) AS confidence,
           (CAST(c_uv AS DOUBLE) * CAST(n_baskets AS DOUBLE))
               / (CAST(iu.c_i AS DOUBLE) * CAST(iv.c_i AS DOUBLE)) AS lift
    FROM pairs
    JOIN items iu ON iu.l_partkey = u
    JOIN items iv ON iv.l_partkey = v
    CROSS JOIN n
    WHERE c_uv >= 5
    ORDER BY lift DESC, u, v
    LIMIT 20
    """,
    tags=("behavioral", "association", "join", "aggregation"),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: the top-20 part pairs by LIFT
    (with support and confidence) among pairs co-purchased in ≥5
    orders — the classic retail affinity analysis, and the non-graph
    face of the same intra-order co-occurrence the triangle census
    builds on.

    Scale shape: baskets reduce to DISTINCT (order, item) pairs first
    (partial-aggregable); pair generation is intra-order from one
    basket exchange — bounded by basket size per order key, never an
    item×item product; item
    supports are a second tiny aggregate of the same frame; the basket
    count is a single-row broadcast (the always-safe scalar hint). All
    three metrics are ratios of exact integer counts with identical
    operation order in both engines — bit-deterministic — and the
    top-20 is TakeOrdered with a full (lift, u, v) tiebreak.
    """
    li = table(spark, sf_dir, "lineitem")
    item_orders = li.select("l_orderkey", "l_partkey").distinct()
    n = item_orders.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    # Pair generation as ONE basket exchange, not a self-join (the
    # census-derivation pattern, graph.py): per-order sorted distinct
    # item array, C(k,2) ordered pairs JVM-side, then the cross-order
    # support count. Identical pair multiset since ``item_orders`` is
    # distinct-first; per-order cost stays C(basket²) either way.
    pairs = (
        item_orders.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ps, (x, i) -> transform("
                        "slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v)))"
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count("*").alias("c_uv"))
        .filter(F.col("c_uv") >= 5)
    )
    items_u = item_orders.groupBy(F.col("l_partkey").alias("u")).agg(
        F.count("*").alias("cu")
    )
    items_v = item_orders.groupBy(F.col("l_partkey").alias("v")).agg(
        F.count("*").alias("cv")
    )
    nb = F.col("n_baskets").cast("double")
    return (
        pairs.join(items_u, "u")
        .join(items_v, "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u",
            "v",
            "c_uv",
            (F.col("c_uv").cast("double") / nb).alias("support"),
            (F.col("c_uv").cast("double") / F.col("cu").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("c_uv").cast("double") * nb)
                / (F.col("cu").cast("double") * F.col("cv").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("u"), F.asc("v"))
        .limit(20)
    )


_AB_SPARK_ARM = f"({md5int_spark('CAST(user_id AS STRING)')} % 2)"
_AB_DUCK_ARM = f"({md5int_duckdb('CAST(user_id AS VARCHAR)')} % 2)"


@query(
    "ab_test_conversion",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, {_AB_DUCK_ARM} AS arm,
               CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, COUNT(*) AS n_users, CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rate
        FROM per_user GROUP BY arm
    ),
    wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n_users END) AS n0,
               MAX(CASE WHEN arm = 0 THEN n_converted END) AS c0,
               MAX(CASE WHEN arm = 0 THEN rate END) AS rate0,
               MAX(CASE WHEN arm = 1 THEN n_users END) AS n1,
               MAX(CASE WHEN arm = 1 THEN n_converted END) AS c1,
               MAX(CASE WHEN arm = 1 THEN rate END) AS rate1
        FROM arms
    )
    SELECT n0, c0, rate0, n1, c1, rate1,
           (rate1 - rate0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
               AS z_score
    FROM wide
    """,
    tags=("behavioral", "experimentation", "statistics", "aggregation"),
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by portable
    hash (the same engine-agnostic gate as train_test_split — tomorrow's
    rerun assigns identical arms), per-arm conversion-to-purchase rates,
    and the pooled two-proportion z-score — the significance number an
    experimentation platform reports.

    Scale shape: events collapse to one (user, converted) row via a
    partial-aggregable MAX-flag; the per-arm rollup is 2 rows; the
    z-score is a fixed sequence of scalar IEEE ops over exact integer
    counts, written with IDENTICAL operation order in both engines so
    the statistic is bit-deterministic (no float aggregation anywhere —
    rates and the pooled variance derive from counts at the very end).
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted")
    ).select(F.expr(_AB_SPARK_ARM).alias("arm"), "converted")
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
        (
            F.sum("converted").cast("double") / F.count("*").cast("double")
        ).alias("rate"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 0, F.col("rate"))).alias("rate0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
        F.max(F.when(F.col("arm") == 1, F.col("rate"))).alias("rate1"),
    )
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    z = (F.col("rate1") - F.col("rate0")) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return wide.select("n0", "c0", "rate0", "n1", "c1", "rate1", z.alias("z_score"))
