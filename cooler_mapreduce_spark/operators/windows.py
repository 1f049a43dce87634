"""Window-function operators: ranking, analytic offsets, frames, sessions.

Absent from the reference (SURVEY.md §2.4) — a MapReduce formulation needs
a full secondary sort inside reduce. Spark plans each of these as one
shuffle on the partition key + an in-partition sort; there is no per-group
memory blowup because the window operator streams sorted rows.

Determinism notes: every ORDER BY carries a unique tiebreaker column
(event_id / orderkey / custkey) so ranks and offsets are reproducible under
ties; running/moving sums aggregate through decimals (see
``functions.numeric``) so frames produce bit-identical doubles in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.timeutil import sec_since_epoch, us_between, wall_trunc
from ..registry import query
from ..sources.catalog import table


@query(
    "window_top_orders_per_customer",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "ranking", "topk-per-group"),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — the scalable top-k-per-
    group idiom (rank filter prunes during the sorted stream; never
    collect-and-sort-per-group in Python)."""
    o = table(spark, sf_dir, "orders", fan_out=False)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
    FROM customer
    """,
    tags=("window", "ranking"),
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over account balance within segment."""
    # fan_out=False: the window exchange immediately re-partitions this
    # scan and nothing but projection runs before it, so the single-split
    # fan-out was a redundant full shuffle (r11 A/B on the same shape:
    # window_running_total 0.881 -> 0.427 s, sessionize 1.033 -> 0.515 s).
    c = table(spark, sf_dir, "customer", fan_out=False)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic", "offset"),
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event stream + inter-event gap in µs.

    The gap is computed on integer epoch-microseconds, exact in both
    engines (no float time arithmetic).
    """
    # fan_out=False: redundant pre-window shuffle (see window_rank note)
    ev = table(spark, sf_dir, "events", fan_out=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        us_between(F.lag("ts").over(w), F.col("ts")).alias("us_since_prev"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders_so_far
    FROM orders
    """,
    tags=("window", "frame", "running"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — unbounded-preceding frame over an
    exact decimal sum (running double sums are order-*and*-algorithm
    dependent across engines; decimal is bit-stable)."""
    # fan_out=False: redundant pre-window shuffle; A/B 0.881 -> 0.427 s
    o = table(spark, sf_dir, "orders", fan_out=False)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("n_orders_so_far"),
    )


@query(
    "window_moving_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving_spend_3
    FROM orders
    """,
    tags=("window", "frame", "moving"),
)
def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving sum — a bounded sliding frame."""
    # fan_out=False: redundant pre-window shuffle (see window_rank note)
    o = table(spark, sf_dir, "orders", fan_out=False)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w).cast("double").alias("moving_spend_3"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_seq
        FROM gapped
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
    tags=("window", "session", "streaming-batch-equivalent"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap sessions via lag + cumulative
    start-marker sum — the classic two-window idiom. One shuffle on
    user_id, one sort; the streaming twin (``streaming.windows``) uses
    ``session_window`` with a watermark for the unbounded case.
    """
    # fan_out=False: redundant pre-window shuffle; A/B 1.033 -> 0.515 s
    ev = table(spark, sf_dir, "events", fan_out=False)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = us_between(F.lag("ts").over(wo), F.col("ts"))
    gapped = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    sessions = gapped.withColumn("session_seq", F.sum("is_start").over(wrun))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "window_range_frame_stats",
    oracle="""
    WITH e AS (SELECT event_id, event_type, ts, value,
                      -- floor, not round: Spark's timestamp->long cast
                      -- truncates fractional seconds
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
    SELECT event_id, event_type,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY sec
                          RANGE BETWEEN 900 PRECEDING AND 900 FOLLOWING)
             AS n_nearby,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id), 9)
             AS value_pctl,
           ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id), 9)
             AS value_cume,
           FIRST_VALUE(event_id) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id)
             AS first_event_id
    FROM e
    """,
    tags=("window", "frame", "range", "analytic"),
)
def window_range_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE frames + distribution analytics: per event type, how
    many events fall within ±15 minutes of each event (range frame over
    epoch seconds — a frame by VALUE distance, not row count), the
    percent_rank/cume_dist of its value (integer-derived ratios,
    deterministic under the event_id tiebreak), and the partition's
    first event id. One shuffle on event_type; the range frame streams
    the sorted partition with a sliding pointer — no per-row rescan."""
    # fan_out=False: redundant pre-window shuffle (see window_rank note)
    ev = table(spark, sf_dir, "events", fan_out=False).withColumn(
        "sec", sec_since_epoch(F.col("ts"))
    )
    wr = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-900, 900)
    )
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wf = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.count("*").over(wr).alias("n_nearby"),
        F.round(F.percent_rank().over(wv), 9).alias("value_pctl"),
        F.round(F.cume_dist().over(wv), 9).alias("value_cume"),
        F.first("event_id").over(wf).alias("first_event_id"),
    )


def exact_global_rank(df: DataFrame, keys: list, num_partitions: int | None = None):
    """Distributed EXACT 0-based global rank over a unique total order.

    The scalable replacement for ``row_number() OVER (ORDER BY ...)``
    without PARTITION BY (which Spark plans as a single-task sort — the
    one window shape that cannot scale).  Three steps, all parallel:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on the keys —
       the same sampled RangePartitioning exchange a global ORDER BY
       uses, so partition *i*'s rows all precede partition *i+1*'s.
       ``localCheckpoint`` pins the sampled range bounds: the count pass
       and the rank pass must observe one layout, not two resamples.
    2. Per-partition row counts — an O(num_partitions) collect — turned
       into cumulative offsets on the driver.
    3. rank = offset[partition] + (row_number within partition − 1),
       computed by a window PARTITIONED by ``spark_partition_id`` — every
       partition ranks independently, no single reducer anywhere.

    Because the key list is a unique total order, the rank is
    well-defined regardless of where the sampled range bounds fall, so
    the result is deterministic even though the sampling itself is not.

    Returns ``(ranked_df_with__rank0_column, total_row_count)``.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_part, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    local_rn = F.row_number().over(Window.partitionBy("_pid").orderBy(*keys))
    ranked = ranged.withColumn(
        "_rank0", (F.element_at(off_map, F.col("_pid")) + local_rn - 1).cast("long")
    ).drop("_pid")
    return ranked, acc


def ntile_from_rank(rank0, n_total: int, k: int):
    """SQL ``NTILE(k)`` as pure arithmetic on a 0-based global rank.

    With N rows, the first ``N mod k`` buckets take ``ceil(N/k)`` rows
    and the rest ``floor(N/k)`` — exactly NTILE's tie-free assignment —
    so the bucket of rank r needs no second pass and no boundary
    resolution.  Pair with :func:`exact_global_rank` to spell NTILE
    without the single-task sort of an unpartitioned window.
    """
    size_small, big = n_total // k, n_total % k
    size_big = size_small + 1
    cutoff = big * size_big
    if size_small == 0:  # N < k: row i lands alone in bucket i+1
        return (rank0 + 1).cast("int")
    return (
        F.when(rank0 < cutoff, F.floor(rank0 / size_big))
        .otherwise(big + F.floor((rank0 - cutoff) / size_small))
        + 1
    ).cast("int")


@query(
    "ntile_order_deciles",
    oracle="""
    WITH t AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n_orders,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS decile_revenue
    FROM t GROUP BY decile
    """,
    tags=("window", "ntile", "distribution"),
)
def ntile_order_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count decile banding — EXACT ``ntile(10)`` semantics over the
    global order-value ranking, computed WITHOUT the single-task sort a
    naive unpartitioned window requires.  The r6 10×-data sweep showed
    the window spelling scaling 4.5× (every other agg absorbed 10×
    inside fixed overhead): exact ntile was the registry's last
    single-reducer survivor.

    Spelling: :func:`exact_global_rank` (range-partitioned parallel
    rank), then ntile's bucket-assignment closed form — with N rows and
    k buckets, the first ``N mod k`` buckets take ``ceil(N/k)`` rows and
    the rest ``floor(N/k)``, so the bucket of 0-based rank r is pure
    arithmetic on (r, N, k) — no second pass, no boundary resolution.
    Ordering is made total (price, orderkey) so bucket edges are
    deterministic; min/max are selections (bit-exact) and the sum is
    decimal-staged.  At 100 TB every stage is parallel: the range
    exchange samples bounds, partitions rank independently against an
    O(partitions) offset map, and the final shuffle carries 10 groups.
    """
    o = table(spark, sf_dir, "orders")
    ranked, n_total = exact_global_rank(
        o.select("o_totalprice", "o_orderkey"), ["o_totalprice", "o_orderkey"]
    )
    decile = ntile_from_rank(F.col("_rank0"), n_total, 10)
    t = ranked.select("o_totalprice", decile.alias("decile"))
    return t.groupBy("decile").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("decile_revenue"),
    )


@query(
    "debounce_events",
    oracle="""
    WITH g AS (
        SELECT event_type,
               date_diff('microseconds',
                         lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                         ts) AS gap_us
        FROM events
    )
    SELECT event_type, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us < 900000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 900000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM g GROUP BY event_type
    """,
    tags=("window", "dedup", "debounce"),
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debouncing: events of the same (user, type) arriving
    within 15 minutes of the previous one are rate-limit suppressed;
    report the kept/suppressed split per type — the ingest thinning pass
    that keeps double-fires and retry storms out of a training corpus
    (the time-window cousin of exact dedup: same key, *near* time
    instead of same content).

    One ``lag`` window (shuffle on (user, type), narrow rows), exact
    microsecond gaps, one tiny rollup.  The streaming twin is
    ``dropDuplicatesWithinWatermark`` semantics; at 100 TB both forms
    hold state/sort bounded per key, never globally.
    """
    # fan_out=False: redundant pre-window shuffle (see window_rank note)
    ev = table(spark, sf_dir, "events", fan_out=False)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = us_between(F.lag("ts").over(w), F.col("ts"))
    g = ev.select("event_type", gap.alias("gap_us"))
    dropped = F.col("gap_us").isNotNull() & (F.col("gap_us") < 900_000_000)
    return g.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(dropped, 1).otherwise(0)).alias("n_debounced"),
        F.sum(F.when(~dropped | F.col("gap_us").isNull(), 1).otherwise(0)).alias("n_kept"),
    )


@query(
    "yoy_revenue_by_month",
    oracle="""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue, 12) OVER (ORDER BY month) AS revenue_prior_year,
           round((revenue - lag(revenue, 12) OVER (ORDER BY month))
                 / lag(revenue, 12) OVER (ORDER BY month), 9) AS yoy_change
    FROM m
    """,
    tags=("window", "timeseries", "seasonality"),
)
def yoy_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue: the seasonal comparison every
    finance dashboard leads with — a 12-step ``lag`` over the monthly
    aggregate, so each month compares against the SAME month last year
    instead of the previous month (which mixes seasonality into the
    delta; :func:`~cooler_mapreduce_spark.operators.tpch.
    forecast_revenue_change` shows the adjacent-period form).

    The fact table collapses to O(months) rows before the window, so
    the unpartitioned ORDER BY sorts ~80 rows — the aggregate-then-
    window shape that stays trivially cheap at any fact scale.  Revenue
    is decimal-staged; the YoY ratio is one double division.
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(wall_trunc("o_orderdate", "month").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("month")
    prior = F.lag("revenue", 12).over(w)
    return m.select(
        "month",
        "revenue",
        prior.alias("revenue_prior_year"),
        F.round((F.col("revenue") - prior) / prior, 9).alias("yoy_change"),
    )


@query(
    "window_max_quantity_with_ties",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
               rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rk
        FROM lineitem
    )
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_tied_rows,
           MIN(l_quantity) AS max_qty,
           MIN(l_orderkey) AS first_orderkey
    FROM r WHERE rk = 1
    GROUP BY l_returnflag
    """,
    tags=("window", "rank", "ties"),
)
def window_max_quantity_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-rank selection WITH ties: every lineitem sharing the maximum
    quantity per returnflag survives (``rank() = 1``), where
    ``row_number`` would arbitrarily keep one — the WITH TIES semantics
    of SQL:2008 FETCH FIRST, and the difference between "a top item"
    and "all items tied for the top".  Quantities are coarse-grained so
    hundreds of rows tie: the positive path is structural, not luck.
    The rollup counts the tie group per flag; MIN over the tied
    quantity is exact (all equal by construction).
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    r = li.select(
        "l_returnflag", "l_orderkey", "l_quantity", F.rank().over(w).alias("rk")
    ).filter(F.col("rk") == 1)
    return r.groupBy("l_returnflag").agg(
        F.count("*").alias("n_tied_rows"),
        F.min("l_quantity").alias("max_qty"),
        F.min("l_orderkey").alias("first_orderkey"),
    )


@query(
    "skyline_pareto_orders",
    oracle="""
    SELECT a.o_orderkey, a.o_totalprice, a.o_orderdate
    FROM orders a
    WHERE NOT EXISTS (
        SELECT 1 FROM orders b
        WHERE b.o_totalprice >= a.o_totalprice
          AND b.o_orderdate <= a.o_orderdate
          AND (b.o_totalprice > a.o_totalprice OR b.o_orderdate < a.o_orderdate)
    )
    """,
    tags=("window", "skyline", "pareto"),
)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of orders: maximize o_totalprice,
    minimize o_orderdate — "the earliest order at every price level no
    later cheaper order beats". A row survives iff no other row is ≥ on
    both dims and > on one (ties on both dims are mutually
    non-dominating, so exact duplicates all stay).

    Two stages, both shuffle-light. (1) Partition-local prune: rows
    hash into 64 buckets and each bucket drops rows whose strict prefix
    (price DESC, date ASC, key) already saw an earlier-or-equal date —
    every dropped row is strictly dominated by a surviving bucket-mate,
    and since dominance is transitive/acyclic the global skyline is a
    subset of the survivors (the classic distributed-skyline
    local-prune). Survivors number O(skyline × buckets) — tiny.
    (2) Exact pass on the survivors: per price level take the min date,
    run one ordered window over the distinct levels for the
    strictly-higher-price running min, and keep rows at their level's
    min date that no higher level undercuts. The global window touches
    only the pruned frame, never the fact table. The oracle is the
    independent quadratic NOT EXISTS definition — affordable at sf0.01
    precisely because DuckDB verifies what the window formulation
    computes. All comparisons are on raw column values; no float
    arithmetic is introduced, so determinism is free.
    """
    o = table(spark, sf_dir, "orders", fan_out=False).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    wb = (
        Window.partitionBy(F.pmod(F.hash("o_orderkey"), F.lit(64)))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pruned = (
        o.withColumn("_prefix_min", F.min("o_orderdate").over(wb))
        .filter(
            F.col("_prefix_min").isNull()
            | (F.col("o_orderdate") <= F.col("_prefix_min"))
        )
        .drop("_prefix_min")
    )
    lvl = pruned.groupBy("o_totalprice").agg(
        F.min("o_orderdate").alias("_lvl_min_date")
    )
    wl = (
        Window.orderBy(F.desc("o_totalprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lvl = lvl.withColumn("_strict_min_date", F.min("_lvl_min_date").over(wl))
    return (
        pruned.join(lvl, "o_totalprice")
        .filter(
            (F.col("o_orderdate") == F.col("_lvl_min_date"))
            & (
                F.col("_strict_min_date").isNull()
                | (F.col("_strict_min_date") > F.col("o_orderdate"))
            )
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
