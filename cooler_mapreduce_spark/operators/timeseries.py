"""Time-series analytics over the daily revenue series and event timelines.

Beyond the reference (SURVEY.md §2.4 — its single-round MapReduce jobs
cannot express order-dependent series math): EWMA smoothing, lagged
autocorrelation, maximum drawdown, and time-weighted averaging — the
feature-engineering staples of a forecasting / anomaly pipeline.

Scale design (100 TB): every query first collapses the fact table to a
calendar-bounded series (one partial-aggregated shuffle; the series has
O(days) rows regardless of SF — ~2.4 k days here, still ~40 k rows after a
century), so the subsequent global-ordered windows run over a frame whose
size is fixed by the calendar, not the data. ``time_weighted_avg_value``
windows per user_id — a keyed shuffle, never a global sort.

Determinism: series values come from decimal-staged sums
(``functions.numeric``); EWMA weights are powers of 0.5 (exact binary
doubles, so products are exact scalings); composite expressions are
generated ONCE as SQL text and parsed by both engines, pinning the
floating-point evaluation order bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..functions.timeutil import us_between, wall_trunc
from ..registry import query
from ..sources.catalog import table

#: DuckDB fragment: the shared daily revenue series.
_SQL_DAILY = f"""
    daily AS (
        SELECT date_trunc('day', o_orderdate) AS bucket_day,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )"""


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue series: one scan, partial-aggregable, O(days) rows."""
    o = table(spark, sf_dir, "orders", fan_out=False)
    return o.groupBy(
        wall_trunc(F.col("o_orderdate"), "day").alias("bucket_day")
    ).agg(dsum("o_totalprice").alias("revenue"))


#: EWMA: 10 terms (lags 0..9) of weight 0.5^k — a half-life of one day,
#: truncated where the remaining tail weight (0.5^10 ≈ 0.1 %) is below
#: the series' own noise floor. Powers of 0.5 are exact binary doubles.
_EWMA_LAGS = 9


def _ewma_exprs() -> tuple[str, str]:
    """(numerator, denominator) SQL — identical text for both engines, so
    the left-associative double summation order is pinned by the parser."""
    num, den = ["revenue"], ["1.0"]
    for k in range(1, _EWMA_LAGS + 1):
        w = repr(0.5**k)  # shortest round-trip literal → same double bits
        num.append(f"CASE WHEN lag_{k} IS NULL THEN 0.0 ELSE {w} * lag_{k} END")
        den.append(f"CASE WHEN lag_{k} IS NULL THEN 0.0 ELSE {w} END")
    return " + ".join(num), " + ".join(den)


def _ewma_oracle() -> str:
    lags = ",\n               ".join(
        f"LAG(revenue, {k}) OVER (ORDER BY bucket_day) AS lag_{k}"
        for k in range(1, _EWMA_LAGS + 1)
    )
    num, den = _ewma_exprs()
    return f"""
    WITH {_SQL_DAILY},
    lagged AS (
        SELECT bucket_day, revenue,
               {lags}
        FROM daily
    )
    SELECT bucket_day, revenue, ({num}) / ({den}) AS ewma
    FROM lagged
    """


@query(
    "ewma_daily_revenue",
    oracle=_ewma_oracle(),
    tags=("timeseries", "window", "smoothing"),
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (half-life = 1 day, truncated at 10 taps, adjust-style
    renormalization over the available lags at the series head).

    The recurrence y_t = αx_t + (1-α)y_{t-1} is inherently sequential;
    truncating the exponentially vanishing tail turns it into a
    fixed-width FIR filter — 10 LAG taps over one ordered window, fully
    parallel and shuffle-free beyond the day-rollup. The window is
    global-ordered but runs on the O(days) series, not the fact table.
    Weights 0.5^k are exact binary doubles (products are exact
    scalings), and the summation expression is one SQL string parsed by
    both engines — bit-identical left-to-right order.
    """
    d = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("bucket_day")
    lagged = d.select(
        "bucket_day",
        "revenue",
        *[F.lag("revenue", k).over(w).alias(f"lag_{k}") for k in range(1, _EWMA_LAGS + 1)],
    )
    num, den = _ewma_exprs()
    return lagged.select(
        "bucket_day", "revenue", F.expr(f"({num}) / ({den})").alias("ewma")
    )


_AC_LAGS = 7

#: Pearson r from exact component sums — one SQL string for both engines
#: (n is pre-cast to double as nd). corr() itself is merge-order-dependent;
#: this decimal-staged formulation is not.
_AC_CORR = (
    "round((nd * sxy - sx * sy) / "
    "sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 12)"
)


def _autocorr_oracle() -> str:
    lags = ",\n               ".join(
        f"LAG(revenue, {k}) OVER (ORDER BY bucket_day) AS lag_{k}"
        for k in range(1, _AC_LAGS + 1)
    )
    pairs = "\n        UNION ALL ".join(
        f"SELECT {k} AS lag_k, revenue AS x, lag_{k} AS y FROM lagged"
        for k in range(1, _AC_LAGS + 1)
    )
    return f"""
    WITH {_SQL_DAILY},
    lagged AS (
        SELECT bucket_day, revenue,
               {lags}
        FROM daily
    ),
    pairs AS (
        {pairs}
    ),
    comp AS (
        SELECT lag_k, COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
               {sql_dsum('x * y', 4)} AS sxy,
               {sql_dsum('x * x', 4)} AS sxx,
               {sql_dsum('y * y', 4)} AS syy
        FROM pairs WHERE y IS NOT NULL GROUP BY lag_k
    )
    SELECT lag_k, n AS n_pairs, {_AC_CORR} AS autocorr
    FROM comp
    """


@query(
    "autocorr_daily_revenue",
    oracle=_autocorr_oracle(),
    tags=("timeseries", "statistics", "window"),
)
def autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of daily revenue — the seasonality
    fingerprint (weekly cadence shows as a lag-7 spike).

    Each lag pairs the series with its own offset (7 LAG taps over one
    ordered window on the O(days) series), the pairs unpivot via
    ``stack`` into (lag_k, x, y) rows, and Pearson r comes from exact
    decimal component sums (n, Σx, Σy, Σxy, Σx², Σy²) — the same
    one-pass co-moment shape as ``stat_corr_qty_price`` but
    order-independent: built-in ``corr()`` merges partial co-moments in
    shuffle-arrival order and is not bit-stable. The closed form is one
    shared SQL string, so both engines evaluate the identical double
    expression tree.
    """
    d = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("bucket_day")
    lagged = d.select(
        "revenue",
        *[F.lag("revenue", k).over(w).alias(f"lag_{k}") for k in range(1, _AC_LAGS + 1)],
    )
    stack_args = ", ".join(f"{k}, lag_{k}" for k in range(1, _AC_LAGS + 1))
    pairs = lagged.select(
        F.col("revenue").alias("x"),
        F.expr(f"stack({_AC_LAGS}, {stack_args}) AS (lag_k, y)"),
    ).filter(F.col("y").isNotNull())
    comp = pairs.groupBy("lag_k").agg(
        F.count("*").alias("n"),
        F.count("*").cast("double").alias("nd"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y"), 4).alias("sxy"),
        dsum(F.col("x") * F.col("x"), 4).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 4).alias("syy"),
    )
    return comp.select(
        "lag_k", F.col("n").alias("n_pairs"), F.expr(_AC_CORR).alias("autocorr")
    )


@query(
    "max_drawdown_revenue",
    oracle=f"""
    WITH {_SQL_DAILY},
    peaks AS (
        SELECT bucket_day, revenue,
               MAX(revenue) OVER (ORDER BY bucket_day
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS peak
        FROM daily
    )
    SELECT bucket_day, revenue, peak,
           round((peak - revenue) / peak, 12) AS drawdown
    FROM peaks
    ORDER BY (peak - revenue) / peak DESC, bucket_day
    LIMIT 1
    """,
    tags=("timeseries", "window", "running-extremum"),
)
def max_drawdown_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily revenue series: the worst
    peak-to-trough fall relative to the running peak — the risk metric
    behind "how bad did the dip get".

    Running peak is a MAX over an unbounded-preceding frame (a picked
    value — exact, order-independent); the drawdown ratio is one double
    division of decimal-derived values; the single argmax row comes out
    via TakeOrdered with the day as tiebreak. All heavy lifting is the
    O(days) series rollup; the window itself is calendar-bounded.
    """
    d = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("bucket_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    peaks = d.withColumn("peak", F.max("revenue").over(w))
    dd = (F.col("peak") - F.col("revenue")) / F.col("peak")
    return (
        peaks.orderBy(dd.desc(), F.asc("bucket_day"))
        .limit(1)
        .select("bucket_day", "revenue", "peak", F.round(dd, 12).alias("drawdown"))
    )


@query(
    "time_weighted_avg_value",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, value,
               CAST(epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                    - epoch_us(ts) AS BIGINT) AS dt_us
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_intervals,
           CAST(SUM(CAST(FLOOR(value * (dt_us / 1000000.0) * 1048576.0)
                         AS DECIMAL(38,0))) AS DOUBLE)
             / 1048576.0 / (CAST(SUM(dt_us) AS DOUBLE) / 1000000.0) AS twa_value
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY user_id HAVING SUM(dt_us) > 0
    """,
    tags=("timeseries", "window", "irregular-sampling"),
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's ``value`` signal — the
    correct mean for irregularly sampled series, where a plain AVG
    over-weights bursts: each observation holds until the next one, so
    it weighs by its holding duration (value ⋅ Δt / Σ Δt).

    One keyed shuffle on user_id, one in-partition sort for the LEAD
    tap; durations are exact integer microseconds
    (``timeutil.us_between`` — timestamp-flavor invariant). The weighted
    terms are floor-quantized at 2⁻²⁰ before the exact decimal sum (the
    ``pagerank`` convention: a plain double→decimal cast ROUNDS, and
    Spark's half-up vs DuckDB's tie rule diverge on half-way products),
    then one fixed double division chain — bit-identical on both
    engines. The last observation per user has no successor
    and drops out (standard TWA); single-event users and all-tied
    timelines (Σ Δt = 0) are filtered rather than left to divide by
    zero under ANSI mode.
    """
    # fan_out=False: redundant pre-window shuffle (r11 A/B on the same
    # shape: window_running_total 0.881 -> 0.427 s)
    ev = table(spark, sf_dir, "events", fan_out=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        us_between(F.col("ts"), F.lead("ts").over(w)).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    q = F.floor(
        F.col("value") * (F.col("dt_us") / F.lit(1000000.0)) * F.lit(1048576.0)
    ).cast("decimal(38,0)")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            (
                F.sum(q).cast("double")
                / F.lit(1048576.0)
                / (F.sum("dt_us").cast("double") / F.lit(1000000.0))
            ).alias("twa_value"),
            F.sum("dt_us").alias("_tot_dt"),
        )
        .filter(F.col("_tot_dt") > 0)
        .drop("_tot_dt")
    )


@query(
    "cusum_changepoint_revenue",
    oracle=f"""
    WITH {_SQL_DAILY},
    dev AS (
        SELECT bucket_day, revenue,
               revenue - (CAST(SUM(CAST(revenue AS DECIMAL(30,2))) OVER ()
                               AS DOUBLE) / COUNT(*) OVER ()) AS d
        FROM daily
    ),
    cu AS (
        SELECT bucket_day, revenue,
               CAST(SUM(CAST(FLOOR(d * 1048576.0) AS DECIMAL(38,0)))
                        OVER (ORDER BY bucket_day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 1048576.0 AS cusum
        FROM dev
    )
    SELECT bucket_day, revenue, cusum, abs(cusum) AS abs_cusum
    FROM cu
    ORDER BY abs(cusum) DESC, bucket_day
    LIMIT 1
    """,
    tags=("timeseries", "changepoint", "window"),
)
def cusum_changepoint_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily revenue: the day where the
    cumulative sum of deviations from the series mean peaks in magnitude
    — the classic single-changepoint estimator (the level shift
    maximizes |Σ(xᵢ − x̄)| exactly at the shift).

    The mean is an unbounded-frame window over the O(days) series (no
    scalar collect, no cross join); deviations are floor-quantized at
    2⁻²⁰ before the exact decimal running sum (the engine's
    double→decimal convention — a plain cast ROUNDS and the engines'
    tie rules differ), and the argmax row comes out via TakeOrdered
    with the day tiebreak. Fact-table work is the one partial-aggregated
    day rollup; everything after is calendar-bounded.
    """
    d = _daily_revenue(spark, sf_dir)
    w_all = Window.partitionBy()
    mean = (
        F.sum(F.col("revenue").cast("decimal(30,2)")).over(w_all).cast("double")
        / F.count("*").over(w_all)
    )
    dev = d.select("bucket_day", "revenue", (F.col("revenue") - mean).alias("d"))
    w_run = Window.orderBy("bucket_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = F.floor(F.col("d") * F.lit(1048576.0)).cast("decimal(38,0)")
    cu = dev.select(
        "bucket_day",
        "revenue",
        (F.sum(q).over(w_run).cast("double") / F.lit(1048576.0)).alias("cusum"),
    )
    return (
        cu.orderBy(F.abs(F.col("cusum")).desc(), F.asc("bucket_day"))
        .limit(1)
        .select("bucket_day", "revenue", "cusum", F.abs(F.col("cusum")).alias("abs_cusum"))
    )


#: OLS closed form from exact component sums — one SQL string for both
#: engines (nd = n as double). Guarded: a single-day group has zero x
#: variance; NULL the slope there instead of dividing by zero under ANSI.
_OLS_SLOPE = "(nd * sxy - sx * sy) / nullif(nd * sxx - sx * sx, 0.0)"
_OLS_EXPRS = (
    f"round({_OLS_SLOPE}, 12) AS slope",
    f"round((sy - {_OLS_SLOPE} * sx) / nd, 12) AS intercept",
    f"round(({_OLS_SLOPE}) * ({_OLS_SLOPE}) * (nd * sxx - sx * sx)"
    " / nullif(nd * syy - sy * sy, 0.0), 12) AS r2",
)


@query(
    "linreg_trend_by_priority",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority,
               datediff('day', DATE '1995-01-01',
                        CAST(date_trunc('day', o_orderdate) AS DATE)) AS x,
               {sql_dsum('o_totalprice')} AS y
        FROM orders GROUP BY 1, 2
    ),
    comp AS (
        SELECT o_orderpriority, COUNT(*) AS n_days,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               {sql_dsum('y')} AS sy,
               {sql_dsum('y * y', 4)} AS syy,
               {sql_dsum('x * y')} AS sxy
        FROM daily GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_days,
           {', '.join(_OLS_EXPRS)}
    FROM comp
    """,
    tags=("timeseries", "statistics", "regression"),
)
def linreg_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue trend: ordinary-least-squares slope,
    intercept and R² of the daily revenue series against the day index —
    "is URGENT growing faster than LOW", the grouped trend-line
    feature behind forecasting and drift monitors.

    Everything reduces to six exact component sums per group (n, Σx,
    Σx², Σy, Σy², Σxy) in ONE partial-aggregable pass over the day
    rollup — never a window, never a per-group collect. x is an exact
    integer day offset from a fixed epoch; x·y and y² are exact
    low-decimal doubles (y carries 2 decimals), so their decimal-staged
    sums are bit-identical; the closed form is one shared SQL string
    evaluated in the same order by both engines, with zero-variance
    groups NULLed under ``nullif`` instead of tripping ANSI division.
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(
            wall_trunc(F.col("o_orderdate"), "day").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("x"),
    ).agg(dsum("o_totalprice").alias("y"))
    comp = daily.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_days"),
        F.count("*").cast("double").alias("nd"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("y"), 4).alias("syy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return comp.select("o_orderpriority", "n_days", *[F.expr(e) for e in _OLS_EXPRS])


@query(
    "interpolate_hourly_purchase_value",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_hour
        FROM bounds
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS bucket_hour,
               COUNT(*) AS n_obs,
               CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    joined AS (SELECT s.bucket_hour, h.n_obs, h.v
               FROM spine s LEFT JOIN hourly h USING (bucket_hour)),
    carried AS (
        SELECT bucket_hour, n_obs, v,
               LAST_VALUE(v IGNORE NULLS) OVER
                   (ORDER BY bucket_hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_hour END IGNORE NULLS)
                   OVER (ORDER BY bucket_hour
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               FIRST_VALUE(v IGNORE NULLS) OVER
                   (ORDER BY bucket_hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_hour END IGNORE NULLS)
                   OVER (ORDER BY bucket_hour
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM joined
    )
    SELECT bucket_hour, COALESCE(n_obs, 0) AS n_obs,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv) *
                     (CAST(epoch_us(bucket_hour) - epoch_us(ph) AS DOUBLE)
                      / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
                END AS interp_value,
           (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS is_interpolated
    FROM carried
    """,
    tags=("timeseries", "gapfill", "interpolation", "window"),
)
def interpolate_hourly_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps: the hourly mean
    purchase value on a dense hourly spine, with missing hours filled by
    the straight line between the nearest observed neighbors (NULL
    outside the observed range, where no second anchor exists) — the
    densify step ``gapfill_hourly_events`` zero-fills counts with, done
    right for a *level* signal where zero would be a lie.

    The spine is generated from the min/max bound aggregate (bounded by
    calendar hours, never row count); prev/next anchors are the two
    ignorenulls carry windows (the as-of idiom, forward + backward) over
    that bounded spine; the interpolation weight is a ratio of exact
    integer microsecond gaps. The hourly means are decimal-staged sums
    of a 2-decimal-quantized signal — exact, so both engines interpolate
    from bit-identical anchors.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        wall_trunc(F.min("ts"), "hour").alias("lo"),
        wall_trunc(F.max("ts"), "hour").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket_hour")
    )
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(wall_trunc(F.col("ts"), "hour").alias("bucket_hour"))
        .agg(
            F.count("*").alias("n_obs"),
            (
                F.sum(F.col("value").cast("decimal(30,2)")).cast("double")
                / F.count("*")
            ).alias("v"),
        )
    )
    j = spine.join(hourly, "bucket_hour", "left")
    wA = Window.orderBy("bucket_hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wB = Window.orderBy("bucket_hour").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("bucket_hour"))
    carried = j.select(
        "bucket_hour",
        "n_obs",
        "v",
        F.last("v", ignorenulls=True).over(wA).alias("pv"),
        F.last(known_h, ignorenulls=True).over(wA).alias("ph"),
        F.first("v", ignorenulls=True).over(wB).alias("nv"),
        F.first(known_h, ignorenulls=True).over(wB).alias("nh"),
    )
    frac = us_between(F.col("ph"), F.col("bucket_hour")).cast("double") / us_between(
        F.col("ph"), F.col("nh")
    ).cast("double")
    return carried.select(
        "bucket_hour",
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("interp_value"),
        (
            F.col("v").isNull() & F.col("pv").isNotNull() & F.col("nv").isNotNull()
        ).alias("is_interpolated"),
    )


#: deseasonalized z from exact per-weekday component sums — one string,
#: both engines; single-day weekdays (zero variance) NULL out via nullif.
_WD_Z = (
    "round((revenue - (swx / wn)) / nullif(sqrt((wn * swxx - swx * swx)"
    " / (wn * (wn - 1.0))), 0.0), 12)"
)


@query(
    "weekday_profile_anomalies",
    oracle=f"""
    WITH {_SQL_DAILY},
    wd AS (
        SELECT bucket_day, revenue, dayofweek(bucket_day) + 1 AS dow
        FROM daily
    ),
    prof AS (
        SELECT dow, CAST(COUNT(*) AS DOUBLE) AS wn,
               {sql_dsum('revenue')} AS swx,
               {sql_dsum('revenue * revenue', 4)} AS swxx
        FROM wd GROUP BY dow
    )
    SELECT bucket_day, dow, revenue, {_WD_Z} AS z
    FROM wd JOIN prof USING (dow)
    ORDER BY abs({_WD_Z}) DESC, bucket_day
    LIMIT 10
    """,
    tags=("timeseries", "anomaly", "seasonality"),
)
def weekday_profile_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally adjusted anomaly detection: each day's revenue scored
    against ITS WEEKDAY's profile (mean/std over all same-weekday days),
    top-10 |z| out — the adjustment that keeps every Sunday from looking
    like an anomaly when weekends simply run lower.

    The weekday profile is 7 groups of exact component sums over the
    O(days) series (one partial-aggregable pass); profiles join back by
    size-based broadcast (a 7-row post-aggregate); the z closed form is
    one shared SQL string — bit-identical across engines — and the
    top-10 is TakeOrdered with the day tiebreak. Spark's `dayofweek` is
    1=Sunday..7; DuckDB's is 0-based — the oracle adds 1.
    """
    d = _daily_revenue(spark, sf_dir)
    wd = d.select(
        "bucket_day", "revenue", F.dayofweek("bucket_day").alias("dow")
    )
    prof = wd.groupBy("dow").agg(
        F.count("*").cast("double").alias("wn"),
        dsum("revenue").alias("swx"),
        dsum(F.col("revenue") * F.col("revenue"), 4).alias("swxx"),
    )
    j = wd.join(prof, "dow").select(
        "bucket_day", "dow", "revenue", F.expr(_WD_Z).alias("z")
    )
    # project z BEFORE the sort: with the closed form inlined in the sort
    # key Spark falls back to Sort+CollectLimit; on the named column the
    # planner picks TakeOrderedAndProject (per-partition top-k merge).
    return j.orderBy(F.abs(F.col("z")).desc(), F.asc("bucket_day")).limit(10)


@query(
    "theilsen_trend_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT datediff('day', DATE '1995-01-01',
                        CAST(date_trunc('day', o_orderdate) AS DATE)) AS x,
               {sql_dsum('o_totalprice')} AS y
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT a.x AS x1, b.x AS x2,
               (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
        FROM daily a JOIN daily b ON a.x < b.x
    ),
    ranked AS (
        SELECT slope,
               ROW_NUMBER() OVER (ORDER BY slope, x1, x2) AS rn,
               COUNT(*) OVER () AS n
        FROM pairs
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
           (MIN(slope) + MAX(slope)) / 2.0 AS theil_sen_slope
    FROM ranked
    WHERE rn IN (CAST(FLOOR((n + 1) / 2.0) AS BIGINT),
                 CAST(FLOOR(n / 2.0) AS BIGINT) + 1)
    """,
    tags=("timeseries", "statistics", "robust-regression"),
)
def theilsen_trend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue: the MEDIAN of all
    pairwise slopes — the regression estimator outliers can't drag
    (breakdown point 29 %, vs OLS's zero; compare
    ``linreg_trend_by_priority``).

    All-pairs sounds like the forbidden quadratic, but both sides are
    the CALENDAR-BOUNDED day series — the pair count is O(days²),
    fixed by the date range, not the data (≈2.9 M pairs over this
    7-year range at ANY scale factor; the fact table only feeds the
    day rollup's partial sums). The median is an explicit middle-rank
    selection (row_number with a total-order tiebreak, then
    (lo+hi)/2 written identically in both engines) rather than
    percentile()/median(), whose interpolation formulas are
    engine-private and can differ in the last ULP.
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    daily = o.groupBy(
        F.datediff(
            wall_trunc(F.col("o_orderdate"), "day").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("x")
    ).agg(dsum("o_totalprice").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy("slope", "x1", "x2")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / F.lit(2.0)).cast("long"))
        | (F.col("rn") == F.floor(F.col("n") / F.lit(2.0)).cast("long") + 1)
    )
    return mid.agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        ((F.min("slope") + F.max("slope")) / F.lit(2.0)).alias("theil_sen_slope"),
    )


_RC_WIN = 90  # rolling window: 90 observed days

#: rolling Pearson r from windowed exact component sums — one SQL string
#: for both engines; degenerate windows (constant series) NULL via nullif.
_RC_CORR = (
    "round((nd * sxy - sx * sy) /"
    " nullif(sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 0.0), 12)"
)


@query(
    "rolling_corr_revenue_orders",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS bucket_day,
               {sql_dsum('o_totalprice')} AS x,
               CAST(COUNT(*) AS DOUBLE) AS y
        FROM orders GROUP BY 1
    ),
    win AS (
        SELECT bucket_day,
               CAST(COUNT(*) OVER w AS DOUBLE) AS nd,
               CAST(SUM(CAST(FLOOR(x) AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(FLOOR(y) AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(FLOOR(x * y) AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxy,
               CAST(SUM(CAST(FLOOR(x * x) AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxx,
               CAST(SUM(CAST(FLOOR(y * y) AS DECIMAL(38,0))) OVER w AS DOUBLE) AS syy
        FROM daily
        WINDOW w AS (ORDER BY bucket_day
                     ROWS BETWEEN {_RC_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_day, CAST(nd AS BIGINT) AS n_days, {_RC_CORR} AS rolling_corr
    FROM win WHERE nd >= {_RC_WIN}
    """,
    tags=("timeseries", "statistics", "window", "rolling"),
)
def rolling_corr_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 90-day correlation between daily revenue and daily order
    count — "is growth volume-driven or price-driven lately", tracked as
    it drifts. Windowed Pearson needs SIX running sums (n, Σx, Σy, Σxy,
    Σx², Σy²); all six ride ONE ordered window over the calendar-bounded
    series, each unit-floor-quantized before its exact decimal frame sum
    (x² exceeds 2⁵³ units at any sub-unit staging scale, where a plain
    rounding cast is conversion-path-dependent across engines — the TWA
    lesson; FLOOR of an identical double is not, and whole units are
    noise at 1e7-scale daily magnitudes: the corr error is ~1e-12,
    below the 1e-12 output rounding). Partial windows
    (fewer than 90 observed days) are suppressed rather than reported
    with inflated variance. The closed form is one shared SQL string,
    `nullif`-guarded for constant windows.
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    daily = o.groupBy(
        wall_trunc(F.col("o_orderdate"), "day").alias("bucket_day")
    ).agg(
        dsum("o_totalprice").alias("x"),
        F.count("*").cast("double").alias("y"),
    )
    w = Window.orderBy("bucket_day").rowsBetween(-(_RC_WIN - 1), Window.currentRow)

    def ws(expr):
        q = F.floor(expr).cast("decimal(38,0)")
        return F.sum(q).over(w).cast("double")

    win = daily.select(
        "bucket_day",
        F.count("*").over(w).cast("double").alias("nd"),
        ws(F.col("x")).alias("sx"),
        ws(F.col("y")).alias("sy"),
        ws(F.col("x") * F.col("y")).alias("sxy"),
        ws(F.col("x") * F.col("x")).alias("sxx"),
        ws(F.col("y") * F.col("y")).alias("syy"),
    )
    return win.filter(F.col("nd") >= _RC_WIN).select(
        "bucket_day",
        F.col("nd").cast("bigint").alias("n_days"),
        F.expr(_RC_CORR).alias("rolling_corr"),
    )


# ------------------------------------------------ Holt linear smoothing ----

#: Holt's recurrence, one shared SQL spelling. α = β = 0.5: halving is an
#: exact binary-double scaling, so every rounding step is a plain IEEE
#: add/subtract evaluated in the same left-to-right order by both
#: engines — the fold is bit-deterministic without quantization.
_HOLT_L = "0.5 * {y} + 0.5 * ({l} + {b})"
_HOLT_B = "0.5 * (({nl}) - {l}) + 0.5 * {b}"


def _holt_oracle() -> str:
    nl = _HOLT_L.format(y="x.y", l="h.level", b="h.trend")
    nb = _HOLT_B.format(nl=nl, l="h.level", b="h.trend")
    return f"""
    WITH RECURSIVE weekly AS (
        SELECT date_trunc('week', o_orderdate) AS bucket_week,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY bucket_week) AS i,
               bucket_week, CAST(revenue AS DOUBLE) AS y
        FROM weekly
    ),
    holt AS (
        SELECT i, bucket_week, y,
               y AS level, CAST(0.0 AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS forecast
        FROM idx WHERE i = 1
        UNION ALL
        SELECT x.i, x.bucket_week, x.y,
               {nl} AS level,
               {nb} AS trend,
               h.level + h.trend AS forecast
        FROM holt h JOIN idx x ON x.i = h.i + 1
    )
    SELECT bucket_week, y, level, trend, forecast FROM holt
    """


@query(
    "holt_linear_smoothing",
    oracle=_holt_oracle(),
    tags=("timeseries", "forecasting", "iterative", "hof"),
)
def holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over the weekly
    revenue series: per day the level, trend, and the one-step-ahead
    forecast the model would have issued the evening before —
    the classic short-horizon baseline forecaster.

    The recurrence l_t = αy_t + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1} is inherently sequential — a
    window cannot express it (each output feeds the next input). The
    scale answer is the module's calendar-bounded-series invariant: the
    fact table collapses to O(days) rows with one partial-aggregated
    shuffle, and only THEN does the sequential fold run — a single
    ``aggregate`` higher-order pass over a ~350-element array in one
    task. The sequential stage's cost is fixed by the calendar (a
    century is ~5.2 k steps), not by the 100 TB below it. (Weekly, not
    daily: the oracle's recursive CTE pays ~6 ms per step — at ~2.4 k
    daily steps the correctness gate spent 14 s in DuckDB for the same
    semantics this shows at ~350.) The DuckDB
    oracle is the same recurrence as a recursive CTE — the engines
    share one spelling of the update expressions, pinning FP order.

    Init (standard): l_1 = y_1, b_1 = 0; the forecast column is NULL on
    day 1 (no prior state). Reference parity: beyond the reference —
    its single-round MapReduce cannot chain state across records
    (SURVEY.md §2.4).
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    weekly = o.groupBy(
        F.trunc(F.to_date("o_orderdate"), "week").cast("timestamp_ntz").alias("bucket_week")
    ).agg(dsum("o_totalprice").alias("revenue"))
    series = weekly.select(
        F.struct("bucket_week", F.col("revenue").cast("double").alias("y")).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("ser"))
    nl = _HOLT_L.format(y="x.y", l="acc.l", b="acc.b")
    nb = _HOLT_B.format(nl=nl, l="acc.l", b="acc.b")
    fold = f"""
        aggregate(
            slice(ser, 2, greatest(size(ser) - 1, 0)),
            struct(
                element_at(ser, 1).y AS l,
                CAST(0.0 AS DOUBLE) AS b,
                array(struct(
                    element_at(ser, 1).bucket_week AS bucket_week,
                    element_at(ser, 1).y AS y,
                    element_at(ser, 1).y AS level,
                    CAST(0.0 AS DOUBLE) AS trend,
                    CAST(NULL AS DOUBLE) AS forecast)) AS out),
            (acc, x) -> struct(
                {nl} AS l,
                {nb} AS b,
                array_append(acc.out, struct(
                    x.bucket_week AS bucket_week,
                    x.y AS y,
                    {nl} AS level,
                    {nb} AS trend,
                    acc.l + acc.b AS forecast)) AS out),
            acc -> acc.out)
    """
    return series.select(F.explode(F.expr(fold)).alias("r")).select("r.*")


# ------------------------------------------- LTTB-style downsampling ----

#: Triangle area (×2) against the neighbor-bucket MEAN anchors — one
#: spelling, both engines, identical IEEE evaluation order. Edge buckets
#: (no prev/next anchor) get -1.0, below any real area, so their
#: selection falls through to the earliest-point tiebreak.
_LTTB_AREA = (
    "COALESCE(abs((xp - xn) * (value - yp)"
    " - (xp - CAST(x_us AS DOUBLE)) * (yn - yp)), -1.0)"
)


@query(
    "downsample_lttb_daily",
    oracle=f"""
    WITH p AS (
        SELECT event_id, ts, value, date_trunc('day', ts) AS bucket_day,
               CAST(epoch_us(ts) AS BIGINT) AS x_us
        FROM events WHERE event_type = 'purchase'
    ),
    b AS (
        SELECT bucket_day,
               CAST(SUM(x_us) AS DOUBLE) / COUNT(*) AS xbar,
               {sql_davg('value', 6)} AS ybar
        FROM p GROUP BY bucket_day
    ),
    anch AS (
        SELECT bucket_day,
               LAG(xbar)  OVER (ORDER BY bucket_day) AS xp,
               LAG(ybar)  OVER (ORDER BY bucket_day) AS yp,
               LEAD(xbar) OVER (ORDER BY bucket_day) AS xn,
               LEAD(ybar) OVER (ORDER BY bucket_day) AS yn
        FROM b
    ),
    scored AS (
        SELECT p.bucket_day, p.event_id, p.ts, p.value, p.x_us,
               {_LTTB_AREA} AS area
        FROM p JOIN anch ON p.bucket_day = anch.bucket_day
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket_day
                                     ORDER BY area DESC, x_us, event_id) AS rn
        FROM scored
    )
    SELECT bucket_day, event_id, ts, value FROM r WHERE rn = 1
    """,
    tags=("timeseries", "downsampling", "window", "hypertable"),
)
def downsample_lttb_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visualization-grade downsampling of the purchase-value signal to
    one representative point per day, LTTB-style (Steinarsson's
    Largest-Triangle-Three-Buckets, the timeseries-DB downsampling
    standard): within each bucket keep the point subtending the largest
    triangle against the NEIGHBOR buckets' mean points. Classic LTTB
    anchors on the previously *selected* point, making it sequential;
    this mean-anchored variant (Steinarsson's "LTTB with bucket mean"
    simplification) keeps the visual fidelity while every bucket scores
    independently — fully parallel.

    Scale: the per-bucket mean table is O(days) (exact-integer x̄ and
    decimal-staged ȳ, so the anchors are bit-deterministic), the anchor
    lag/lead runs on that calendar-bounded frame, and anchors join back
    to the fact by size-based broadcast — no hint, one fact-side
    shuffle for the bucket rollup and the per-bucket argmax, which is a
    partial-aggregable ``max(struct(area, −x_us, −event_id, payload))``
    (total-order tiebreak: earliest point wins ties, edge buckets with
    no anchor degrade to first-point-of-bucket). The area expression is
    one shared SQL string — both engines evaluate the identical double
    tree.
    """
    ev = table(spark, sf_dir, "events", fan_out=False)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        "value",
        wall_trunc(F.col("ts"), "day").alias("bucket_day"),
        us_between(epoch, F.col("ts").cast("timestamp_ntz")).alias("x_us"),
    )
    b = p.groupBy("bucket_day").agg(
        (F.sum("x_us").cast("double") / F.count("*")).alias("xbar"),
        davg("value", 6).alias("ybar"),
    )
    wb = Window.orderBy("bucket_day")
    anch = b.select(
        "bucket_day",
        F.lag("xbar").over(wb).alias("xp"),
        F.lag("ybar").over(wb).alias("yp"),
        F.lead("xbar").over(wb).alias("xn"),
        F.lead("ybar").over(wb).alias("yn"),
    )
    scored = p.join(anch, "bucket_day").select(
        "bucket_day", "event_id", "ts", "value", "x_us",
        F.expr(_LTTB_AREA).alias("area"),
    )
    sel = scored.groupBy("bucket_day").agg(
        F.max(
            F.struct(
                "area",
                (-F.col("x_us")).alias("nx"),
                (-F.col("event_id")).alias("ne"),
                F.col("event_id").alias("sel_event_id"),
                F.col("ts").alias("sel_ts"),
                F.col("value").alias("sel_value"),
            )
        ).alias("m")
    )
    return sel.select(
        "bucket_day",
        F.col("m.sel_event_id").alias("event_id"),
        F.col("m.sel_ts").alias("ts"),
        F.col("m.sel_value").alias("value"),
    )


# --- classical additive seasonal decomposition (period 7) -------------------

#: the centered 7-tap trend as ONE SQL string (the EWMA convention:
#: explicit lags/leads instead of a sliding frame — sliding-window SUMs
#: may evaluate incrementally with FP subtraction, which is engine- and
#: implementation-dependent; a parsed expression pins the op sequence).
_STL_TREND = (
    "(lag_3 + lag_2 + lag_1 + revenue + lead_1 + lead_2 + lead_3) / 7.0"
)


def _stl_oracle() -> str:
    taps = ",\n               ".join(
        [f"LAG(revenue, {k}) OVER (ORDER BY bucket_day) AS lag_{k}" for k in (1, 2, 3)]
        + [f"LEAD(revenue, {k}) OVER (ORDER BY bucket_day) AS lead_{k}" for k in (1, 2, 3)]
    )
    return f"""
    WITH {_SQL_DAILY},
    tapped AS (
        SELECT bucket_day, revenue,
               {taps}
        FROM daily
    ),
    det AS (
        SELECT dayofweek(bucket_day) AS dow,
               revenue - ({_STL_TREND}) AS detrended
        FROM tapped
        WHERE lag_3 IS NOT NULL AND lead_3 IS NOT NULL
    ),
    seas AS (
        SELECT dow, detrended,
               COUNT(*) OVER (PARTITION BY dow) AS n_days,
               CAST(SUM(CAST(detrended AS DECIMAL(30,6))) OVER (PARTITION BY dow)
                    AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY dow) AS DOUBLE)
                   AS seasonal
        FROM det
    )
    SELECT dow, CAST(MAX(n_days) AS BIGINT) AS n_days,
           round(MAX(seasonal), 6) AS seasonal,
           round(sqrt({sql_dsum('(detrended - seasonal) * (detrended - seasonal)', 6)}
                 / CAST(COUNT(*) AS DOUBLE)), 6) AS residual_rms
    FROM seas
    GROUP BY dow
    ORDER BY dow
    """


@query(
    "seasonal_decompose_weekly",
    oracle=_stl_oracle(),
    tags=("timeseries", "window", "statistics", "seasonal"),
)
def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue,
    period 7 (the moving-average step of STL without loess): trend =
    centered 7-tap mean; seasonal = per-weekday mean of the detrended
    series; residual = what neither explains. Emits one row per weekday
    (dow 0=Sunday..6): the seasonal component and the within-weekday
    residual RMS — together the variance split that tells a forecaster
    whether a weekly cycle is real and how much noise rides on it.
    ``weekday_profile_anomalies`` flags individual outliers against the
    same cycle; this emits the MODEL (trend/seasonal/residual
    decomposition itself), and ``holt_linear_smoothing`` the level/trend
    recursion — the three standard views of one series.

    Scale shape: the fact table collapses to the calendar-bounded daily
    series in one partial-aggregable pass; every window after that runs
    on O(days) rows (the order-only trend window is calendar-bounded —
    allowlisted class). Determinism: the 7-tap trend is one parsed
    expression (no incremental sliding-sum FP), the per-weekday means
    and the residual sum are decimal-staged, and dayofweek is pinned to
    the 0=Sunday convention in both engines.
    """
    d = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("bucket_day")
    tapped = d.select(
        "bucket_day",
        "revenue",
        *[F.lag("revenue", k).over(w).alias(f"lag_{k}") for k in (1, 2, 3)],
        *[F.lead("revenue", k).over(w).alias(f"lead_{k}") for k in (1, 2, 3)],
    )
    det = tapped.filter(
        F.col("lag_3").isNotNull() & F.col("lead_3").isNotNull()
    ).select(
        (F.dayofweek("bucket_day") - F.lit(1)).alias("dow"),
        (F.col("revenue") - F.expr(_STL_TREND)).alias("detrended"),
    )
    wd = Window.partitionBy("dow")
    seas = det.select(
        "dow",
        "detrended",
        F.count("*").over(wd).alias("n_days"),
        (
            F.sum(F.col("detrended").cast("decimal(30,6)")).over(wd).cast("double")
            / F.count("*").over(wd).cast("double")
        ).alias("seasonal"),
    )
    res2 = (F.col("detrended") - F.col("seasonal")) * (
        F.col("detrended") - F.col("seasonal")
    )
    return (
        seas.groupBy("dow")
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.round(F.max("seasonal"), 6).alias("seasonal"),
            F.round(
                F.sqrt(dsum(res2, 6) / F.count("*").cast("double")), 6
            ).alias("residual_rms"),
        )
        .orderBy("dow")
    )


# ------------------------------------------------- 1-D Kalman filter ----

#: Local-level (random-walk) model constants, in units of y (weekly
#: revenue scaled to millions): process noise Q, observation noise R,
#: initial state variance P0. Literals, not fitted — this is the
#: smoothing primitive, not a fitted model.
_KAL_Q = "0.01"
_KAL_R = "1.0"
_KAL_P0 = "1.0"
#: One spelling of the predict/update recurrence, shared by the Spark
#: HOF fold and the DuckDB recursive CTE so every intermediate double is
#: produced by the identical IEEE op sequence (the holt convention).
#: predict: pp = p + Q;  gain: k = pp / (pp + R);
#: update:  x' = x + k (y − x);  p' = (1 − k) pp.
_KAL_K = f"(({{p}} + {_KAL_Q}) / (({{p}} + {_KAL_Q}) + {_KAL_R}))"
_KAL_X = f"({{x}} + {_KAL_K} * ({{y}} - {{x}}))"
_KAL_P = f"((1.0 - {_KAL_K}) * ({{p}} + {_KAL_Q}))"


def _kalman_oracle() -> str:
    k = _KAL_K.format(p="f.p")
    nx = _KAL_X.format(x="f.x", y="w.y", p="f.p")
    np_ = _KAL_P.format(p="f.p")
    return f"""
    WITH RECURSIVE weekly AS (
        SELECT date_trunc('week', o_orderdate) AS bucket_week,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY bucket_week) AS i,
               bucket_week, CAST(revenue AS DOUBLE) / 1000000.0 AS y
        FROM weekly
    ),
    filt AS (
        SELECT i, bucket_week, y,
               y AS x, CAST({_KAL_P0} AS DOUBLE) AS p,
               CAST(NULL AS DOUBLE) AS gain
        FROM idx WHERE i = 1
        UNION ALL
        SELECT w.i, w.bucket_week, w.y,
               {nx} AS x, {np_} AS p, {k} AS gain
        FROM filt f JOIN idx w ON w.i = f.i + 1
    )
    SELECT bucket_week, y, x AS level, p AS variance, gain FROM filt
    """


@query(
    "kalman_smooth_weekly_revenue",
    oracle=_kalman_oracle(),
    tags=("timeseries", "forecasting", "iterative", "hof", "kalman"),
)
def kalman_smooth_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level / random-walk model) over the
    weekly revenue series: per week the filtered level, its posterior
    variance, and the Kalman gain actually applied — the probabilistic
    sibling of :func:`holt_linear_smoothing` (holt tracks level+trend
    with fixed gains; Kalman's gain adapts to the accumulated variance,
    converging toward the steady-state value as evidence accrues).

    The recurrence (predict pp = p + Q, gain k = pp/(pp+R), update
    x' = x + k(y − x), p' = (1 − k)pp) is inherently sequential — each
    output feeds the next input — so the scale answer is the module's
    calendar-bounded-series invariant: the fact table collapses to
    O(weeks) rows in one partial-aggregated shuffle, and only THEN does
    the fold run, a single ``aggregate`` higher-order pass over a ~350-
    element array in one task. Sequential cost is fixed by the calendar,
    not by the 100 TB below it. Init: x₁ = y₁, p₁ = P0, gain NULL (no
    prior to mix). y is scaled to millions so the literal Q/R are on
    sensible units. The DuckDB oracle is the same recurrence as a
    recursive CTE, both engines parsing ONE spelling of the
    predict/update expressions — identical IEEE op order, bit-equal
    doubles (the holt convention; no rounding anywhere).

    Reference parity: beyond the reference — its single-round MapReduce
    cannot chain state across records (SURVEY.md §2.4).
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    weekly = o.groupBy(
        F.trunc(F.to_date("o_orderdate"), "week").cast("timestamp_ntz").alias("bucket_week")
    ).agg(dsum("o_totalprice").alias("revenue"))
    series = weekly.select(
        "bucket_week", (F.col("revenue").cast("double") / F.lit(1_000_000.0)).alias("y")
    )
    return kalman_fold(series)


def kalman_fold(series: DataFrame) -> DataFrame:
    """Run the local-level Kalman recurrence over a ``(bucket_week, y)``
    frame — the fold kernel of :func:`kalman_smooth_weekly_revenue`,
    factored out so the property suite can pin it against a sequential
    pure-Python recurrence on arbitrary series
    (tests/test_property_blocks.py)."""
    series = series.select(
        F.struct("bucket_week", "y").alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("ser"))
    k = _KAL_K.format(p="acc.p")
    nx = _KAL_X.format(x="acc.x", y="w.y", p="acc.p")
    np_ = _KAL_P.format(p="acc.p")
    fold = f"""
        aggregate(
            slice(ser, 2, greatest(size(ser) - 1, 0)),
            struct(
                element_at(ser, 1).y AS x,
                CAST({_KAL_P0} AS DOUBLE) AS p,
                array(struct(
                    element_at(ser, 1).bucket_week AS bucket_week,
                    element_at(ser, 1).y AS y,
                    element_at(ser, 1).y AS level,
                    CAST({_KAL_P0} AS DOUBLE) AS variance,
                    CAST(NULL AS DOUBLE) AS gain)) AS out),
            (acc, w) -> struct(
                {nx} AS x,
                {np_} AS p,
                array_append(acc.out, struct(
                    w.bucket_week AS bucket_week,
                    w.y AS y,
                    {nx} AS level,
                    {np_} AS variance,
                    {k} AS gain)) AS out),
            acc -> acc.out)
    """
    return series.select(F.explode(F.expr(fold)).alias("r")).select("r.*")
