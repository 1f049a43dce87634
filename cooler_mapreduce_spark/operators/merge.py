"""MERGE / upsert — snapshot maintenance without a table format.

The lakehouse MERGE INTO (insert + update + delete in one pass) expressed
as plain DataFrame algebra: one full-outer join between the snapshot and
the change batch, then per-row resolution. Delta/Iceberg implement exactly
this plan under their MERGE syntax; writing it as algebra keeps the engine
format-agnostic, and the reference (append-only TSV output,
task_executor.py:244-250) has no notion of mutation at all.

Scale shape: the change batch is small relative to the snapshot in every
real CDC pipeline → broadcast it and the snapshot is never shuffled; a
bucketed snapshot (sources/bucketing.py) keeps even same-size merges
exchange-free on the snapshot side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import dsum, sql_dsum
from ..registry import query
from ..sources.catalog import table


@query(
    "merge_cdc_orders",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, 'D' AS op,
               CAST(NULL AS DOUBLE) AS new_totalprice,
               CAST(NULL AS VARCHAR) AS new_status
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice * 1.1, 'P'
        FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'I', 42.0, 'O'
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
    FROM orders s LEFT JOIN changes c ON s.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL
    UNION ALL
    SELECT c.o_orderkey, c.new_status, c.new_totalprice
    FROM changes c LEFT JOIN orders s ON s.o_orderkey = c.o_orderkey
    WHERE c.op = 'U' AND s.o_orderkey IS NOT NULL
    UNION ALL
    SELECT c.o_orderkey, c.new_status, c.new_totalprice
    FROM changes c WHERE c.op = 'I'
    """,
    tags=("merge", "cdc", "upsert"),
)
def merge_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a deterministic CDC batch into the orders snapshot:
    deletes (keys % 13), updates (keys % 7, price uplift to 'P' status),
    inserts (fresh keys).

    Decomposed as survivors ∪ updates ∪ inserts: the survivor branch is
    a LEFT ANTI join against the change keys — and anti joins (unlike
    full-outer, which Spark refuses to broadcast) take a broadcast build
    side, so the snapshot is filtered in place with NO shuffle; the
    update/insert branches project the change batch directly. UNION ALL
    is partition concatenation — also shuffle-free. Total exchanges on
    the 100 TB side: zero. (A full-outer-join formulation would
    sort-merge-shuffle the entire snapshot — Spark logs "build right
    for full outer join" unsupported and silently degrades.)
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    changes = (
        base.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("new_totalprice"),
            F.lit(None).cast("string").alias("new_status"),
        )
        .union(
            base.filter((F.col("o_orderkey") % 13 != 0) & (F.col("o_orderkey") % 7 == 0))
            .select(
                "o_orderkey",
                F.lit("U").alias("op"),
                (F.col("o_totalprice") * 1.1).alias("new_totalprice"),
                F.lit("P").alias("new_status"),
            )
        )
        .union(
            base.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit("I").alias("op"),
                F.lit(42.0).alias("new_totalprice"),
                F.lit("O").alias("new_status"),
            )
        )
    )
    survivors = base.join(F.broadcast(changes), "o_orderkey", "left_anti")
    applied = changes.filter(F.col("op").isin("U", "I")).select(
        "o_orderkey",
        F.col("new_status").alias("o_orderstatus"),
        F.col("new_totalprice").alias("o_totalprice"),
    )
    return survivors.union(applied)


#: The SCD2 versions CTE — the ONE spelling of "orders as a versioned
#: change feed" shared by every oracle that reads the history
#: (scd2_customer_history / scd2_snapshot_asof /
#: scd2_point_in_time_join here, TAKEDOWN_SCD2_ORACLE in
#: governance.py): a drifted copy would silently audit a different
#: history than the kernels build.
SCD2_VERSIONS_CTE = """versions AS (
        SELECT o_custkey AS custkey, o_orderdate AS valid_from, o_totalprice AS attr,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS vn,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS next_from
        FROM orders
    )"""


@query(
    "scd2_customer_history",
    oracle=f"""
    WITH {SCD2_VERSIONS_CTE}
    SELECT custkey, vn AS version, valid_from,
           CAST(COALESCE(next_from, TIMESTAMP '2200-01-01 00:00:00') AS TIMESTAMP) AS valid_to,
           (next_from IS NULL) AS is_current,
           attr
    FROM versions
    """,
    tags=("merge", "scd2", "history"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: each key's change events become
    versioned rows with [valid_from, valid_to) ranges and a current-row
    flag — the warehouse history-tracking pattern (orders stand in as the
    change feed; o_totalprice as the tracked attribute). The open-ended
    sentinel is 2200-01-01, not 9999-12-31: Arrow nanosecond timestamps
    (the driver's collect path) top out in 2262.

    One window over (key, time): lead() supplies each version's
    expiration, row_number its version ordinal — a single hash-partition
    shuffle on the key, state per row O(1). The (orderdate, orderkey)
    sort key is a total order, so version numbering is deterministic
    under ties.
    """
    # fan_out=False: the history window's exchange immediately
    # re-partitions this scan — the fan-out pass was redundant. r11 A/B,
    # identical rows: 0.780 -> 0.348 s (also speeds every face that
    # derives from this history: asof, point-in-time, takedown).
    o = table(spark, sf_dir, "orders", fan_out=False)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_totalprice").alias("attr"),
        F.row_number().over(w).alias("version"),
        F.lead("o_orderdate").over(w).alias("next_from"),
    )
    return v.select(
        "custkey",
        "version",
        "valid_from",
        # cast the sentinel to next_from's OWN type (TIMESTAMP or
        # TIMESTAMP_NTZ depending on source annotation) — a fixed LTZ cast
        # would make the coalesce coerce the whole column through the
        # session timezone
        F.coalesce(
            F.col("next_from"),
            F.lit("2200-01-01").cast(v.schema["next_from"].dataType),
        ).alias("valid_to"),
        F.col("next_from").isNull().alias("is_current"),
        "attr",
    )


_ASOF_TS = "1998-06-15 00:00:00"


@query(
    "scd2_snapshot_asof",
    oracle=f"""
    WITH {SCD2_VERSIONS_CTE}
    SELECT custkey, vn AS version, valid_from, attr
    FROM versions
    WHERE valid_from <= TIMESTAMP '{_ASOF_TS}'
      AND COALESCE(next_from, TIMESTAMP '2200-01-01 00:00:00')
          > TIMESTAMP '{_ASOF_TS}'
    """,
    tags=("merge", "scd2", "temporal", "history"),
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal AS-OF read over the SCD2 history: the state of every
    tracked key exactly as of one instant — "what did this dimension
    look like on 1998-06-15?" — the time-travel query the versioned
    [valid_from, valid_to) layout exists to answer.

    The snapshot is a pure filter over :func:`scd2_customer_history`'s
    output (valid_from ≤ t < valid_to — the half-open ranges partition
    time per key, so exactly ≤1 row per key survives; keys with no
    version yet simply don't appear). At 100 TB the history table is
    materialized once and the snapshot predicate prunes on
    valid_from/valid_to footer stats — no window recomputation per
    read; here it composes the registered history query directly so the
    two stay definitionally consistent. The AS-OF literal coerces to
    the column's own timestamp flavor (a fixed LTZ literal would shift
    the cut under a non-UTC session).
    """
    hist = scd2_customer_history(spark, sf_dir)
    ts_type = hist.schema["valid_from"].dataType
    t = F.lit(_ASOF_TS).cast(ts_type)
    return (
        hist.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
        .select("custkey", "version", "valid_from", "attr")
    )


@query(
    "snapshot_diff_customers",
    oracle=f"""
    WITH states AS (
        SELECT o_custkey AS custkey,
               COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00')
                   AS old_n,
               COUNT(*) AS new_n,
               {sql_dsum("CASE WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00' THEN o_totalprice END")}
                   AS old_total,
               {sql_dsum('o_totalprice')} AS new_total
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey,
           CASE WHEN old_n = 0 THEN 'insert' ELSE 'update' END AS change_type,
           old_n, new_n, old_total, new_total
    FROM states WHERE old_n <> new_n
    """,
    tags=("merge", "cdc", "aggregation", "temporal"),
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a change feed from two snapshot states — the INVERSE of
    merge_cdc_orders (which consumes CDC, this produces it): which
    per-customer aggregate rows changed between the end-of-1998
    snapshot and now, emitted as insert/update change rows with
    old+new values (unchanged keys are silent, as in a real change
    feed; this construction has no deletes since facts only accrue —
    a delete would surface as old-without-new).

    The scale insight: when both snapshots are time-slices of the SAME
    fact stream, the diff needs NO snapshot join — conditional
    aggregation computes both states in ONE partial-aggregable scan
    (old = FILTER'd counters, new = plain counters) and the change
    classification is a per-row CASE. A naive implementation
    materializes two snapshots and full-outer-joins them: two scans
    plus a key shuffle; this is one scan, one shuffle, and the
    pushed-down date literal never leaves the row's own flavor. Both
    totals decimal-staged, so 'changed' never misfires on float noise.
    """
    cut = F.col("o_orderdate") < "1999-01-01 00:00:00"
    o = table(spark, sf_dir, "orders")
    states = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.when(cut, 1)).alias("old_n"),
        F.count("*").alias("new_n"),
        dsum(F.when(cut, F.col("o_totalprice"))).alias("old_total"),
        dsum("o_totalprice").alias("new_total"),
    )
    return states.filter(F.col("old_n") != F.col("new_n")).select(
        "custkey",
        F.when(F.col("old_n") == 0, "insert").otherwise("update").alias("change_type"),
        "old_n",
        "new_n",
        "old_total",
        "new_total",
    )


@query(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH {SCD2_VERSIONS_CTE}
    SELECT e.user_id, e.event_id, v.vn AS version, v.attr
    FROM events e
    JOIN versions v
      ON v.custkey = e.user_id
     AND v.valid_from <= e.ts
     AND COALESCE(v.next_from, TIMESTAMP '2200-01-01 00:00:00') > e.ts
    WHERE e.event_type = 'purchase'
    """,
    tags=("merge", "scd2", "temporal", "join"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical SCD2 consumption pattern — the point-in-time join:
    enrich each fact (purchase events) with the dimension version that
    was in effect AT THE FACT'S OWN TIMESTAMP, not today's row. Joining
    facts to a current-only dimension silently rewrites history; the
    versioned [valid_from, valid_to) ranges exist precisely so this
    join can ask "what was true then".

    Plan shape: an equi-join on the key with the validity window as a
    residual range predicate — per key the version count is bounded and
    the half-open ranges are disjoint, so each fact matches EXACTLY one
    version (or none, if it predates the first) and the fan-out is ≤1.
    At 100 TB this is the same bounded-theta discipline as the as-of
    join: the range residual rides the key-partitioned join, never a
    time-range cross product. Event time stays in the column's own
    timestamp flavor end-to-end.
    """
    hist = scd2_customer_history(spark, sf_dir)
    # fan_out=False: the filtered purchase slice is the broadcast BUILD
    # side of the point-in-time join — Q3/Q8 pattern
    ev = table(spark, sf_dir, "events", fan_out=False).filter(
        F.col("event_type") == "purchase"
    )
    ts_type = hist.schema["valid_from"].dataType
    ets = F.col("ts").cast(ts_type)
    return (
        ev.join(
            hist,
            (hist.custkey == ev.user_id)
            & (hist.valid_from <= ets)
            & (hist.valid_to > ets),
        )
        .select("user_id", "event_id", "version", "attr")
    )
