"""Join operators — every join family the engine supports natively.

The reference has **no** join operator (SURVEY.md §2.4: expressible only as
a hand-written reduce-side join in user map/reduce code; no sample does
it). Here each family is a declarative plan with the physical strategy the
100 TB deployment wants:

- dimension joins → **broadcast hash** (fact table never shuffles);
- fact-fact joins → **sort-merge / shuffled hash**, AQE re-plans at
  runtime (skew split, dynamic broadcast);
- EXISTS / NOT EXISTS → **semi / anti** join (no row duplication, pruned
  probe payload);
- interval predicates → **broadcast nested-loop** against a tiny band
  table (the only NL join that's ever acceptable at scale);
- as-of ordering → **window carry-forward**, *not* a non-equi self-join:
  one shuffle + one sort per key, linear work — the quadratic
  range-join formulation would melt at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import dsum, sql_dsum
from ..functions.timeutil import us_between, wall_trunc
from ..registry import query
from ..sources.catalog import table


@query(
    "join_orders_customers",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "broadcast"),
)
def join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner fact-to-dimension join, broadcast by SIZE, not by hint.

    customer is ~1/10th of orders but still SF-scaled (~20 B rows at
    100 TB), so no ``F.broadcast`` hint: the 64 MB
    autoBroadcastJoinThreshold (session.py) picks a broadcast hash join
    at every test SF — orders is read once, never shuffled, the join
    runs at scan speed inside one stage — while at 100 TB size-based
    planning + AQE degrade to a shuffle join instead of OOMing on a
    forced broadcast (hints override size checks).
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    c = table(spark, sf_dir, "customer", fan_out=False)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    Build-side broadcast of the *left* table is illegal for left-outer, so
    Spark broadcasts the right (orders is larger — at real scale AQE
    decides; the aggregate keyed by custkey then coalesces). COUNT(col)
    skips the NULLs from non-matches — same semantics both engines.
    """
    c = table(spark, sf_dir, "customer")
    # fan_out=False: orders is the broadcast BUILD side (left-outer must
    # stream the preserved customer side) — the Q3/Q8/Q9/Q18 pattern.
    o = table(spark, sf_dir, "orders", fan_out=False)
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: customers who never ordered.

    The anti join shuffles only the single join column from the probe side
    (column pruning), emits each customer at most once, and needs no
    post-dedup — the formulation a hand-written MapReduce version always
    gets subtly wrong on duplicates.
    """
    c = table(spark, sf_dir, "customer")
    # fan_out=False: the single-column probe side of the anti join is a
    # broadcast BUILD at test SF — the Q3/Q8/Q9/Q18 pattern.
    o = table(spark, sf_dir, "orders", fan_out=False).select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_range_price_bands",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
               ('premium', 1200.0, 100000.0)
    )
    SELECT b.band, COUNT(*) AS n_parts, {sql_dsum('p.p_retailprice')} AS total_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    tags=("join", "range", "theta"),
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny in-memory band table.

    Non-equi joins have no hash path; Spark plans BroadcastNestedLoopJoin.
    That is O(|facts| × |bands|) — acceptable *only* because the band side
    is a constant handful of rows broadcast everywhere; a fact-fact range
    join would instead be rewritten to bucket + equi-join (see
    ``similarity`` for that pattern at scale).
    """
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice").alias("total_price"))
    )


@query(
    "join_asof_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
           ) AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
    tags=("join", "asof", "window"),
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it — implemented as a window carry-forward, not a join.

    Union clicks+purchases, one shuffle on user_id, one sort on (ts,
    kind), then ``last(click_ts, ignorenulls)`` over an unbounded-
    preceding frame. Linear in events per user; the naive non-equi
    self-join the oracle uses for *verification* is quadratic per user
    and exists only because DuckDB can afford it at sf0.01.
    Clicks sort before purchases at equal ts so `<=` semantics hold.
    """
    ev = table(spark, sf_dir, "events", fan_out=False)
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


@query(
    "join_null_safe_props",
    oracle="""
    WITH e AS (SELECT event_id, json_extract_string(props, '$.missing') AS grp
               FROM events),
    d AS (SELECT DISTINCT json_extract_string(props, '$.missing') AS grp
          FROM events)
    SELECT e.event_id, CASE WHEN d.grp IS NULL THEN 'null-group' ELSE d.grp END AS matched
    FROM e JOIN d ON e.grp IS NOT DISTINCT FROM d.grp
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    standard equi-joins silently drop. Planned as a hash join on the
    null-safe key, so it scales like any other equi-join."""
    ev = table(spark, sf_dir, "events")
    e = ev.select("event_id", F.get_json_object("props", "$.missing").alias("grp"))
    d = e.select("grp").distinct().withColumnRenamed("grp", "d_grp")
    return (
        e.join(d, F.col("grp").eqNullSafe(F.col("d_grp")))
        .select(
            "event_id",
            F.when(F.col("d_grp").isNull(), F.lit("null-group"))
            .otherwise(F.col("d_grp"))
            .alias("matched"),
        )
    )


@query(
    "fuzzy_match_parts",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    tags=("join", "fuzzy", "levenshtein"),
)
def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (entity resolution): near-identical part
    names within a brand, edit distance ≤ 2.

    BLOCKED self-join — the equi-key (p_brand) makes it a hash join
    whose candidate count is Σ(block²), not n²; levenshtein runs only
    on within-block candidates, and the threshold form
    ``levenshtein(a, b, 2)`` computes a banded DP (O(len·k) not
    O(len²), early-exit at distance > 2; −1 sentinel filtered) —
    measured 12.2 s → 5.3 s at sf0.1 over the unbanded spelling.

    The blocking-key choice is the entire scale story of entity
    resolution: at 100 TB blocks come from cheaper signatures
    (first-k chars, phonetic codes, LSH buckets — the dedup tier's
    machinery). A PartEnum-style pigeonhole signature (one of k+1=3
    name chunks survives ≤2 edits verbatim, equi-joined at ±2 shifted
    positions) was prototyped and MEASURED SLOWER here (7.2 s): this
    corpus draws names from a small word vocabulary, so chunk
    signatures collide pervasively (2.0 M candidates vs 8 M brute
    pairs) and the candidate dedup costs more than the skipped
    verifications — the same crossover economics as prefix-filter vs
    posting-list Jaccard (SCALING.md): signature schemes pay only when
    signatures are selective. Integer edit distances are exact in both
    engines.
    """
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 2).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               date_diff('microseconds', a.ts, b.ts) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL 300 SECOND
    )
    SELECT type_a, type_b, COUNT(*) AS n_pairs,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           round(CAST(SUM(gap_us) AS BIGINT) / COUNT(*) / 1000000.0, 9) AS avg_gap_sec
    FROM pairs GROUP BY type_a, type_b
    """,
    tags=("join", "interval", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal band self-join: pairs of events by the same user within a
    5-minute window, aggregated per (earlier-type, later-type) — the
    near-in-time correlation shape (double-fire detection, cause→effect
    pairing) that completes the join inventory alongside equi, range,
    and as-of (SURVEY.md §2.4: the reference expresses no join at all).

    The theta condition rides on an equi-join: Catalyst hashes on
    user_id (SortMergeJoin) and evaluates the time band as a residual
    filter per user — never a cartesian product.  Gap arithmetic is
    exact microsecond integers (``unix_micros``), timestamps compared
    raw.  100 TB: per-user grouping bounds the pair blow-up (pairs grow
    quadratically *per user*, not globally); for dense users, bucketing
    both sides on user_id removes the shuffle entirely, and the window
    bound caps the search to adjacent time buckets.
    """
    ev = table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 300 SECONDS")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        us_between(F.col("a.ts"), F.col("b.ts")).alias("gap_us"),
    )
    return pairs.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n_pairs"),
        F.min("gap_us").alias("min_gap_us"),
        F.round(F.sum("gap_us") / F.count("*") / 1_000_000.0, 9).alias("avg_gap_sec"),
    )


@query(
    "join_full_outer_hourly",
    oracle="""
    WITH s AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, COUNT(*) AS n_signups
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    e AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT COALESCE(s.hour, e.hour) AS hour,
           COALESCE(n_signups, 0) AS n_signups,
           COALESCE(n_errors, 0) AS n_errors
    FROM s FULL OUTER JOIN e ON s.hour = e.hour
    """,
    tags=("join", "full-outer", "reconciliation"),
)
def join_full_outer_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation: hourly signup counts against hourly
    error counts, keeping hours where either side is absent (zero-filled
    by COALESCE) — the two-ledger comparison shape where inner/left
    joins silently drop exactly the discrepant rows you're looking for.
    Completes the outer-join family (left outer: order counts; anti:
    inactive customers; semi: Q4).

    Both inputs pre-aggregate to O(hours) rows before the join, so the
    full-outer — which cannot broadcast (both sides must retain
    unmatched rows) — joins two tiny keyed sets; at 100 TB the pattern
    holds because the reduction happens BEFORE the join, never on raw
    events.
    """
    ev = table(spark, sf_dir, "events")

    def hourly(event_type: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy(wall_trunc("ts", "hour").alias("hour"))
            .agg(F.count("*").alias(out))
        )

    s = hourly("signup", "n_signups")
    e = hourly("error", "n_errors")
    return s.join(e, "hour", "full").select(
        "hour",
        F.coalesce("n_signups", F.lit(0)).alias("n_signups"),
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
    )


@query(
    "join_asof_forward_tolerance",
    oracle="""
    SELECT v.event_id, v.user_id, v.ts,
           (SELECT MIN(p.ts) FROM events p
            WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
              AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 7 DAY
           ) AS next_purchase_ts
    FROM events v WHERE v.event_type = 'view'
    """,
    tags=("join", "asof", "window", "tolerance"),
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each view event matched to the
    user's NEXT purchase at-or-after it, but only within 7 days — the
    conversion-window join (pandas ``merge_asof(direction='forward',
    tolerance=...)``). Complements ``join_asof_last_click``'s backward
    direction.

    Same carry idiom, reversed: union views+purchases, one shuffle on
    user_id, sort by ts DESCENDING (purchases before views at equal ts,
    so ``>=`` holds), and ``last(purchase_ts, ignorenulls)`` over the
    unbounded-preceding frame — scanning from the future backwards, the
    most recently seen purchase IS the nearest following one. The
    tolerance then nulls matches beyond 7 days via exact integer
    microsecond arithmetic (timestamp-flavor invariant). Linear per
    user; the oracle's correlated MIN subquery is the quadratic
    spelling DuckDB can afford at sf0.01.
    """
    ev = table(spark, sf_dir, "events", fan_out=False)
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("kind"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "next_ts", F.last("purchase_ts", ignorenulls=True).over(w)
    )
    tol_us = 7 * 24 * 3600 * 1_000_000
    return carried.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            us_between(F.col("ts"), F.col("next_ts")) <= tol_us, F.col("next_ts")
        ).alias("next_purchase_ts"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT v.event_id, v.user_id, v.ts,
           (SELECT p.ts FROM events p
            WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
            ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), p.ts
            LIMIT 1) AS nearest_purchase_ts
    FROM events v WHERE v.event_type = 'view'
    """,
    tags=("join", "asof", "window"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — pandas ``merge_asof(direction='nearest')``,
    completing the family's third direction (backward:
    :func:`join_asof_last_click`; forward + tolerance:
    :func:`join_asof_forward_tolerance`): each view event matched to the
    user's purchase with the smallest |Δt| in EITHER direction, ties
    broken toward the earlier purchase (a spelled rule, identical in
    both engines — pandas leaves equidistant ties unspecified).

    Shape: both directional carries from ONE user-keyed exchange — the
    ascending and descending windows share the shuffle, each a linear
    pass (two sorts, zero extra exchanges; .explain shows one
    hashpartitioning). The nearest pick is then pure projection over
    exact microsecond arithmetic. The oracle's correlated ORDER
    BY/LIMIT 1 subquery is the quadratic spelling DuckDB can afford at
    test scale; the engine side stays O(events) per user at any SF.
    """
    ev = table(spark, sf_dir, "events", fan_out=False)
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
        # purchases sort before views at equal ts in BOTH directions, so
        # a same-instant purchase is visible to each carry (<= / >=)
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("kind"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "prev_ts", F.last("purchase_ts", ignorenulls=True).over(w_back)
    ).withColumn("next_ts", F.last("purchase_ts", ignorenulls=True).over(w_fwd))
    d_prev = us_between(F.col("prev_ts"), F.col("ts"))
    d_next = us_between(F.col("ts"), F.col("next_ts"))
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return carried.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", nearest.alias("nearest_purchase_ts")
    )


# --------------------------------------------- bloom-prefiltered join --

#: hot-customer predicate + bloom sizing for the prefilter face. The
#: bloom parameters are LITERALS (2^17 bits = a 16 KB broadcast, 4
#: hashes: fpp ~ 2% even at 15k hot keys) — a production job derives
#: them from table stats, the mechanics are identical.
_BLOOM_HOT_BAL = 9900.0
_BLOOM_BITS = 131072
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_HASHES = 4


def _bloom_positions(key: str) -> list[F.Column]:
    """k independent bit positions for a key: xxhash64 of (key, salt_i)
    — mixing a literal salt column varies the hash — folded into
    [0, bits) by pmod (non-negative, unlike %)."""
    return [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_HASHES)
    ]


def bloom_build(keys: DataFrame, key: str) -> DataFrame:
    """ONE-row bloom filter over a key column, composed from public
    DataFrame ops (Spark's own ``BloomFilterAggregate`` is
    optimizer-internal — injected by the runtime-filter rule, not
    SQL-invocable — so the engine exposes the operator as a
    composition): explode each key's k bit positions, fold positions
    into per-word masks with a partial-aggregable ``bit_or``, and pack
    the words into ONE dense ``array<long>`` ordered by word index
    (array_sort over (index, mask) structs — order-free, so the bits
    never depend on partition layout). Output: 1 row, ``bf
    array<long>`` of 2048 longs (131072 bits, 16 KB).

    Scale shape: O(keys x k) exploded positions -> O(2048) masks -> one
    16 KB row, independent of the key count — the property that makes
    the prefilter broadcastable when the key SET is not.
    """
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(key))).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("m"),
    ).groupBy("w").agg(F.bit_or("m").alias("mask"))
    spine = (
        keys.sparkSession.range(_BLOOM_WORDS)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("mask", F.lit(0).cast("long")).alias("mask"))
    )
    return spine.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "mask"))), lambda s: s.mask
        ).alias("bf")
    )


def bloom_might_contain(bf: str, key: str) -> F.Column:
    """Membership probe against a packed ``array<long>`` bloom: the
    key's k bit positions are materialized ONCE into a positions array
    (the exact :func:`_bloom_positions` spelling the build uses, so
    probe and build hash identically), then ``forall`` requires every
    position's bit set — exactly k xxhash64 evaluations + k word/bit
    tests per probed row (the previous spelling inlined each position
    twice — word index and bit shift — paying 2k hash evaluations
    unless the optimizer CSE'd them, which FilterExec codegen does
    not). element_at is 1-based. The higher-order forall is a
    CodegenFallback leaf — the surrounding scan+filter stage stays
    whole-stage-codegen'd and evaluates the 4-element probe via the
    interpreter, which the halved hash count more than pays for."""
    return F.forall(
        F.array(*_bloom_positions(key)),
        lambda p: (
            F.element_at(F.col(bf), (p / 64).cast("int") + 1).bitwiseAND(
                # F.shiftleft's numBits param is int-only; the SQL
                # function accepts a column — call it directly
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
                )
            )
            != 0
        ),
    )


@query(
    "bloom_prefilter_hot_orders",
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > {_BLOOM_HOT_BAL}
    GROUP BY 1
    ORDER BY segment
    """,
    tags=("join", "filter", "bloom", "aggregation", "scan"),
)
def bloom_prefilter_hot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PREFILTERED dimension join — the semi-join reduction
    pattern (Bloom, CACM 1970; the mechanism behind Spark's own
    runtime row-level filters): the selective side (customers with
    c_acctbal > {_BLOOM_HOT_BAL}, ~1% of the dimension) folds its join
    keys into ONE 16 KB bloom filter (:func:`bloom_build` — order-free
    bit_or merge of seeded xxhash64 positions, composed from PUBLIC
    DataFrame ops because Spark's own BloomFilterAggregate is
    optimizer-internal), the fact scan drops non-member rows via the
    packed-bitmap probe BEFORE any exchange, and the survivors flow
    into the exact verify join (false positives die there, so the
    bloom changes the PLAN, never the answer — the oracle is the plain
    join). Output: per-segment order count + exact decimal revenue of
    the hot cohort.

    Why this matters at 100 TB: the fact side never shuffles its cold
    99% — the bloom rides a 1-row broadcast onto the scan, which is the
    ONLY way to prune a fact join whose selective predicate lives on
    the other table (partition pruning can't see it; Spark's runtime
    bloom-filter rule does exactly this automatically when its size
    thresholds align — this face pins the mechanics explicitly, at any
    threshold, and plan-asserts the prefilter so the pattern is
    testable).

    Scale shape: the bloom build is O(hot x k) exploded positions
    folding into O(2048) word masks -> ONE 16 KB row (independent of
    key count — the property that makes it broadcastable when the key
    SET is not); the probe is 4 hash+bit ops per fact row inside
    whole-stage codegen; then the exact verify join (hot side ~1% of
    the dimension) and an O(segments) rollup. No fact-side shuffle of
    unmatched rows, no collects.

    Reference parity: beyond the reference — no join surface exists
    there at all (SURVEY.md §2.4); extends the join family with the
    semi-join-reduction member (round-10 growth).
    """
    c = (
        table(spark, sf_dir, "customer", fan_out=False)
        .filter(F.col("c_acctbal") > _BLOOM_HOT_BAL)
        .select("c_custkey", "c_mktsegment")
    )
    bf = bloom_build(c.select("c_custkey"), "c_custkey")
    o = table(spark, sf_dir, "orders", fan_out=False).select(
        "o_custkey", "o_totalprice"
    )
    pruned = (
        o.crossJoin(F.broadcast(bf))
        .filter(bloom_might_contain("bf", "o_custkey"))
        .drop("bf")
    )
    return (
        pruned.join(c, pruned.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .orderBy("segment")
    )
