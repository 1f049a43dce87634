"""TPC-H-shaped analytical queries on the star schema — the flagship tier.

The reference can only express these as hand-written reduce-side programs
(it never does — SURVEY.md §2.4 "Joins: Absent"); here they are declarative
plans that Catalyst optimizes: filter/projection pushdown into the parquet
scan, partial+final hash aggregation, broadcast joins for dimensions, AQE
for runtime re-planning. These are the queries bench.py times at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..registry import query
from ..sources.catalog import table


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "flagship", "tpch"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the engine's flagship query (weather-stats algebra
    at fact-table scale: 8 aggregates over 2 grouping keys).

    Plan at any scale: parquet scan with the shipdate predicate pushed to
    row-group stats + only 7 columns read → map-side partial agg (4-group
    output per partition) → one tiny shuffle → final agg. The shuffle
    payload is O(partitions × groups), independent of row count — this is
    the pattern that makes 100 TB aggregation cheap.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "aggregation", "tpch"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension star join: lineitem ⋈ supplier ⋈ nation.

    nation (fixed 25 rows) is broadcast by hint; supplier is SF-scaled,
    so it carries NO hint — the 64 MB autoBroadcastJoinThreshold
    (session.py) picks a broadcast hash join at every test SF, and at
    100 TB size-based planning + AQE degrade gracefully to a shuffle
    join instead of force-OOMing the executors. At test scale the plan
    is identical either way: the only shuffle is the final 25-group
    aggregate and the fact table is never repartitioned.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi-join", "tpch"),
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join.

    The semi join shuffles only (l_orderkey, l_shipdate) pairs — column
    pruning cuts the probe side to 16 bytes/row — and never duplicates
    orders rows (semantics EXISTS requires; an inner join + distinct would
    shuffle far more and need a second dedup shuffle).
    """
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "revenue_topn_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "aggregation", "topk", "tpch"),
)
def revenue_topn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop join + aggregate + top-k (TPC-H Q10 shape).

    lineitem ⋈ orders shuffles on orderkey (both huge → sort-merge, AQE
    may pick shuffled-hash); the customer side is joined WITHOUT a hint —
    customer is SF-scaled, so size-based planning broadcasts it at every
    test SF (64 MB threshold) and falls back to a shuffle join at 100 TB
    rather than OOMing on a forced broadcast. Aggregate keyed by customer
    is high-cardinality, so partial agg + AQE coalescing matter; the
    final top-20 is TakeOrdered, never a global sort.
    """
    # fan_out=False on both dimensions: each is a broadcast BUILD side
    # at test SF (lineitem streams), so the single-split fan-out
    # exchange was a shuffle for zero downstream parallelism (the
    # Q3/Q8/Q9/Q18 pattern, A/B'd there). Inert at 100 TB.
    cust = table(spark, sf_dir, "customer", fan_out=False)
    orders = table(spark, sf_dir, "orders", fan_out=False)
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE CAST(o.o_totalprice AS DECIMAL(30,2)) * 2 *
          (SELECT COUNT(*) FROM orders c WHERE c.o_custkey = o.o_custkey)
        > 3 * (SELECT SUM(CAST(s.o_totalprice AS DECIMAL(30,2)))
               FROM orders s WHERE s.o_custkey = o.o_custkey)
    """,
    tags=("subquery", "correlated", "tpch"),
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 50% above their customer's own
    average. Written as literal correlated SQL — Catalyst DECORRELATES it
    into an aggregate + join (RewriteCorrelatedScalarSubquery), the
    optimizer capability SURVEY.md §4 calls out as impossible in the
    reference (queries there are opaque Python). The oracle runs the
    identical SQL, so the rewrite is proven semantics-preserving.

    The "50% above the mean" predicate runs entirely in exact
    integer/decimal arithmetic (price × 2 × count > 3 × sum — the 1.5
    factor as a 2:3 ratio, AVG unrolled to SUM/COUNT) because
    o_totalprice is stored as double: a float AVG would be
    partition-order-dependent in Spark AND DuckDB's AVG(DECIMAL)
    returns DOUBLE (see functions/numeric.py for the general rule).
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE CAST(o.o_totalprice AS DECIMAL(30,2)) * 2 *
              (SELECT COUNT(*) FROM orders c WHERE c.o_custkey = o.o_custkey)
            > 3 * (SELECT SUM(CAST(s.o_totalprice AS DECIMAL(30,2)))
                   FROM orders s WHERE s.o_custkey = o.o_custkey)
        """
    )


@query(
    "shipping_priority_topk",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "aggregation", "topk", "tpch"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue, top 10.

    The segment filter prunes customer BEFORE the join (one-fifth of the
    dimension), the date filters push into both parquet scans, and the
    top-10 is TakeOrdered over the aggregate — no global sort of the
    grouped output. customer carries no broadcast hint (SF-scaled): the
    size threshold broadcasts the pruned dimension at test SF; at 100 TB
    planning degrades to a shuffle join instead of a forced-OOM
    broadcast. l_orderkey is unique per group so the
    revenue-desc/orderkey tiebreak is a total order (deterministic
    top-k, bit-stable revenue via decimal sums).
    """
    # fan_out=False on both dimension sides: each feeds a broadcast
    # BUILD at test SF (the collect to the driver serializes anyway), so
    # the single-split fan-out exchange shuffles the table for zero
    # downstream parallelism. Interleaved A/B at sf0.1, identical rows:
    # 1.356 -> 0.965 s steady. At 100 TB the flag is inert (multi-split
    # scans never trigger the guard) and both joins degrade to shuffle
    # joins by size.
    cust = table(spark, sf_dir, "customer", fan_out=False).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders", fan_out=False).filter(
        F.col("o_orderdate") < "1998-07-01"
    )
    li = table(spark, sf_dir, "lineitem", fan_out=False).filter(
        F.col("l_shipdate") > "1998-07-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "forecast_revenue_change",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("aggregation", "pushdown", "tpch"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The whole query is one parquet scan with every predicate pushed to the
    reader (date range + discount band + quantity cap prune row groups via
    min/max stats) and a 4-column ReadSchema — at 100 TB this reads a few
    percent of the table and aggregates map-side to a single row. The
    canonical "is pushdown actually working" probe.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@query(
    "priority_line_counts",
    oracle="""
    SELECT l.l_linestatus,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("join", "conditional-aggregation", "tpch"),
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + pivoted conditional aggregation.

    One pass over the joined rows produces both counters via
    COUNT(CASE ...) — the pivot-by-predicate idiom that replaces two
    separate filtered scans with a single shuffle. The lineitem side is
    date-pruned at the scan; the join shuffles only (orderkey, linestatus)
    against (orderkey, orderpriority).
    """
    # fan_out=False: orders is the broadcast BUILD side (the date-pruned
    # lineitem streams) — the Q3/Q8/Q9/Q18 pattern, A/B'd there.
    orders = table(spark, sf_dir, "orders", fan_out=False)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(100 AS DOUBLE) *
           ({sql_dsum("CASE WHEN p.p_type = 'PROMO' "
                      "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)}
            / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)}) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "conditional-aggregation", "tpch"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month.

    part is SF-scaled, so it joins WITHOUT a broadcast hint: size-based
    planning broadcasts it at test SF (64 MB threshold) and shuffles at
    100 TB. The month filter prunes the fact scan; both sums come out of
    one aggregate pass. The ratio divides two bit-deterministic decimal
    sums in double — one FP op, identical in both engines.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False).filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    part = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * (dsum(promo, 4) / dsum(disc, 4))).alias("promo_revenue")
        )
    )


@query(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive-predicate", "tpch"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join with an OR-of-ANDs residual.

    Catalyst keeps p_partkey = l_partkey as the hash-join key and
    evaluates the disjunction as a post-join residual. We additionally
    push the brand/size envelope onto the part scan and the quantity
    envelope onto the lineitem scan by hand — implied single-side
    predicates an optimizer cannot always derive from a disjunction —
    so both scans prune before the join, the difference between
    scanning 100 TB and scanning the 3-brand slice. No broadcast hint
    on part (SF-scaled): the size threshold broadcasts the pruned
    3-brand slice at test SF and degrades to shuffle at 100 TB.
    """
    brands = ("Brand#12", "Brand#23", "Brand#34")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands) & F.col("p_size").between(1, 15)
    )
    li = table(spark, sf_dir, "lineitem", fan_out=False).filter(F.col("l_quantity").between(1, 30))
    cases = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cases)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@query(
    "small_quantity_revenue_q17",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.2 * pa.avg_qty
    """,
    tags=("tpch", "join", "correlated-subquery"),
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue lost if
    orders below 20% of a part's average quantity were dropped, for one
    brand.  The correlated AVG-per-part subquery is decorrelated by hand
    into the plan Catalyst would pick anyway — and better: the brand
    filter (1/|brands| selectivity) joins FIRST, so the per-part
    average aggregates only brand lineitems instead of the whole fact
    table (the textbook plan averages everything, then throws 96% away).
    Neither join carries a broadcast hint — the pruned part slice and
    the per-part averages (2 narrow columns, |parts|/|brands| rows) are
    both SF-scaled, so size-based planning broadcasts them at test SF
    and shuffles at 100 TB; the threshold compare is bit-exact because
    both engines stage the average identically (exact decimal sum / count).
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    brand_lines = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(9,2)")).cast("double") / F.count("*"))
        .alias("avg_qty")
    )
    return (
        brand_lines.join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@query(
    "large_orders_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "join", "having", "topk"),
)
def large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    quantity tops 300, with their customer, ranked by order value.

    The HAVING collapses the fact table to a handful of order keys
    before any join — that survivor set broadcasts onto orders and the
    enriched (still tiny) result broadcasts onto customer, so neither
    big table ever shuffles. The survivor set carries NO broadcast hint:
    qty > 300 selects ~1-in-20k orders, so at test SF the 64 MB
    size threshold (and AQE's runtime stats) pick the identical
    BroadcastHashJoin — measured at sf0.1 — while at 100 TB the
    survivor count is still O(orders) strictly speaking, and the
    size-based planner degrades to a shuffle join instead of a forced
    OOM.  The final ranking is TakeOrdered (per-partition heaps),
    tie-broken by orderkey for a total order.  The quantity sum is
    exact decimal, so the >300 gate admits identical rows on both
    engines.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    # fan_out=False on BOTH dimension sides. customer is a broadcast
    # BUILD (the enriched survivor set probes it): A/B 1.423 -> 1.298 s.
    # orders too — the planner broadcasts the ~5 MB orders projection
    # rather than the survivor agg (whose post-HAVING estimate it cannot
    # see), so the fan-out exchange fed a broadcast build there as well:
    # A/B on top of the customer fix, identical rows, 1.008 -> 0.884 s
    # steady. Both flags are inert at 100 TB (multi-split scans; both
    # joins degrade to shuffle joins by size).
    o = table(spark, sf_dir, "orders", fan_out=False)
    c = table(spark, sf_dir, "customer", fan_out=False)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "top_supplier_by_revenue_q15",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))) AS r
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    """,
    tags=("tpch", "argmax", "scalar-subquery"),
)
def top_supplier_by_revenue_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    revenue in a quarter — max-equality selection against a scalar
    subquery, which unlike a LIMIT 1 keeps ALL tied winners.

    The per-supplier revenue aggregate stays in exact decimal so the
    ``r = MAX(r)`` equality is bit-safe (a double-rounded revenue could
    admit different tie sets on different engines).  The global max is a
    one-row broadcast (the always-safe hint); the surviving winner rows
    (ties only) carry NO hint — their subtree contains the per-supplier
    aggregate, whose key is SF-scaled, so the engine's hint rule leaves
    the choice to size-based planning, which picks the identical
    BroadcastHashJoin at test SF (measured at sf0.1) and would shuffle
    at 100 TB.  The fact table shuffles once for the aggregate and
    nothing else moves.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)"))
        .alias("r")
    )
    mx = rev.agg(F.max("r").alias("mr"))
    winners = rev.crossJoin(F.broadcast(mx)).filter(F.col("r") == F.col("mr"))
    s = table(spark, sf_dir, "supplier")
    return s.join(winners, s.s_suppkey == F.col("l_suppkey")).select(
        "s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue")
    )


@query(
    "local_supplier_volume_q5",
    oracle=f"""
    SELECT n_name AS nation,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "aggregation", "tpch"),
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local supplier volume: revenue by nation where
    the customer and the supplier sit in the SAME nation (the join graph
    is a cycle, not a star: lineitem→orders→customer and
    lineitem→supplier close through c_nationkey = s_nationkey).

    Plan: region filter prunes nation (fixed-25-row dimension, hinted
    broadcast); customer and supplier are SF-scaled so they carry NO
    hint — the 64 MB size threshold broadcasts them at test SF, and at
    100 TB planning + AQE pick shuffle joins instead of a forced-OOM
    broadcast (the nation-key equality becomes part of the join
    condition either way). The only wide exchange at test scale is the
    final 5-group aggregate — the fact table never shuffles before
    aggregation. Date predicate pushed to the orders scan.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    # fan_out=False on orders/customer: broadcast BUILD sides at test SF
    # (lineitem streams) — the Q3/Q8/Q9/Q18 pattern, A/B'd there.
    o = table(spark, sf_dir, "orders", fan_out=False).filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    c = table(spark, sf_dir, "customer", fan_out=False)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(rev, 4).alias("revenue")
    )


@query(
    "customer_order_distribution_q13",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    tags=("join", "aggregation", "tpch"),
)
def customer_order_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    join with a predicate on the JOIN side (not a post-filter — customers
    whose every order is urgent must still appear with count 0), then two
    chained aggregations (per-customer count → histogram of counts).

    The outer join's null-extension semantics are the point: an inner
    join would silently drop zero-order customers and skew the
    distribution's head. Plan: the orders side is pre-filtered in its
    scan, the per-customer count partial-aggregates before its shuffle,
    and the second aggregate is O(distinct counts) — tiny.
    """
    c = table(spark, sf_dir, "customer")
    # fan_out=False: the pre-filtered orders side is the broadcast BUILD
    # of the left-outer join (customer streams as the preserved side) —
    # the Q3/Q8/Q9/Q18 pattern, A/B'd there.
    o = table(spark, sf_dir, "orders", fan_out=False).filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "volume_shipping_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume', 4)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "aggregation", "tpch"),
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two trading nations, per
    direction per ship year. The join uses TWO aliases of the nation
    dimension with a disjunctive cross-nation predicate — the pattern
    that defeats naive star-join planners; here both nation aliases
    (fixed 25 rows each) are hinted broadcasts and the OR predicate
    rides the joined row as a residual filter. customer and supplier
    are SF-scaled → no hint: the size threshold broadcasts them at test
    SF and degrades to shuffle joins at 100 TB. Year extraction groups
    the revenue into a (2 dirs × years) rollup — the only wide exchange
    at test scale.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    # fan_out=False on orders/customer: broadcast BUILD sides at test SF
    # (lineitem streams) — the Q3/Q8/Q9/Q18 pattern, A/B'd there.
    o = table(spark, sf_dir, "orders", fan_out=False)
    c = table(spark, sf_dir, "customer", fan_out=False)
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), vol.alias("volume")
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", 4).alias("revenue"))
    )


@query(
    "market_share_q8",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          AND p_type = 'PROMO'
    )
    SELECT o_year,
           round({sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 4)}
                 / {sql_dsum('volume', 4)}, 9) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
    tags=("join", "aggregation", "tpch"),
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: one nation's fraction of
    the PROMO-part revenue sold into a region, per order year. An
    8-relation join (two nation roles: the customer's region gate and
    the supplier's nationality) feeding a conditional-fraction aggregate
    — numerator and denominator both decimal-staged, divided once in
    double, so the share is bit-deterministic at any partition count.
    Only the fixed-cardinality dimensions (nation aliases, region) are
    hinted broadcasts; part/customer/supplier are SF-scaled and carry
    no hint — broadcast by size at test SF, shuffle joins at 100 TB.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    # fan_out=False on all four SF-scaled dimensions: every one is a
    # broadcast BUILD side at test SF (lineitem is the only streamed
    # side), so their single-split fan-out exchanges shuffled each table
    # for zero downstream parallelism. Interleaved A/B at sf0.1,
    # identical rows: 1.551 -> 1.352 s steady. Inert at 100 TB, where
    # these joins degrade to shuffle joins by size anyway.
    p = table(spark, sf_dir, "part", fan_out=False).filter(F.col("p_type") == "PROMO")
    o = table(spark, sf_dir, "orders", fan_out=False)
    c = table(spark, sf_dir, "customer", fan_out=False)
    s = table(spark, sf_dir, "supplier", fan_out=False)
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0), 4)
                / dsum("volume", 4),
                9,
            ).alias("mkt_share")
        )
    )


@query(
    "sales_opportunity_q22",
    oracle=f"""
    SELECT c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_nationkey >= 20
      AND c_acctbal > (
          SELECT {sql_dsum('c_acctbal')} / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0 AND c_nationkey >= 20
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    tags=("join", "aggregation", "subquery", "tpch"),
)
def sales_opportunity_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: this schema has no c_phone, so
    c_nationkey plays the country code, and the no-orders predicate is
    no-URGENT-orders since this generator gives every customer at least
    one order) — untapped customers: from the high-numbered nations,
    customers with above-average positive balance who never placed an
    urgent order, rolled up per country.

    Three classic sub-shapes compose: a scalar aggregate subquery (the
    positive-balance average — computed once, broadcast as a single-row
    literal, the one hint here that is always safe), a NOT EXISTS
    decorrelated into a LEFT ANTI join against the distinct urgent-order
    customer keys (SF-scaled → no hint; size-based planning broadcasts
    it at test SF, shuffles at 100 TB), and the final per-country
    rollup. The balance average is decimal-staged so the filter
    threshold is bit-identical in both engines.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey") >= 20)
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count("*")).alias("thr")
    )
    o_keys = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o_keys, c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "late_shipper_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    """,
    tags=("join", "semi-join", "anti-join", "tpch"),
)
def late_shipper_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: this schema has no receipt/commit
    dates, so "kept the order waiting" = shipped last) — suppliers whose
    line was the LAST to ship in a finished multi-supplier order.

    The signature Q21 structure survives intact: one EXISTS (another
    supplier participated — left-semi join on the order key with a
    supplier-inequality residual) and one NOT EXISTS (nobody shipped
    after me — left-anti join with a date-inequality residual), both
    decorrelated by Catalyst onto the same l_orderkey equi-key, so the
    probe sides shuffle only (orderkey, suppkey/shipdate) pairs. Ties on
    the max ship date mean no strictly-later line exists — both such
    lines count, exactly as the NOT EXISTS states. supplier is
    SF-scaled, so its join carries no broadcast hint (size-based
    broadcast at test SF, shuffle at 100 TB).
    """
    s = table(spark, sf_dir, "supplier")
    # fan_out=False: the status-filtered orders side is a broadcast
    # BUILD at test SF (l1 streams) — the Q3/Q8/Q9/Q18 pattern.
    o = table(spark, sf_dir, "orders", fan_out=False).filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = table(spark, sf_dir, "lineitem", fan_out=False).alias("l1")
    l2 = table(spark, sf_dir, "lineitem", fan_out=False).select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = table(spark, sf_dir, "lineitem", fan_out=False).select(
        F.col("l_orderkey").alias("k3"), F.col("l_shipdate").alias("d3")
    )
    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3"))
            & (F.col("d3") > F.col("l1.l_shipdate")),
            "left_anti",
        )
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
    )
    return waiting.groupBy("s_name").agg(F.count("*").alias("numwait"))


@query(
    "min_cost_supplier_q2",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost AS cost
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size <= 5 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT MIN(s2.ps_supplycost)
          FROM supply s2, supplier sp2, nation n2, region r2
          WHERE s2.ps_partkey = supply.ps_partkey
            AND sp2.s_suppkey = s2.ps_suppkey
            AND sp2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    """,
    tags=("join", "subquery", "window", "tpch"),
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: this schema has no partsupp, so the
    supply relation is derived from observed trade — a supplier supplies
    a part if any lineitem pairs them, at cost MIN(unit sale price)) —
    for each small LARGE-type part, the European supplier(s) achieving
    the region-minimum cost.

    The signature Q2 structure is the correlated scalar MIN subquery
    that re-joins the same supply/supplier/nation/region tree. Here the
    decorrelation is explicit and cheaper than a self-join: after the
    region filter, a window MIN partitioned by part key computes every
    part's regional floor in ONE pass over the already-joined rows, and
    the filter keeps exactly the floor-achieving rows. MIN of doubles
    is order-independent, so the equality filter is deterministic at
    any partition count. supplier is SF-scaled → no broadcast hint;
    nation/region are fixed-cardinality hinted broadcasts. At 100 TB
    the supply aggregation partial-aggregates before its one shuffle,
    and the window reuses that shuffle's partitioning profile.
    """
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        supply.join(p, F.col("ps_partkey") == p.p_partkey)
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
    )


@query(
    "product_type_profit_q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity', 4)}
               AS sum_profit
    FROM lineitem, orders, part, supplier, nation
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    """,
    tags=("join", "aggregation", "tpch"),
)
def product_type_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is proxied
    at 60 % of the part's retail price) — profit on gear-like parts per
    supplier nation per order year.

    A five-relation join feeding a two-key rollup: the per-row profit
    expression mixes three tables' columns, which is what makes Q9 the
    classic join-ordering stress test — Catalyst pushes the name LIKE
    into the part scan and joins the shrunken part side first under
    AQE. part/orders/supplier are SF-scaled → no hints (size-based
    broadcast at test SF, shuffle at 100 TB); nation is a hinted
    broadcast. The profit sum is decimal-staged so the rollup is
    bit-deterministic at any partition count.
    """
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    # orders is a broadcast BUILD side at test SF (lineitem streams), so
    # its single-split fan-out exchange was a shuffle for zero downstream
    # parallelism. Interleaved A/B at sf0.1, identical rows:
    # 1.388 -> 1.065 s steady. Inert at 100 TB (multi-split scan).
    o = table(spark, sf_dir, "orders", fan_out=False)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", 4).alias("sum_profit"))
    )


@query(
    "important_part_value_q11",
    oracle=f"""
    WITH val AS (
        SELECT l_partkey AS ps_partkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS part_value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT ps_partkey, part_value FROM val
    WHERE part_value > 0.001 * (SELECT {sql_dsum('part_value', 4)} FROM val)
    """,
    tags=("aggregation", "subquery", "tpch"),
)
def important_part_value_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp, so a part's "stock value"
    through one nation's suppliers is the discounted revenue its
    lineitems produced) — parts whose value through NATION_7 suppliers
    exceeds 0.1 % of that nation's total.

    The signature Q11 structure: a GROUP BY whose HAVING threshold is a
    scalar aggregate over the SAME derivation — a global-total subquery.
    The grouped frame is computed once; the total re-aggregates the
    per-part values (lossless: each is already an exact multiple of
    1e-4 after decimal staging, so the re-sum is order-independent) and
    broadcasts back as a single-row literal — the always-safe hint. At
    100 TB the per-part aggregation partial-aggregates before its one
    shuffle and the threshold side stays O(1).
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    base = li.join(s, li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    val = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("part_value")
    )
    thr = val.agg((F.lit(0.001) * dsum("part_value", 4)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select("ps_partkey", "part_value")
    )


@query(
    "parts_supplier_relationship_q16",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM supply, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#4' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "anti-join", "distinct", "tpch"),
)
def parts_supplier_relationship_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp — the supply relation is
    the distinct (part, supplier) pairs observed in lineitem; no
    s_comment — "complaint" suppliers are those with negative balance)
    — how many suppliers can furnish each qualifying brand/type/size
    bucket, excluding complaint suppliers.

    Three sub-shapes compose: a DISTINCT projection of the fact table
    (partial-aggregates before its one shuffle — at 100 TB the
    exchange carries unique pairs, not rows), a NOT IN subquery
    decorrelated to a LEFT ANTI join (the excluded-supplier set is
    SF-scaled → no hint; none of its keys are NULL by construction,
    so anti-join and NOT IN agree), and a COUNT(DISTINCT) over the
    surviving pairs. part is SF-scaled → size-based broadcast only.
    """
    li = table(spark, sf_dir, "lineitem")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        supply.join(p, supply.l_partkey == p.p_partkey)
        .join(bad, supply.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "potential_promotion_q20",
    oracle=f"""
    WITH sup_qty AS (
        SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
        GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey, {sql_dsum('qty')} AS total FROM sup_qty GROUP BY 1)
    SELECT s_name, s_acctbal
    FROM supplier, nation, region
    WHERE s_suppkey IN (
          SELECT sq.l_suppkey FROM sup_qty sq
          JOIN tot t ON sq.l_partkey = t.l_partkey
          WHERE sq.qty > 0.5 * t.total)
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
    """,
    tags=("join", "semi-join", "subquery", "window", "tpch"),
)
def potential_promotion_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availability, so "can
    promote" means market dominance — the supplier shipped more than
    half of a red part's total 1997 volume) — European suppliers
    dominating at least one red part's supply.

    The signature Q20 structure is the nested-IN chain: parts by name →
    per-(part, supplier) quantity with a correlated per-part threshold →
    supplier keys → supplier attributes. The part-name IN prunes the
    fact scan FIRST via a left-semi join (at 100 TB this is the
    difference between aggregating the full year and ~1/8 of it); the
    per-part total is a window sum over the already-grouped frame
    (decimal-staged → order-independent, and it reuses the groupBy
    shuffle's hash profile instead of a join-back); the dominant
    supplier keys reach supplier as a LEFT SEMI join, which IS the IN
    semantics — duplicates collapse without a DISTINCT. supplier and
    the semi-join probe are SF-scaled → no hints; nation/region are
    hinted broadcasts.
    """
    from pyspark.sql.window import Window

    red = table(spark, sf_dir, "part").filter(F.col("p_name").like("red %")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    sup_qty = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sup_qty.withColumn(
            "total", F.sum(F.col("qty").cast("decimal(30,2)")).over(w).cast("double")
        )
        .filter(F.col("qty") > F.lit(0.5) * F.col("total"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "s_acctbal")
    )
