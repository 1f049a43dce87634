"""SQL-text query surface: ``spark.sql`` over the registered catalog.

The reference's only user surface is imperative (map_fn/reduce_fn job
files loaded by importlib — task_executor.py:80-97); this engine's second
surface is declarative SQL text. The proof of equivalence is maximal
here: the Spark side and the DuckDB oracle execute the IDENTICAL ANSI
string — one query text, two engines, same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import sql_dsum
from ..registry import query
from ..sources.catalog import register_views

#: One ANSI-SQL string both engines run verbatim: a 3-way join rollup in
#: the dialect-portable subset (explicit CASTs, decimal-staged sum).
_SEGMENT_REVENUE_SQL = """
    SELECT n_name AS nation, c_mktsegment AS segment,
           COUNT(DISTINCT o.o_custkey) AS n_buyers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS segment_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name, c_mktsegment
"""


@query("sql_segment_revenue", oracle=_SEGMENT_REVENUE_SQL, tags=("sql", "join", "aggregation"))
def sql_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (nation, market segment) expressed as SQL TEXT and
    executed by ``spark.sql`` — the oracle is the very same string, so
    this query also certifies the engine's ANSI-dialect compatibility.
    Catalyst plans it identically to the DataFrame formulation: nation
    broadcasts, customer⋈orders shuffles once on custkey, then one
    distinct-aggregate expansion for the buyer count.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SEGMENT_REVENUE_SQL)


#: LATERAL correlated subquery, dialect-portable: for each nation, its
#: top-2 customers by account balance (deterministic tie-break).
_LATERAL_TOP_SQL = """
    SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
    FROM nation n,
         LATERAL (
             SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             LIMIT 2
         ) t
"""


@query("sql_lateral_top_customers", oracle=_LATERAL_TOP_SQL, tags=("sql", "subquery", "lateral"))
def sql_lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers via a correlated LATERAL subquery —
    both engines run the identical string. Catalyst DECORRELATES the
    lateral (DecorrelateInnerQuery): the per-nation ORDER BY/LIMIT
    becomes a rank-filter window over customer partitioned by
    nationkey joined back to nation — so the "run the subquery once per
    outer row" reading never executes; at 100 TB the plan is one window
    over the inner table plus a broadcast join, not |nation| query
    repetitions. The window/filter/join formulation this decorrelates
    into is what `window_top_orders_per_customer` tests natively; here
    the optimizer derives it from the declarative form.
    """
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOP_SQL)


#: Recursive CTE, dialect-portable (integer halving spelled as
#: CAST(FLOOR(x / 2)) so Spark and DuckDB run the IDENTICAL string):
#: every part's ancestor chain in the synthetic binary hierarchy
#: parent(k) = floor(k / 2), rolled up to per-ancestor subtree stats.
_RECURSIVE_ROLLUP_SQL = """
    WITH RECURSIVE lineage(part, anc) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION ALL
        SELECT part, CAST(FLOOR(anc / 2) AS BIGINT) FROM lineage WHERE anc > 1
    )
    SELECT anc AS node, COUNT(*) AS n_descendants,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE) AS subtree_value
    FROM lineage JOIN part ON p_partkey = part
    GROUP BY anc
"""


@query(
    "sql_recursive_subtree_rollup",
    oracle=_RECURSIVE_ROLLUP_SQL,
    tags=("sql", "recursive", "iterative", "aggregation"),
)
def sql_recursive_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (BOM-style) subtree rollup via WITH RECURSIVE — the
    org-chart/bill-of-materials aggregation pattern: for every node of a
    part hierarchy (synthetic binary parent ``floor(k/2)``, giving every
    part a chain to root 1), the count and decimal-staged retail value
    of its whole subtree, self included.

    This exercises Spark 4's recursive-CTE execution (the reference,
    single-round by construction, cannot express ANY recursion; even
    this engine's PageRank oracle had to hand-unroll its iterations
    because DuckDB forbids aggregates inside recursive terms — an
    aggregate-AFTER-recursion rollup like this one is the portable
    shape). Scale: the recursive term is pure per-row arithmetic — no
    join, no shuffle inside the loop; the frontier starts at |part| and
    only shrinks as chains hit the root, so the closure is
    |part| × O(log maxkey) rows, materialized once and rolled up with
    one partial-aggregable exchange. Depth grows logarithmically with
    the key domain: ~11 levels at sf0.01, ~31 at a 2-billion-part
    catalog — iteration count is never data-volume-bound.
    """
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_ROLLUP_SQL)


@query(
    "sql_pipe_syntax_revenue",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "pipe-syntax", "aggregation"),
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's ``|>`` operators, from the SQL:2023 /
    GoogleSQL lineage): the same scan → filter → aggregate written as a
    linear pipeline instead of inside-out SQL. Catalyst resolves it to
    the identical logical plan — the oracle is the classic spelling of
    the same query, proving the two surfaces agree row-for-row. Filters
    still push down; the aggregate still partial-aggregates: syntax
    sugar, not a different engine path.
    """
    register_views(spark, sf_dir)
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                       AS revenue
           GROUP BY o_orderpriority
    """)


@query(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority, n_orders, revenue
    """,
    tags=("sql", "group-by-all", "aggregation"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (the DuckDB-originated
    shorthand Spark adopted): every non-aggregate select item becomes a
    grouping key, and the output orders by every column left-to-right —
    no key list to keep in sync with the projection. The analyzer
    expands ALL at resolution time, so the optimized plan is IDENTICAL
    to the explicit spelling the oracle runs: same partial+final hash
    aggregate, same exchange on the expanded keys — surface sugar, not
    an engine path. (The ordering is total here — the two key columns
    plus both aggregates — so the row order itself is deterministic,
    though the driver's hash compare never relies on it.)
    """
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """)


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice >= 400000.0
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "session-variables", "parameterized"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (``DECLARE`` / ``SET VARIABLE`` — the ANSI
    parameterization surface Spark 4 added): thresholds live in typed
    session state instead of string-spliced literals — the
    SQL-injection-proof way to parameterize dashboards and promote-gate
    scripts. Constant-folding inlines the variable values at plan time,
    so the parquet scan still receives both pushed filters; the oracle
    is the same query with the values inlined, proving the variable
    path changes nothing semantically.
    """
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE date_floor TIMESTAMP_NTZ")
    spark.sql("SET VARIABLE price_floor = 400000.0")
    spark.sql("SET VARIABLE date_floor = TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_totalprice >= price_floor AND o_orderdate >= date_floor
        GROUP BY o_orderpriority
    """)


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_totalprice >= 350000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "execute-immediate", "parameterized"),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXECUTE IMMEDIATE`` (Spark 4): SQL text composed at runtime and
    executed with bound parameters (``USING expr AS name`` feeding
    ``:name`` markers) — the stored-procedure-style dynamic-SQL surface,
    and the injection-safe alternative to f-string query splicing that
    completes the parameterization family next to session variables
    (:func:`sql_session_variables`) and the ``spark.sql(..., args=)``
    API (:func:`sql_named_parameters`). The parameters inline at parse
    time, so both pushed filters still reach the parquet scan; the
    oracle is the same statement with the values written as literals,
    proving the dynamic path changes nothing semantically.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue "
        "FROM orders WHERE o_totalprice >= :floor AND o_orderstatus = :status "
        "GROUP BY o_orderpriority' "
        "USING 350000.0D AS floor, 'F' AS status"
    )


@query(
    "sql_named_parameters",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    WHERE c_acctbal >= 2500.0 AND c_nationkey < 13
    GROUP BY c_mktsegment
    """,
    tags=("sql", "parameterized", "api"),
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers — ``spark.sql(text, args={...})``: the
    PySpark API face of parameterized SQL (``:name`` markers bound from
    a Python dict, values transported as typed literals, never string-
    spliced). This is how application code should pass user input into
    SQL; the marker substitution happens before analysis, so predicate
    pushdown sees plain literals — the oracle runs the same text with
    the values inlined and must match bit-for-bit.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        FROM customer
        WHERE c_acctbal >= :min_bal AND c_nationkey < :max_nation
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 2500.0, "max_nation": 13},
    )


@query(
    "sql_collated_grouping",
    oracle="""
    SELECT lower(CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                      ELSE lower(c_mktsegment) END) AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY 1
    """,
    tags=("sql", "collation", "string"),
)
def sql_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): grouping under ``COLLATE UTF8_LCASE``
    merges case variants engine-side — no normalizing rewrite of the
    expression, the COLUMN carries the comparison semantics. The mixed
    case is synthesized deterministically (even keys upper, odd lower)
    so the test actually exercises the merge; the emitted key is
    ``lower(seg)`` because the collated group's representative value is
    whichever variant a partition saw first — nondeterministic by
    contract, normalized once for both engines. The oracle spells the
    same semantics the pre-collation way (group by lower()), proving
    the collation path is a pure semantics transfer: same groups, same
    counts, same decimal-staged balances. At scale collation-aware
    grouping hashes the collation key exactly like any other group-by —
    one shuffle, partial-aggregable.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lower(seg) AS segment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        FROM (SELECT (CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                           ELSE lower(c_mktsegment) END) COLLATE UTF8_LCASE AS seg,
                     c_acctbal
              FROM customer)
        GROUP BY seg
        """
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT n_name AS nation, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "identifier", "parameterized"),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IDENTIFIER(:param)`` (Spark 4): parameterized TABLE and COLUMN
    *names* — the face of the parameterization family that values can't
    cover (``:name`` markers only bind literals; splicing a table name
    into f-string SQL is the injection vector IDENTIFIER exists to
    close). One statement serves N tenant tables / metric columns by
    binding names through the same injection-safe channel as values:
    IDENTIFIER resolves at parse time, so the resolved plan — scan,
    join, pushdown, partial aggregation — is byte-identical to the
    hand-written query, which is exactly what the oracle (the same
    statement with the names inlined) proves. Completes the family:
    session variables (:func:`sql_session_variables`), EXECUTE IMMEDIATE
    (:func:`sql_execute_immediate`), spark.sql args
    (:func:`sql_named_parameters`), and now identifiers.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:name_col) AS nation, COUNT(*) AS n_suppliers,
               CAST(SUM(CAST(IDENTIFIER(:bal_col) AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_balance
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON s_nationkey = n_nationkey
        GROUP BY IDENTIFIER(:name_col)
        """,
        args={
            "fact": "supplier",
            "dim": "nation",
            "name_col": "n_name",
            "bal_col": "s_acctbal",
        },
    )


@query(
    "sql_create_function_udfs",
    oracle=f"""
    WITH bands(band, lo, hi) AS (VALUES
        ('small', 0, 20), ('mid', 21, 40), ('large', 41, 100))
    SELECT b.band, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
    FROM lineitem l JOIN bands b ON l.l_quantity BETWEEN b.lo AND b.hi
    GROUP BY b.band
    """,
    tags=("sql", "udf-surface", "sql-udf"),
)
def sql_create_function_udfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDFs (Spark 4 ``CREATE FUNCTION ... RETURN``): both
    faces — a SCALAR function (``disc_price``: the discounted-revenue
    expression, named once and reused) and a TABLE function
    (``qty_bands()``: a banding dimension defined as a query, used in
    FROM like any relation). SQL UDFs are the missing middle of the UDF
    surface matrix (Python UDF/UDTF/pandas exist at the other end):
    pure-SQL bodies are INLINED by the analyzer — no serialization
    boundary, no black box; the optimizer sees through them, so the
    plan (and hence pushdown/pruning/codegen) is byte-identical to the
    hand-inlined spelling. That is precisely what the oracle asserts:
    it runs the same statement with both bodies written out, and the
    decimal-staged revenue must match bit for bit.
    """
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_bands()"
        " RETURNS TABLE(band STRING, lo INT, hi INT)"
        " RETURN SELECT * FROM VALUES"
        " ('small', 0, 20), ('mid', 21, 40), ('large', 41, 100) t(band, lo, hi)"
    )
    return spark.sql(
        """
        SELECT b.band, COUNT(*) AS n_items,
               CAST(SUM(CAST((disc_price(l_extendedprice, l_discount))
                    AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN qty_bands() b ON l.l_quantity BETWEEN b.lo AND b.hi
        GROUP BY b.band
        """
    )


# ------------------------------------------------- TABLESAMPLE faces ----

from ..functions.hashing import md5int_duckdb, md5int_spark  # noqa: E402

#: deterministic 1% gate — the hash-sampling tier's convention
#: (sampling.py): a seeded md5 bucket, identical in both engines.
_TS_GATE_SPARK = f"({md5int_spark(chr(39) + 'ts:' + chr(39) + ' || CAST(o_orderkey AS STRING)')} % 100)"
_TS_GATE_DUCK = f"({md5int_duckdb(chr(39) + 'ts:' + chr(39) + ' || CAST(o_orderkey AS VARCHAR)')} % 100)"
_TS_ROWS = 100


@query(
    "sql_tablesample_faces",
    oracle=f"""
    SELECT 'rows' AS face, o_orderkey, o_totalprice
    FROM (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT {_TS_ROWS}) t
    UNION ALL
    SELECT 'pct_hash' AS face, o_orderkey, o_totalprice
    FROM orders WHERE {_TS_GATE_DUCK} < 1
    """,
    tags=("sql", "sampling", "tablesample"),
)
def sql_tablesample_faces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``TABLESAMPLE`` SQL surface, in its two reproducible faces:

    - ``TABLESAMPLE (n ROWS)`` over an ordered subquery — Spark compiles
      the ROWS clause to a limit, and limit-over-sort plans as
      ``TakeOrderedAndProject`` (parallel per-partition top-k + k-row
      merge, never a global sort), so the face is deterministic AND
      scale-safe; the oracle spells the same thing as ORDER BY + LIMIT.
    - the deterministic 1 %-gate twin of ``TABLESAMPLE (1 PERCENT)`` —
      a seeded md5 bucket on the key (the hash-sampling tier's
      convention, sampling.py): reproducible across engines, partition
      layouts, and reruns, which Bernoulli sampling is not.

    Spark's native ``TABLESAMPLE (x PERCENT) [REPEATABLE (seed)]`` stays
    out of the registered face ON PURPOSE: its Bernoulli gate draws from
    a per-partition-seeded RNG stream, so the selected row SET changes
    with the split layout — it would fail this engine's partition-count
    invariance bar (tests/test_invariance.py), never mind the oracle.
    The hash gate is the production shape for resumable pipelines
    anyway: membership is a pure function of the row key.

    100 TB shape: the ROWS face is one TakeOrderedAndProject (O(n·k)
    work, k-row result); the gate face is a pushdown-friendly filter
    scan — no shuffle in either branch, UNION ALL is partition
    concatenation.

    Reference parity: beyond the reference — it has no sampling surface
    and no SQL surface at all (SURVEY.md §2.4; its only user API is the
    map_fn/reduce_fn job file, task_executor.py:80-97).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT 'rows' AS face, o_orderkey, o_totalprice
        FROM (SELECT * FROM orders ORDER BY o_orderkey) TABLESAMPLE ({_TS_ROWS} ROWS)
        UNION ALL
        SELECT 'pct_hash' AS face, o_orderkey, o_totalprice
        FROM orders WHERE {_TS_GATE_SPARK} < 1
        """
    )
