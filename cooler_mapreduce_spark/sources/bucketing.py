"""Bucketed tables — shuffle-free co-located joins.

The 100 TB join strategy the reference cannot express: physically
cluster both join sides by the join key at WRITE time (``bucketBy``), so
every subsequent join on that key is a zipped per-bucket merge with **no
exchange on either side** — the shuffle is paid once at ingest, amortized
over every downstream query. This is Spark's answer to the reference's
hash-partitioned intermediates (reference task_executor.py:147-149),
except persistent and reusable across jobs.

Bucketed tables live in the session warehouse (``saveAsTable`` — the
parquet-files-only reader can't carry bucket metadata). At 100 TB the
same calls target an external catalog (Hive metastore / Iceberg).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` clustered (and optionally sorted) by ``bucket_col``.

    ``sortBy`` upgrades downstream joins from hash to merge within each
    bucket pair and makes per-bucket range scans cheap.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed prior write can leave the managed location behind with no
    # catalog entry; saveAsTable refuses to reuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits
    a SortMergeJoin with ZERO Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def _bucketed_fixture(spark: SparkSession, sf_dir: str, n_buckets: int = 16) -> tuple[str, str]:
    """Materialize the orders/lineitem pair bucketed on the order key
    (idempotent per (sf_dir, bucket count) — keyed table names)."""
    tag = f"{abs(hash(sf_dir)) % 10**8}_{n_buckets}"
    t_o, t_l = f"bj_orders_{tag}", f"bj_lineitem_{tag}"
    if not spark.catalog.tableExists(t_o) or not spark.catalog.tableExists(t_l):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        write_bucketed(o, t_o, "o_orderkey", n_buckets)
        write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), t_l,
                       "o_orderkey", n_buckets)
    return t_o, t_l


try:  # registered face (kept optional so the module stays importable solo)
    from ..registry import query as _query
except ImportError:  # pragma: no cover
    _query = None

if _query is not None:

    @_query(
        "bucketed_join_colocated",
        oracle="""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        """,
        tags=("source", "bucketing", "join", "colocated"),
    )
    def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The shuffle-free co-located join, driver-verified: both fact
        tables are written ``bucketBy(16, order key)`` once (the fixture
        is cached in the session warehouse — the ingest-time shuffle the
        pattern amortizes), and the join + rollup then plans with ZERO
        exchanges before the final O(groups) aggregate
        (tests/test_sinks_cli.py asserts the exchange-free plan;
        measured −30 % vs the shuffle join at sf0.1, SCALING.md). This
        is the repeated fact-fact join strategy at 100 TB: daily dedup
        against history, CDC merge probes, any join that recurs on the
        same key.
        """
        from pyspark.sql import functions as F

        t_o, t_l = _bucketed_fixture(spark, sf_dir)
        j = bucketed_join(spark, t_l, t_o, "o_orderkey")
        return j.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )


if _query is not None:
    from ..functions.hashing import md5int_duckdb, md5int_spark

    #: Hive-style deterministic bucket sample: BUCKET 4 OUT OF 8 ON key =
    #: rows whose portable key hash lands in residue 3 mod 8 — the
    #: engine's md5int convention, identical in both engines (Spark's
    #: native TABLESAMPLE (BUCKET x OUT OF y) is Bernoulli row sampling
    #: whose selected set depends on the partition layout; it fails the
    #: partition-invariance bar for the same reason the PERCENT face
    #: does — see sql_tablesample_faces).
    _TSB_Y = 8
    _TSB_X = 4  # residue x-1 = 3
    _TSB_GATE_SPARK = f"({md5int_spark(chr(39) + 'tsb:' + chr(39) + ' || CAST(o_orderkey AS STRING)')} % {_TSB_Y})"
    _TSB_GATE_DUCK = f"({md5int_duckdb(chr(39) + 'tsb:' + chr(39) + ' || CAST(o_orderkey AS VARCHAR)')} % {_TSB_Y})"
    #: literal probe keys for the bucket-PRUNED leg: an IN-list on the
    #: bucket column lets the bucketed reader skip every file whose
    #: bucket none of the keys hash into (SelectedBucketsCount in the
    #: scan — asserted structurally in tests/test_sinks_cli.py).
    _TSB_KEYS = tuple(97 * k for k in range(1, 21))

    @_query(
        "sql_tablesample_bucket_twin",
        oracle=f"""
        SELECT 'bucket_hash' AS face, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE {_TSB_GATE_DUCK} = {_TSB_X - 1}
        UNION ALL
        SELECT 'bucket_pruned' AS face, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey IN ({", ".join(map(str, _TSB_KEYS))})
        """,
        tags=("sql", "sampling", "tablesample", "bucketing", "source"),
    )
    def sql_tablesample_bucket_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
        """``TABLESAMPLE (BUCKET x OUT OF y)`` over the bucketed layout,
        in its two production-faithful faces:

        - ``bucket_hash`` — the Hive-clustered-table semantic twin:
          rows whose KEY hashes into bucket x of y, spelled with the
          engine's portable seeded md5 gate so membership is a pure
          function of the key — reproducible across engines, partition
          layouts, and reruns. (Spark's native BUCKET sampler is
          Bernoulli row sampling — layout-dependent selection, excluded
          by design exactly like the PERCENT face,
          sql_tablesample_faces.)
        - ``bucket_pruned`` — the read path that makes the bucketed
          layout pay: an IN-list on the bucket column prunes the scan
          to only the files whose bucket some probe key hashes into
          (``SelectedBucketsCount ≤ |keys| of 16`` in the scan node —
          plan-asserted in tests/test_sinks_cli.py), the
          shuffle-free point-lookup sibling of the co-located join.
          The leg aggregates BY the bucket column first — Spark keeps a
          bucketed scan only for plans that exploit its partitioning
          (a bare filter gets "Bucketed: false (disabled by query
          planner)") — so the per-key rollup runs exchange-free off the
          pruned buckets and only the ≤|keys| partials hit the final
          single-group fold.

        Both legs read the ``bucketBy(16, o_orderkey)`` warehouse table
        (the ``bucketed_join_colocated`` fixture — the ingest-time
        shuffle is paid once and shared); the oracle reads the plain
        parquet, proving the bucketed layout changes the PLAN, never
        the answer.

        100 TB shape: the hash leg is a pushdown-friendly filter scan +
        one partial-aggregated count/sum; the pruned leg touches
        O(|keys|) buckets of the table regardless of SF. No shuffles
        beyond the final single-group aggregate; no windows, no joins.
        """
        from pyspark.sql import functions as F

        t_o, _ = _bucketed_fixture(spark, sf_dir)

        def leg(face: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
                .cast("double")
                .alias("sum_price"),
            ).select(F.lit(face).alias("face"), "n_orders", "sum_price")

        hash_leg = leg(
            "bucket_hash",
            spark.table(t_o).filter(F.expr(f"{_TSB_GATE_SPARK} = {_TSB_X - 1}")),
        )
        per_key = (
            spark.table(t_o)
            .filter(F.col("o_orderkey").isin(*_TSB_KEYS))
            .groupBy("o_orderkey")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("s"),
            )
        )
        # Coalesce the folded count to 0: at a dataset where every probe
        # key is absent, the per-key rollup is empty and SUM(cnt) yields
        # NULL, while the oracle's COUNT(*) over zero rows gives 0 (its
        # SUM stays NULL — matched by leaving sum_price uncoalesced).
        pruned_leg = per_key.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.sum("s").cast("double").alias("sum_price"),
        ).select(F.lit("bucket_pruned").alias("face"), "n_orders", "sum_price")
        return hash_leg.unionAll(pruned_leg)
