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
