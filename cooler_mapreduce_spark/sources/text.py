"""Text source — the reference's only input format, Spark-first.

Reference semantics (reference design.md:172-176, task_executor.py:124-151):
record = one line; record key = ``"{filename}:{line_num}"``; value = the
stripped line. Spark's ``spark.read.text`` gives the same line-record model
with automatic newline-aligned splitting; the (filename, line offset) key is
reconstructed declaratively when callers ask for it — most jobs ignore the
key entirely (reference word_count.py:9-14), so it is opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_lines(
    spark: SparkSession,
    path: str,
    with_keys: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """Read newline-delimited text as ``value: string`` rows.

    With ``with_keys=True`` adds ``fname`` and a per-file ``line_id``
    (ordinal within the file, via a window over the input order — fine for
    the key-parity use case; at 100 TB callers should prefer keyless lines,
    as every reference sample job does).
    """
    reader = spark.read
    if min_partitions:
        # Spark splits by maxPartitionBytes; shrinking it raises parallelism
        # for small files the way the reference's num_map_tasks did.
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(1, 128 * 1024 * 1024 // min_partitions))
        )
    df = reader.text(path)
    if not with_keys:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.select(
        F.input_file_name().alias("fname"),
        (F.row_number().over(w) - F.lit(1)).alias("line_id"),
        F.col("value"),
    )
