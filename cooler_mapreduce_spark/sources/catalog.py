"""Test-table catalog: the TPC-H-ish star schema + events/documents/embeddings.

One parquet file per table per scale factor (TESTDATA.md). At 100 TB each
"file" becomes a partitioned parquet/iceberg dataset; nothing here changes —
``spark.read.parquet`` plans column-pruned, predicate-pushed, split-parallel
scans either way, which is the Spark replacement for the reference's manual
byte-range input splitting (reference coordinator/server.py:209-243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at *any* scale factor —
#: region/nation are fixed-cardinality; supplier/customer/part grow with SF
#: but stay tiny relative to the fact tables (classic star-schema shape).
BROADCAST_SAFE = ("region", "nation")


#: Fan out single-split scans above this size. The test parquet files are
#: written as ONE row group each, and parquet can't split below row-group
#: granularity — so without intervention every scan (and everything fused
#: into it: tokenize, hash, aggregate partials) runs in ONE task no matter
#: how many cores exist. Real deployments never hit this branch: a 100 TB
#: table arrives as thousands of files/row groups and splits natively, and
#: an extra shuffle there would be pure waste — hence the partition-count
#: guard, not an unconditional repartition. The threshold is deliberately
#: low: compressed size is a poor proxy for downstream compute (600 KB of
#: parquet text fans out into millions of md5 calls in the dedup
#: pipelines), and redistributing a sub-MB table costs ~nothing; only
#: the KB-scale dimension tables (region/nation), which broadcast
#: anyway, stay single-partition.
_FANOUT_MIN_BYTES = 256 * 1024


def table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool | None = None
) -> DataFrame:
    """Load one catalog table from a scale-factor directory.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]); the
    ``nanosAsLong`` legacy conf reads it as an int64 of nanoseconds and we
    rebuild a proper timestamp at microsecond precision — the same ns→µs
    truncation DuckDB applies, so both engines see identical instants.

    ``fan_out``: ``None`` (default) applies the single-split guard below;
    ``False`` skips the fan-out shuffle for this scan. Callers pass
    ``False`` when the scan's OWN compute is trivial (a pruned
    filter/projection feeding a join or a selective aggregate): there the
    redistribution shuffle costs more than the extra parallelism buys,
    measured 1.3–1.5× per query at sf0.1. Scans that fan tokens/hashes
    out of each row (tokenize, minhash, decimal-heavy full-row aggs)
    keep the default — their per-row compute dwarfs the shuffle. At
    production scale the flag is inert either way: multi-split tables
    never trigger the guard.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fan_out is False:
        return df
    return _fan_out(spark, df, f"{sf_dir}/{name}.parquet")


#: fan-out decision per (path, parallelism) — the split count of a static
#: file never changes within a run, and the .rdd partition probe costs a
#: plan construction per call.
_FANOUT_CACHE: dict[tuple[str, int], bool] = {}


def _fan_out(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    import os

    target = spark.sparkContext.defaultParallelism
    key = (path, target)
    fan = _FANOUT_CACHE.get(key)
    if fan is None:
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        fan = (
            size >= _FANOUT_MIN_BYTES
            and target >= 4
            and df.rdd.getNumPartitions() < max(2, target // 2)
        )
        _FANOUT_CACHE[key] = fan
    return df.repartition(target) if fan else df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every catalog table as a temp view so ``spark.sql`` text
    queries run against the same (ts-fixed, fan-out-guarded) DataFrames
    the programmatic API uses."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
