"""Sinks — the reference's output contract plus the columnar formats a
100 TB pipeline actually ships.

Reference sink (reference task_executor.py:244-250, design.md:187-191):
one plain-text TSV file per reduce partition, ``str(key)\\tstr(value)``
rows, ``part-*`` layout. :func:`write_tsv` reproduces that contract with
``DataFrameWriter`` — every column ``str()``-rendered, tab-separated, one
``part-*`` file per partition — while inheriting Spark's atomic job
commit (the reference writes output files in place with no commit
protocol; a mid-write worker crash leaves torn files, reference
task_executor.py:245-250).

For real pipelines TSV is the wrong format at scale (no schema, no
column pruning, no predicate pushdown) — :func:`write_parquet` with
``partition_by`` is the scale path, and what every downstream query in
this engine assumes.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from cooler_mapreduce_spark.registry import query

#: Conf key for the roundtrip queries' scratch location. On any
#: multi-node deployment this MUST point at a shared filesystem URI
#: (HDFS/S3A/NFS mount) — executors commit part files under it and the
#: driver reads them back; a driver-local tempdir is only correct in
#: local mode, where executors and driver share one disk.
SCRATCH_DIR_CONF = "spark.cooler_mapreduce.scratchDir"


def scratch_dir(spark: SparkSession, prefix: str) -> str:
    """Job-scoped scratch path for sink roundtrips: a fresh child of
    :data:`SCRATCH_DIR_CONF` when set, else a driver-local tempdir
    (local-mode fallback — see the conf docstring)."""
    base = spark.conf.get(SCRATCH_DIR_CONF, None)
    if base:
        return f"{base.rstrip('/')}/{prefix}{uuid.uuid4().hex}"
    return tempfile.mkdtemp(prefix=prefix)


def remove_scratch(spark: SparkSession, path: str) -> None:
    """Delete a scratch path on whatever filesystem it lives on — Hadoop
    FileSystem handles URI schemes (hdfs://, s3a://, file:/); plain local
    paths fall back to shutil."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(p, True)
    except Exception:
        shutil.rmtree(path, ignore_errors=True)


def write_tsv(df: DataFrame, path: str, num_partitions: int | None = None) -> None:
    """Write the reference's TSV part-file layout.

    ``num_partitions`` plays the reference's R (num_reduce_tasks): it
    fixes the part-file count. Columns are rendered with ``CAST AS
    STRING`` — the analogue of the reference's ``str(value)`` sink
    (arrays/structs render in Spark's canonical bracket form).
    """
    out = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    if num_partitions:
        out = out.repartition(num_partitions)
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "false")
        .option("nullValue", "None")  # reference prints Python None
        .csv(path)
    )


def read_tsv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read a TSV part-file directory back (all-string unless a schema is
    given — the reference's outputs are untyped text either way)."""
    reader = spark.read.option("sep", "\t").option("header", "false")
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Columnar sink — the scale path.

    ``partition_by`` buys partition pruning for downstream readers (the
    scan skips whole directories); ``max_records_per_file`` bounds file
    sizes so a 1000-executor read gets balanced splits.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


@query(
    "sink_tsv_roundtrip",
    oracle="""
        SELECT l_returnflag AS ret_flag, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("sink", "tsv", "roundtrip"),
)
def sink_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the reference's TSV sink contract end-to-end.

    Aggregates lineitem counts per return flag, writes them through
    :func:`write_tsv` (the reference's ``str(key)\\tstr(value)``
    part-file layout, reference task_executor.py:244-250), reads the
    part files back with :func:`read_tsv`, and returns the parsed
    DataFrame. The oracle is the pre-sink aggregate, so a hash match
    proves the sink/read pair is lossless for the reference's key/value
    contract (3 part files — the reference's R=num_reduce_tasks knob).

    The materialized roundtrip is tiny (one row per return flag) no
    matter the corpus size — sink throughput itself is exercised by the
    parquet path every other query reads, so this stays cheap at 100 TB.
    """
    agg = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_returnflag").alias("ret_flag"))
        .agg(F.count("*").alias("cnt"))
    )
    out_dir = scratch_dir(spark, "sink_tsv_roundtrip_")
    try:
        write_tsv(agg, out_dir, num_partitions=3)
        back = read_tsv(spark, out_dir, schema="ret_flag STRING, cnt BIGINT")
        # Materialize before the part files are deleted.
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out_dir)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the columnar alternative for Hive-ecosystem consumers
    (predicate pushdown + column pruning like parquet, built into Spark
    with no extra packages)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


@query(
    "sink_orc_roundtrip",
    oracle="""
        SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("sink", "orc", "roundtrip"),
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the ORC sink end-to-end: aggregate orders per status,
    write through :func:`write_orc`, read the files back, and return the
    re-read DataFrame. A hash match against the pre-sink oracle proves
    the columnar roundtrip is lossless for strings, counts, and
    decimal-staged doubles. Like :func:`sink_tsv_roundtrip`, the
    materialized payload is O(groups) regardless of corpus size."""
    agg = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("total"),
        )
    )
    out_dir = scratch_dir(spark, "sink_orc_roundtrip_")
    try:
        write_orc(agg, out_dir)
        back = spark.read.orc(out_dir)
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out_dir)


def write_json_lines(df: DataFrame, path: str) -> None:
    """Newline-delimited JSON — the interchange sink (one object per
    row; schema travels in-band, unlike TSV)."""
    df.write.mode("overwrite").json(path)


@query(
    "pysink_tsv_roundtrip",
    oracle="""
        SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("sink", "connector", "python-datasource", "roundtrip"),
)
def pysink_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the CUSTOM PYTHON DATASOURCE *writer* end-to-end
    (sources/pysource.py TsvDirDataSource) — the reference's TSV sink
    contract (task_executor.py:244-250) re-expressed through Spark 4's
    ``DataSourceWriter`` two-phase commit: tasks write hidden temp parts,
    the driver's commit() renames them into ``part-NNNNN.tsv`` +
    ``_SUCCESS``, abort() removes them — the crash-atomicity the
    reference's in-place sink lacks.

    Aggregates orders per priority, writes through the connector, reads
    the committed part files back with :func:`read_tsv`, and returns the
    parsed DataFrame; the oracle is the pre-sink aggregate, so a hash
    match proves connector write → commit → read is lossless. Payload is
    O(groups) (5 priorities) regardless of corpus size. The Python
    connector addresses the filesystem with plain paths, so on multi-node
    deployments :data:`SCRATCH_DIR_CONF` must be a *mounted* shared path
    (NFS/FUSE), not a URI scheme — URI-filesystem sinks go through
    :func:`write_tsv` instead.
    """
    from .pysource import register

    register(spark)
    agg = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("cnt"))
    )
    out_dir = scratch_dir(spark, "pysink_tsv_roundtrip_")
    try:
        agg.write.format("tsv_dir").mode("overwrite").save(out_dir)
        back = read_tsv(spark, out_dir, schema="priority STRING, cnt BIGINT")
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out_dir)


@query(
    "sink_partitioned_pruning",
    oracle="""
        SELECT CAST(user_id % 16 AS BIGINT) AS user_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
        FROM events WHERE user_id % 16 = 3
        GROUP BY user_id % 16
    """,
    tags=("sink", "layout", "partition-pruning", "roundtrip"),
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout roundtrip proving PARTITION PRUNING — the scan-side
    payoff of :func:`write_parquet`'s ``partition_by``: events land in
    16 ``user_bucket=N/`` directories, and the read-back filter on the
    partition column reaches the file listing (PartitionFilters), so
    the scan touches 1/16th of the files before any I/O happens. At
    100 TB this layout choice IS the difference between a full-corpus
    scan and a directory lookup for every bucket-keyed consumer; the
    pruning (inputFiles ⊆ the one directory) is asserted in
    tests/test_sinks_cli.py, and the hash match here proves the
    partitioned layout is value-lossless. Output is the one selected
    bucket's aggregate — O(1) rows regardless of corpus size.
    """
    ev = table_events(spark, sf_dir).withColumn(
        "user_bucket", (F.col("user_id") % 16).cast("bigint")
    )
    out_dir = scratch_dir(spark, "sink_partitioned_pruning_")
    try:
        write_parquet(ev, out_dir, partition_by=["user_bucket"])
        back = spark.read.parquet(out_dir).filter(F.col("user_bucket") == 3)
        agg = back.groupBy(F.col("user_bucket").cast("bigint").alias("user_bucket")).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        )
        return spark.createDataFrame(agg.collect(), schema=agg.schema)
    finally:
        remove_scratch(spark, out_dir)


@query(
    "catalog_partitioned_scan",
    oracle="""
    SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("source", "layout", "partition-pruning"),
)
def catalog_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly purchase stats read through the catalog's OPT-IN
    partitioned layout (``table(..., partitioned_by=("event_type",))``)
    — the default-capable promotion of what :func:`sink_partitioned_pruning`
    demonstrates on a throwaway scratch copy.

    The event-type filter never touches data: it resolves in the file
    LISTING (PartitionFilters on the ``event_type=purchase/`` directory
    — runtime-asserted via input_file_name() in tests/test_sinks_cli.py),
    so the scan reads 1/|types| of the corpus before any I/O. The hash
    match against an oracle running on the UNpartitioned original proves
    the layout is value-lossless, ns→µs timestamp handling included. At
    100 TB this catalog option is how a fact table keyed by a hot filter
    column (date, tenant, modality) serves bucket-keyed consumers at
    directory-lookup cost.
    """
    from .catalog import table

    ev = table(spark, sf_dir, "events", partitioned_by=("event_type",))
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.hour("ts").cast("int").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "zorder_scan",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_partkey BETWEEN 100 AND 500
    """,
    tags=("source", "layout", "zorder", "data-skipping"),
)
def zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box query (ship-date window × part-key band) served from the
    catalog's Z-ORDERED copy of lineitem (:func:`catalog.zordered_layout`
    keyed by morton(epoch-day(l_shipdate), l_partkey)).

    Both predicates are pushed to the parquet reader, and because every
    file covers a compact box in (day, partkey) space, the footer
    min/max check eliminates most files for a box predicate — the
    data-skipping that single-column sorting gives only its own column.
    The selectivity of the layout (files whose stat-box intersects the
    predicate box: z-order ≪ natural order) is measured in
    tests/test_sinks_cli.py; the oracle runs on the UNsorted original,
    so the hash match proves the re-layout is value-lossless. At 100 TB
    this is the OPTIMIZE ZORDER pattern for fact tables with two hot
    filter dimensions (time × tenant, date × entity).
    """
    from .catalog import morton_code, zordered_layout

    z = morton_code(
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")), F.col("l_partkey")
    )
    li = zordered_layout(
        spark, sf_dir, "lineitem", z, n_files=16, cache_key="day_partkey"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-07-01")
            & F.col("l_partkey").between(100, 500)
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "dpp_partitioned_join",
    oracle="""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES ('click', 0), ('view', 0), ('purchase', 1),
                 ('signup', 1), ('error', 0)) AS d(etype, is_conversion)
      ON e.event_type = d.etype
    WHERE d.is_conversion = 1
    GROUP BY e.event_type
    """,
    tags=("source", "layout", "dynamic-partition-pruning", "join"),
)
def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the fact side is the catalog's
    partitioned events layout, the filter lives on the DIMENSION
    (conversion event types), and no literal predicate mentions the
    partition column — so static pruning is impossible. Spark plans a
    dynamicpruning#N subquery into the fact scan's PartitionFilters: at
    runtime the dim's surviving keys broadcast and the fact's file
    listing drops every non-matching ``event_type=`` directory BEFORE
    any data I/O (plan-asserted in tests/test_sinks_cli.py).

    At 100 TB this is the star-join pattern where the date/tenant filter
    arrives through a dimension table: DPP turns "scan the whole fact
    table, filter after the join" into "read only the partitions the
    dimension selects" — the single biggest I/O lever on partitioned
    fact tables after static pruning. The oracle joins the same literal
    dimension against the unpartitioned original, proving the layout +
    DPP change nothing about the values.

    The dim carries an explicit broadcast hint — bounded (5 literal
    rows), and REQUIRED for the pruning to execute: DPP reuses the
    build-side broadcast as the fact scan's runtime filter
    (reuseBroadcastOnly), so if the planner instead broadcast the
    tiny-at-test-SF fact side, the dynamicpruning subquery would
    degenerate to a no-op (measured: 5/5 files read without the hint,
    2/5 with — the metrics test pins the pruned execution).
    """
    from .catalog import table

    ev = table(spark, sf_dir, "events", partitioned_by=("event_type",))
    dim = spark.createDataFrame(
        [("click", 0), ("view", 0), ("purchase", 1), ("signup", 1), ("error", 0)],
        "etype string, is_conversion int",
    )
    return (
        ev.join(F.broadcast(dim), ev.event_type == dim.etype)
        .filter(F.col("is_conversion") == 1)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        )
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_by: str | None = None,
) -> int:
    """Small-files compaction — the maintenance job every long-lived
    ingest directory needs: streaming sinks and frequent small batch
    appends accumulate files far below the efficient scan size, and at
    100 TB the resulting listing + open() overhead (plus one scheduler
    task per tiny split) dominates scan cost long before I/O does.

    Rewrites ``path`` into ``ceil(bytes / target_mb)`` files via a
    staged two-phase swap: write the compacted copy next to the data
    (``<path>.__compact_tmp``), then swap directories with two Hadoop
    FileSystem renames (each individually atomic). Single-writer and
    crash-recoverable, not a single atomic transaction: a crash BETWEEN
    the renames leaves ``path`` briefly absent with the data parked at
    ``<path>.__compact_old`` — the next run (or any caller) restores it
    before doing anything else, and a crash before the swap leaves the
    original untouched (the stale temp dir is swept by the next run).
    Concurrent readers during the swap window may observe ENOENT and
    should retry; no reader ever sees a mixture of layouts.

    ``sort_by`` optionally re-sorts during the rewrite (range-partition
    + in-file sort on that column) so compaction doubles as clustering
    maintenance — pair with a :func:`~..sources.catalog.morton_code`
    key to refresh a z-order layout. Returns the new file count.
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    recover_swap(spark, path)
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))

    def write_tmp(tmp: str) -> None:
        df = spark.read.parquet(path)
        if sort_by:
            staged = df.repartitionByRange(n_files, sort_by).sortWithinPartitions(sort_by)
        else:
            staged = df.repartition(n_files)
        staged.write.mode("overwrite").parquet(tmp)

    staged_swap(spark, path, write_tmp)
    return n_files


def recover_swap(spark: SparkSession, path: str) -> None:
    """Crash recovery for :func:`staged_swap`: a prior run that died
    between its two swap renames left the dataset parked at
    ``<path>.__compact_old`` with ``path`` absent — restore it before
    treating anything as stale garbage, then sweep leftovers."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    tmp_p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}.__compact_tmp")
    old_p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}.__compact_old")
    if fs.exists(old_p) and not fs.exists(hpath):
        if not fs.rename(old_p, hpath):
            raise IOError(f"swap recovery failed: could not restore {old_p} to {path}")
    for stale in (tmp_p, old_p):  # crashed prior run (post-recovery leftovers)
        if fs.exists(stale):
            fs.delete(stale, True)


def staged_swap(spark: SparkSession, path: str, write_tmp) -> None:
    """Replace the dataset at ``path`` with one staged by
    ``write_tmp(tmp_path)`` via two Hadoop renames (each individually
    atomic). Single-writer and crash-recoverable (:func:`recover_swap`),
    not one atomic transaction: a crash between the renames leaves
    ``path`` briefly absent with the data parked aside; no reader ever
    sees a MIXTURE of old and new layouts — the invariant the tile
    compactor's no-double-count guarantee rests on."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    tmp = f"{path.rstrip('/')}.__compact_tmp"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    old_p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}.__compact_old")

    write_tmp(tmp)

    # two renames, each atomic on HDFS/local FS: old data aside, new in
    if not fs.rename(hpath, old_p):
        raise IOError(f"swap failed: could not move {path} aside")
    if not fs.rename(tmp_p, hpath):
        fs.rename(old_p, hpath)  # roll back
        raise IOError(f"swap failed: could not promote {tmp}")
    fs.delete(old_p, True)


def table_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events via the catalog (kept as a helper so the module's top
    imports stay sink-focused)."""
    from .catalog import table

    return table(spark, sf_dir, "events")


@query(
    "sink_schema_evolution_roundtrip",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderpriority
    ),
    v2 AS (
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               {{dsum}} AS total_price
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderpriority
    ),
    merged AS (
        SELECT o_orderpriority, n_orders, NULL::DOUBLE AS total_price FROM v1
        UNION ALL
        SELECT o_orderpriority, n_orders, total_price FROM v2
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_batches,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders_total,
           CAST(SUM(CAST(total_price AS DECIMAL(30,2))) AS DOUBLE)
             AS late_total_price
    FROM merged GROUP BY o_orderpriority
    """.format(
        dsum="CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)"
    ),
    tags=("sink", "parquet", "schema-evolution", "roundtrip"),
)
def sink_schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution end-to-end: an early batch writes
    (priority, n_orders); a later batch appends with an ADDED
    total_price column; the read merges footers (``mergeSchema``) so old
    files surface NULL for the new column — the additive-evolution
    contract a 100 TB lake lives by (readers never rewrite history to
    gain a column). The read-back aggregate proves both batch
    generations landed: per priority, the batch count, the order total
    across generations, and the new column's sum (old-generation NULLs
    ignored by SUM, decimal-staged).

    Scale note: mergeSchema reconciles FOOTERS, an O(files) planning
    cost — production layouts record the merged schema in the catalog
    instead; the semantics (NULL-filled added columns) are identical,
    which is what this pins.
    """
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v1 = (
        o.filter(F.col("o_orderdate") < "1998-01-01")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )
    v2 = (
        o.filter(F.col("o_orderdate") >= "1998-01-01")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
    out_dir = scratch_dir(spark, "sink_schema_evo_")
    try:
        v1.write.mode("overwrite").parquet(out_dir)
        v2.write.mode("append").parquet(out_dir)
        back = (
            spark.read.option("mergeSchema", "true")
            .parquet(out_dir)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_batches"),
                F.sum("n_orders").alias("n_orders_total"),
                F.sum(F.col("total_price").cast("decimal(30,2)"))
                .cast("double")
                .alias("late_total_price"),
            )
        )
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out_dir)


@query(
    "source_binaryfile_roundtrip",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    tags=("source", "binaryfile", "multimodal", "roundtrip"),
)
def source_binaryfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` built-in source end-to-end — how a media lake
    actually arrives: one opaque file per asset. Executors write each
    document's bytes as its own ``doc_<id>.bin`` (foreachPartition —
    parallel, never a driver loop), then ``spark.read.format
    ("binaryFile")`` lists the directory back into (path, length,
    content) rows; the asset id is parsed from the filename and the
    content integrity-checked by md5 against the source of truth.

    Scale notes: binaryFile is the ingestion format for the multimodal
    tier (operators/multimodal.py consumes exactly such blob columns);
    the listing parallelizes over files, content never passes through
    the driver, and `pathGlobFilter`/`recursiveFileLookup` give the
    scan partition-pruning-like selectivity on file layout. The
    one-file-per-row layout is the SOURCE's contract; a lake would
    compact small assets into archives before this ever bottlenecks.
    """
    import os

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    out_dir = scratch_dir(spark, "source_binaryfile_")

    def write_part(rows):
        for r in rows:
            # exclusive create: two attempts of a retried task can't
            # interleave partial writes under the same name
            with open(os.path.join(out_dir, f"doc_{r.doc_id}.bin"), "wb") as fh:
                fh.write(bytes(r.media))

    try:
        d.foreachPartition(write_part)
        back = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(out_dir)
            .select(
                F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
                .cast("bigint")
                .alias("doc_id"),
                F.col("length").alias("n_bytes"),
                F.md5("content").alias("content_md5"),
            )
        )
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out_dir)


@query(
    "read_json_permissive_corrupt",
    oracle="""
    SELECT
        CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_corrupt,
        CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_valid,
        CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN n_chars END) AS BIGINT)
          AS valid_chars
    FROM documents
    """,
    tags=("source", "json", "error-handling", "roundtrip"),
)
def read_json_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input survival, end-to-end: a JSONL batch where every
    10th record is TRUNCATED mid-object (the torn write / bad producer
    every 100 TB ingest eventually meets) is read back in PERMISSIVE
    mode with a ``_corrupt_record`` capture column — the malformed lines
    land there for quarantine instead of killing the job (FAILFAST) or
    silently vanishing (DROPMALFORMED), and every well-formed record
    survives bit-intact. The oracle recomputes the expected
    valid/corrupt split and surviving payload volume from the source of
    truth.

    The corruption is deterministic (doc_id % 10), so the assertion is
    exact, not statistical. At scale the same option set plus a
    quarantine sink on the corrupt column is the ingest contract.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    line = F.to_json(F.struct("doc_id", "text", "n_chars"))
    jsonl = d.select(
        F.when(
            F.col("doc_id") % 10 == 0,
            # torn record: drop the closing half of the object
            F.substring(line, 1, 20),
        )
        .otherwise(line)
        .alias("value")
    )
    out_dir = scratch_dir(spark, "json_permissive_")
    try:
        jsonl.write.mode("overwrite").text(out_dir)
        back = (
            spark.read.schema(
                "doc_id bigint, text string, n_chars bigint, _corrupt_record string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(out_dir)
        )
        stats = back.agg(
            F.sum(
                F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
            ).alias("n_corrupt"),
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0)
            ).alias("n_valid"),
            F.sum(
                F.when(F.col("_corrupt_record").isNull(), F.col("n_chars"))
            ).alias("valid_chars"),
        )
        return spark.createDataFrame(stats.collect(), schema=stats.schema)
    finally:
        remove_scratch(spark, out_dir)


# ------------------------------------------- copy-on-write upsert sink ----

#: One shared spelling of the floor-quantized revenue sum (×2^20, FLOOR,
#: exact decimal sum): updates carry full-entropy doubles (price × 1.1),
#: where a straight double→DECIMAL(30,2) CAST would hit Spark-vs-DuckDB
#: tie-rounding differences (half-up vs round-half-even).
_COW_REVENUE = (
    "CAST(SUM(CAST(FLOOR(o_totalprice * 1048576.0) AS DECIMAL(38,0)))"
    " AS DOUBLE) / 1048576.0"
)


def cow_rewrite_partitions(
    spark: SparkSession,
    path: str,
    touched: list[int],
    change_keys: DataFrame,
    upserts: DataFrame,
) -> None:
    """Copy-on-write MERGE into a parquet dataset partitioned by
    ``o_year``: read ONLY the touched partitions (partition-pruned
    scan), drop changed keys (broadcast anti join — the CDC batch is
    bounded by ingest cadence, not dataset size), append the new row
    versions, and overwrite JUST those partitions via dynamic partition
    overwrite. Untouched partitions are never read, never rewritten —
    the rewrite cost is O(touched data), not O(dataset); that
    proportionality is the entire point of COW at 100 TB.

    The dynamic-overwrite commit is per-partition-atomic (each partition
    dir swaps on job commit); concurrent readers of untouched partitions
    are unaffected throughout.
    """
    cur = spark.read.parquet(path).filter(F.col("o_year").isin(touched))
    survivors = cur.join(F.broadcast(change_keys), "o_orderkey", "left_anti")
    merged = survivors.select(*upserts.columns).unionByName(upserts)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("o_year").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


@query(
    "sink_cow_upsert_partitioned",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
        FROM orders
    ),
    src AS (SELECT * FROM base WHERE o_year IN (1996, 1997)),
    deletes AS (
        SELECT o_orderkey FROM src WHERE o_year = 1996 AND o_orderkey % 13 = 0
    ),
    updates AS (
        SELECT o_orderkey, o_year, o_totalprice * 1.1 AS o_totalprice
        FROM src WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
    ),
    inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, o_year, 42.0 AS o_totalprice
        FROM src WHERE o_year = 1997 AND o_orderkey % 97 = 0
    ),
    change_keys AS (
        SELECT o_orderkey FROM deletes UNION ALL SELECT o_orderkey FROM updates
    ),
    merged AS (
        SELECT b.o_orderkey, b.o_year, b.o_totalprice
        FROM base b LEFT JOIN change_keys c ON b.o_orderkey = c.o_orderkey
        WHERE b.o_year IN (1996, 1997) AND c.o_orderkey IS NULL
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts
        UNION ALL SELECT * FROM base WHERE o_year NOT IN (1996, 1997)
    )
    SELECT o_year, COUNT(*) AS n_orders, {_COW_REVENUE} AS revenue
    FROM merged GROUP BY o_year
    """,
    tags=("sink", "parquet", "cow", "merge", "partition-pruning", "roundtrip"),
)
def sink_cow_upsert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write upsert into a year-partitioned parquet lake,
    end-to-end: materialize orders partitioned by ``o_year``, apply a
    deterministic CDC batch that touches ONLY 1996/1997 (deletes in
    1996, price-uplift updates in both, fresh-key inserts into 1997),
    rewrite JUST those two partition directories (dynamic partition
    overwrite after a partition-pruned read), then read the whole
    dataset back and aggregate per year. The oracle computes the same
    MERGE in SQL — proving the file-level surgery preserved exact
    table semantics, survivors and all, across the untouched years too.

    This is the table-format primitive under Delta/Iceberg MERGE
    (reference has no notion of mutable datasets — its sinks are
    write-once TSV part files, design.md's sink contract): COW rewrite
    cost scales with the touched slice, reads stay plain parquet scans
    with partition pruning, and ``tests/test_sinks_cli.py`` pins that
    untouched partitions' files are byte-identical (never rewritten).
    """
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"), "o_totalprice"
    )
    out = scratch_dir(spark, "sink_cow_")
    try:
        base.write.mode("overwrite").partitionBy("o_year").parquet(out)
        src = base.filter(F.col("o_year").isin(1996, 1997))
        deletes = src.filter(
            (F.col("o_year") == 1996) & (F.col("o_orderkey") % 13 == 0)
        ).select("o_orderkey")
        updates = src.filter(
            (F.col("o_orderkey") % 13 != 0) & (F.col("o_orderkey") % 7 == 0)
        ).select(
            "o_orderkey", "o_year", (F.col("o_totalprice") * 1.1).alias("o_totalprice")
        )
        inserts = src.filter(
            (F.col("o_year") == 1997) & (F.col("o_orderkey") % 97 == 0)
        ).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_year",
            F.lit(42.0).alias("o_totalprice"),
        )
        change_keys = deletes.union(updates.select("o_orderkey"))
        cow_rewrite_partitions(
            spark, out, [1996, 1997], change_keys, updates.unionByName(inserts)
        )
        back = (
            spark.read.parquet(out)
            .groupBy("o_year")
            .agg(F.count("*").alias("n_orders"), F.expr(_COW_REVENUE).alias("revenue"))
        )
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        remove_scratch(spark, out)
