"""Oracle-checked queries driven through the MapReduce compat layer (mr.py).

These run real reference-style map/combine/reduce functions over the test
tables and adapt the resulting RDD back to a typed DataFrame, proving the
compat surface end-to-end against the same DuckDB gate as the native tier.

Tokenization note: the reference's word normalization is ``str.strip`` of
the punctuation set — *leading/trailing only* (reference
word_count.py:19-24) — unlike the native ``word_count`` query, which
strips punctuation everywhere. Both semantics are kept, each with its own
matching oracle.

Float-determinism note: every numeric flowing through these jobs is
integral (counts; l_quantity is whole-valued in this dataset), so Python
float sums are exact below 2^53 and order-independent. At 100 TB the
DataFrame tier with decimal aggregation is the right path; the compat tier
exists for API parity, per the reference's own single-node envelope
(BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..mr import run_job
from ..registry import query
from ..sources.catalog import table

#: DuckDB fragment for the reference's strip-style tokens of ``text``.
_STRIP_TOKS = (
    "list_filter("
    "list_transform(string_split_regex(lower(text), '\\s+'),"
    " t -> trim(t, '.,!?;:\"''-')),"
    " t -> length(t) > 0)"
)


def _wc_map(key, text):
    for word in text.strip().lower().split():
        word = word.strip(".,!?;:\"'-")
        if word:
            yield (word, 1)


def _sum_reduce(key, values):
    return sum(values)


@query(
    "mr_word_count",
    oracle=f"""
    WITH toks AS (SELECT unnest({_STRIP_TOKS}) AS word FROM documents)
    SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    """,
    tags=("mr-compat", "aggregation"),
)
def mr_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference word-count job (map/combine/reduce) via the compat layer.

    ``sort_output=False``: sorted keys are the reference's *TSV output*
    contract (task_executor.py:226), not a semantic one for an unordered
    DataFrame hand-off — and ``sortByKey`` costs an extra shuffle plus a
    range-bound sampling job that re-evaluates the whole lineage. The
    CLI/TSV sink path keeps the sort. ``num_reduce=8``: the reduce
    cardinality is vocabulary-sized; 32 shuffle partitions for a ~31-key
    keyspace is pure task-scheduling overhead.
    """
    docs = table(spark, sf_dir, "documents").select("text")
    out = run_job(
        spark, docs, _wc_map, _sum_reduce, combine_fn=_sum_reduce,
        num_reduce=8, sort_output=False,
    )
    schema = StructType(
        [StructField("word", StringType(), False), StructField("cnt", LongType(), False)]
    )
    return spark.createDataFrame(out, schema)


def _stats_map(key, value):
    yield (key, value)


def _stats_combine(key, values):
    vals = list(values)
    return {"sum": sum(vals), "count": len(vals), "min": min(vals), "max": max(vals)}


def _stats_reduce(key, values):
    """The reference weather reducer's algebra: merge partial-stat dicts or
    raw floats, duck-typed on element type (weather_stats.py:56-75)."""
    vals = list(values)
    if vals and isinstance(vals[0], dict):
        total, count = sum(v["sum"] for v in vals), sum(v["count"] for v in vals)
        lo, hi = min(v["min"] for v in vals), max(v["max"] for v in vals)
    else:
        total, count, lo, hi = sum(vals), len(vals), min(vals), max(vals)
    return {"average": total / count, "min": lo, "max": hi, "count": count}


@query(
    "mr_quantity_stats",
    oracle="""
    SELECT l_returnflag AS flag,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("mr-compat", "aggregation"),
)
def mr_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weather-stats algebra ({sum,count,min,max} combiner → merge reducer)
    over lineitem quantities, keyed by return flag."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    out = run_job(
        spark, li, _stats_map, _stats_reduce, combine_fn=_stats_combine,
        num_reduce=8, sort_output=False,  # see mr_word_count docstring
    )
    rows = out.map(
        lambda kv: (kv[0], kv[1]["average"], kv[1]["min"], kv[1]["max"], kv[1]["count"])
    )
    schema = StructType(
        [
            StructField("flag", StringType(), False),
            StructField("avg_qty", DoubleType(), False),
            StructField("min_qty", DoubleType(), False),
            StructField("max_qty", DoubleType(), False),
            StructField("cnt", LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _grep_map(key, text):
    if "stream" in text and "hash" in text:
        yield (key, text)


def _first_reduce(key, values):
    return next(iter(values))


@query(
    "mr_grep",
    oracle="""
    SELECT doc_id, text FROM documents
    WHERE contains(text, 'stream') AND contains(text, 'hash')
    """,
    tags=("mr-compat", "filter"),
)
def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's designed grep job: map-side filter, identity reduce
    (design.md:272-275 — 'no combiner: not applicable')."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = run_job(spark, docs, _grep_map, _first_reduce, sort_output=False)
    schema = StructType(
        [StructField("doc_id", LongType(), False), StructField("text", StringType(), False)]
    )
    return spark.createDataFrame(out, schema)


def _ii_map(key, text):
    for word in text.strip().lower().split():
        word = word.strip(".,!?;:\"'-")
        if word:
            yield (word, key)


def _ii_combine(key, values):
    return sorted(set(values))


def _ii_reduce(key, values):
    vals = list(values)
    if vals and isinstance(vals[0], list):
        merged: set = set()
        for v in vals:
            merged.update(v)
    else:
        merged = set(vals)
    return sorted(merged)


@query(
    "mr_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest({_STRIP_TOKS}) AS word FROM documents
    )
    SELECT word, array_to_string(list_sort(list(doc_id)), ',') AS docs
    FROM toks GROUP BY word
    """,
    tags=("mr-compat", "aggregation", "array"),
)
def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's designed inverted-index job: word → sorted doc list;
    combiner merges per-partition doc-id sets (design.md:277-280). Posting
    lists are emitted comma-joined so every output cell is a hashable
    scalar."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = run_job(
        spark, docs, _ii_map, _ii_reduce, combine_fn=_ii_combine,
        num_reduce=8, sort_output=False,  # see mr_word_count docstring
    )
    schema = StructType(
        [
            StructField("word", StringType(), False),
            StructField("docs", ArrayType(LongType()), False),
        ]
    )
    return spark.createDataFrame(out, schema).select(
        "word", F.array_join(F.col("docs").cast("array<string>"), ",").alias("docs")
    )
