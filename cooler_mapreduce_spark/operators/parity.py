"""Reference-parity queries — the workloads the reference actually runs.

These are the four demonstrated/designed jobs (SURVEY.md §2.3) plus the
trivially-derivable distinct/top-k, each re-expressed as a declarative
DataFrame plan over the ``documents``/``lineitem`` test tables:

- word_count      — reference shared/samples/word_count.py:8-57
- grep            — reference design.md:272-275 (filter, "no combiner")
- weather_stats   — reference shared/samples/weather_stats.py:10-100
                    (unpivot → per-metric avg/min/max/count)
- inverted_index  — reference design.md:277-280 (word → doc list)

Scale notes: every query here is scan → narrow transform → single
hash-aggregate shuffle. Catalyst plans map-side partial aggregation
automatically (the reference designed a combiner for exactly this,
design.md:197-245, but never wired it in — SURVEY.md §2.1 #5); parquet
scans read only the referenced columns. Nothing below materializes a
driver-side collection, so the plans are unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..functions.text import SQL_WORD_TOKENS, word_tokens
from ..registry import query
from ..sources.catalog import table

_TOKS = SQL_WORD_TOKENS.format(col="text")


@query(
    "word_count",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_TOKS}) AS word FROM documents
    )
    SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    """,
    tags=("parity", "aggregation", "flagship-shape"),
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship reference job: normalized word frequencies over documents.

    explode(word_tokens) → groupBy(word).count(): one shuffle, partial
    counts map-side. Token cardinality is bounded by vocabulary, so the
    final aggregate is small regardless of corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(word_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "grep",
    oracle="""
    SELECT doc_id, text FROM documents
    WHERE regexp_matches(text, 'spark.*join|join.*spark')
    """,
    tags=("parity", "filter"),
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference 'grep' design: emit records matching a regex.

    Pure filter — no shuffle at all; predicate evaluates inside the scan
    stage. (Regex contains-matches can't push to parquet row-group stats,
    but column pruning still applies.)
    """
    docs = table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike("spark.*join|join.*spark")).select("doc_id", "text")


@query(
    "weather_stats",
    oracle=f"""
    WITH m AS (
        SELECT 'quantity' AS metric, l_quantity AS v FROM lineitem
        UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'discount', l_discount FROM lineitem
    )
    SELECT metric,
           {sql_davg('v')} AS avg_v,
           MIN(v) AS min_v,
           MAX(v) AS max_v,
           COUNT(*) AS cnt
    FROM m GROUP BY metric
    """,
    tags=("parity", "aggregation", "unpivot"),
)
def weather_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference weather_stats shape: unpivot columns → per-metric stats.

    The reference unpivots CSV columns inside map_fn and merges a
    {sum,count,min,max} dict in its combiner/reducer
    (weather_stats.py:33-75). Here: ``stack`` (zero-copy unpivot, no
    Python) → one hash aggregate. Three-row result at any scale.
    """
    li = table(spark, sf_dir, "lineitem")
    m = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (metric, v)"
    )
    return m.groupBy("metric").agg(
        davg("v").alias("avg_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.count("*").alias("cnt"),
    )


@query(
    "inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest({_TOKS}) AS word FROM documents
    )
    SELECT word,
           array_to_string(list_sort(list(doc_id)), ',') AS docs,
           COUNT(*) AS n_docs
    FROM toks GROUP BY word
    """,
    tags=("parity", "aggregation", "array"),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference inverted-index design: word → sorted list of doc ids.

    tokenize → explode → collect each word's doc ids as a SET. The
    per-(word, doc) dedup is folded into the aggregate itself
    (optimization round 11, guide §2.4): ``collect_set`` dedups exactly
    what the earlier separate DISTINCT did, but map-side partial
    aggregation now ships per-task-deduped postings through ONE word-keyed
    exchange instead of a (doc_id, word)-keyed dedup exchange FOLLOWED by
    the word-keyed one; Spark's ObjectHashAggregate builds the sets
    spillably. Posting lists for stop words get large at 100 TB — real
    deployments cap or bucket them; here the vocabulary is small and
    lists are bounded by document count.

    The sorted posting list is emitted as a comma-joined string (not an
    array column) so any hash-comparing harness can canonicalize the cell
    as a scalar; the join is lossless since doc ids are integers.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id"), F.explode(word_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .select(
            "word",
            F.array_join(F.col("ids").cast("array<string>"), ",").alias("docs"),
            F.size("ids").cast("bigint").alias("n_docs"),
        )
    )


@query(
    "distinct_values",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("parity", "distinct"),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over low-cardinality keys — map-side partial dedup then one
    tiny shuffle (same partial/final split as any aggregate)."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("parity", "topk", "sort"),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    of size k, then a k·P-row driver merge; no global sort ever runs.
    Deterministic under ties via the o_orderkey tiebreak."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "word_count_file_keyed",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS}) AS word FROM documents
    )
    SELECT source, word, COUNT(*) AS cnt FROM toks GROUP BY source, word
    """,
    tags=("parity", "aggregation"),
)
def word_count_file_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count keyed by origin — the reference's `filename:line` record
    key made useful (its sample jobs all discard it; here `source` plays
    the filename role as a grouping dimension)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(word_tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "pysource_event_mix",
    oracle="""
    WITH g AS (
        SELECT (i * 2654435761) % 4294967296 AS h
        FROM (SELECT unnest(generate_series(0, 9999)) AS i)
    )
    SELECT CASE h % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                      WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
                      ELSE 'error' END AS event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST((CAST(h % 10000 AS DOUBLE) / 100.0) AS DECIMAL(30,2)))
                AS DOUBLE) AS total_value,
           CAST(MIN(h % 1000) AS BIGINT) AS min_user
    FROM g GROUP BY 1
    """,
    tags=("source", "connector", "python-datasource"),
)
def pysource_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the CUSTOM PYTHON DATASOURCE (sources/pysource.py)
    — the Spark-native replacement for the reference's hand-rolled
    input-split + scan machinery (coordinator/server.py:209-243,
    task_executor.py:103-183).  8 planned input partitions stream 10k
    deterministic rows straight into a hash aggregate; no file ever
    exists.  The oracle REGENERATES the identical rows in pure SQL
    (the generator is one multiplicative-hash expression), so even the
    connector path is value-checked, not just row-counted.  ``sf_dir``
    is unused: the source is its own data.
    """
    from ..functions.numeric import dsum as _dsum
    from ..sources.pysource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", "8")
        .option("rowsPerPartition", "1250")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        _dsum("value", 2).alias("total_value"),
        F.min("user_id").alias("min_user"),
    )


@query(
    "positional_index_top_terms",
    oracle="""
    WITH words AS (
        SELECT d.doc_id, d.lst[i.i] AS word, i.i AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS lst FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(d.lst))) AS i) i
    ),
    agg AS (
        SELECT word,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences,
               array_to_string(list_sort(list(doc_id * 100000 + pos)), ',') AS postings
        FROM words GROUP BY word
    )
    SELECT word, n_docs, n_occurrences, postings
    FROM agg ORDER BY n_occurrences DESC, word LIMIT 25
    """,
    tags=("parity", "inverted-index", "positional"),
)
def positional_index_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL inverted index: word → sorted posting list of
    (doc, position) — the structure phrase search and proximity scoring
    need, one step past the reference's designed word→[documents] index
    (design.md:277-280, no positions).  Postings are encoded as
    doc_id·10⁵+position bigints (documents are ≪10⁵ tokens), keeping
    the list a flat sorted int sequence — compact to shuffle, mergeable,
    and engine-portable (emitted comma-joined so every output cell is a
    hashable scalar).  Determinism: ``sort_array`` imposes posting
    order (collect order is partition-dependent), top-25 is tie-broken
    by word.  100 TB: one explode-shuffle on word, posting lists bounded
    per word by document frequency — the classic search-index build as
    a two-aggregate plan.

    n_docs and n_occurrences are DERIVED from the collected posting
    array rather than aggregated alongside it (optimization round 11,
    guide §2.4): a ``countDistinct`` next to a ``collect_list`` made
    Spark plan the distinct's own (word, doc_id)-keyed exchange + a
    second word-keyed one, while the posting list — which the query
    collects anyway — already determines both counts: the encoded
    doc component (posting div 10⁵) counted distinct is n_docs, the
    array size is n_occurrences. One exchange instead of two, and the
    per-group state (the posting list) is unchanged.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    agg = (
        words.groupBy("word")
        .agg(
            F.sort_array(
                F.collect_list(F.col("doc_id") * 100000 + F.col("pos"))
            ).alias("parr")
        )
        .select(
            "word",
            F.size(
                F.array_distinct(F.expr("transform(parr, x -> x div 100000)"))
            )
            .cast("bigint")
            .alias("n_docs"),
            F.size("parr").cast("bigint").alias("n_occurrences"),
            F.array_join(F.col("parr").cast("array<string>"), ",").alias(
                "postings"
            ),
        )
    )
    return agg.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(25)
