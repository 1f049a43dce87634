"""Python UDTF tier — the modern declarative form of the reference's
``map_fn`` surface.

The reference's entire query API is a user generator emitting 0..n pairs
per record (reference design.md:71-82). Spark's three equivalents, by
preference at scale:

1. Catalyst expressions (``explode``/``transform``) — JVM-side, used by
   every query in ``operators/parity.py``;
2. **Python UDTF** (this module) — a *typed, registered* 1→n row
   function usable from SQL via LATERAL — the closest API-shape match to
   a reference job file's ``map_fn``, but schema-declared and
   plannable;
3. RDD ``flatMap`` (``mr.py``) — runs unmodified reference job files.

UDTFs run Python per input row; keep them off the hot path (the oracle
check proves semantic equivalence with the expression tier — at scale
you'd ship tier 1).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..registry import query
from ..sources.catalog import register_views, table


@udtf(returnType="word string")
class SplitWords:
    """Reference word_count normalization (reference
    shared/samples/word_count.py:19-24) as a 1→n table function:
    lowercase, strip ``.,!?;:"'-``, split on whitespace, drop empties."""

    def eval(self, text: str):  # noqa: D102
        for w in (text or "").strip().lower().split():
            w = w.strip(".,!?;:\"'-")
            if w:
                yield (w,)


@query(
    "udtf_word_count",
    oracle="""
    WITH toks AS (
        SELECT unnest(
            list_filter(
                list_transform(string_split_regex(lower(text), '\\s+'),
                               t -> trim(t, '.,!?;:"''-')),
                t -> length(t) > 0)
        ) AS word
        FROM documents
    )
    SELECT word, COUNT(*) AS cnt FROM toks GROUP BY word
    """,
    tags=("udf-surface", "udtf", "aggregation"),
)
def udtf_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the registered UDTF + LATERAL join — proves the
    typed Python 1→n surface agrees with the expression tier bit-for-bit
    (same oracle family as word_count/mr_word_count)."""
    spark.udtf.register("split_words", SplitWords)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT s.word, COUNT(*) AS cnt
        FROM documents_v, LATERAL split_words(text) s
        GROUP BY s.word
        """
    )


@query(
    "pandas_udaf_second_max",
    oracle="""
    SELECT l_returnflag,
           MAX(l_quantity) AS max_qty,
           MAX(CASE WHEN l_quantity < (SELECT MAX(l2.l_quantity) FROM lineitem l2
                                       WHERE l2.l_returnflag = lineitem.l_returnflag)
                    THEN l_quantity END) AS second_max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "udaf", "pandas"),
)
def pandas_udaf_second_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF tier: a GROUPED_AGG ``pandas_udf`` computing the
    second-largest distinct quantity per returnflag — the aggregate
    shape Spark has no built-in for and the reference would write as a
    reduce_fn scanning its value list (design.md:84-94).  The Arrow
    path hands the UDF one column per group; the oracle expresses the
    same semantics relationally (max below the correlated max), so the
    imperative aggregate is value-pinned.  At 100 TB the same UDF runs
    unchanged — grouped-agg shuffles only (group, value) columns — but
    note no partial aggregation: a built-in composition (two-level
    max/filter) is the hot-path form; this tier exists for semantics
    Spark cannot compose.
    """
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def pandas_max(v: pd.Series) -> float:
        return float(v.max())

    @pandas_udf(DoubleType())
    def second_max(v: pd.Series) -> float:
        # set semantics: no accumulation-order dependence, hence
        # deterministic under any partitioning
        u = v.drop_duplicates().nlargest(2)
        return float(u.iloc[1]) if len(u) > 1 else float("nan")

    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg,
    # so the max rides the same Arrow path
    # fan_out=False: pandas UDAFs have no partial aggregation, so the
    # groupBy exchange ships every row regardless — the fan-out shuffle
    # before it was redundant (r11 window-family A/B)
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    return li.groupBy("l_returnflag").agg(
        pandas_max("l_quantity").alias("max_qty"),
        second_max("l_quantity").alias("second_max_qty"),
    )


@query(
    "arrow_byte_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY lang
    """,
    tags=("udf", "arrow", "mapInArrow"),
)
def arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth Python-integration tier: ``mapInArrow`` — the UDF runs on
    raw Arrow ``RecordBatch``es with ZERO pandas materialization, the
    right surface for byte-level work on binary/multimodal columns
    (pandas round-trips every value through Python objects; Arrow
    compute kernels stay in C). Per-document UTF-8 byte lengths are
    computed batch-at-a-time with ``pyarrow.compute``, then rolled up
    per language by a JVM partial aggregate. The oracle reproduces the
    byte semantics relationally (octet_length over the UTF-8 encoding),
    so the Arrow kernel path is value-pinned like the other UDF tiers.

    Scale shape: the Arrow stage is a partition-local projection (no
    shuffle, no state, batches stream through bounded memory); the only
    wide operation is the O(langs) aggregate after it.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def byte_stats(batches):
        for b in batches:
            idx = b.schema.get_field_index("text")
            nbytes = pc.binary_length(pc.cast(b.column(idx), pa.binary()))
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("lang")), pc.cast(nbytes, pa.int64())],
                names=["lang", "n_bytes"],
            )

    d = table(spark, sf_dir, "documents").select("lang", "text")
    per_doc = d.mapInArrow(byte_stats, schema="lang string, n_bytes bigint")
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


@udtf(
    returnType="user_id bigint, session_seq bigint, n_events bigint,"
    " session_start timestamp_ntz, session_end timestamp_ntz"
)
class SessionizeTable:
    """Polymorphic (TABLE-argument) UDTF: 30-minute-gap sessionization as
    per-group ordered streaming state. With ``PARTITION BY user_id
    ORDER BY (ts, event_id)`` Spark instantiates the class once per user
    and feeds that user's rows to ``eval`` in order — the state machine
    holds O(1): the open session's start/last/count, emitted on each gap
    and flushed by ``terminate``. The imperative twin of the
    two-window lag+cumsum idiom (``operators.windows.sessionize_events``),
    for session logic too procedural for window functions (multi-clock
    timeouts, per-event budgets)."""

    def __init__(self) -> None:
        self.uid = None
        self.seq = 0
        self.n = 0
        self.start = None
        self.last = None

    def eval(self, row):  # noqa: D102
        uid, ts = row["user_id"], row["ts"]
        if self.last is None:
            self.uid, self.seq, self.n, self.start = uid, 1, 1, ts
        elif (ts - self.last).total_seconds() > 1800:
            yield (self.uid, self.seq, self.n, self.start, self.last)
            self.seq += 1
            self.n = 1
            self.start = ts
        else:
            self.n += 1
        self.last = ts

    def terminate(self):  # noqa: D102
        if self.last is not None:
            yield (self.uid, self.seq, self.n, self.start, self.last)


@query(
    "udtf_table_arg_sessionize",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_seq
        FROM gapped
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
    tags=("udf-surface", "udtf", "table-argument", "session"),
)
def udtf_table_arg_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through the Spark 4 polymorphic-UDTF surface:
    ``SELECT * FROM sessionize_table(TABLE(...) PARTITION BY user_id
    ORDER BY (ts, event_id))`` — the SQL-callable form of "run my
    stateful per-key function over ordered groups" (the batch cousin of
    ``applyInPandasWithState``; the reference cannot express ANY
    order-dependent per-key state in one round). The oracle is the
    declarative two-window spelling — proving the imperative state
    machine and the lag+cumsum algebra produce identical sessions.

    Scale: one exchange on user_id + an in-partition sort feed the
    Python workers via Arrow; state per worker is one open session, so
    memory is O(1) per group regardless of group size. It IS the Python
    hot path (~rows × IPC), which is why the window twin exists — this
    query certifies the API surface and its exactly-once group/order
    contract, not a preferred plan at 100 TB.
    """
    spark.udtf.register("sessionize_table", SessionizeTable)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT * FROM sessionize_table(
            TABLE(SELECT user_id, event_id, ts FROM events)
            PARTITION BY user_id ORDER BY (ts, event_id))
    """)
