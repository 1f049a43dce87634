"""The composed training-corpus pipeline — every stage in one plan.

Individual operators prove capabilities; this module proves COMPOSITION:
scrub → quality-gate → exact-dedup → deterministic split → audit rollup
as a single declarative plan that Catalyst fuses (the scrub, token
count, gate, and hash all run inside one codegen stage — zero
materialization between "steps", where the reference would run one
MapReduce job per stage with intermediate files in between
(design.md:178-191) and five full passes over the corpus).

Every stage reuses the same primitives its standalone operator uses
(md5int content hashes, min-struct keep-first, hash-mod split), so the
pipeline result is oracle-checked end to end with pure integer/string
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
from ..functions.timeutil import us_between
from ..registry import query
from ..sources.catalog import table

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_MIN_TOKENS = 25


@query(
    "pipeline_training_corpus",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                         || '@example.com thanks'
                    ELSE text END AS payload
        FROM documents
    ),
    cleaned AS (
        SELECT doc_id, lang, source,
               regexp_replace(payload, '{_EMAIL_RE}', '<EMAIL>', 'g') AS clean
        FROM seeded
    ),
    gated AS (
        SELECT doc_id, lang, source, clean,
               len(string_split(clean, ' ')) AS n_tokens
        FROM cleaned
        WHERE len(string_split(clean, ' ')) >= {_MIN_TOKENS}
    ),
    kept AS (
        SELECT min(struct_pack(doc_id := doc_id, lang := lang,
                               source := source, n_tokens := n_tokens)) AS r
        FROM gated
        GROUP BY {md5int_duckdb('clean')}
    ),
    flat AS (
        SELECT r.doc_id AS doc_id, r.lang AS lang, r.source AS source,
               r.n_tokens AS n_tokens
        FROM kept
    )
    SELECT lang,
           CASE WHEN {md5int_duckdb('CAST(doc_id AS VARCHAR)')} % 100 < 80
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM flat GROUP BY 1, 2
    """,
    tags=("pipeline", "llm-pipeline", "composition"),
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation in ONE plan: PII scrub (regex
    redaction after deterministic injection), token-count quality gate,
    exact dedup keeping the lowest doc_id per content hash (min-struct
    argmin — map-side combinable), portable hash-mod train/test split,
    and the per-(lang, split) audit a data-mixing decision reads.

    Plan shape: one scan through a single codegen stage (scrub + gate +
    hash), ONE shuffle for the dedup aggregate, and one tiny rollup —
    versus the reference's five jobs with TSV/pickle materialization
    between each.  100 TB: the only wide exchange carries (hash, small
    struct); everything upstream is embarrassingly parallel map work.
    """
    d = table(spark, sf_dir, "documents", fan_out=False)
    seeded = d.select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com thanks"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("payload"),
    )
    cleaned = seeded.select(
        "doc_id",
        "lang",
        "source",
        F.regexp_replace("payload", _EMAIL_RE, "<EMAIL>").alias("clean"),
    )
    gated = cleaned.withColumn("n_tokens", F.size(F.split("clean", " "))).filter(
        F.col("n_tokens") >= _MIN_TOKENS
    )
    kept = (
        gated.groupBy(F.expr(md5int_spark("clean")).alias("h"))
        .agg(F.min(F.struct("doc_id", "lang", "source", "n_tokens")).alias("r"))
        .select("r.*")
    )
    return (
        kept.withColumn(
            "split",
            F.when(
                F.expr(md5int_spark("CAST(doc_id AS STRING)")) % 100 < 80, "train"
            ).otherwise("test"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "pipeline_behavioral_sessions",
    oracle="""
    WITH deb AS (
        SELECT user_id, event_id, event_type, ts,
               date_diff('microseconds',
                         lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id), ts) AS same_gap
        FROM events
    ),
    kept AS (
        SELECT user_id, event_id, event_type, ts FROM deb
        WHERE same_gap IS NULL OR same_gap >= 900000000
    ),
    gapped AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microseconds', lag(ts) OVER w, ts) > 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM kept
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM gapped
    ),
    per AS (
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               date_diff('microseconds', MIN(ts), MAX(ts)) AS dur_us,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(has_purchase) AS BIGINT) AS n_purchase_sessions,
           round(CAST(SUM(n_events) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 9)
               AS avg_session_events,
           round(CAST(SUM(dur_us) AS BIGINT) / COUNT(*) / 1000000.0, 9)
               AS avg_session_sec
    FROM per
    """,
    tags=("pipeline", "behavioral", "composition"),
)
def pipeline_behavioral_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The behavioral twin of :func:`pipeline_training_corpus`: debounce
    (15-min same-key rate-limit) → sessionize the survivors (30-min
    gaps) → per-session stats → one audit row.  Catalyst fuses the
    chain into TWO wide exchanges — (user, type) for the debounce lag,
    then user for everything else: the session lag, the running session
    counter, and the per-session aggregate (with map-side partials) all
    share the second partitioning, no exchange between them (the
    reference would run a job per stage, re-shuffling the full stream
    each time, design.md:178-191).

    All arithmetic is exact microsecond integers until two final
    rounded divisions.  100 TB: both exchanges carry four narrow
    columns, per-user sorted chains, O(sessions) final state.
    """
    # fan_out=False: redundant pre-window shuffle (r11 window-family A/B)
    ev = table(spark, sf_dir, "events", fan_out=False)
    wdt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    same_gap = us_between(F.lag("ts").over(wdt), F.col("ts"))
    kept = (
        ev.select("user_id", "event_id", "event_type", "ts", same_gap.alias("same_gap"))
        .filter(F.col("same_gap").isNull() | (F.col("same_gap") >= 900_000_000))
        .drop("same_gap")
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = us_between(F.lag("ts").over(wo), F.col("ts"))
    gapped = kept.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    sess = gapped.withColumn("session_seq", F.sum("is_start").over(wrun))
    per = sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        us_between(F.min("ts"), F.max("ts")).alias("dur_us"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("has_purchase"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.sum("has_purchase").alias("n_purchase_sessions"),
        F.round(F.sum("n_events") / F.count("*").cast("double"), 9).alias("avg_session_events"),
        F.round(F.sum("dur_us") / F.count("*") / 1_000_000.0, 9).alias("avg_session_sec"),
    )
