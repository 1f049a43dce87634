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

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
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
    d = table(spark, sf_dir, "documents")
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
