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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..registry import query
from ..sources.catalog import table


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
