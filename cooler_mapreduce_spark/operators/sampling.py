"""Deterministic sampling & dataset splitting — training-pipeline staples.

A 100 TB corpus cannot be sampled with ``rand()``: the sample must be
*reproducible* across reruns, engines, and partition layouts, or every
downstream experiment becomes unrepeatable. The standard fix is
hash-mod sampling — a row is in the sample iff ``hash(key) % 100`` falls
under the rate — which is stateless, shuffle-free (a pure filter pushed
into the scan stage), stable under repartitioning, and consistent across
engines when the hash is portable (``functions/hashing.py`` md5int, the
same primitive the dedup tier uses). Spark's own ``df.sample``/
``sampleBy`` use seeded per-partition RNGs, so their output changes with
the partition layout — exactly what a training pipeline must avoid; the
reference (text-only MapReduce, SURVEY.md §2.4) has no sampling story at
all.

Every operator here is a narrow transform: no shuffle, no state, trivially
scales to any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
from ..functions.numeric import dsum, sql_dsum
from ..registry import query
from ..sources.catalog import table

#: Bucket expression: md5int is a positive 60-bit int in both dialects, so
#: ``% 100`` is a uniform, non-negative bucket id.
_SPARK_PCT = f"({md5int_spark('CAST(doc_id AS STRING)')} % 100)"
_DUCK_PCT = f"({md5int_duckdb('CAST(doc_id AS VARCHAR)')} % 100)"


@query(
    "sample_hash_documents",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_DUCK_PCT} < 10
    """,
    tags=("sampling", "llm-pipeline"),
)
def sample_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli sample by content key.

    A pure filter — evaluated in whole-stage codegen during the scan, no
    shuffle, and the SAME rows come back at any partition count, any
    cluster size, any engine. Rerunning the pipeline tomorrow on 100 TB
    re-selects the identical sample.
    """
    d = table(spark, sf_dir, "documents")
    return d.filter(F.expr(_SPARK_PCT) < 10).select("doc_id", "lang", "n_chars")


@query(
    "train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_DUCK_PCT} < 80 THEN 'train'
                WHEN {_DUCK_PCT} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("sampling", "split", "llm-pipeline"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment by key hash.

    Stateless per-row labeling: membership is a function of the document
    id alone, so the split never leaks rows between sets when data is
    re-partitioned, re-ingested, or appended — adding new documents
    never moves an existing one across the boundary (the property
    ``randomSplit`` cannot give you).
    """
    d = table(spark, sf_dir, "documents")
    pct = F.expr(_SPARK_PCT)
    return d.select(
        "doc_id",
        F.when(pct < 80, "train").when(pct < 90, "valid").otherwise("test").alias("split"),
    )


@query(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_DUCK_PCT} <
          CASE WHEN lang = 'en' THEN 20 ELSE 50 END
    """,
    tags=("sampling", "stratified", "llm-pipeline"),
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates: downsample dominant English, keep half of the
    rest — the language-rebalancing step of corpus curation
    (``sampleBy`` semantics, but deterministic). Still a pure scan-stage
    filter; the rate table would broadcast if it were data-driven."""
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    return d.filter(F.expr(_SPARK_PCT) < rate).select("doc_id", "lang")


_SPARK_DOC_H = md5int_spark("CAST(doc_id AS STRING)")
_DUCK_DOC_H = md5int_duckdb("CAST(doc_id AS VARCHAR)")


@query(
    "sample_k_per_group",
    oracle=f"""
    SELECT lang, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_DUCK_DOC_H}, doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
    tags=("sampling", "per-group", "llm-pipeline"),
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (5 docs per language): rank rows
    within each group by their portable content hash and keep the k
    smallest — reservoir-sampling semantics (uniform-ish, size-bounded)
    but reproducible across engines and reruns. The hash order is
    data-independent, so appending documents only perturbs the sample
    where new hashes land in the bottom k. One hash-partitioned window
    per group; at extreme group sizes the same selection runs as
    min-k aggregation instead of a full window sort.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.expr(_SPARK_DOC_H), "doc_id")
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", "n_chars")
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id,
               {md5int_duckdb('text')} AS content_hash,
               CASE WHEN {_DUCK_PCT} < 80 THEN 'train' ELSE 'test' END AS split
        FROM documents
    ),
    per_hash AS (
        SELECT content_hash,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT split) AS n_splits
        FROM tagged GROUP BY content_hash
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_contents,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked_contents,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
               AS n_leaked_docs
    FROM per_hash
    """,
    tags=("sampling", "leakage", "llm-pipeline"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: content hashes that land in BOTH splits
    — the eval-contamination check every ML team runs, and the reason
    the composed pipeline dedups BEFORE splitting (splitting on doc_id
    hashes puts byte-identical duplicate docs on both sides of the
    fence; this query counts exactly how often).  A non-zero
    n_leaked_contents here is the motivating negative path for
    :func:`~cooler_mapreduce_spark.operators.pipeline.
    pipeline_training_corpus`'s dedup-then-split ordering.

    One scan (hash + split tag in codegen), one aggregate per content
    hash, one 3-counter rollup — the same O(rows) cost as the split
    itself at any scale.
    """
    d = table(spark, sf_dir, "documents")
    tagged = d.select(
        F.expr(md5int_spark("text")).alias("content_hash"),
        F.when(F.expr(_SPARK_PCT) < 80, "train").otherwise("test").alias("split"),
    )
    per_hash = tagged.groupBy("content_hash").agg(
        F.count("*").alias("n_docs"), F.countDistinct("split").alias("n_splits")
    )
    leaked = F.col("n_splits") > 1
    return per_hash.agg(
        F.count("*").alias("n_distinct_contents"),
        F.sum(F.when(leaked, 1).otherwise(0)).alias("n_leaked_contents"),
        F.sum(F.when(leaked, F.col("n_docs")).otherwise(0)).alias("n_leaked_docs"),
    )


#: Importance-sampling resolution: acceptance thresholds are compared at
#: parts-per-million granularity so the keep decision is pure integer
#: cross-multiplication (engine-exact; no float probability anywhere).
_IS_RES = 1_000_000
#: Character count at which a document's keep probability saturates at 1.
_IS_FULL_CHARS = 400

_SPARK_IS_BUCKET = f"({md5int_spark(chr(39) + 'is:' + chr(39) + ' || CAST(doc_id AS STRING)')} % {_IS_RES})"
_DUCK_IS_BUCKET = f"({md5int_duckdb(chr(39) + 'is:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} % {_IS_RES})"


@query(
    "importance_sample_by_length",
    oracle=f"""
    SELECT doc_id, lang, n_chars, {_DUCK_IS_BUCKET} AS bucket
    FROM documents
    WHERE {_DUCK_IS_BUCKET} * {_IS_FULL_CHARS} < n_chars * {_IS_RES}
    """,
    tags=("sampling", "importance", "llm-pipeline"),
)
def importance_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic IMPORTANCE sampling: keep probability proportional
    to a per-document quality weight (here length, saturating at
    ``_IS_FULL_CHARS`` chars — substitute any scalar quality score).

    Uniform hash sampling throws away the same fraction of good and bad
    documents; curation pipelines instead keep high-weight documents
    with probability min(1, w) and down-sample the tail. The keep
    decision is ``bucket(doc_id) < w·RES`` on a fresh salted hash
    ('is:' prefix — independent of the split/sample buckets, so
    composing with :func:`train_test_split` introduces no correlation),
    compared by integer cross-multiplication — no float probability, so
    both engines admit bit-identical row sets, and the sample is stable
    under repartitioning, appends, and reruns like every operator in
    this module. Pure scan-stage filter: zero shuffle at any scale.
    """
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_IS_BUCKET)
    return (
        d.select("doc_id", "lang", "n_chars", bucket.alias("bucket"))
        .filter(F.col("bucket") * _IS_FULL_CHARS < F.col("n_chars") * _IS_RES)
    )


_SPARK_FOLD = f"({md5int_spark('CAST(o_orderkey AS STRING)')} % 5)"
_DUCK_FOLD = f"({md5int_duckdb('CAST(o_orderkey AS VARCHAR)')} % 5)"


@query(
    "kfold_target_encoding",
    oracle=f"""
    WITH base AS (
        SELECT c_mktsegment AS segment, {_DUCK_FOLD} AS fold,
               o_totalprice AS target
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    per_fold AS (
        SELECT segment, fold, COUNT(*) AS n_rows,
               {sql_dsum('target')} AS s_fold
        FROM base GROUP BY segment, fold
    ),
    totals AS (
        SELECT segment, SUM(n_rows) AS n_all, {sql_dsum('s_fold')} AS s_all
        FROM per_fold GROUP BY segment
    )
    SELECT p.segment, p.fold, p.n_rows,
           CASE WHEN n_all > n_rows
                THEN (s_all - s_fold) / (n_all - n_rows) END AS oof_mean
    FROM per_fold p JOIN totals t ON p.segment = t.segment
    """,
    tags=("sampling", "ml-features", "encoding", "llm-pipeline"),
)
def kfold_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding (K=5): the mean order price
    per market segment, computed for each fold EXCLUDING that fold's own
    rows — the out-of-fold mean a training pipeline joins back onto its
    features so no row sees a statistic derived from its own target.

    Folds are assigned by portable content hash (md5int % 5 — the same
    engine-agnostic gate as train_test_split), so tomorrow's rerun on
    100 TB reproduces the identical folds. The heavy pass is ONE
    partial-aggregable groupBy to (segment, fold) sums/counts —
    O(segments × K) rows; the per-segment totals re-aggregate that tiny
    frame and join back (broadcast by size). The out-of-fold mean is
    computed by SUBTRACTION (s_all − s_fold) / (n_all − n_rows) — no
    K-fold re-scan of the fact table, which is the difference between
    one pass and K passes at scale. Both sums are decimal-staged exact
    multiples of 0.01, so the subtraction and the final division are
    bit-deterministic at any partition count.
    """
    o = table(spark, sf_dir, "orders")
    # fan_out=False: customer is the broadcast BUILD side — Q3/Q8 pattern
    c = table(spark, sf_dir, "customer", fan_out=False)
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(_SPARK_FOLD).alias("fold"),
        F.col("o_totalprice").alias("target"),
    )
    per_fold = base.groupBy("segment", "fold").agg(
        F.count("*").alias("n_rows"), dsum("target").alias("s_fold")
    )
    # Segment totals as a WINDOW over the grouped frame, not a
    # re-aggregate + join-back: a join formulation re-derives the whole
    # per_fold subtree for the totals side in the static plan (two fact
    # scans before runtime stage reuse) and plans a sort-merge join on
    # statically-unknown cardinalities. The window keeps ONE derivation
    # and ONE fact scan by construction; its input is already the
    # O(segments × K) grouped frame, so the extra exchange moves ~25
    # rows. Decimal-staged window sum: per-fold values are exact
    # multiples of 1e-2, so the re-sum is order-independent.
    from pyspark.sql import Window

    w = Window.partitionBy("segment")
    s_all = F.sum(F.col("s_fold").cast("decimal(30,2)")).over(w).cast("double")
    n_all = F.sum("n_rows").over(w)
    return per_fold.select(
        "segment",
        "fold",
        "n_rows",
        # try_divide: a segment whose rows all hash into ONE fold has
        # n_all == n_rows; under ANSI mode a bare division would abort
        # the whole job for that degenerate (but legal) input. NULL
        # oof_mean mirrors the oracle's CASE guard.
        F.try_divide(s_all - F.col("s_fold"), n_all - F.col("n_rows")).alias("oof_mean"),
    )


_WSAMPLE_K = 100


@query(
    "weighted_sample_wor_orders",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               ln(({md5int_duckdb("CAST(o_orderkey AS VARCHAR)")} + 1.0)
                  / 1152921504606846976.0) / o_totalprice AS es_key
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY es_key DESC, o_orderkey) AS sample_rank
    FROM keyed
    ORDER BY es_key DESC, o_orderkey
    LIMIT {_WSAMPLE_K}
    """,
    tags=("sampling", "weighted", "without-replacement"),
)
def weighted_sample_wor_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    k=100 orders drawn with probability proportional to o_totalprice,
    each row drawn at most once — the sketch-free way to build a
    price-weighted evaluation slice. Per row the key is
    ln(u)/w with u = (md5int(orderkey)+1)/2^60 ∈ (0, 1] (the log-space
    form of u^(1/w)); the top-k keys ARE the sample — reproducible
    because u comes from the engine-portable content hash, not an RNG.

    One scan + TakeOrdered: map-side partial top-k per partition, k-row
    merge on the driver — no global sort, no shuffle of the fact table,
    the same plan shape at any SF. The ln() value itself is never
    emitted (libm last-ULP differences between JVM and DuckDB could
    flip a hash compare); only the selected rows and their rank are —
    and a rank flip would need two keys within one ULP of each other,
    which distinct 60-bit hashes make vanishingly improbable.
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    u = (F.expr(md5int_spark("CAST(o_orderkey AS STRING)")) + F.lit(1.0)) / F.lit(
        float(1 << 60)
    )
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (F.log(u) / F.col("o_totalprice")).alias("es_key"),
    )
    picked = keyed.orderBy(F.desc("es_key"), F.asc("o_orderkey")).limit(_WSAMPLE_K)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("es_key"), F.asc("o_orderkey"))
    return picked.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("sample_rank"),
    )
