"""Corpus-hygiene operators: repetition quality gates, benchmark
decontamination, boilerplate detection, deterministic epoch shuffling.

The four "keep the training set clean" passes a large-scale LLM data
pipeline runs corpus-wide (driver-brief tier; the reference stops at
word-level counting, shared/samples/word_count.py:19-24):

- :func:`repetition_filter` — Gopher-style within-document repetition
  signals (duplicate-trigram fraction, top-bigram coverage);
- :func:`decontaminate_ngram_overlap` — train/benchmark n-gram overlap
  (the "did an eval question leak into the training set?" audit);
- :func:`boilerplate_ngrams` — cross-document high-frequency shingles
  (navigation chrome, license headers) and per-source exposure;
- :func:`corpus_shuffle_shards` — seeded, engine-independent epoch
  shuffle + shard assignment.

Every metric is integer- or string-valued (ratios are compared by
integer cross-multiplication), so the DuckDB oracle matches bit-for-bit
— see tests/oracle.py for why float ratios would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
from ..registry import query
from ..sources.catalog import table

# --------------------------------------------------------------------------
# dialect helpers: non-distinct word n-grams (unlike functions.hashing's
# shingles_*, which de-duplicate — repetition metrics need every occurrence)


def _ngrams_spark(tokens: str, n: int) -> str:
    return (
        f"transform(sequence(1, greatest(size({tokens}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({tokens}, i, {n})))"
    )


def _ngrams_duckdb(tokens: str, n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({tokens}) - {n - 1}, 1)),"
        f" i -> array_to_string({tokens}[i:i+{n - 1}], ' '))"
    )


# --------------------------------------------------------------------------
# repetition_filter — Gopher-style repetition quality gate

#: Flag thresholds (Rae et al. 2021 "Scaling Language Models" app. A1 use
#: 0.30 for duplicate n-gram fraction and 0.20 for top-ngram coverage).
_DUP_TG_PCT = 30  # flag if duplicate trigrams > 30% of trigram positions
_TOP_BG_PCT = 20  # flag if the most frequent bigram covers > 20% of tokens


@query(
    "repetition_filter",
    oracle=f"""
    WITH feats AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_tok,
               {_ngrams_duckdb("string_split(text, ' ')", 3)} AS tg,
               {_ngrams_duckdb("string_split(text, ' ')", 2)} AS bg
        FROM documents
    ),
    m AS (
        SELECT lang, n_tok,
               len(tg) AS n_tg,
               len(tg) - len(list_distinct(tg)) AS dup_tg,
               list_max(list_transform(list_distinct(bg),
                                       b -> len(list_filter(bg, x -> x = b)))) AS top_bg
        FROM feats
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dup_tg * 100 > {_DUP_TG_PCT} * n_tg
                           OR top_bg * 2 * 100 > {_TOP_BG_PCT} * n_tok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(dup_tg) AS BIGINT) AS total_dup_trigrams,
           CAST(SUM(n_tg) AS BIGINT) AS total_trigrams,
           MAX(top_bg) AS max_top_bigram_count
    FROM m
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("textstats", "repetition", "quality", "llm-pipeline"),
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition gate (Gopher rules A1).

    Computes per document the duplicate-trigram fraction and the token
    coverage of the single most frequent bigram, flags documents over
    the published thresholds, and reports per-language flag rates.

    Top-bigram coverage counts OVERLAPPING occurrences (``top_bg * 2``
    tokens), so a degenerate run like "a a a" yields coverage 4 > 3
    tokens; this over-flags relative to a non-overlapping reading of the
    Gopher rule but is applied identically in the Spark and oracle
    expressions, and for any threshold < 100% the flag outcome is
    unchanged (coverage > n_tok implies coverage > pct·n_tok either way).

    Both signals are pure array expressions over the token vector — the
    per-document work is embarrassingly parallel inside one codegen'd
    map stage (no explode, nothing wide until the final per-language
    rollup, a partial-aggregable shuffle on ~10 keys). Document length
    is bounded, so the O(distinct·len) top-bigram scan is a constant per
    row; at 100 TB this runs at scan speed.
    """
    d = table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    m = d.select(
        "lang",
        F.expr(f"size({toks})").alias("n_tok"),
        F.expr(f"size({_ngrams_spark(toks, 3)})").alias("n_tg"),
        F.expr(
            f"size({_ngrams_spark(toks, 3)}) - size(array_distinct({_ngrams_spark(toks, 3)}))"
        ).alias("dup_tg"),
        F.expr(
            f"array_max(transform(array_distinct({_ngrams_spark(toks, 2)}),"
            f" b -> size(filter({_ngrams_spark(toks, 2)}, x -> x = b))))"
        ).alias("top_bg"),
    )
    flagged = (F.col("dup_tg") * 100 > _DUP_TG_PCT * F.col("n_tg")) | (
        F.col("top_bg") * 2 * 100 > _TOP_BG_PCT * F.col("n_tok")
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(flagged, 1).otherwise(0)).alias("n_flagged"),
            F.sum("dup_tg").alias("total_dup_trigrams"),
            F.sum("n_tg").alias("total_trigrams"),
            F.max("top_bg").alias("max_top_bigram_count"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# decontaminate_ngram_overlap — train/benchmark leakage audit

#: Every doc_id ≡ 0 (mod 17) plays the held-out benchmark (~6% of docs).
_BENCH_MOD = 17
#: Overlap n-gram width. 5 balances specificity against the synthetic
#: corpus's small vocabulary (real pipelines use 8-13, e.g. GPT-3 app. C).
_DECON_N = 5


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   {_ngrams_duckdb("string_split(text, ' ')", _DECON_N)},
                   s -> {md5int_duckdb('s')})) AS hashes
        FROM documents
    ),
    bench AS (
        SELECT DISTINCT unnest(hashes) AS h FROM sh
        WHERE doc_id % {_BENCH_MOD} = 0
    ),
    train AS (
        SELECT doc_id, unnest(hashes) AS h FROM sh
        WHERE doc_id % {_BENCH_MOD} <> 0
    )
    SELECT t.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
    FROM train t LEFT JOIN bench b ON t.h = b.h
    GROUP BY t.doc_id
    ORDER BY n_contaminated DESC, doc_id
    LIMIT 100
    """,
    tags=("dedup", "decontamination", "llm-pipeline"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which training documents contain
    n-grams from the held-out benchmark slice?

    The audit run before every model train: shingle both sides into
    distinct {n}-grams, build the benchmark shingle set, and count per
    training document how many of its shingles appear in that set.

    Scale shape: a REAL benchmark set is tiny relative to the corpus
    (evals are thousands of docs, the corpus is billions), so size-based
    planning broadcasts it — the 100 TB training side is scanned once,
    never shuffled for the probe; only the final per-doc count is a
    (doc_id-partitioned, partial-aggregable) shuffle. No pairwise
    doc×doc comparison exists anywhere. No FORCED broadcast (round-8):
    this fixture emulates the bench set with a modulo slice of the
    corpus, which scales with SF — the 64 MB threshold keeps the
    identical broadcast plan at test SF and degrades to a shuffle join
    if the bench side ever outgrows it.
    """
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform({_ngrams_spark('split(text, chr(32))', _DECON_N)},"
            f" s -> {md5int_spark('s')}))"
        ).alias("hashes"),
    )
    bench = (
        sh.where(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("hashes").alias("h"))
        .distinct()
        .withColumn("is_contaminated", F.lit(1))
    )
    train = sh.where(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", F.explode("hashes").alias("h")
    )
    # NO broadcast hint on bench (round-8): a REAL benchmark set is a
    # fixed external input (thousands of docs) and size-based planning
    # broadcasts it on its own; this fixture emulates it with a modulo
    # SLICE of the corpus, which scales with SF — hinting that shape
    # forces an OOM at 100 TB. The 64 MB threshold picks the identical
    # BroadcastHashJoin at test SF (plan-pinned) and degrades honestly.
    return (
        train.join(bench, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_contaminated"), F.lit(0))).alias("n_contaminated"),
        )
        .orderBy(F.desc("n_contaminated"), "doc_id")
        .limit(100)
    )


#: Drop a training doc when at least this % of its distinct n-grams
#: appear in the benchmark slice — at 50 the gate removes leaked
#: near-copies while mere topical overlap passes.
_DECON_MAX_PCT = 50


@query(
    "corpus_decontaminate_apply",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang, source, n_chars,
               list_distinct(list_transform(
                   {_ngrams_duckdb("string_split(text, ' ')", _DECON_N)},
                   s -> {md5int_duckdb('s')})) AS hashes
        FROM documents
    ),
    bench AS (
        SELECT DISTINCT unnest(hashes) AS h FROM sh
        WHERE doc_id % {_BENCH_MOD} = 0
    ),
    train AS (
        SELECT doc_id, lang, source, n_chars, unnest(hashes) AS h FROM sh
        WHERE doc_id % {_BENCH_MOD} <> 0
    )
    SELECT t.doc_id, t.lang, t.source, t.n_chars
    FROM train t LEFT JOIN bench b ON t.h = b.h
    GROUP BY t.doc_id, t.lang, t.source, t.n_chars
    HAVING SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) * 100
           < {_DECON_MAX_PCT} * COUNT(*)
    """,
    tags=("dedup", "decontamination", "llm-pipeline"),
)
def corpus_decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination verdict APPLIED: materialize the clean
    training corpus — every train-split document whose benchmark n-gram
    overlap stays under :data:`_DECON_MAX_PCT` % of its distinct
    shingles (the leaked near-copies :func:`decontaminate_ngram_overlap`
    surfaces are exactly what this drops).

    Scale shape: the document metadata rides THROUGH the shingle
    explode and aggregation as extra group-key columns, so the whole
    apply is one corpus scan + one partial-aggregable shuffle — no
    join-back of an O(corpus) verdict table, and the benchmark shingle
    set stays a SIZE-BASED broadcast exactly as in the audit query
    (hint-free for the same fixture-slice reason, round-8).
    """
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.expr(
            f"array_distinct(transform({_ngrams_spark('split(text, chr(32))', _DECON_N)},"
            f" s -> {md5int_spark('s')}))"
        ).alias("hashes"),
    )
    bench = (
        sh.where(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("hashes").alias("h"))
        .distinct()
        .withColumn("is_contaminated", F.lit(1))
    )
    train = sh.where(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", "lang", "source", "n_chars", F.explode("hashes").alias("h")
    )
    # hint-free for the same reason as decontaminate_ngram_overlap: the
    # fixture's bench slice scales with SF; size-based planning keeps
    # the broadcast where the bench side is genuinely small.
    scored = (
        train.join(bench, "h", "left")
        .groupBy("doc_id", "lang", "source", "n_chars")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce(F.col("is_contaminated"), F.lit(0))).alias("n_cont"),
        )
    )
    return scored.filter(
        F.col("n_cont") * 100 < F.lit(_DECON_MAX_PCT) * F.col("n_sh")
    ).select("doc_id", "lang", "source", "n_chars")


# --------------------------------------------------------------------------
# boilerplate_ngrams — cross-document boilerplate exposure per source

#: A shingle present in ≥10% of documents is "boilerplate" (site chrome,
#: license headers, navigation text).
_BOILER_PCT = 10
_BOILER_N = 4


@query(
    "boilerplate_ngrams",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   {_ngrams_duckdb("string_split(text, ' ')", _BOILER_N)},
                   s -> {md5int_duckdb('s')}))) AS h
        FROM documents
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    boiler AS (
        SELECT h FROM sh CROSS JOIN n
        GROUP BY h, n.n_docs
        HAVING COUNT(*) * 100 >= {_BOILER_PCT} * n.n_docs
    ),
    per_doc AS (
        SELECT sh.doc_id, sh.source,
               COUNT(*) AS n_sh,
               CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler
        FROM sh LEFT JOIN boiler b ON sh.h = b.h
        GROUP BY sh.doc_id, sh.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
           CAST(SUM(n_boiler) AS BIGINT) AS total_boilerplate,
           MAX(n_boiler) AS max_boilerplate,
           CAST(SUM(CASE WHEN n_boiler * 2 > n_sh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mostly_boilerplate
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    tags=("textstats", "boilerplate", "llm-pipeline"),
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection and per-source exposure.

    Pass 1 computes the document frequency of every distinct {n}-gram
    shingle and keeps those in ≥{pct}% of documents — the boilerplate
    inventory. Pass 2 joins each document's shingles against that
    inventory and rolls exposure up per source (how much of each crawl
    source is navigation chrome / repeated headers?).

    Scale shape: the df aggregation is one partial-aggregable shuffle on
    the shingle hash. The HAVING filter shrinks the inventory to the few
    genuinely corpus-frequent shingles, so the pass-2 probe joins the
    full shingle stream against a SMALL broadcast set — the corpus is
    never shuffled a second time; per-doc and per-source rollups are
    ordinary partial-agg shuffles.
    """
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"array_distinct(transform({_ngrams_spark('split(text, chr(32))', _BOILER_N)},"
                f" s -> {md5int_spark('s')}))"
            )
        ).alias("h"),
    )
    # corpus size as a broadcast single-row scalar (lazy; no driver action)
    n = d.agg(F.count("*").alias("n_docs"))
    boiler = (
        sh.groupBy("h")
        .count()
        .crossJoin(F.broadcast(n))
        .where(F.col("count") * 100 >= _BOILER_PCT * F.col("n_docs"))
    )
    per_doc = (
        sh.join(F.broadcast(boiler.select("h").withColumn("is_b", F.lit(1))), "h", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.coalesce(F.col("is_b"), F.lit(0))).alias("n_boiler"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_sh").alias("total_shingles"),
            F.sum("n_boiler").alias("total_boilerplate"),
            F.max("n_boiler").alias("max_boilerplate"),
            F.sum(F.when(F.col("n_boiler") * 2 > F.col("n_sh"), 1).otherwise(0)).alias(
                "n_mostly_boilerplate"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# corpus_shuffle_shards — seeded, reproducible epoch shuffle

_SHUFFLE_SEED = "epoch7"
_N_SHARDS = 8


@query(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS k,
               {md5int_duckdb(f"'{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")} % {_N_SHARDS} AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k) AS pos
    FROM keyed
    ORDER BY shard, pos
    """,
    tags=("sampling", "shuffle", "llm-pipeline"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: seeded pseudo-random order + shard
    assignment for training-data loading.

    Training runs need the corpus in a shuffled order that is (a) stable
    across reruns and engines, (b) different per epoch, and (c) already
    sharded for the data-loader fleet. Keying by md5(seed:doc_id) gives
    all three without any RNG state: the seed string changes the
    permutation, the hash is engine-portable, and shard = hash mod k.

    Scale shape: one hash-partition shuffle on `shard` (the window's
    PARTITION BY), then an in-partition sort by the md5 key — exactly a
    repartition + sortWithinPartitions write of shard files. No global
    sort, no skew (md5 is uniform by construction).
    """
    # fan_out=False: the shard exchange immediately re-partitions this
    # scan and the per-row work before it is two md5 calls — redundant
    # fan-out shuffle (r11 window-family A/B)
    d = table(spark, sf_dir, "documents", fan_out=False)
    seed_expr = f"concat('{_SHUFFLE_SEED}:', CAST(doc_id AS STRING))"
    keyed = d.select(
        "doc_id",
        F.expr(f"md5({seed_expr})").alias("k"),
        F.expr(f"{md5int_spark(seed_expr)} % {_N_SHARDS}").alias("shard"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("k")
    return (
        keyed.select("doc_id", "shard", F.row_number().over(w).alias("pos"))
        .orderBy("shard", "pos")
    )


# --------------------------------------------------------------------------
# doc_chunk_windows — context-length chunking (training sequences / RAG)

#: Chunk geometry: 64-token windows advancing 48 tokens (16-token
#: overlap) — the sliding-window shape context-length preprocessing
#: uses; production pipelines swap in their model's context size.
_CHUNK_W = 64
_CHUNK_STRIDE = 48


@query(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, n, i.i AS chunk_no,
               array_to_string(
                   toks[i.i * {_CHUNK_STRIDE} + 1 : i.i * {_CHUNK_STRIDE} + {_CHUNK_W}],
                   ' ') AS chunk
        FROM t, LATERAL (
            SELECT unnest(generate_series(0,
                greatest(CAST(ceil((n - {_CHUNK_W}) / {_CHUNK_STRIDE}.0) AS BIGINT), 0)
            )) AS i
        ) i
    )
    SELECT doc_id, chunk_no,
           least({_CHUNK_W}, n - chunk_no * {_CHUNK_STRIDE}) AS n_chunk_tokens,
           md5(chunk) AS chunk_hash
    FROM c
    """,
    tags=("corpus", "chunking", "llm-pipeline"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: split every document into 64-token
    windows advancing by 48 (16-token overlap), emitting one row per
    chunk with its token count and content hash — the 1→many
    preprocessing that turns raw documents into model-sized training
    sequences (or RAG passages), with the overlap preserving cross-
    boundary context.

    Pure Catalyst: the window index set is a ``sequence`` literal per
    row and chunks are ``slice``+``concat_ws`` projections, so the whole
    op is one scan with zero shuffle and zero Python — at 100 TB it
    fuses into the read stage like any map. The emitted hash (not the
    chunk text) keeps the result scalar-hashable; a production writer
    selects the chunk string instead.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("size(split(text, ' '))").alias("n"),
    )
    chunks = t.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(CAST(ceil((n - {_CHUNK_W}) / {_CHUNK_STRIDE}.0) AS BIGINT), 0)),"
                f" i -> struct(i AS chunk_no,"
                f" concat_ws(' ', slice(toks, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_W})) AS chunk))"
            )
        ).alias("c"),
    ).select("doc_id", "n", F.col("c.chunk_no"), F.col("c.chunk"))
    return chunks.select(
        "doc_id",
        "chunk_no",
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("chunk_no") * _CHUNK_STRIDE).alias(
            "n_chunk_tokens"
        ),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_hash"),
    )


@query(
    "chunk_dedup_groups",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               md5(array_to_string(
                   toks[i.i * {_CHUNK_STRIDE} + 1 : i.i * {_CHUNK_STRIDE} + {_CHUNK_W}],
                   ' ')) AS chunk_hash
        FROM t, LATERAL (
            SELECT unnest(generate_series(0,
                greatest(CAST(ceil((n - {_CHUNK_W}) / {_CHUNK_STRIDE}.0) AS BIGINT), 0)
            )) AS i
        ) i
    )
    SELECT chunk_hash,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM c
    GROUP BY chunk_hash
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
    tags=("dedup", "chunking", "llm-pipeline"),
)
def chunk_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: chunk every document with
    :func:`doc_chunk_windows`'s geometry and group identical chunks that
    appear in MORE THAN ONE document — the partial-copy detector
    (quoted sections, syndicated paragraphs, stitched-together docs)
    that whole-document hashing (``dedup_exact``) structurally misses.

    Scale shape inherits from the chunker: one scan fused with the
    window explode, then a single partial-aggregable shuffle on
    (chunk_hash) — 16-byte keys, never chunk text. At 100 TB the hot
    keys are boilerplate chunks; the rollup is an aggregation (counts),
    not a pair expansion, so a popular chunk costs one reducer row, not
    a quadratic bucket.
    """
    chunks = doc_chunk_windows(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
