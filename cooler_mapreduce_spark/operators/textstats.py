"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

The per-document feature extractors a training-data pipeline runs over
every document before filtering/mixing (driver-brief tier; no reference
analogue — SURVEY.md §2.4 stops at word_count's lower/strip/split,
shared/samples/word_count.py:19-22). All four are pure Catalyst
expression pipelines — single scan, zero shuffle, whole-stage codegen —
because per-document features are embarrassingly parallel; the only wide
operation anywhere is an optional aggregate on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import (
    md5int_duckdb,
    md5int_spark,
    minhash_perm,
    shingles_duckdb,
    shingles_spark,
)
from ..functions.numeric import dsum, sql_dsum
from ..registry import query
from ..sources.catalog import table
from .similarity import duckdb_cosine

#: Tiny per-language stopword inventories for the n-gram/stopword-hit
#: heuristic. Deliberately minimal — language ID at corpus scale is a
#: lookup-table expression, not a model call.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "avec", "les"],
    "de": ["der", "die", "das", "und", "von", "zu", "mit", "ist", "den", "für"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}
_LANGS = sorted(STOPWORDS)


def _sql_list(words: list[str], dialect: str) -> str:
    body = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"array({body})" if dialect == "spark" else f"[{body}]"


def _hits(tokens: str, lang: str, dialect: str) -> str:
    lst = _sql_list(STOPWORDS[lang], dialect)
    if dialect == "spark":
        return f"size(filter({tokens}, t -> array_contains({lst}, t)))"
    return f"len(list_filter({tokens}, t -> list_contains({lst}, t)))"


def _langid_expr(tokens: str, dialect: str) -> str:
    """argmax over per-language stopword hit counts; ties break to the
    alphabetically-first language; all-zero → 'und' (undetermined)."""
    hits = {lg: _hits(tokens, lg, dialect) for lg in _LANGS}
    best = " ".join(
        f"WHEN {hits[lg]} = " + f"greatest({', '.join(hits.values())})"
        f" AND {hits[lg]} > 0 THEN '{lg}'"
        for lg in _LANGS
    )
    return f"CASE {best} ELSE 'und' END"


@query(
    "text_language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           {_langid_expr('toks', 'duckdb')} AS predicted_lang
    FROM t
    """,
    tags=("textstats", "langid", "llm-pipeline"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language identification per document (argmax over
    per-language token-hit counts, deterministic tie-break)."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.col("lang").alias("labeled_lang"), F.split(F.lower("text"), " ").alias("toks"))
    # materialize each language's hit count once — the argmax CASE
    # references every count up to 6 times, and inlining would re-filter
    # the token array per reference
    hits = t.select(
        "doc_id",
        "labeled_lang",
        *[F.expr(_hits("toks", lg, "spark")).alias(f"h_{lg}") for lg in _LANGS],
    )
    best = " ".join(
        f"WHEN h_{lg} = greatest({', '.join('h_' + l for l in _LANGS)})"
        f" AND h_{lg} > 0 THEN '{lg}'"
        for lg in _LANGS
    )
    return hits.select(
        "doc_id", "labeled_lang", F.expr(f"CASE {best} ELSE 'und' END").alias("predicted_lang")
    )


@query(
    "text_quality_score",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS toks, text FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE) / len(toks) AS avg_token_len,
           len(list_filter(toks, x -> len(x) >= 4)) AS n_long_tokens,
           CAST(len(list_filter(toks, x -> len(x) >= 4)) AS DOUBLE) / len(toks) AS long_token_ratio,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
           CASE WHEN len(toks) BETWEEN 5 AND 10000
                     AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.2
                THEN 1 ELSE 0 END AS passes_quality
    FROM t
    """,
    tags=("textstats", "quality", "llm-pipeline"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features + a pass/fail gate: token
    counts, average token length, type-token ratio (lexical diversity),
    long-token ratio — the Gopher/C4-style cheap filters, as pure column
    expressions. Ratios divide exact ints in double: deterministic."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", "n_chars", F.split("text", " ").alias("toks"))
    # count the array traversals (filter, array_distinct) once; the ratio
    # columns reference them repeatedly
    counts = t.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.size(F.filter("toks", lambda x: F.length(x) >= 4)).alias("n_long_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
    )
    n_tok = F.col("n_tokens")
    ttr = F.col("n_distinct_tokens").cast("double") / n_tok
    return counts.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        (F.col("n_chars").cast("double") / n_tok).alias("avg_token_len"),
        "n_long_tokens",
        (F.col("n_long_tokens").cast("double") / n_tok).alias("long_token_ratio"),
        "n_distinct_tokens",
        ttr.alias("ttr"),
        F.when((n_tok >= 5) & (n_tok <= 10000) & (ttr > 0.2), F.lit(1))
        .otherwise(F.lit(0))
        .alias("passes_quality"),
    )


#: BPE-ish pre-tokenization pattern: letter runs, digit runs, single
#: non-space symbols — the GPT-2-style regex family reduced to what both
#: regex engines (RE2-compatible subset) agree on.
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS bpe_ish_tokens,
           n_chars
    FROM documents
    """,
    tags=("textstats", "tokens", "llm-pipeline"),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per document: whitespace tokens and a BPE-style
    pre-tokenizer count (letter runs / digit runs / symbols) — the unit
    every mixing/budget decision is denominated in."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias("bpe_ish_tokens"),
        "n_chars",
    )


_FP_K = 8  # bottom-k sketch size


@query(
    "doc_fingerprint",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_sort(list_transform({shingles_duckdb("string_split(text, ' ')")},
                                        s -> {md5int_duckdb('s')})) AS hashes
        FROM documents
    )
    SELECT doc_id, array_to_string(hashes[1:{_FP_K}], ',') AS fingerprint,
           hashes[1] AS min_hash
    FROM sh
    """,
    tags=("textstats", "fingerprint", "llm-pipeline"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k document fingerprint: the k smallest 3-gram rolling
    hashes (md5int over shingles), a constant-size sketch whose overlap
    estimates containment — the winnowing-style alternative to full
    minhash signatures. Pure expression; no shuffle."""
    d = table(spark, sf_dir, "documents")
    spark_toks = "split(text, ' ')"
    # sort the hash array once; both output columns slice it
    h = d.select(
        "doc_id",
        F.array_sort(
            F.expr(f"transform({shingles_spark(spark_toks)}, s -> {md5int_spark('s')})")
        ).alias("hashes"),
    )
    return h.select(
        "doc_id",
        F.array_join(F.slice("hashes", 1, _FP_K).cast("array<string>"), ",").alias(
            "fingerprint"
        ),
        F.element_at("hashes", 1).alias("min_hash"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    per_term AS (
        SELECT term, COUNT(*) AS df, SUM(tf) AS stf FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, df,
           round(stf * ln((n.n_docs + 1) / (df + 1.0)), 6) AS total_tfidf
    FROM per_term CROSS JOIN n
    ORDER BY total_tfidf DESC, term
    LIMIT 100
    """,
    tags=("textstats", "tfidf", "llm-pipeline"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary weighting: top-100 terms by summed TF-IDF.

    idf = ln((N+1)/(df+1)) is constant per term, so summed TF-IDF
    factors as idf(term) · Σ_docs tf — ONE corpus scan feeding two
    chained partial-aggregable shuffles ((doc,term) then term), a
    broadcast single-row N, and a TakeOrdered top-100. No join, no
    second tokenize pass (the naive tf⋈df formulation rebuilds the
    whole scan+explode+agg subtree for the df branch — Catalyst can't
    reuse the exchange because column pruning makes the two subtrees
    differ). Both Σtf and df are exact integers, so the single
    round(·, 6) after the multiply is bit-deterministic in any engine
    and under any aggregation order.
    """
    d = table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count("*").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per_term = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("stf")
    )
    return (
        per_term.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.round(
                F.col("stf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1.0)), 6
            ).alias("total_tfidf"),
        )
        .orderBy(F.desc("total_tfidf"), F.asc("term"))
        .limit(100)
    )


@query(
    "quality_top_decile",
    oracle="""
    WITH thr AS (SELECT quantile_cont(n_chars, 0.9) AS t FROM documents)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d, thr
    WHERE d.n_chars > thr.t
    """,
    tags=("textstats", "quantile-filter", "llm-pipeline"),
)
def quality_top_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold gating: keep documents above the corpus's 90th
    length percentile — the "top-X% by quality score" selection step of
    corpus curation, done WITHOUT a global window: pass 1 reduces to a
    single exact-percentile scalar (sort-based per-group percentile over
    one group — bounded output), pass 2 broadcasts that scalar into a
    scan-stage filter. A percent_rank() window over all rows would need
    a global sort and a single-partition window at 100 TB; the two-pass
    form never materializes an ordering.
    """
    d = table(spark, sf_dir, "documents")
    thr = d.agg(F.percentile("n_chars", F.lit(0.9)).alias("t"))
    return (
        d.crossJoin(F.broadcast(thr))
        .filter(F.col("n_chars") > F.col("t"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "bigram_counts",
    oracle="""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS w FROM documents
    ),
    bigrams AS (
        SELECT array_to_string(w[i:i+1], ' ') AS bigram
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
        WHERE w[i] <> '' AND w[i+1] <> ''
    )
    SELECT bigram, COUNT(*) AS n
    FROM bigrams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
    tags=("textstats", "ngram", "llm-pipeline"),
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (top 50) — the n-gram statistic
    under language models, collocation mining, and contamination checks.
    Adjacent-token pairs come from zipping the token array with its own
    tail (transform over indices) INSIDE the scan projection, so the
    only shuffle is the count aggregate and the top-50 is TakeOrdered."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower("text"), " ").alias("w"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(1, greatest(size(w) - 1, 1)),"
                " i -> IF(i <= size(w) - 1 AND w[i-1] <> '' AND w[i] <> '',"
                "        concat(w[i-1], ' ', w[i]), NULL)),"
                " x -> x IS NOT NULL)"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


@query(
    "pii_redaction",
    oracle="""
    WITH seeded AS (
        SELECT source,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com thanks'
                    ELSE text END AS payload
        FROM documents
    ),
    scrubbed AS (
        SELECT source, payload,
               regexp_replace(payload, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g') AS clean
        FROM seeded
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN payload <> clean THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
           CAST(SUM(length(payload) - length(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed GROUP BY source
    """,
    tags=("text", "pii", "data-quality"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the corpus-cleaning pass every training-data
    pipeline runs before tokenization: regex-redact email addresses and
    account per-source how many documents were touched and how many
    characters were removed (the audit row a compliance gate signs off
    on).  The synthetic corpus has no PII, so addresses are injected
    deterministically (every 7th doc) to guarantee both paths.

    All string work (inject, regex scrub, length delta) runs inside
    whole-stage codegen — no UDF — followed by one tiny per-source
    aggregate.  The regex is anchored to a dialect-portable subset
    (character classes + bounded repeat) so Spark's Java regex and the
    oracle's RE2 agree.  100 TB: embarrassingly parallel map work;
    the real pattern set (emails, phones, SSNs, credit cards) is a
    chain of the same regexp_replace calls at identical plan cost.
    """
    d = table(spark, sf_dir, "documents")
    seeded = d.select(
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
    scrubbed = seeded.select(
        "source",
        "payload",
        F.regexp_replace(
            "payload", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        ).alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("payload") != F.col("clean"), 1).otherwise(0)).alias("n_redacted"),
        F.sum(F.length("payload") - F.length("clean")).alias("chars_removed"),
    )


@query(
    "seqlen_bucket_packing",
    oracle="""
    WITH t AS (
        SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    b AS (
        SELECT n_tokens,
               CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
                    WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
                    WHEN n_tokens <= 256 THEN 256 ELSE 512 END AS bucket
        FROM t
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(bucket - n_tokens) AS BIGINT) AS padding_waste
    FROM b GROUP BY bucket
    """,
    tags=("textstats", "batching", "llm-pipeline"),
)
def seqlen_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for batch packing: documents assigned to
    power-of-2 token-length buckets, with per-bucket doc counts, token
    mass, and PADDING WASTE (bucket_len − n_tokens summed) — the report
    that decides bucket boundaries for a training dataloader, where
    padding waste is compute burned on pad tokens.  Buckets are an
    explicit CASE ladder (integer compares — no log2, whose libm
    rounding differs across engines).  One scan, one O(buckets)
    aggregate.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(F.size(F.split("text", " ")).alias("n_tokens"))
    bucket = (
        F.when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .when(F.col("n_tokens") <= 256, 256)
        .otherwise(512)
    )
    b = t.select("n_tokens", bucket.alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("bucket") - F.col("n_tokens")).alias("padding_waste"),
    )


#: Data-mixing targets: desired share of the training token budget per
#: language, and the total budget (tokens). Literals shared with the
#: oracle so both engines price the identical mix.
_MIX_BUDGET = 1_000_000
_MIX_SHARES = {"en": 0.40, "zh": 0.20, "es": 0.15, "fr": 0.15, "de": 0.10}


def _mix_share_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{lg}' THEN {s}" for lg, s in sorted(_MIX_SHARES.items())
    )
    return f"CASE {whens} ELSE 0.0 END"


@query(
    "mixing_rates_by_lang",
    oracle=f"""
    WITH avail AS (
        SELECT lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
        FROM documents GROUP BY lang
    )
    SELECT lang, available_tokens,
           CAST(round({_MIX_BUDGET} * {_mix_share_sql('lang')}) AS BIGINT)
               AS target_tokens,
           round(least(1.0, CAST(round({_MIX_BUDGET} * {_mix_share_sql('lang')}) AS BIGINT)
                            / CAST(available_tokens AS DOUBLE)), 9) AS sample_rate,
           CASE WHEN CAST(round({_MIX_BUDGET} * {_mix_share_sql('lang')}) AS BIGINT)
                     > available_tokens THEN 1 ELSE 0 END AS undersupplied
    FROM avail
    """,
    tags=("textstats", "mixing", "llm-pipeline"),
)
def mixing_rates_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data MIXING: given a token budget and target language
    shares, compute each language's sampling rate (and flag languages
    whose corpus can't supply its target — the upsample-or-reweight
    decision).  This is the step after dedup/quality/leakage: the same
    audit numbers those ops produce, turned into per-slice sampling
    rates a dataloader applies via the deterministic hash-mod sampler
    (:func:`~cooler_mapreduce_spark.operators.sampling.
    sample_hash_documents`).

    One scan → O(langs) aggregate; targets are shared literals, rates
    are exact-int divisions rounded once — deterministic across
    engines.  At 100 TB this query IS the mixing plan: its output
    feeds the sampler's threshold, no further passes.
    """
    d = table(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("available_tokens")
    )
    share = F.lit(0.0)
    for lg, s in sorted(_MIX_SHARES.items()):
        share = F.when(F.col("lang") == lg, F.lit(s)).otherwise(share)
    target = F.round(F.lit(_MIX_BUDGET) * share).cast("bigint")
    return avail.select(
        "lang",
        "available_tokens",
        target.alias("target_tokens"),
        F.round(
            F.least(F.lit(1.0), target / F.col("available_tokens").cast("double")), 9
        ).alias("sample_rate"),
        F.when(target > F.col("available_tokens"), 1).otherwise(0).alias("undersupplied"),
    )


#: the unigram-LM per-doc scoring chain, ending in ``nll_per_doc(doc_id,
#: n_tokens, nll)`` — shared by the doc_unigram_nll and
#: ccnet_perplexity_buckets oracles (one spelling).
_NLL_CTES = """toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    pt AS (SELECT term, SUM(tf) AS stf FROM tf GROUP BY term),
    tot AS (SELECT SUM(stf) AS t FROM pt),
    lp AS (
        SELECT term, round(ln(CAST(stf AS DOUBLE) / t), 9) AS lp
        FROM pt CROSS JOIN tot
    ),
    nll_per_doc AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               round(-CAST(SUM(CAST(tf.tf AS DECIMAL(18,0)) *
                                CAST(lp.lp AS DECIMAL(20,9))) AS DOUBLE)
                     / SUM(tf.tf), 6) AS nll
        FROM tf JOIN lp ON tf.term = lp.term
        GROUP BY tf.doc_id
    )"""


@query(
    "doc_unigram_nll",
    oracle=f"""
    WITH {_NLL_CTES}
    SELECT doc_id, n_tokens, nll
    FROM nll_per_doc
    ORDER BY nll DESC, doc_id
    LIMIT 100
    """,
    tags=("textstats", "language-model", "quality", "llm-pipeline"),
)
def doc_unigram_nll(
    spark: SparkSession,
    sf_dir: str,
    min_count: int | None = None,
    top: int | None = 100,
) -> DataFrame:
    """Unigram language-model scoring: the 100 most "surprising" docs by
    average negative log-likelihood under the corpus's own unigram
    distribution — the LM-based quality signal corpus-curation pipelines
    (CCNet-style) gate on, with the corpus itself as the model.

    Shape: a tokenize → (doc,term) partial-agg diamond (tf), consumed
    by the scoring side and the model side (term-level re-agg → vocab
    stf, plus a single-row corpus total T). The three legs instantiate
    the tokenize subtree separately in the plan and run concurrently
    inside one job; checkpointing tf once to dedup them was A/B'd in
    r11 (1.380 → 1.491 s steady, identical rows) — the materialization
    barrier costs more than the warm re-scans at any bench SF, so the
    diamond stays. The
    vocab table (term, lp) joins back onto tf SIZE-BASED (no hint —
    round-8: the vocabulary scales with the corpus under Heaps' law, so
    a forced broadcast is a forced OOM at 100 TB; the 64 MB threshold
    keeps the identical BroadcastHashJoin at test SF and degrades to a
    shuffle join at scale). Per-doc reduction is a partial-aggregable
    groupBy, final top-100 is TakeOrdered.

    ``min_count`` is the model-side cardinality bound (same convention
    as the LSH bucket / posting-list caps: the REGISTERED query runs
    exact with ``None``, the scale path sets it): terms rarer than the
    threshold are dropped from the model, capping the vocab side at the
    head vocabulary (Zipf: a tiny min_count removes the long singleton
    tail that dominates raw vocab size) — small enough that size-based
    planning restores the broadcast. T still counts ALL tokens, so kept
    probabilities are unchanged; pruned terms simply don't contribute —
    per-doc n_tokens can only shrink (inner join), a one-sided
    approximation tested in tests/test_llm_ops.py.

    Determinism: stf and T are exact ints; ln(stf/T) is one double op
    rounded once to 9 places (same ULPs both engines — proven by
    tfidf_top_terms); tf·lp products aggregate in exact decimal, and
    the final divide-by-exact-count + round(6) is order-independent.
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    pt = tf.groupBy("term").agg(F.sum("tf").alias("stf"))
    tot = pt.agg(F.sum("stf").alias("t"))
    kept = pt if min_count is None else pt.filter(F.col("stf") >= min_count)
    lp = kept.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(F.log(F.col("stf").cast("double") / F.col("t")), 9).alias("lp"),
    )
    # NO broadcast hint on lp: the vocabulary grows with the corpus
    # (Heaps' law — billions of distinct whitespace tokens at 100 TB of
    # web text), so a forced broadcast is a forced OOM at scale. The
    # 64 MB autoBroadcastJoinThreshold picks the identical
    # BroadcastHashJoin at test SF (plan-pinned in
    # test_scale_properties._SIZE_BROADCAST_QUERIES) and degrades to a
    # shuffle join when the vocab outgrows it; min_count bounds the
    # model side when the scale path wants the broadcast back.
    scored = tf.join(lp, "term")
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(
            -F.sum(
                F.col("tf").cast("decimal(18,0)")
                * F.col("lp").cast("decimal(20,9)")
            ).cast("double")
            / F.sum("tf"),
            6,
        ).alias("nll"),
    )
    if top is None:
        return per_doc
    return per_doc.orderBy(F.desc("nll"), F.asc("doc_id")).limit(top)


#: perplexity-bucket histogram shape: equi-width NLL bins of 1e-4 nats,
#: capped at [0, 16.384) — resolution chosen for unigram NLLs, whose
#: corpus spread is a few millinats (the first cut, 0.01-nat bins, put
#: BOTH tercile cutoffs inside one bin and the uniform-within-bin
#: interpolation mis-split the terciles 140/243/117; at 1e-4 the
#: crossing bins hold ~1 doc). The bin SPACE is a bounded literal; the
#: histogram/CDF only materializes NONEMPTY bins (≤ distinct nll
#: values), so the CDF window input stays bounded either way.
_PPL_BIN_W = "0.0001"
_PPL_BIN_CAP = 163839
#: tercile crossing estimate from the binned CDF — same in-bin linear
#: interpolation as aggregates._qbin_est, one spelling for both engines.
_PPL_CUT = (
    "min(CASE WHEN cum >= {q} * total AND cum - cnt < {q} * total"
    " THEN bin * {w} + ({q} * total - (cum - cnt)) / cnt * {w} END)"
)


def _ppl_cut(q: str) -> str:
    return _PPL_CUT.format(q=q, w=_PPL_BIN_W)


@query(
    "ccnet_perplexity_buckets",
    oracle=f"""
    WITH {_NLL_CTES},
    binned AS (
        SELECT doc_id, n_tokens, nll,
               least(CAST(floor(nll / {_PPL_BIN_W}) AS BIGINT), {_PPL_BIN_CAP}) AS bin
        FROM nll_per_doc
    ),
    hist AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
    cdf AS (
        SELECT bin, CAST(cnt AS DOUBLE) AS cnt,
               CAST(SUM(cnt) OVER (ORDER BY bin) AS DOUBLE) AS cum,
               CAST(SUM(cnt) OVER () AS DOUBLE) AS total
        FROM hist
    ),
    cuts AS (
        SELECT {_ppl_cut('CAST(1.0 AS DOUBLE) / 3.0')} AS t33,
               {_ppl_cut('CAST(2.0 AS DOUBLE) / 3.0')} AS t67
        FROM cdf
    )
    SELECT CASE WHEN nll <= t33 THEN 'head'
                WHEN nll <= t67 THEN 'middle'
                ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(nll AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
               AS mean_nll
    FROM binned CROSS JOIN cuts
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("textstats", "language-model", "quality", "sketch", "llm-pipeline"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al., LREC 2020): bucket
    every document by LM perplexity terciles — 'head' (most fluent
    third, usually kept), 'middle' (kept or sampled), 'tail' (most
    surprising third, dropped or down-sampled). The LM is the corpus's
    own unigram model (:func:`doc_unigram_nll`'s scoring chain,
    verbatim); the tercile cutoffs come from a BINNED NLL CDF — the
    mergeable-histogram quantile (1e-4-nat bins capped at 163,839 →
    a 163,840-bin space; in-bin linear interpolation), not a global
    sort, so the cutoff step is O(nonempty bins ≤ distinct rounded
    NLLs) after a partial-aggregable histogram even when documents
    number in the billions. Output: the three buckets' doc counts,
    token counts, and decimal-staged mean NLL — the numbers that decide
    the keep/sample/drop policy.

    Determinism: NLLs are the rounded-6 doubles the oracle shares; bins
    and counts are exact ints; the cutoffs and bucket comparisons are
    one spelled expression evaluated on identical doubles in both
    engines. The CDF window is order-only but runs over the histogram,
    bounded by the literal 163,840-bin space (nonempty bins only —
    allowlisted class).
    """
    from pyspark.sql import Window

    per_doc = doc_unigram_nll(spark, sf_dir, top=None)
    binned = per_doc.select(
        "doc_id",
        "n_tokens",
        "nll",
        F.least(
            F.floor(F.col("nll") / F.lit(float(_PPL_BIN_W))).cast("bigint"),
            F.lit(_PPL_BIN_CAP),
        ).alias("bin"),
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bin")
    wtot = Window.partitionBy()
    cdf = hist.select(
        "bin",
        F.col("cnt").cast("double").alias("cnt"),
        F.sum("cnt").over(wcum).cast("double").alias("cum"),
        F.sum("cnt").over(wtot).cast("double").alias("total"),
    )
    cuts = cdf.agg(
        F.expr(_ppl_cut("CAST(1.0 AS DOUBLE) / 3.0")).alias("t33"),
        F.expr(_ppl_cut("CAST(2.0 AS DOUBLE) / 3.0")).alias("t67"),
    )
    bucket = (
        F.when(F.col("nll") <= F.col("t33"), "head")
        .when(F.col("nll") <= F.col("t67"), "middle")
        .otherwise("tail")
    )
    return (
        binned.crossJoin(F.broadcast(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("nll").cast("decimal(30,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_nll"),
        )
        .orderBy("bucket")
    )


@query(
    "vocab_coverage_topk",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    pt AS (
        SELECT term, COUNT(*) AS stf FROM toks WHERE term <> '' GROUP BY term
    ),
    ranked AS (
        SELECT stf, ROW_NUMBER() OVER (ORDER BY stf DESC, term) AS rnk,
               SUM(stf) OVER () AS total
        FROM pt
    )
    SELECT k, CAST(COALESCE(SUM(stf), 0) AS BIGINT) AS covered_tokens,
           round(COALESCE(SUM(stf), 0) / CAST(MIN(total_all) AS DOUBLE), 6)
               AS coverage
    FROM (SELECT unnest([100, 1000, 10000]) AS k)
    LEFT JOIN (SELECT rnk, stf, total AS total_all FROM ranked) r
        ON r.rnk <= k
    GROUP BY k
    ORDER BY k
    """,
    tags=("textstats", "vocabulary", "llm-pipeline"),
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all corpus tokens a
    top-k frequency vocabulary covers, for k ∈ {100, 1k, 10k} — the
    tokenizer-budget planning number (how big must the vocab be before
    OOV rate is acceptable).

    Shape: one tokenize scan → term partial-agg shuffle → the REST runs
    on a BOUNDED slice of the vocabulary: only ranks ≤ max(k)=10 000 can
    contribute to any coverage bucket, so the top-10k terms are taken
    with orderBy+limit — planned as TakeOrdered (map-side partial top-k
    per partition, k-row driver merge; never a vocabulary-wide sort —
    a 100 TB web crawl's whitespace vocabulary is 10⁸⁺ junk-inflated
    terms, and the old |vocab|-row window was a single-task sort of
    it) — and the row_number window ranks just those ≤10 000 survivor
    rows. Bucket each term by the smallest k that includes it, then a
    3-group rollup turns per-bucket subtotals into cumulative coverage.
    Counts are exact ints; the one double division is rounded once —
    deterministic across engines (the (stf DESC, term ASC) order is a
    unique total order, so the top-k cut is reproducible).
    """
    d = table(spark, sf_dir, "documents")
    pt = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("stf"))
    )
    from pyspark.sql import Window

    topk = pt.orderBy(F.desc("stf"), F.asc("term")).limit(10000)
    ranked = topk.select(
        "stf",
        F.row_number()
        .over(Window.orderBy(F.desc("stf"), F.asc("term")))
        .alias("rnk"),
    )
    total = pt.agg(F.sum("stf").alias("total"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(100), F.lit(1000), F.lit(10000))).alias("k")
    )
    covered = (
        ks.join(ranked, ranked.rnk <= ks.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("stf"), F.lit(0)).cast("bigint").alias("covered_tokens"))
    )
    return (
        covered.crossJoin(F.broadcast(total))
        .select(
            "k",
            "covered_tokens",
            F.round(F.col("covered_tokens") / F.col("total").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


_BM25_TERMS = ("hash", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
#: per-term score quantum for order-independent summation (see
#: operators/graph.py for the same convention)
_BM25_Q = "1000000000000"


#: the BM25 scorer as a DuckDB CTE chain ending in ``bm_scores(doc_id,
#: score)`` — shared verbatim by the bm25_topk and rrf_hybrid_search
#: oracles (one spelling, one place to diverge from the engine — never).
_BM25_ORACLE_CTES = f"""
    toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    scal AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN ('hash', 'join', 'stream')
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               FLOOR(
                   ln(1 + (scal.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * dl.dl / scal.avgdl))
                   * {_BM25_Q}.0
               )::DECIMAL(38,0) AS qscore
        FROM tf
        JOIN df ON tf.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN scal
    ),
    bm_scores AS (
        SELECT doc_id,
               round(CAST(SUM(qscore) AS DOUBLE) / {_BM25_Q}.0, 6) AS score
        FROM scored GROUP BY doc_id
    )"""


@query(
    "bm25_topk",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES}
    SELECT doc_id, score FROM bm_scores
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    tags=("textstats", "search", "bm25", "llm-pipeline"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-20 documents for a literal term query — the
    ranking function behind every lexical search / hybrid-retrieval
    pipeline, which the corpus tier lacked (tfidf_top_terms weights the
    VOCABULARY; this ranks DOCUMENTS for a query).

    Two deliberate tokenize branches (NOT the doc_unigram_nll shared
    exchange — evaluated and rejected here): the dl branch must see
    every token but its per-doc count partial-aggregates to one row per
    (doc × partition) before its shuffle, while the tf branch filters
    to the query terms BEFORE its aggregate so its scan+explode work and
    posting shuffle cover only matches. Sharing one (doc, term)
    exchange would save a tokenize pass but force a corpus-sized
    distinct-terms shuffle that the direct dl avoids — and Catalyst
    pushes the grouping-key filter below the aggregate anyway, splitting
    the subtrees. df is |query| rows (bounded by the literal term list →
    broadcast is size-safe), N/avgdl ride a broadcast single-row
    aggregate, and the per-doc score join shuffles O(matching docs).
    Per-term scores are a fixed sequence of double ops from exact
    integers; the cross-term sum is floor-quantized to 1e-12 and summed
    as exact decimal, so the final score is bit-identical in both
    engines at any partition count. Top-20 is TakeOrdered with a doc_id
    tiebreak. At 100 TB: posting-list pruning at the scan + two
    partial-aggregable shuffles — the classic inverted-index build cost,
    per query term, without materializing an index.
    """
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score frame for the literal query terms — the
    shared scorer behind :func:`bm25_topk` and the RRF fusion tier (only
    docs matching ≥1 query term appear, the standard posting semantics)."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    scal = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * (F.col("tf") * (_BM25_K1 + 1)) / norm
    q = F.lit(float(_BM25_Q))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            F.floor(term_score * q).cast("decimal(38,0)").alias("qscore"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("qscore").cast("double") / q, 6).alias("score")
    )


_RRF_K = 60          # the canonical damping constant (Cormack et al. SIGIR'09)
_RRF_DEPTH = 50      # per-system candidate depth
_RRF_QVEC = 0        # embeddings.vec_id used as the dense query vector


@query(
    "rrf_hybrid_search",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES},
    bm_top AS (
        SELECT doc_id, score FROM bm_scores
        ORDER BY score DESC, doc_id LIMIT {_RRF_DEPTH}
    ),
    bm_rank AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
        FROM bm_top
    ),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QVEC}),
    cos_all AS (
        SELECT e.vec_id AS doc_id,
               {duckdb_cosine('qv.embedding', 'e.embedding')} AS cosine
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id != {_RRF_QVEC}
    ),
    cos_top AS (
        SELECT doc_id, cosine FROM cos_all
        ORDER BY cosine DESC, doc_id LIMIT {_RRF_DEPTH}
    ),
    cos_rank AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS cos_rank
        FROM cos_top
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           b.bm25_rank, c.cos_rank,
           round(COALESCE(1.0 / ({_RRF_K} + b.bm25_rank), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + c.cos_rank), 0.0), 12) AS rrf_score
    FROM bm_rank b FULL OUTER JOIN cos_rank c ON b.doc_id = c.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 20
    """,
    tags=("textstats", "search", "hybrid", "rrf", "llm-pipeline"),
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    Büttcher, SIGIR'09): fuse a LEXICAL ranking (BM25 over the query
    terms — the :func:`bm25_topk` scorer verbatim) with a DENSE ranking
    (cosine against a query embedding — ``vec_id`` 0, the
    ``documents``/``embeddings`` tables share one id space) by
    ``score(d) = Σ_systems 1/(60 + rank_s(d))`` over each system's
    top-50, the de-facto standard first stage of every
    RAG / search pipeline that mixes keyword and vector indexes.

    Determinism: BM25 scores are decimal-quantized, cosines round to
    9 dp, both ranks break ties by doc_id → integer ranks are identical
    in both engines, and the fused score is the same fixed sequence of
    double ops (coalesce(1/(60+r),0) + coalesce(...), rounded to 12).

    Scale design (100 TB): each system reduces to its top-k with
    TakeOrdered (parallel partial top-k, no global sort); the rank
    row_number windows run over the ≤50-row survivor sets
    (bounded by the query literal — allowlisted in the plan audit), and
    the fusion is a 50×2-row full outer join. Corpus-side
    cost is one posting scan + one embedding scan; nothing quadratic,
    nothing collected.
    """
    from pyspark.sql import Window

    from .similarity import _embeddings_normed, spark_cosine_prenorm

    bm_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
    )
    bm_rank = bm_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("bm25_rank"),
    )
    e = _embeddings_normed(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("emb_d").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cos_top = (
        e.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(spark_cosine_prenorm("q_emb", "emb_d", "q_nrm", "nrm")).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
    )
    cos_rank = cos_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("doc_id")))
        .cast("long")
        .alias("cos_rank"),
    )
    k = F.lit(float(_RRF_K))
    fused = bm_rank.join(cos_rank, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (k + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (k + F.col("cos_rank")), F.lit(0.0)),
            12,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(20)


#: Count-min sketch shape: 4 hash rows × 1024 buckets. The row hashes
#: reuse the fixed universal-hash family (functions/hashing.py
#: MINHASH_A/B, seed 42) — pairwise-independent is exactly the CMS
#: requirement, and sharing the constants keeps engine and oracle
#: bit-identical by construction.
_CMS_D = 4
_CMS_W = 1024


def _cms_bucket_sql(j: int, hash_expr: str) -> str:
    """Row-j bucket of a token hash, dialect-neutral arithmetic."""
    return f"({minhash_perm(j, hash_expr)} % {_CMS_W})"


def _cms_oracle() -> str:
    hv = md5int_duckdb("term")
    cells = "\n        UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_bucket_sql(j, 'hv')} AS bucket, COUNT(*) AS c"
        " FROM hashed GROUP BY 2"
        for j in range(_CMS_D)
    )
    probes = "\n        UNION ALL ".join(
        f"SELECT term, true_cnt, {j} AS j, {_cms_bucket_sql(j, 'hv')} AS bucket FROM eh"
        for j in range(_CMS_D)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    hashed AS (SELECT term, {hv} AS hv FROM toks),
    cells AS (
        {cells}
    ),
    exact AS (
        SELECT term, COUNT(*) AS true_cnt FROM toks
        GROUP BY term ORDER BY true_cnt DESC, term LIMIT 20
    ),
    eh AS (SELECT term, true_cnt, {hv} AS hv FROM exact),
    probes AS (
        {probes}
    )
    SELECT p.term, p.true_cnt, MIN(c.c) AS cms_est
    FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
    GROUP BY p.term, p.true_cnt
    """


@query(
    "cms_heavy_hitters",
    oracle=_cms_oracle(),
    tags=("textstats", "sketch", "approx", "mergeable", "llm-pipeline"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, read back at the
    true top-20 tokens: (term, exact count, CMS estimate) — the
    mergeable heavy-hitter counter (Cormode & Muthukrishnan '05) beside
    the HLL distinct tier.

    Unlike the HLL tier (engine-specific sketch binaries, rows-only
    check), CMS is plain integer arithmetic over portable hashes, so
    the ENTIRE sketch — build and probe — is hash-checked against
    DuckDB running the same construction. The sketch is one
    partial-aggregable pass: each token posexplodes to its 4 (row,
    bucket) cells and the groupBy carries at most d×w = 4096 cells per
    partition into the shuffle — the sketch table is
    SIZE-INDEPENDENT of the corpus, which is the whole point: at
    100 TB the exchange still moves ≤4096-row partials, and two
    corpora's sketches merge by adding cells (tested). Probing joins
    the candidates' 4 cells against the sketch (broadcast: bounded
    d×w by construction) and takes MIN over rows. CMS guarantees
    est ≥ true always, est ≤ true + εN w.h.p. — both pinned by test.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
    h = md5int_spark("term")
    buckets = F.array(*[F.expr(_cms_bucket_sql(j, h)) for j in range(_CMS_D)])
    cells = (
        toks.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        toks.groupBy("term")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("term"))
        .limit(20)
    )
    probes = exact.select(
        "term", "true_cnt", F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("term", "true_cnt")
        .agg(F.min("c").alias("cms_est"))
    )


_BPE_ROUNDS = 10


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = _BPE_ROUNDS
) -> tuple[DataFrame, list[tuple]]:
    """Distributed BPE vocabulary training (Sennrich et al. '16): learn
    ``rounds`` merge rules from the corpus by iterated most-frequent-
    adjacent-pair counting — THE iterative MapReduce workload of the
    LLM-tokenizer pipeline, inexpressible in the single-round reference.

    Scale design: the corpus is scanned ONCE, collapsing to the
    (word, count) frequency table — bounded by vocabulary size, not
    corpus size, which is what makes BPE trainable at 100 TB: every
    merge round thereafter runs over the vocab-bounded symbol table
    (weighted pair explode → partial-aggregated pair counts → global
    argmax), never re-touching the corpus. Per round the driver
    collects exactly ONE rule row (the argmax — O(rounds) driver
    traffic, the same bounded-collect budget as dedup's fixpoint
    checksum); the merge is applied executor-side as a higher-order
    array fold (greedy left-to-right, the standard apply order), and
    the symbol table is re-materialized per round so plan depth stays
    constant instead of nesting ``rounds`` lambda layers.

    Determinism: pair counts are integer sums; the argmax tie-break is
    (count DESC, left ASC, right ASC) — total order, so the learned
    merge sequence is identical at any partition count and any engine.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.expr("filter(split(w, ''), x -> x <> '')").alias("syms"), "cnt"
        )
        .localCheckpoint(eager=True)
    )
    pair = (
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
    )
    merges = []
    for r in range(rounds):
        top = (
            words.filter(F.size("syms") >= 2)
            .select(F.explode(F.expr(pair)).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0].a, top[0].b, top[0].c
        merges.append((r + 1, a, b, a + b, int(c)))

        def make_step(a, b):
            def step(acc, x):
                return (
                    F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(a))
                        & (x == F.lit(b)),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                        ),
                    )
                    .otherwise(F.concat(acc, F.array(x)))
                )

            return step

        step = make_step(a, b)

        words = words.select(
            F.aggregate(
                "syms", F.expr("CAST(array() AS ARRAY<STRING>)"), step
            ).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=True)
    return words, merges


@query(
    "bpe_train_merges",
    oracle=None,  # iterative argmax sequence — not one SQL expression; the
    # test pins every learned rule against an independent pure-Python BPE
    # reference on the identical word-frequency table.
    tags=("textstats", "iterative", "tokenizer", "llm-pipeline"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of :func:`_bpe_train` (10 merge rounds): the
    learned merge-rule table."""
    _, merges = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        schema="merge_rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT",
    )


@query(
    "bpe_encode_stats",
    oracle=None,  # consumes the trained merges (iterative, see above); the
    # test pins the stats against the pure-Python reference's encoding.
    tags=("textstats", "iterative", "tokenizer", "llm-pipeline"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE vocabulary back to the corpus — the second
    half of the tokenizer lifecycle (train → encode) — and report the
    corpus-level budget stats a data pipeline denominates in: word
    occurrences, character volume, BPE token count, and the compression
    ratio (chars per BPE token).

    The encode costs NOTHING beyond training here: the training loop's
    final symbol table IS the encoded vocabulary (each word's symbols
    after all merges), so corpus totals are one weighted aggregate over
    the vocab-bounded table — occurrence-weighted sums of per-word
    symbol counts. At 100 TB the same holds: encoding new text is a
    broadcast-join of the (word → symbols) table against the corpus,
    never a re-scan per merge rule. All outputs are exact integer sums
    plus one division — bit-deterministic.
    """
    words, _ = _bpe_train(spark, sf_dir)
    return words.agg(
        F.count("*").alias("n_distinct_words"),
        F.sum("cnt").alias("n_word_occurrences"),
        F.sum(F.col("cnt") * F.length(F.concat_ws("", F.col("syms")))).alias(
            "total_chars"
        ),
        F.sum(F.col("cnt") * F.size("syms")).alias("total_bpe_tokens"),
    ).select(
        "n_distinct_words",
        "n_word_occurrences",
        "total_chars",
        "total_bpe_tokens",
        (
            F.col("total_chars").cast("double") / F.col("total_bpe_tokens")
        ).alias("chars_per_token"),
    )


@query(
    "corpus_mix_entropy_kl",
    oracle=f"""
    WITH langs AS (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ),
    probs AS (
        SELECT lang, cnt,
               CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS p,
               1.0 / CAST(COUNT(*) OVER () AS DOUBLE) AS q
        FROM langs
    )
    SELECT CAST(COUNT(*) AS INT) AS n_langs,
           {sql_dsum('-p * ln(p)', 12)} AS entropy_nats,
           {sql_dsum('p * ln(p / q)', 12)} AS kl_uniform_nats
    FROM probs
    """,
    tags=("textstats", "statistics", "mixing", "llm-pipeline"),
)
def corpus_mix_entropy_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diagnostics: Shannon entropy of the language
    distribution and its KL divergence from the uniform mix — the
    numbers a training-data pipeline watches to keep a blended corpus
    from silently collapsing onto one source (entropy ↓) or drifting
    from the intended mixture (KL ↑); the measurement companion to
    ``mixing_rates_by_lang``'s rate table.

    One partial-aggregable pass to per-language counts; the total and
    language-count marginals are window sums over that ≤|langs|-row
    frame (never a second corpus scan). Each p·ln(p/q) term is a fixed
    scalar sequence; the term sums — the only float aggregations — are
    decimal-staged at 1e-12, which also absorbs any last-ULP libm
    disagreement between engines' ln (the same discipline that keeps
    bm25_topk and doc_unigram_nll hash-identical).
    """
    d = table(spark, sf_dir, "documents")
    langs = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    probs = langs.select(
        (F.col("cnt").cast("double") / F.sum("cnt").over(w_all).cast("double")).alias("p"),
        (F.lit(1.0) / F.count("*").over(w_all).cast("double")).alias("q"),
    )
    return probs.agg(
        F.count("*").cast("int").alias("n_langs"),
        dsum(-F.col("p") * F.log(F.col("p")), 12).alias("entropy_nats"),
        dsum(F.col("p") * F.log(F.col("p") / F.col("q")), 12).alias("kl_uniform_nats"),
    )


#: temperature-sampling exponent (the mT5/XLM-R standard α = 0.7) and
#: the fixed-point quantum that stages each pow() output before the
#: cross-language normalizer sum (the bm25/graph floor-staging rule).
_MIX_ALPHA = 0.7
_MIX_Q = "1000000000000"


@query(
    "mixing_weights_temperature",
    oracle=f"""
    WITH langs AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    probs AS (
        SELECT lang, n_docs,
               CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS p
        FROM langs
    ),
    staged AS (
        SELECT lang, n_docs, p,
               CAST(FLOOR(pow(p, {_MIX_ALPHA}) * {_MIX_Q}.0) AS DECIMAL(38,0)) AS pw
        FROM probs
    )
    SELECT lang, n_docs,
           round(p, 9) AS p,
           round(CAST(pw AS DOUBLE) / CAST(SUM(pw) OVER () AS DOUBLE), 9) AS weight,
           round((CAST(pw AS DOUBLE) / CAST(SUM(pw) OVER () AS DOUBLE)) / p, 6)
               AS upsample_factor
    FROM staged
    ORDER BY lang
    """,
    tags=("textstats", "mixing", "sampling", "llm-pipeline"),
)
def mixing_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing weights (the mT5 / XLM-R
    standard, α = 0.7): sampling weight q_i ∝ p_i^α, where p_i is each
    language's share of the corpus — the knob that upsamples tail
    languages (upsample_factor > 1) and downsamples the head without
    flattening the mix entirely (α = 0 would be uniform, α = 1 the raw
    mix). The emitted table IS the sampler configuration a training
    pipeline feeds to its per-source rates — the prescription companion
    to ``corpus_mix_entropy_kl``'s diagnostics and
    ``mixing_rates_by_lang``'s observed rates.

    One partial-aggregable pass to per-language counts; everything
    after is window math over the ≤|langs|-row frame. Each pow() output
    is floor-staged at 1e-12 before the normalizer sum (the bm25/graph
    convention), so the weights are bit-identical across engines.
    """
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    langs = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    probs = langs.select(
        "lang",
        "n_docs",
        (
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all).cast("double")
        ).alias("p"),
    )
    staged = probs.withColumn(
        "pw",
        F.floor(F.pow("p", F.lit(_MIX_ALPHA)) * F.lit(float(_MIX_Q))).cast(
            "decimal(38,0)"
        ),
    )
    weight = F.col("pw").cast("double") / F.sum("pw").over(w_all).cast("double")
    return staged.select(
        "lang",
        "n_docs",
        F.round("p", 9).alias("p"),
        F.round(weight, 9).alias("weight"),
        F.round(weight / F.col("p"), 6).alias("upsample_factor"),
    ).orderBy("lang")


@query(
    "docs_repetition_filter",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(lower(text), '\\s+'),
                                  t -> regexp_replace(t, '[.,!?;:"''-]', '', 'g')),
                   t -> length(t) > 0) AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(t) AS w,
               unnest(generate_series(1, len(t))) AS p
        FROM toks
    ),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM pos GROUP BY doc_id, w),
    wstats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               COUNT(*) AS n_distinct_words, MAX(c) AS top_word_c
        FROM wc GROUP BY doc_id
    ),
    big AS (
        SELECT doc_id,
               w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY p) AS bg
        FROM pos
        QUALIFY LEAD(w) OVER (PARTITION BY doc_id ORDER BY p) IS NOT NULL
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
    bstats AS (SELECT doc_id, MAX(c) AS top_bigram_c FROM bc GROUP BY doc_id)
    SELECT w.doc_id, w.n_words, w.n_distinct_words,
           CAST(w.n_words - w.n_distinct_words AS DOUBLE) / w.n_words
             AS dup_word_ratio,
           CAST(w.top_word_c AS DOUBLE) / w.n_words AS top_word_ratio,
           CASE WHEN w.n_words > 1
                THEN CAST(COALESCE(b.top_bigram_c, 0) AS DOUBLE) / (w.n_words - 1)
                END AS top_bigram_ratio,
           (CAST(w.top_word_c AS DOUBLE) / w.n_words > 0.12
            OR (w.n_words > 1 AND
                CAST(COALESCE(b.top_bigram_c, 0) AS DOUBLE) / (w.n_words - 1) > 0.08))
             AS flagged
    FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id
    """,
    tags=("text-analysis", "llm-pipeline", "quality-filter"),
)
def docs_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (Rae et al. 2021 §A1.1): per
    document, the duplicate-word mass, the most-frequent-word share, and
    the most-frequent-bigram share — then a flag for documents whose
    repetition exceeds the quality thresholds (top word > 12 % of
    tokens, or top bigram > 8 % of bigrams). Boilerplate, keyword-stuffed
    and template-generated pages light up on exactly these ratios.

    NOT a twin of ``corpus.repetition_filter``: that query is the
    corpus-health ROLLUP (per-language flag rates from trigram-dup
    fraction + overlapping-bigram token coverage, raw-space-split
    tokens); this one is the row-level GATE — one output row per
    document with the word-grain ratios a filtering pipeline joins back
    onto the corpus to drop rows (the shape ``corpus_dedup_apply`` uses
    for dedup verdicts). Different grain, different metric family,
    different tokenizer (the engine-wide normalization here).

    Tokenization is the engine-wide normalization (functions/text.py);
    bigrams come from ``zip_with`` over two array slices — derived
    inside the row, no positional explode-and-window pass. The only wide
    ops are the two (doc_id, term)-keyed counts, both partial-aggregable
    and embarrassingly parallel at 100 TB. Ratios are integer-derived
    doubles (single divisions — bit-deterministic); the thresholds are
    exact binary literals.
    """
    from ..functions.text import word_tokens

    d = table(spark, sf_dir, "documents").select(
        "doc_id", word_tokens("text").alias("t")
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("t", 1, n - 1),
            F.slice("t", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wc = (
        d.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("c").alias("top_word_c"),
    )
    bstats = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_c"))
    )
    j = wstats.join(bstats, "doc_id", "left")
    top_word_ratio = F.col("top_word_c").cast("double") / F.col("n_words")
    top_bigram_ratio = F.when(
        F.col("n_words") > 1,
        F.coalesce(F.col("top_bigram_c"), F.lit(0)).cast("double")
        / (F.col("n_words") - 1),
    )
    return j.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        (
            (F.col("n_words") - F.col("n_distinct_words")).cast("double")
            / F.col("n_words")
        ).alias("dup_word_ratio"),
        top_word_ratio.alias("top_word_ratio"),
        top_bigram_ratio.alias("top_bigram_ratio"),
        (
            (top_word_ratio > 0.12)
            | ((F.col("n_words") > 1) & (top_bigram_ratio > 0.08))
        ).alias("flagged"),
    )


_HN_DENSE_K = 20   # dense top-k treated as positives (excluded)
_HN_TOP = 20       # hard negatives emitted


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH {_BM25_ORACLE_CTES},
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QVEC}),
    dense AS (
        SELECT e.vec_id AS doc_id,
               {duckdb_cosine('qv.embedding', 'e.embedding')} AS cosine
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id != {_RRF_QVEC}
    ),
    positives AS (
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rn
            FROM dense
        ) WHERE rn <= {_HN_DENSE_K}
    )
    SELECT b.doc_id, b.score AS bm25_score, d.cosine
    FROM bm_scores b
    JOIN dense d ON d.doc_id = b.doc_id
    LEFT JOIN positives p ON p.doc_id = b.doc_id
    WHERE p.doc_id IS NULL
    ORDER BY b.score DESC, b.doc_id
    LIMIT {_HN_TOP}
    """,
    tags=("textstats", "search", "training-data", "llm-pipeline"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retriever training (the DPR/contrastive
    recipe, Karpukhin et al. EMNLP'20): documents the LEXICAL ranker
    scores highly for the query but that are NOT among the dense
    ranker's top-``_HN_DENSE_K`` (= 20 as shipped) "positives" — exactly the
    confusable-but-wrong examples a bi-encoder needs as negatives.
    Composes the engine's two rankers over the shared doc-id space
    (the :func:`_bm25_scored` scorer; cosine against the ``vec_id`` 0
    query embedding) and emits the top-{_HN_TOP} by BM25 with the
    cosine attached — the training-pair table a contrastive dataloader
    consumes.

    Plan shape: one posting scan (BM25 side, query-term-pruned), one
    embedding scan (dense side, 1-row query broadcast), a broadcast
    anti-join against the _HN_DENSE_K-row positive set, and
    TakeOrdered — no global sort, nothing quadratic. Determinism:
    decimal-staged BM25 scores, round-9 cosines, id tie-breaks.
    """
    from pyspark.sql import Window

    from .similarity import _embeddings_normed, spark_cosine_prenorm

    e = _embeddings_normed(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("emb_d").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dense = (
        e.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(spark_cosine_prenorm("q_emb", "emb_d", "q_nrm", "nrm")).alias(
                "cosine"
            ),
        )
    )
    positives = (
        dense.orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(_HN_DENSE_K)
        .select("doc_id")
    )
    return (
        _bm25_scored(spark, sf_dir)
        .withColumnRenamed("score", "bm25_score")
        .join(dense, "doc_id")
        .join(F.broadcast(positives), "doc_id", "left_anti")
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(_HN_TOP)
        .select("doc_id", "bm25_score", "cosine")
    )
