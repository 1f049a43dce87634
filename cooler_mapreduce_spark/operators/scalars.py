"""Scalar-function suites: string / date-time / math / array / JSON.

The reference's only "functions" are whatever Python its user map_fn runs
per record (lower/strip/split/float — SURVEY.md §2.4). Here each family is
a projection of built-in Catalyst expressions — whole-stage-codegen'd,
vectorized over parquet, no Python in the hot path.

Oracle-parity notes baked into the choices below:

- transcendentals (exp/ln/sin…) are *not* bit-specified across engines →
  kept out of oracle-checked projections (sqrt IS correctly rounded per
  IEEE-754, so it stays);
- Spark ``dayofweek`` is Sunday=1 while DuckDB's is Sunday=0 → expose ISO
  weekday (Mon=1…Sun=7), identical in both;
- JSON extraction goes through string-typed paths then exact integer
  casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.timeutil import wall_trunc
from ..registry import query
from ..sources.catalog import table


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           contains(p_name, 'spark') AS mentions_spark,
           regexp_extract(p_type, '^([A-Za-z]+)', 1) AS type_head,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim(p_name) AS name_trim,
           reverse(p_brand) AS brand_rev,
           split_part(p_type, ' ', 1) AS type_first_word
    FROM part
    """,
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-function suite over part (upper/length/substring/concat/
    replace/contains/regexp_extract/lpad/trim/reverse/split_part)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").contains("spark").alias("mentions_spark"),
        F.regexp_extract("p_type", r"^([A-Za-z]+)", 1).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim("p_name").alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           quarter(o_orderdate) AS order_quarter,
           isodow(o_orderdate) AS order_isodow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m') AS order_ym
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time suite over orders (extract/trunc/interval arithmetic/
    diff/format). ISO weekday and explicit day-diff keep both engines on
    identical integer conventions."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.weekday("o_orderdate") + 1).alias("order_isodow"),
        wall_trunc("o_orderdate", "month").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_weeks,
           round(l_quantity / 4.0, 2) AS qty_quarters,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
           CAST(sign(l_discount - l_tax) AS DOUBLE) AS disc_vs_tax,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math suite over lineitem — every op here is IEEE-exact or integral
    (abs/floor/ceil/round/sqrt/mod/sign/greatest/least), so per-row oracle
    hashes match bit-for-bit. Transcendentals (exp/ln) are excluded by
    design: libm results differ across engines in the last ULP."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_weeks"),
        # round() is oracle-safe only on values with an exact binary
        # representation at the target scale (x/4 → .0/.25/.5/.75): rounding
        # an inexact product differs across engines when the true value
        # straddles a decimal tie (Spark rounds the shortest decimal repr,
        # DuckDB the raw double).
        F.round(F.col("l_quantity") / 4.0, 2).alias("qty_quarters"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("disc_vs_tax"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "array_functions",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           len(words) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           array_to_string(list_sort(list_distinct(words)), ',') AS vocab,
           len(list_distinct(words)) AS n_distinct,
           list_contains(words, 'spark') AS has_spark,
           array_to_string(words[1:3], '|') AS head3
    FROM t
    """,
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array suite over tokenized documents (size/index/sort/distinct/
    contains/slice/join). Arrays stay columnar end-to-end — no explode
    needed for per-array scalars."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ", -1).alias("words"))
    return t.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.col("words").getItem(0).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
        F.array_join(F.array_sort(F.array_distinct("words")), ",").alias("vocab"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.array_contains("words", "spark").alias("has_spark"),
        F.array_join(F.slice("words", 1, 3), "|").alias("head3"),
    )


@query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    """,
    tags=("scalar", "json"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column — string-path
    extraction + exact integer cast (identical NULL semantics for missing
    fields in both engines)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` shreds the props payload into the binary variant
    encoding once per row, ``variant_get`` extracts a typed field, and
    an ordinary aggregate rolls it up per event type.

    Versus per-path ``get_json_object`` string re-parsing (the
    :func:`json_functions` tier), variant parses each payload ONCE and
    serves any number of typed path extractions from the encoded form —
    the right engine-native shape for heterogeneous event payloads at
    100 TB (and what columnar variant shredding optimizes further on
    disk). The DuckDB oracle states the same result through its JSON
    functions; integer field values make the rollup exact in both
    engines.
    """
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS key_list,
           json_extract_string(props, '$.k') AS k_str,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS has_k
    FROM events
    """,
    tags=("scalar", "map", "json"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType suite: parse the JSON props payload into a
    ``map<string,string>`` column, then key inventory / sorted key list /
    typed lookup / membership — the schema-flexible column pattern
    (absent from the reference, whose values are opaque pickles;
    SURVEY.md §1.2). The map stays columnar; no explode."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    t = ev.select("event_id", m.alias("m"))
    return t.select(
        "event_id",
        F.size("m").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("key_list"),
        F.element_at("m", "k").alias("k_str"),
        F.array_contains(F.map_keys("m"), "k").cast("int").alias("has_k"),
    )


@query(
    "conditional_bitwise_functions",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent,
           o_orderkey & 255 AS key_low_byte,
           o_orderkey | 1 AS key_odd,
           xor(o_orderkey, 21845) AS key_xor,
           o_orderkey << 2 AS key_shl,
           o_orderkey >> 3 AS key_shr,
           bit_count(o_orderkey) AS key_popcount
    FROM orders
    """,
    tags=("scalar", "conditional", "bitwise"),
)
def conditional_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (coalesce/nullif/if/case) and bitwise (and/or/xor/
    shifts/popcount) scalar suites — pure codegen expressions; bitwise
    integer ops are exact in any engine."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("key_low_byte"),
        F.col("o_orderkey").bitwiseOR(F.lit(1)).alias("key_odd"),
        F.col("o_orderkey").bitwiseXOR(F.lit(21845)).alias("key_xor"),
        F.shiftleft(F.col("o_orderkey"), 2).alias("key_shl"),
        F.shiftright(F.col("o_orderkey"), 3).alias("key_shr"),
        F.bit_count("o_orderkey").alias("key_popcount"),
    )


@query(
    "higher_order_array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(words, w -> length(w)), ',') AS word_lens,
           COALESCE(array_to_string(list_filter(words, w -> length(w) > 5), ','),
                    '') AS long_words,
           list_reduce(list_prepend(0, list_transform(words, w -> length(w))),
                       (a, b) -> a + b) AS total_chars,
           len(list_filter(words, w -> w LIKE '%e%')) AS n_with_e
    FROM t
    """,
    tags=("scalar", "higher-order", "lambda"),
)
def higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays (transform / filter /
    aggregate) — Catalyst evaluates the lambdas inside codegen, no
    Python involved; integer folds are order-fixed left folds in both
    engines, so results are exact."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("words"))
    return t.select(
        "doc_id",
        F.array_join(
            F.transform("words", lambda w: F.length(w)).cast("array<string>"), ","
        ).alias("word_lens"),
        F.array_join(F.filter("words", lambda w: F.length(w) > 5), ",").alias("long_words"),
        F.aggregate(
            F.transform("words", lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter("words", lambda w: w.like("%e%"))).alias("n_with_e"),
    )


@query(
    "json_parse_quality",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN substring(props, 3) ELSE props END AS payload
        FROM events
    )
    SELECT CASE WHEN json_valid(payload) THEN 'ok' ELSE 'corrupt' END AS parse_status,
           COUNT(*) AS n,
           MIN(event_id) AS first_event
    FROM raw GROUP BY 1
    """,
    tags=("scalar", "json", "data-quality"),
)
def json_parse_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record accounting: classify every payload as parseable
    or corrupt and count each class — the ingest-gate report that decides
    whether a batch is quarantined. Corruption is injected
    deterministically (every 10th payload truncated) so the negative
    path is guaranteed; validity comes from a full JSON parse
    (``from_json`` PERMISSIVE semantics: unparseable → NULL struct),
    evaluated inside codegen, one scan, one 2-group aggregate.
    """
    ev = table(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.expr("substring(props, 3)"))
        .otherwise(F.col("props"))
        .alias("payload"),
    )
    parsed = raw.select(
        "event_id",
        F.when(F.from_json("payload", "map<string,string>").isNotNull(), "ok")
        .otherwise("corrupt")
        .alias("parse_status"),
    )
    return parsed.groupBy("parse_status").agg(
        F.count("*").alias("n"), F.min("event_id").alias("first_event")
    )


@query(
    "url_functions",
    oracle="""
    WITH u AS (
        SELECT 'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param,
           COUNT(*) AS n_docs,
           MIN(regexp_extract(url, 'https://[^/]+(/[^?]*)', 1)) AS first_path
    FROM u GROUP BY 1, 2
    """,
    tags=("scalar", "url", "web-corpus"),
)
def url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — the per-document provenance extraction every web
    corpus pipeline runs (host for domain-level filtering/dedup, query
    params for variant collapsing).  URLs are synthesized
    deterministically from catalog columns, then parsed with Spark's
    ``parse_url`` (HOST / PATH / QUERY-key extraction, all codegen);
    the oracle replicates each extraction with anchored regexes, which
    the synthesized URL shape keeps exactly equivalent.  One scan, one
    small (host, lang) rollup.
    """
    d = table(spark, sf_dir, "documents")
    u = d.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url")
    )
    parsed = u.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
    )
    return parsed.groupBy("host", "lang_param").agg(
        F.count("*").alias("n_docs"),
        F.min("path").alias("first_path"),
    )


@query(
    "csv_functions",
    oracle="""
    WITH enc AS (
        SELECT CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
               || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS line
        FROM orders
    ),
    dec AS (
        SELECT string_split(line, ',') AS parts FROM enc
    )
    SELECT parts[2] AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(parts[3] AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           MIN(CAST(parts[1] AS BIGINT)) AS first_key
    FROM dec GROUP BY 1
    """,
    tags=("scalar", "csv", "roundtrip"),
)
def csv_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scalar round-trip: rows serialize to CSV lines (``to_csv``)
    and parse back (``from_csv`` with an explicit schema) — the
    embedded-delimited-payload path (CSV-in-a-column is the reference's
    entire input model: its weather sample parses CSV lines inside
    map_fn, shared/samples/weather_stats.py:31).  The price travels as
    decimal text so both engines render and re-parse identical digits;
    the aggregate over parsed fields proves the round-trip lossless.
    All codegen — no Python in the loop.
    """
    o = table(spark, sf_dir, "orders")
    enc = o.select(
        F.to_csv(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
            )
        ).alias("line")
    )
    dec = enc.select(
        F.from_csv(
            "line", "k bigint, status string, p decimal(12,2)"
        ).alias("r")
    )
    return dec.groupBy(F.col("r.status").alias("status")).agg(
        F.count("*").alias("n_orders"),
        F.sum("r.p").cast("double").alias("total_price"),
        F.min("r.k").alias("first_key"),
    )


@query(
    "ansi_safety_functions",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_quantity, l_linenumber,
               CASE WHEN l_orderkey % 5 = 0 THEN 'x' || CAST(l_linenumber AS VARCHAR)
                    ELSE CAST(l_linenumber AS VARCHAR) END AS maybe_num
        FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_by_zero,
           CAST(SUM(CASE WHEN TRY_CAST(maybe_num AS INTEGER) IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_unparseable,
           CAST(SUM(CASE WHEN CAST(l_orderkey AS HUGEINT) * 1000000000000000
                              > 9223372036854775807 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overflow
    FROM base
    """,
    tags=("scalar", "ansi", "error-safety"),
)
def ansi_safety_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safety surface: ``try_divide`` (÷0 → NULL instead of
    exception), ``try_cast`` (malformed string → NULL), ``try_multiply``
    (int64 overflow → NULL) — counted per failure class.  This is the
    dirty-data contract the reference leaves to each user's map_fn
    try/except (its weather sample silently skips malformed rows,
    weather_stats.py:37-39); under ANSI mode these expressions are the
    difference between a quarantine column and a 3 a.m. job abort.
    Malformed numerics are injected deterministically (every 5th order's
    line number prefixed); the oracle reproduces each NULL-production
    rule relationally.
    """
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        "l_quantity",
        "l_linenumber",
        F.when(
            F.col("l_orderkey") % 5 == 0,
            F.concat(F.lit("x"), F.col("l_linenumber").cast("string")),
        )
        .otherwise(F.col("l_linenumber").cast("string"))
        .alias("maybe_num"),
    )
    probed = base.select(
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias("safe_ratio"),
        F.expr("try_cast(maybe_num AS INT)").alias("parsed"),
        F.try_multiply(F.col("l_orderkey"), F.lit(1_000_000_000_000_000)).alias("scaled"),
    )
    return probed.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("safe_ratio").isNull(), 1).otherwise(0)).alias("n_div_by_zero"),
        F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0)).alias("n_unparseable"),
        F.sum(F.when(F.col("scaled").isNull(), 1).otherwise(0)).alias("n_overflow"),
    )


@query(
    "json_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           MIN(o_orderkey) AS first_key
    FROM orders GROUP BY 1
    """,
    tags=("scalar", "json", "roundtrip"),
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON serialization round-trip: rows pack into JSON text
    (``to_json``) and parse back through an explicit schema
    (``from_json``), then aggregate the PARSED fields.  The oracle is
    the direct aggregate on the source columns — i.e. the assertion is
    ``parse ∘ serialize = identity``, which pins both directions of the
    JSON codec (the price travels as decimal so digits survive
    verbatim).  Complements :func:`csv_functions` (same proof for CSV)
    and :func:`json_parse_quality` (the failure path).
    """
    o = table(spark, sf_dir, "orders")
    enc = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
            )
        ).alias("j")
    )
    dec = enc.select(F.from_json("j", "k bigint, status string, p decimal(12,2)").alias("r"))
    return dec.groupBy(F.col("r.status").alias("status")).agg(
        F.count("*").alias("n_orders"),
        F.sum("r.p").cast("double").alias("total_price"),
        F.min("r.k").alias("first_key"),
    )


@query(
    "ansi_try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 10 = 0 THEN NULL
                ELSE CAST(o_totalprice AS DOUBLE) / CAST(o_custkey % 10 AS DOUBLE)
           END AS price_per_bucket,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_as_int,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
           CASE WHEN o_custkey % 10 = 0 THEN NULL
                ELSE o_orderkey // (o_custkey % 10) END AS key_div
    FROM orders
    """,
    tags=("scalar", "ansi", "error-handling"),
)
def ansi_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-handling scalar suite: ``try_divide`` and
    ``try_cast`` — the functions that keep a 100 TB pipeline from dying
    on one malformed row. This engine runs ANSI mode ON (session.py),
    where ``/`` by zero and invalid casts THROW instead of silently
    corrupting (the strictness caught two real degenerate-statistic
    bugs during development); the ``try_`` family is the per-expression
    opt-out — NULL on failure, so bad rows become filterable instead of
    fatal. The oracle spells the identical semantics as explicit CASE /
    TRY_CAST (DuckDB's division and casts follow different default
    rules, so the contract is written out rather than assumed):
    double division guarded against a zero bucket, a cast that fails
    for EVERY row ('1-URGENT' is not an integer → all NULL), a cast
    that succeeds for every row (the leading digit), and guarded
    integral division (floor semantics in both engines).
    """
    o = table(spark, sf_dir, "orders")
    bucket = F.col("o_custkey") % 10
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice").cast("double"), bucket.cast("double")).alias(
            "price_per_bucket"
        ),
        F.col("o_orderpriority").try_cast("int").alias("prio_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_rank"),
        F.try_divide(F.col("o_orderkey"), bucket).cast("bigint").alias("key_div"),
    )
