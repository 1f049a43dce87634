"""Data-governance tier: re-identification risk and private release.

A training-data pipeline at 100 TB is also a compliance surface: before
a corpus (or its statistics) leaves the platform, the pipeline must
(1) MEASURE re-identification risk — k-anonymity over the
quasi-identifier combinations an attacker could join on — and
(2) RELEASE aggregate statistics without leaking individuals —
ε-differentially-private counts. Both are single-pass grouped
aggregates here (partial-aggregable, one shuffle), and both are
hash-checked against DuckDB: the DP noise is the classic inverse-CDF
Laplace sample driven by a SEEDED hash uniform, so the "randomness" is
a deterministic function of the group key — reproducible releases, the
property real DP deployments get from a stored noise seed.

The reference engine has no governance surface (SURVEY.md §2); this
extends the LLM-pipeline families (pii_redaction's detector is the
row-level sibling — textstats.py:359).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5int_duckdb, md5int_spark
from ..registry import query
from ..sources.catalog import table

#: quasi-identifier class-size bands for the census (k < 5 is the
#: classic "violates k-anonymity at k=5" line).
_KA_BANDS = "CASE WHEN k < 5 THEN 'k<5' WHEN k < 20 THEN '5<=k<20' ELSE 'k>=20' END"


@query(
    "kanonymity_census",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               COUNT(*) AS k
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT {_KA_BANDS} AS band,
           COUNT(*) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM classes GROUP BY 1
    ORDER BY band
    """,
    tags=("governance", "privacy", "aggregation", "llm-pipeline"),
)
def kanonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census (Sweeney, 2002): group the table by its
    quasi-identifier tuple — here (nation, market segment, account-
    balance band), the columns an attacker could plausibly join against
    an external dataset — and report the equivalence-class size
    distribution. Classes with k < 5 are re-identification risks: any
    released row carrying that QI combination narrows to fewer than 5
    people. The census is the measurement step before suppression or
    generalization; its output is the compliance artifact.

    Scale shape: ONE partial-aggregable groupBy over the table, then an
    O(classes) banding aggregate — the same cost as any count rollup.
    All values exact integers; the balance band is an integer floor, so
    both engines agree bit-for-bit.
    """
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").alias("k"))
    return (
        classes.groupBy(F.expr(_KA_BANDS).alias("band"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("band")
    )


_DP_EPS = 0.5
_DP_SEED = "dp-release-r6"
#: uniform in (-0.5, 0.5) from the seeded group-key hash: bucket the
#: 60-bit hash to 1e6 buckets and center — the +0.5 half-bucket offset
#: keeps u strictly inside the open interval, so ln(1 - 2|u|) is finite.
_DP_U = "((CAST(h % 1000000 AS DOUBLE) + 0.5) / 1000000.0 - 0.5)"


def _dp_noise_expr(eps: float) -> str:
    """Inverse-CDF Laplace(b = 1/eps) sample over the seeded uniform:
    -b * sgn(u) * ln(1 - 2|u|) — ONE spelling for any engine that parses
    ANSI SQL, parameterized by ε (the queries below pin ε = _DP_EPS; the
    staged :func:`dp_noisy_grid` kernel takes it as an argument)."""
    return (
        f"(-(1.0 / {eps}) * (CASE WHEN {_DP_U} >= 0.0 THEN 1.0 ELSE -1.0 END)"
        f" * ln(1.0 - 2.0 * abs({_DP_U})))"
    )


_DP_NOISE = _dp_noise_expr(_DP_EPS)


@query(
    "dp_noisy_segment_counts",
    oracle=f"""
    WITH counts AS (
        SELECT c_mktsegment AS segment, COUNT(*) AS n
        FROM customer GROUP BY 1
    ),
    seeded AS (
        SELECT segment, n,
               {md5int_duckdb(f"'{_DP_SEED}:' || segment")} AS h
        FROM counts
    )
    SELECT segment,
           round(CAST(n AS DOUBLE) + {_DP_NOISE}, 6) AS noisy_count,
           {_DP_EPS} AS epsilon
    FROM seeded
    ORDER BY segment
    """,
    tags=("governance", "privacy", "differential-privacy", "llm-pipeline"),
)
def dp_noisy_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private count release (Dwork et al., TCC'06 —
    the Laplace mechanism): per-segment customer counts plus
    Laplace(1/ε) noise, ε = 0.5, sensitivity 1 (one customer moves one
    count by one). The noise is the textbook inverse-CDF sample
    ``-b·sgn(u)·ln(1-2|u|)`` driven by a uniform derived from a SEEDED
    hash of the group key — deterministic, so repeated releases of the
    same statistic reuse the same noise draw (re-running a DP query
    with fresh noise is a privacy-budget leak; production systems pin
    the draw exactly like this). Deterministic noise is also what makes
    the release hash-checkable against DuckDB.

    Scale shape: one partial-aggregable count + O(groups) scalar math.
    The ln() runs on both engines' libm over identical doubles;
    round-to-6 on O(100) magnitudes absorbs any ULP skew (the repo's
    standard staging argument).
    """
    c = table(spark, sf_dir, "customer")
    counts = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n")
    )
    seeded = counts.withColumn(
        "h", F.expr(md5int_spark(f"'{_DP_SEED}:' || segment"))
    )
    return seeded.select(
        "segment",
        F.round(F.col("n").cast("double") + F.expr(_DP_NOISE), 6).alias(
            "noisy_count"
        ),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("segment")


# ----------------------------------------- ε-DP quantiles (histogram) ----

#: fixed equi-width price grid (the quantile-histogram convention of
#: aggregates._QBIN_W): 10 k wide, ids 0..63, top-clamped. A FIXED grid is
#: what makes the release valid ε-DP — data-dependent bin edges would
#: themselves leak.
_DPQ_W = 10_000.0
_DPQ_CAP = 63
_DPQ_SEED = "dp-quantiles-r8"
_DPQ_PS = (0.25, 0.5, 0.75, 0.9)


@query(
    "dp_noisy_quantiles_price",
    oracle=f"""
    WITH counts AS (
        SELECT least(CAST(floor(o_totalprice / {_DPQ_W}) AS BIGINT), {_DPQ_CAP}) AS bin,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    ),
    noisy AS (
        SELECT bin,
               CAST(n AS DOUBLE) + {_DP_NOISE} AS nn
        FROM (SELECT bin, n,
                     {md5int_duckdb(f"'{_DPQ_SEED}:' || CAST(bin AS VARCHAR)")} AS h
              FROM counts)
    ),
    cums AS (
        SELECT bin, nn, SUM(nn) OVER (ORDER BY bin) AS cum FROM noisy
    ),
    tot AS (SELECT max_by(cum, bin) AS total FROM cums),
    ps AS (SELECT unnest(ARRAY[{", ".join(f"CAST({p} AS DOUBLE)" for p in _DPQ_PS)}]) AS p)
    SELECT p,
           MIN(CASE WHEN cum >= p * total THEN bin END) AS qbin,
           CAST(MIN(CASE WHEN cum >= p * total THEN bin END) AS DOUBLE) * {_DPQ_W}
               AS q_value,
           {_DP_EPS} AS epsilon
    FROM cums, tot, ps
    GROUP BY p, total
    """,
    tags=("governance", "privacy", "differential-privacy", "quantile", "llm-pipeline"),
)
def dp_noisy_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP quantile release via the NOISY-HISTOGRAM mechanism: publish
    Laplace(1/ε)-noised counts over a FIXED equi-width price grid
    (disjoint bins → parallel composition, total cost ε; sensitivity 1 —
    one order moves one bin count by one), then read each requested
    quantile off the noisy CDF as the first bin whose cumulative noisy
    count crosses p·N̂. The quantile extraction is post-processing of an
    already-private release, so it costs no additional budget — the
    textbook-valid route to DP quantiles, unlike naively Laplace-noising
    an empirical quantile (whose local sensitivity is unbounded). Noise
    is the module's seeded inverse-CDF Laplace draw keyed by bin id —
    deterministic (a stored noise draw, the re-release discipline
    ``dp_noisy_segment_counts`` documents) and therefore hash-checkable.

    Scale shape: ONE partial-aggregable groupBy onto the 64-bin grid,
    then all remaining work (noise, running CDF, 4 quantile picks) runs
    over exactly 64 rows — the unpartitioned window is over the
    HISTOGRAM, never the data (the qbin-rollup convention). The noisy
    total N̂ is read as max_by(cum, bin) — the ORDERED running sum's last
    element — rather than an unordered SUM over signed noise, so both
    engines accumulate the identical left-to-right double sequence.

    Reference parity: beyond the reference — no governance surface
    exists there (SURVEY.md §2); this deepens the tier
    ``dp_noisy_segment_counts`` opened.
    """
    o = table(spark, sf_dir, "orders", fan_out=False)
    from pyspark.sql import Window

    counts = o.groupBy(
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(_DPQ_W)).cast("bigint"),
            F.lit(_DPQ_CAP),
        ).alias("bin")
    ).agg(F.count("*").alias("n"))
    noisy = counts.withColumn(
        "h", F.expr(md5int_spark(f"'{_DPQ_SEED}:' || CAST(bin AS STRING)"))
    ).select("bin", (F.col("n").cast("double") + F.expr(_DP_NOISE)).alias("nn"))
    cums = noisy.select(
        "bin", "nn", F.sum("nn").over(Window.orderBy("bin")).alias("cum")
    )
    tot = cums.agg(F.max_by("cum", "bin").alias("total"))
    ps = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(p)) for p in _DPQ_PS])).alias("p")
    )
    return (
        cums.crossJoin(tot)
        .crossJoin(ps)
        .groupBy("p", "total")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("p") * F.col("total"), F.col("bin"))).alias("qbin"),
            F.lit(_DP_EPS).alias("epsilon"),
        )
        .select(
            "p",
            "qbin",
            (F.col("qbin").cast("double") * F.lit(_DPQ_W)).alias("q_value"),
            "epsilon",
        )
    )


def dp_noisy_grid(
    df: DataFrame, keys: list[str], eps: float, seed: str
) -> DataFrame:
    """Generic seeded ε-DP count release over an arbitrary key tuple:
    one partial-aggregable count per cell plus a Laplace(1/ε) draw keyed
    by the seeded hash of the cell's key string — the reusable core
    behind ``dp_noisy_segment_counts`` (1 key) and the 2-D
    quasi-identifier grids a k-anonymity remediation publishes
    (nation × segment), with ε and the stored-noise seed as arguments.

    STAGED round-9 kernel (not yet a registered query — the round-8
    window is full per the registry discipline; r9 registers the 2-D QI
    grid face with an oracle via the same shared noise spelling).
    Privacy accounting: cells are disjoint → parallel composition at
    sensitivity 1, total cost ε; the seeded draw is the stored-noise
    re-release discipline the 1-D query documents. Returns UNROUNDED
    noisy counts — the registered face owns the round-to-6 ULP absorber
    (both engines' libm ln() can differ in the last bit).

    Scale shape: one groupBy shuffle onto the cell grid, O(cells) scalar
    math after; nothing collected or broadcast.
    """
    key_str = " || ':' || ".join(f"CAST({k} AS STRING)" for k in keys)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    return counts.withColumn(
        "h", F.expr(md5int_spark(f"'{seed}:' || {key_str}"))
    ).select(
        *keys,
        "n",
        (F.col("n").cast("double") + F.expr(_dp_noise_expr(eps))).alias(
            "noisy_count"
        ),
        F.lit(eps).alias("epsilon"),
    )
