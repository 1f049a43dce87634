#!/usr/bin/env python
"""Round-11 optimization probe, batch 3 (continuation session): interleaved
A/B of the remaining "Not yet optimized" candidates (guide §1 protocol:
warm session, noop sink / real sink where the sink is the workload,
steady-state min, variants alternated so host weather hits both arms).

Cases (A = committed behavior, B = candidate edit):
  scd2_a / scd2_b   — SCD2 touched-bucket history rebuild: DISTINCT +
                      custkey window (2 exchanges) vs the DISTINCT folded
                      into the window pass as an adjacent-duplicate drop
                      (1 exchange). Staged raw store mirrors the bench
                      drain (full orders as one batch, no duplicates).
  scd2_check        — correctness: on a raw store with REPLAYED (duplicated)
                      appends, variant B's history must equal variant A's.
  scd1_a / scd1_b   — SCD1 merge batch: `fresh` computed twice (touched
                      collect + merged union) vs localCheckpoint'ed once.
                      Mirrors the bench drain's single full-orders batch
                      including the dynamic-overwrite parquet write.
  sd_cells          — diagnostic: semdedup per-cell population at this SF
                      (evidence for/against two-tier salting).
  shj_ab            — preferSortMergeJoin=false vs default on the two
                      remaining non-triangle SMJ queries (entity, semdedup).

Usage: python scripts/opt_probe3.py <case> [case ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "4"))


def _steady(fn, n_max=8, n_min=3, sink="noop"):
    raw = []
    for i in range(n_max):
        t0 = time.perf_counter()
        out = fn()
        if out is not None:
            out.write.format("noop").mode("overwrite").save()
        raw.append(round(time.perf_counter() - t0, 3))
        del out
        import gc

        gc.collect()
        if i >= n_min - 1:
            lo, lo2 = sorted(raw)[:2]
            still = raw[-1] < 0.95 * min(raw[:-1])
            if lo2 <= lo * 1.12 and raw[-1] <= lo * 1.12 and not still:
                break
    return min(raw), raw


def main() -> None:
    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.session import get_session
    from cooler_mapreduce_spark.sources.catalog import TABLES, table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_session("opt-probe3", cpus=cpus)
    specs = load_all()
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    spark.sparkContext.parallelize(range(cpus * 2), cpus).map(lambda x: x).count()
    hof = spark.range(0, 20000, 1, cpus).selectExpr(
        "aggregate(transform(sequence(0, 63), i -> id * i % 2147483647),"
        " CAST(0 AS BIGINT), (a, x) -> a + x) AS s"
    )
    for _ in range(6):
        hof.groupBy().sum("s").count()

    from pyspark.sql import Window

    work = tempfile.mkdtemp(prefix="probe3_")

    # ---- SCD2 rebuild A/B ------------------------------------------------
    # Stage the raw change store the way the bench drain leaves it: the
    # full orders table as ONE appended batch, bucketed like the runner.
    n_buckets = 8
    raw_dir = f"{work}/scd2_raw"
    raw_dup_dir = f"{work}/scd2_raw_dup"

    def _changes():
        return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            F.col("o_custkey").alias("custkey"),
            F.pmod(F.col("o_custkey"), n_buckets).alias("bucket"),
            F.col("o_orderdate").alias("valid_from"),
            F.col("o_orderkey").alias("change_id"),
            F.col("o_totalprice").alias("attr"),
        )

    def _stage_scd2():
        if not os.path.exists(raw_dir):
            _changes().write.mode("append").partitionBy("bucket").parquet(raw_dir)
        if not os.path.exists(raw_dup_dir):
            # simulate a replayed micro-batch: the same rows appended twice
            _changes().write.mode("append").partitionBy("bucket").parquet(raw_dup_dir)
            _changes().limit(40000).write.mode("append").partitionBy(
                "bucket"
            ).parquet(raw_dup_dir)

    touched = list(range(n_buckets))

    def _hist_tail(seen):
        w = Window.partitionBy("custkey").orderBy("valid_from", "change_id")
        return seen.select(
            "custkey",
            "bucket",
            "valid_from",
            "attr",
            F.row_number().over(w).alias("version"),
            F.lead("valid_from").over(w).alias("next_from"),
        ).select(
            "custkey",
            "bucket",
            "version",
            "valid_from",
            F.coalesce(
                F.col("next_from"), F.lit("2200-01-01").cast("timestamp_ntz")
            ).alias("valid_to"),
            F.col("next_from").isNull().alias("is_current"),
            "attr",
        )

    def scd2_a(src=None):
        seen = (
            spark.read.parquet(src or raw_dir)
            .where(F.col("bucket").isin(touched))
            .distinct()
        )
        return _hist_tail(seen)

    def scd2_b(src=None):
        # mirrors streaming.dedup._scd2_rebuild_frame's folded spelling:
        # full-row dedup via a lag'd struct (change_id alone is NOT a
        # dedup key — update feeds re-use it with a later valid_from)
        seen = spark.read.parquet(src or raw_dir).where(
            F.col("bucket").isin(touched)
        )
        dw = Window.partitionBy("custkey").orderBy(
            "valid_from", "change_id", "attr"
        )
        row_key = F.struct("valid_from", "change_id", "attr")
        deduped = (
            seen.withColumn("_prev", F.lag(row_key).over(dw))
            .filter(F.col("_prev").isNull() | (F.col("_prev") != row_key))
            .drop("_prev")
        )
        return _hist_tail(deduped)

    def scd2_check():
        a = {tuple(r) for r in scd2_a(raw_dup_dir).collect()}
        b = {tuple(r) for r in scd2_b(raw_dup_dir).collect()}
        na = scd2_a(raw_dup_dir).count()
        nb = scd2_b(raw_dup_dir).count()
        print(
            f"# scd2_check: sets_equal={a == b} rows_a={na} rows_b={nb}",
            file=sys.stderr,
        )
        assert a == b and na == nb
        return None

    # ---- SCD1 merge A/B ----------------------------------------------------
    def _fresh():
        batch_df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        return (
            batch_df.withColumn("bucket", F.pmod(F.col("o_orderkey"), n_buckets))
            .groupBy("o_orderkey", "bucket")
            .agg(
                F.max_by(
                    F.struct(
                        "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority",
                    ),
                    F.struct("o_orderdate", "o_orderkey"),
                ).alias("r")
            )
            .select("o_orderkey", "bucket", "r.*")
        )

    def _scd1_write(merged, out):
        (
            merged.localCheckpoint(eager=True)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(out)
        )

    scd1_i = [0]

    def scd1_a():
        out = f"{work}/scd1_a_{scd1_i[0]}"
        scd1_i[0] += 1
        fresh = _fresh()
        _ = [r["bucket"] for r in fresh.select("bucket").distinct().collect()]
        merged = (
            _fresh()
            .groupBy("o_orderkey", "bucket")
            .agg(
                F.max_by(
                    F.struct(
                        "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority",
                    ),
                    F.struct("o_orderdate", "o_orderkey"),
                ).alias("r")
            )
            .select("o_orderkey", "bucket", "r.*")
        )
        _scd1_write(merged, out)
        shutil.rmtree(out, ignore_errors=True)
        return None

    def scd1_b():
        out = f"{work}/scd1_b_{scd1_i[0]}"
        scd1_i[0] += 1
        fresh = _fresh().localCheckpoint(eager=True)
        _ = [r["bucket"] for r in fresh.select("bucket").distinct().collect()]
        merged = (
            fresh.groupBy("o_orderkey", "bucket")
            .agg(
                F.max_by(
                    F.struct(
                        "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority",
                    ),
                    F.struct("o_orderdate", "o_orderkey"),
                ).alias("r")
            )
            .select("o_orderkey", "bucket", "r.*")
        )
        _scd1_write(merged, out)
        shutil.rmtree(out, ignore_errors=True)
        return None

    # ---- semdedup cell census (diagnostic) -------------------------------
    def sd_cells():
        from cooler_mapreduce_spark.operators.similarity import _semdedup_frames

        assigned, _ = _semdedup_frames(spark, SF_DIR, 0.30)
        rows = (
            assigned.groupBy("cell").agg(F.count("*").alias("n")).orderBy("cell")
        ).collect()
        print(f"# sd_cells: {[(r['cell'], r['n']) for r in rows]}", file=sys.stderr)
        return None

    cases: dict[str, object] = {
        "scd2_a": scd2_a,
        "scd2_b": scd2_b,
        "scd2_check": scd2_check,
        "scd1_a": scd1_a,
        "scd1_b": scd1_b,
        "sd_cells": sd_cells,
    }

    def registered(name):
        return lambda: specs[name].fn(spark, SF_DIR)

    # ---- preferSortMergeJoin A/B on the two non-triangle SMJ faces --------
    def _with_shj(name):
        def run():
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            try:
                return specs[name].fn(spark, SF_DIR)
            finally:
                pass

        return run

    def _with_smj(name):
        def run():
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
            return specs[name].fn(spark, SF_DIR)

        return run

    cases["entity_shj"] = _with_shj("entity_resolution_customers")
    cases["entity_smj"] = _with_smj("entity_resolution_customers")
    cases["semdedup_shj"] = _with_shj("semdedup_prune_cells")
    cases["semdedup_smj"] = _with_smj("semdedup_prune_cells")

    _stage_scd2()
    for name in sys.argv[1:]:
        fn = cases[name]
        if name in ("scd2_check", "sd_cells"):
            fn()
            print(f'{{"case": "{name}", "ok": true}}')
            continue
        mn, raw = _steady(fn)
        print(f"# {name}: min={mn:.3f} runs={raw}", file=sys.stderr)
        import json

        print(json.dumps({"case": name, "min": mn, "runs": raw}))
    # reset any conf the SHJ cases touched
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
