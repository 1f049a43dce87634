#!/usr/bin/env python
"""r12 probe: size partitions to DATA, not cores (verdict item 2).

Interleaved A/B at a fixed core count (default 32): for each probed query,
alternate partition POLICIES inside one warm session so host weather hits
every arm equally.

Policies (each is (shuffle_partitions, fanout_target_fn)):
  cores : status quo — shuffle = fan-out = defaultParallelism
  data  : shuffle = ceil(sf_dir_bytes / 2 MiB), fan-out = same value
  bytes : shuffle = data value; fan-out per table =
          clamp(ceil(table_bytes * weight / 512 KiB), 2, cores)
          with compute weights documents=16, embeddings=8, events=4.

Streaming drains re-create their checkpoints per run, so the session
shuffle conf at start() sets their state-store partition count — the A/B
covers the state-commit cost directly.

Usage: python scripts/opt_probe6.py [rounds] [query ...]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources import catalog


def dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if os.path.isfile(os.path.join(d, f))
    )


DATA_N = max(1, min(CPUS, math.ceil(dir_bytes(SF_DIR) / (2 << 20))))

_WEIGHTS = {"documents": 16, "embeddings": 8, "events": 4}


def bytes_fanout(name: str, size: int, cores: int) -> int:
    w = _WEIGHTS.get(name, 1)
    return max(2, min(cores, math.ceil(size * w / (512 << 10))))


POLICIES = {
    "cores": (CPUS, None),  # None → leave _fan_out alone (status quo)
    "data": (DATA_N, lambda name, size, cores: DATA_N),
    "bytes": (DATA_N, bytes_fanout),
}

DEFAULT_QUERIES = [
    # regressed at 32c vs 8c in PERF_r11 scaling (ratio < 0.9):
    "skyline_pareto_orders",
    "autocorr_daily_revenue",
    "holt_linear_smoothing",
    "weighted_median_price_by_flag",
    "tfidf_top_terms",
    "doc_unigram_nll",
    "multiple_ols_price_by_flag",
    "mr_word_count",
    "ann_topk_bruteforce",
    "word_count",
    "revenue_by_nation",
    "dedup_exact",
    "triangle_count_copurchase",
    "multimodal_resize_stats",
    "sink_orc_roundtrip",
    "pagerank_supplier_customer",
    "semdedup_prune_cells",
    # guard set — these LIKED 32 cores (ratio > 1.1); must not regress:
    "pricing_summary",
    "join_orders_customers",
    "entity_resolution_customers",
    "shipping_priority_topk",
    "window_top_orders_per_customer",
    "market_share_q8",
    "stat_corr_qty_price",
    "dedup_minhash_lsh",
    "stream_tumbling_counts",
]

STREAMS = ["stream_tumbling_available_now", "stream_scd1_upsert_replay"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT_QUERIES + STREAMS
    spark = get_session("opt_probe6", cpus=CPUS)
    sc = spark.sparkContext
    specs = load_all()

    # warm like bench.py
    from cooler_mapreduce_spark.sources.catalog import TABLES, table

    for t in TABLES:
        table(spark, SF_DIR, t).count()
    sc.parallelize(range(CPUS * 2), CPUS).map(lambda x: x).count()

    orig_fanout = catalog._fan_out

    def set_policy(pname: str) -> None:
        n_shuf, fo = POLICIES[pname]
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuf))
        if fo is None:
            catalog._fan_out = orig_fanout
        else:
            def fanned(spark_, df, path, name):  # noqa: ANN001
                import os as _os

                target = sc.defaultParallelism
                key = (path, target)
                fan = catalog._FANOUT_CACHE.get(key)
                if fan is None:
                    try:
                        size = _os.path.getsize(path)
                    except OSError:
                        size = 0
                    fan = (
                        size >= catalog._FANOUT_MIN_BYTES
                        and target >= 4
                        and df.rdd.getNumPartitions() < max(2, target // 2)
                    )
                    catalog._FANOUT_CACHE[key] = fan
                if not fan:
                    return df
                try:
                    size = _os.path.getsize(path)
                except OSError:
                    size = 0
                n = fo(name, size, target)
                keys = catalog._TABLE_KEYS.get(name)
                from pyspark.sql import functions as F

                if keys:
                    return df.repartition(n, *[F.col(k) for k in keys])
                return df.repartition(n)

            catalog._fan_out = fanned

    import gc

    def run_batch(name: str) -> float:
        spec = specs[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        del df
        gc.collect()
        return dt

    def run_stream(name: str) -> float:
        import shutil
        import tempfile

        t0 = time.perf_counter()
        if name == "stream_tumbling_available_now":
            from cooler_mapreduce_spark.streaming.windows import run_tumbling_stream

            q = run_tumbling_stream(
                spark, SF_DIR, query_name=f"p6_{time.monotonic_ns()}", available_now=True
            )
            q.awaitTermination()
        elif name == "stream_scd1_upsert_replay":
            from cooler_mapreduce_spark.streaming.dedup import run_streaming_upsert

            work = tempfile.mkdtemp(prefix="p6_scd1_")
            try:
                q = run_streaming_upsert(spark, SF_DIR, f"{work}/out", f"{work}/ckpt")
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()
            finally:
                shutil.rmtree(work, ignore_errors=True)
        return time.perf_counter() - t0

    results: dict[str, dict[str, list[float]]] = {}
    all_names = [n for n in names if n in specs or n in STREAMS]
    print(f"# policies: cores={CPUS} data={DATA_N}  sf_bytes={dir_bytes(SF_DIR)}")
    for name in all_names:
        results[name] = {p: [] for p in POLICIES}
        sc.setJobDescription(f"probe6 {name}")
        # one unmeasured warm pass under the status-quo policy
        set_policy("cores")
        runner = run_stream if name in STREAMS else run_batch
        runner(name)
        for _ in range(rounds):
            for pname in POLICIES:
                set_policy(pname)
                # clear the fan-out cache so a policy change re-evaluates
                catalog._FANOUT_CACHE.clear()
                results[name][pname].append(round(runner(name), 3))
        set_policy("cores")
        row = "  ".join(
            f"{p}={min(v):.3f}{v}" for p, v in results[name].items()
        )
        print(f"{name}: {row}", flush=True)

    print("\n# summary (min per policy)")
    for name, r in results.items():
        best = min(r, key=lambda p: min(r[p]))
        print(
            f"{name}: "
            + "  ".join(f"{p}={min(v):.3f}" for p, v in r.items())
            + f"  -> {best}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
