#!/usr/bin/env python
"""Round-11 optimization probe, batch 5: shuffle-codec A/B (guide §2.3).

``spark.io.compression.codec`` is a core (static) conf, so the A/B runs as
SEPARATE processes alternated by the caller:

    for i in 1 2 3; do
      python scripts/opt_probe5.py lz4  pricing_summary triangle_count_copurchase
      python scripts/opt_probe5.py zstd pricing_summary triangle_count_copurchase
    done

Each invocation warms the session exactly like opt_probe.py and prints one
JSON line per query with the steady-state min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    codec = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.session import ship_package
    from cooler_mapreduce_spark.sources.catalog import TABLES, table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = (
        SparkSession.builder.appName(f"opt-probe5-{codec}")
        .master(f"local[{cpus}]")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    ship_package(spark)
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

    for name in names:
        raw = []
        for i in range(8):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            raw.append(round(time.perf_counter() - t0, 3))
            del df
            import gc

            gc.collect()
            if i >= 2:
                lo, lo2 = sorted(raw)[:2]
                still = raw[-1] < 0.95 * min(raw[:-1])
                if lo2 <= lo * 1.12 and raw[-1] <= lo * 1.12 and not still:
                    break
        print(
            json.dumps({"codec": codec, "case": name, "min": min(raw), "runs": raw})
        )
    spark.stop()


if __name__ == "__main__":
    main()
