"""Quiet-host isolated re-run protocol (SCALING.md) for flagged bench
regressions: one FRESH session per query (subprocess), bench.py's full
warm-up, 8 timed runs, loadavg recorded at start — the same procedure
that attributed the r3 minhash, r5 contention, and r7 tfidf episodes.

Usage: python scripts/isolated_rerun.py query1 query2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
name = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.cpu_count() or 8
with open("/proc/loadavg") as fh:
    load = fh.read().split()[0]
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources.catalog import TABLES, table
spark = get_session("isolated-rerun", cpus=cpus)
spec = load_all()[name]
for t in TABLES:
    table(spark, sf_dir, t).count()
spark.sparkContext.parallelize(range(cpus * 2), cpus).map(lambda x: x).count()
spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, schema="x int").count()
hof = spark.range(0, 20000, 1, cpus).selectExpr(
    "aggregate(transform(sequence(0, 63), i -> id * i % 2147483647),"
    " CAST(0 AS BIGINT), (a, x) -> a + x) AS s")
for _ in range(6):
    hof.groupBy().sum("s").count()
raw = []
for i in range(8):
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    raw.append(round(time.perf_counter() - t0, 3))
    del df
    import gc; gc.collect()
print("ISOLATED " + json.dumps({"name": name, "loadavg": load, "runs": raw,
                                "min": min(raw)}))
spark.stop()
"""


def main() -> None:
    results = []
    for name in sys.argv[1:]:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, name],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("ISOLATED ")]
        if line:
            rec = json.loads(line[-1].removeprefix("ISOLATED "))
            results.append(rec)
            print(json.dumps(rec), flush=True)
        else:
            print(json.dumps({"name": name, "error": r.stderr[-500:]}), flush=True)
    print(json.dumps({"summary": {r["name"]: r["min"] for r in results}}))


if __name__ == "__main__":
    main()
