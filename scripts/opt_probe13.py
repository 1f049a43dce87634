import os, sys, time, gc
sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
SF = "/root/testdata/sf0.1"
from pyspark.sql import functions as F
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.operators.graph import (
    _DAMPING, _PR_ITERATIONS, _Q, _uniform_trade_graph)
from cooler_mapreduce_spark.sources.catalog import TABLES, table
spark = get_session("probe13", cpus=32)
for t in TABLES:
    table(spark, SF, t).count()

def frame(ckpt_at=None):
    edges, deg = _uniform_trade_graph(spark, SF)
    n = deg.count()
    ranks = deg.select(F.col("src").alias("node"), "outdeg",
                       (F.lit(1.0) / F.lit(n)).alias("rank"))
    q = F.lit(float(_Q))
    for i in range(_PR_ITERATIONS):
        contribs = ranks.hint("shuffle_hash").join(
            edges, F.col("node") == F.col("src")).select(
            F.col("dst").alias("to"),
            F.floor(F.col("rank") / F.col("outdeg") * q).alias("c"))
        sums = contribs.groupBy("to").agg(F.sum("c").alias("s"))
        ranks = sums.join(deg.hint("shuffle_hash"), F.col("to") == F.col("src")).select(
            F.col("to").alias("node"), "outdeg",
            (F.lit(0.15) / F.lit(n) + F.lit(_DAMPING) * (F.col("s").cast("double") / q)).alias("rank"))
        if ckpt_at is not None and i == ckpt_at:
            ranks = ranks.localCheckpoint(eager=True)
    return (ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)
            .select("node", F.round("rank", 12).alias("rank")))

a = [tuple(r) for r in frame(None).collect()]
for k in (1, 2):
    b = [tuple(r) for r in frame(k).collect()]
    print(f"identity ckpt_at={k}:", "MATCH" if a == b else "MISMATCH")

res = {"none": [], "ck1": [], "ck2": []}
for _ in range(4):
    for key, ck in (("none", None), ("ck1", 1), ("ck2", 2)):
        t0 = time.perf_counter()
        frame(ck).write.format("noop").mode("overwrite").save()
        res[key].append(round(time.perf_counter() - t0, 3))
        gc.collect()
for k, v in res.items():
    print(f"{k}: min={min(v):.3f} {v}")
spark.stop()
