import os, sys, time, gc
sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
SF = "/root/testdata/sf0.1"
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources import catalog
from cooler_mapreduce_spark.sources.catalog import TABLES, table
from pyspark.sql import functions as F
spark = get_session("probe12", cpus=32)
specs = load_all()
for t in TABLES:
    table(spark, SF, t).count()

WIDTH = {"cur": None, "w8": 8, "w12": 12}
orig = catalog._fan_out

def make_fanout(n_fixed):
    def f(spark_, df, path, name):
        import os as _os
        cores = spark_.sparkContext.defaultParallelism
        key = (path, cores)
        fan = catalog._FANOUT_CACHE.get(key)
        if fan is None:
            try: size = _os.path.getsize(path)
            except OSError: size = 0
            fan = (size >= catalog._FANOUT_MIN_BYTES and cores >= 4
                   and df.rdd.getNumPartitions() < max(2, cores // 2))
            catalog._FANOUT_CACHE[key] = fan
        if not fan: return df
        keys = catalog._TABLE_KEYS.get(name)
        if keys: return df.repartition(n_fixed, *[F.col(k) for k in keys])
        return df.repartition(n_fixed)
    return f

QUERIES = ["pricing_summary", "multiple_ols_price_by_flag", "large_orders_q18",
           "market_share_q8", "tfidf_top_terms", "word_count", "dedup_minhash_lsh",
           "text_quality_score", "shipping_priority_topk"]
def run(q):
    t0 = time.perf_counter()
    specs[q].fn(spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    gc.collect()
    return round(dt, 3)

for q in QUERIES:
    res = {a: [] for a in WIDTH}
    run(q)
    for _ in range(4):
        for arm, n in WIDTH.items():
            catalog._fan_out = orig if n is None else make_fanout(n)
            catalog._FANOUT_CACHE.clear()
            res[arm].append(run(q))
    catalog._fan_out = orig
    print(f"{q}: " + "  ".join(f"{a}={min(v):.3f}{v}" for a, v in res.items()), flush=True)
spark.stop()
