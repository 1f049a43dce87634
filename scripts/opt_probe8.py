import os, sys, time, gc
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources.catalog import TABLES, table

spark = get_session("probe8", cpus=32)
specs = load_all()
for t in TABLES:
    table(spark, SF, t).count()

QUERIES = ["triangle_count_copurchase", "revenue_by_nation", "join_orders_customers",
           "window_top_orders_per_customer", "market_share_q8", "sink_orc_roundtrip",
           "stream_tumbling_counts", "pricing_summary"]
def run(name):
    t0 = time.perf_counter()
    df = specs[name].fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    del df; gc.collect()
    return round(dt, 3)

res = {}
for name in QUERIES:
    spark.conf.set("spark.sql.shuffle.partitions", "9")
    run(name)  # warm
    res[name] = {"9": [], "32": []}
    for _ in range(4):
        for w in ("9", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            res[name][w].append(run(name))
    print(f'{name}: w9={min(res[name]["9"]):.3f}{res[name]["9"]}  w32={min(res[name]["32"]):.3f}{res[name]["32"]}', flush=True)
spark.stop()
