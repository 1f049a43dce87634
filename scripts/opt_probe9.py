import os, sys, time, gc
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.registry import load_all
from cooler_mapreduce_spark.sources import catalog
from cooler_mapreduce_spark.sources.catalog import TABLES, table

spark = get_session("probe9", cpus=32)
specs = load_all()
for t in TABLES:
    table(spark, SF, t).count()

QUERIES = ["join_orders_customers", "window_top_orders_per_customer", "market_share_q8",
           "pricing_summary", "multiple_ols_price_by_flag", "dedup_keep_latest",
           "revenue_by_nation", "large_orders_q18", "shipping_priority_topk"]
ARMS = {"w1": {}, "w2": {"lineitem": 2, "orders": 2}}
BASE = dict(catalog._FANOUT_WEIGHTS)

def run(name):
    t0 = time.perf_counter()
    df = specs[name].fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    del df; gc.collect()
    return round(dt, 3)

for name in QUERIES:
    res = {a: [] for a in ARMS}
    run(name)
    for _ in range(4):
        for arm, extra in ARMS.items():
            catalog._FANOUT_WEIGHTS = {**BASE, **extra}
            res[arm].append(run(name))
    catalog._FANOUT_WEIGHTS = BASE
    print(f'{name}: ' + "  ".join(f"{a}={min(v):.3f}{v}" for a, v in res.items()), flush=True)
spark.stop()
