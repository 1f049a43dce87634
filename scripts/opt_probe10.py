import os, sys, time, gc
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
from pyspark.sql import functions as F
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.operators.graph import _copurchase_graph
from cooler_mapreduce_spark.sources.catalog import TABLES, table

spark = get_session("probe10", cpus=32)
for t in TABLES:
    table(spark, SF, t).count()

def census(oriented, edges, deg, ckpt_adj=False, sort=True):
    coll = F.sort_array(F.collect_list("dst")) if sort else F.collect_list("dst")
    adj = oriented.groupBy("src").agg(coll.alias("nbrs"))
    if ckpt_adj:
        adj = adj.localCheckpoint(eager=True)
    eu = adj.select("src", F.explode("nbrs").alias("dst"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("src").alias("jv"), F.col("nbrs").alias("nbrs_v"))
    tri = (eu.join(adj_v, F.col("dst") == F.col("jv"))
           .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("t"))
           .agg(F.coalesce(F.sum("t"), F.lit(0).cast("bigint")).alias("triangles")))
    summary = edges.agg(F.count("*").alias("edges"))
    wedges = deg.agg((F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2)).alias("wedges"))
    return (summary.crossJoin(F.broadcast(wedges)).crossJoin(F.broadcast(tri))
            .select("edges", "wedges", "triangles"))

ARMS = {"a_sq": dict(), "b_ckpt": dict(ckpt_adj=True), "f_nosort": dict(sort=False),
        "bf_both": dict(ckpt_adj=True, sort=False)}
# identity check
edges, deg, oriented = _copurchase_graph(spark, SF)
vals = {k: [tuple(r) for r in census(oriented, edges, deg, **kw).collect()] for k, kw in ARMS.items()}
print("identity:", "MATCH" if len({str(v) for v in vals.values()}) == 1 else f"MISMATCH {vals}")

res = {k: [] for k in ARMS}
for _ in range(4):
    for k, kw in ARMS.items():
        edges, deg, oriented = _copurchase_graph(spark, SF)
        t0 = time.perf_counter()
        census(oriented, edges, deg, **kw).write.format("noop").mode("overwrite").save()
        res[k].append(round(time.perf_counter() - t0, 3))
        gc.collect()
for k, v in res.items():
    print(f"{k}: min={min(v):.3f} {v}")
spark.stop()
