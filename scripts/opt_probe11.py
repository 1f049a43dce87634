import os, sys, time, gc
sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
from pyspark.sql import functions as F
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.sources.catalog import TABLES, table

spark = get_session("probe11", cpus=32)
for t in TABLES:
    table(spark, SF, t).count()

def derive(ckpt_oriented=True):
    li = table(spark, SF, "lineitem", fan_out=False).select("l_orderkey", "l_partkey")
    basket = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    edges = (basket.select(F.explode(F.flatten(F.expr(
        "transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v)))"
    ))).alias("p")).select("p.u", "p.v").distinct().localCheckpoint(eager=True))
    deg = (edges.select(F.col("u").alias("node")).unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")).localCheckpoint(eager=True))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du")).hint("shuffle_hash")
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv")).hint("shuffle_hash")
    ranked = edges.join(du, "u").join(dv, "v")
    lf = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ranked.select(F.when(lf, F.col("u")).otherwise(F.col("v")).alias("src"),
                             F.when(lf, F.col("v")).otherwise(F.col("u")).alias("dst"))
    if ckpt_oriented:
        oriented = oriented.localCheckpoint(eager=True)
    return edges, deg, oriented

def full(ckpt_oriented):
    edges, deg, oriented = derive(ckpt_oriented)
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs")).localCheckpoint(eager=True)
    eu = adj.select("src", F.explode("nbrs").alias("dst"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("src").alias("jv"), F.col("nbrs").alias("nbrs_v"))
    tri = (eu.join(adj_v, F.col("dst") == F.col("jv"))
           .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("t"))
           .agg(F.coalesce(F.sum("t"), F.lit(0).cast("bigint")).alias("triangles")))
    summary = edges.agg(F.count("*").alias("edges"))
    wedges = deg.agg((F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2)).alias("wedges"))
    return (summary.crossJoin(F.broadcast(wedges)).crossJoin(F.broadcast(tri))
            .select("edges", "wedges", "triangles"))

vals = {k: [tuple(r) for r in full(k).collect()] for k in (True, False)}
print("identity:", "MATCH" if vals[True] == vals[False] else f"MISMATCH {vals}")
res = {True: [], False: []}
for _ in range(4):
    for k in (True, False):
        t0 = time.perf_counter()
        full(k).write.format("noop").mode("overwrite").save()
        res[k].append(round(time.perf_counter() - t0, 3))
        gc.collect()
for k, v in res.items():
    print(f"ckpt_oriented={k}: min={min(v):.3f} {v}")
spark.stop()
