#!/usr/bin/env python
"""r12 probe: (a) pagerank n-broadcast hoist A/B, (b) triangle census
stage decomposition.

(a) The r11 'Not yet optimized' candidate: the node count n feeds every
iteration as a broadcast 1-row aggregate; each iteration's plan carries
the deg-scan + count subtree and the final plan re-plans it per round.
Variant B collects n ONCE as a driver-side O(1) scalar (the verdict
explicitly blesses this as not a scale-killer collect) and folds it into
literals: rank init 1.0/n, teleport 0.15/n — identical IEEE doubles.

(b) Times _copurchase_graph (edges/deg/oriented, eagerly checkpointed)
separately from the census body so r12 knows where triangle's 4-5 s
actually goes before touching payload encodings.

Usage: python scripts/opt_probe7.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import functions as F

from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark.operators.graph import (
    _DAMPING,
    _PR_ITERATIONS,
    _Q,
    _copurchase_graph,
    _uniform_trade_graph,
    pagerank_frame,
)


def pagerank_frame_hoisted(spark, sf_dir, iterations=_PR_ITERATIONS):
    edges, deg = _uniform_trade_graph(spark, sf_dir)
    n = deg.count()  # O(1) scalar, one job — replaces the per-iteration broadcast
    ranks = deg.select(
        F.col("src").alias("node"),
        "outdeg",
        (F.lit(1.0) / F.lit(n)).alias("rank"),
    )
    q = F.lit(float(_Q))
    for _ in range(iterations):
        contribs = ranks.hint("shuffle_hash").join(
            edges, F.col("node") == F.col("src")
        ).select(
            F.col("dst").alias("to"),
            F.floor(F.col("rank") / F.col("outdeg") * q).alias("c"),
        )
        sums = contribs.groupBy("to").agg(F.sum("c").alias("s"))
        ranks = sums.join(deg.hint("shuffle_hash"), F.col("to") == F.col("src")).select(
            F.col("to").alias("node"),
            "outdeg",
            (
                F.lit(0.15) / F.lit(n)
                + F.lit(_DAMPING) * (F.col("s").cast("double") / q)
            ).alias("rank"),
        )
    return ranks


def top20(frame):
    return (
        frame.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select("node", F.round("rank", 12).alias("rank"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_session("opt_probe7", cpus=CPUS)
    from cooler_mapreduce_spark.sources.catalog import TABLES, table

    for t in TABLES:
        table(spark, SF_DIR, t).count()

    import gc

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # -- identity check first: both variants must produce identical rows
    a_rows = [tuple(r) for r in top20(pagerank_frame(spark, SF_DIR)).collect()]
    b_rows = [tuple(r) for r in top20(pagerank_frame_hoisted(spark, SF_DIR)).collect()]
    print(f"# pagerank identity: {'MATCH' if a_rows == b_rows else 'MISMATCH'}")
    if a_rows != b_rows:
        for x, y in zip(a_rows, b_rows):
            if x != y:
                print("  ", x, "!=", y)
        spark.stop()
        sys.exit(1)

    res = {"pr_statusquo": [], "pr_hoisted": []}
    for _ in range(rounds):
        for key, builder in (
            ("pr_statusquo", pagerank_frame),
            ("pr_hoisted", pagerank_frame_hoisted),
        ):
            t0 = time.perf_counter()
            noop(top20(builder(spark, SF_DIR)))
            res[key].append(round(time.perf_counter() - t0, 3))
            gc.collect()
    for k, v in res.items():
        print(f"{k}: min={min(v):.3f} {v}")

    # -- triangle decomposition
    der, body = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        edges, deg, oriented = _copurchase_graph(spark, SF_DIR)
        t1 = time.perf_counter()
        adj = oriented.groupBy("src").agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
        eu = adj.select(
            "src", F.explode("nbrs").alias("dst"), F.col("nbrs").alias("nbrs_u")
        )
        adj_v = adj.select(F.col("src").alias("jv"), F.col("nbrs").alias("nbrs_v"))
        tri = (
            eu.join(adj_v, F.col("dst") == F.col("jv"))
            .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("t"))
            .agg(F.coalesce(F.sum("t"), F.lit(0).cast("bigint")).alias("triangles"))
        )
        summary = edges.agg(F.count("*").alias("edges"))
        wedges = deg.agg(
            (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2)).alias("wedges")
        )
        noop(
            summary.crossJoin(F.broadcast(wedges))
            .crossJoin(F.broadcast(tri))
            .select("edges", "wedges", "triangles")
        )
        t2 = time.perf_counter()
        der.append(round(t1 - t0, 3))
        body.append(round(t2 - t1, 3))
        gc.collect()
    print(f"triangle derivation (edges+deg+oriented ckpts): min={min(der):.3f} {der}")
    print(f"triangle census body (adj+intersect+counts):    min={min(body):.3f} {body}")
    spark.stop()


if __name__ == "__main__":
    main()
