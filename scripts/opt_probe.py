#!/usr/bin/env python
"""Round-11 optimization probe: time A/B variants of suspect plans in one
warm session (bench.py's warm-up + steady-state min-of-runs protocol,
noop sink). Usage: python scripts/opt_probe.py <case> [case ...]

Each case prints `# <name>: min=<s> runs=[...]` to stderr and one JSON
line per case to stdout. Cases are self-contained closures over the
warm session; nothing here is a registered query — this is the guide
§1 "measure first" harness for the optimization round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steady(fn, n_max=8, n_min=3):
    raw = []
    for i in range(n_max):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        raw.append(round(time.perf_counter() - t0, 3))
        del df
        import gc

        gc.collect()
        if i >= n_min - 1:
            lo, lo2 = sorted(raw)[:2]
            still = raw[-1] < 0.95 * min(raw[:-1])
            if lo2 <= lo * 1.12 and raw[-1] <= lo * 1.12 and not still:
                break
    return min(raw), raw


def main() -> None:
    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.session import get_session
    from cooler_mapreduce_spark.sources.catalog import TABLES, table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_session("opt-probe", cpus=cpus)
    specs = load_all()
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    spark.sparkContext.parallelize(range(cpus * 2), cpus).map(lambda x: x).count()
    import pandas as pd  # noqa: F401

    spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, schema="x int").count()
    hof = spark.range(0, 20000, 1, cpus).selectExpr(
        "aggregate(transform(sequence(0, 63), i -> id * i % 2147483647),"
        " CAST(0 AS BIGINT), (a, x) -> a + x) AS s"
    )
    for _ in range(6):
        hof.groupBy().sum("s").count()

    def registered(name):
        return lambda: specs[name].fn(spark, SF_DIR)

    cases: dict[str, object] = {}

    # ---- registered-query baselines (any name works) -------------------
    for name in specs:
        cases[name] = registered(name)

    # ---- fan-out A/B on the decimal-agg family --------------------------
    def ols_fanout():
        from cooler_mapreduce_spark.operators.aggregates import (
            _MLR_EXPRS,
        )
        from cooler_mapreduce_spark.functions.numeric import dsum

        li = table(spark, SF_DIR, "lineitem")  # fan_out default (True)
        q = F.col("l_quantity").cast("bigint")
        comp = li.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.count("*").cast("double").alias("nd"),
            F.sum(q).cast("double").alias("sx1"),
            dsum("l_discount").alias("sx2"),
            dsum("l_extendedprice").alias("sy"),
            F.sum(q * q).cast("double").alias("s11"),
            dsum(F.col("l_quantity") * F.col("l_discount")).alias("s12"),
            dsum(F.col("l_discount") * F.col("l_discount"), 4).alias("s22"),
            dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("s1y"),
            dsum(F.col("l_discount") * F.col("l_extendedprice"), 4).alias("s2y"),
        )
        return comp.select("l_returnflag", "n_rows", *[F.expr(e) for e in _MLR_EXPRS])

    cases["ols_fanout"] = ols_fanout

    # ---- pricing_summary variants ---------------------------------------
    def _pricing_body(li, dsum, davg):
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            li.filter(F.col("l_shipdate") <= "2001-09-02 00:00:00")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dsum("l_quantity").alias("sum_qty"),
                dsum("l_extendedprice").alias("sum_base_price"),
                dsum(disc_price, 4).alias("sum_disc_price"),
                dsum(charge, 6).alias("sum_charge"),
                davg("l_quantity").alias("avg_qty"),
                davg("l_extendedprice").alias("avg_price"),
                davg("l_discount").alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    def pricing_hash_fanout():
        from cooler_mapreduce_spark.functions.numeric import davg, dsum

        li = table(spark, SF_DIR, "lineitem", fan_out=False)
        li = li.repartition(cpus, F.xxhash64("l_orderkey", "l_linenumber"))
        return _pricing_body(li, dsum, davg)

    cases["pricing_hash_fanout"] = pricing_hash_fanout

    def pricing_narrow_dec():
        def dsum8(col, scale=2):
            c = F.col(col) if isinstance(col, str) else col
            return F.sum(c.cast(f"decimal(8,{scale})")).cast("double")

        def davg8(col, scale=2):
            c = F.col(col) if isinstance(col, str) else col
            return dsum8(c, scale) / F.count(c)

        li = table(spark, SF_DIR, "lineitem")
        return _pricing_body(li, dsum8, davg8)

    cases["pricing_narrow_dec"] = pricing_narrow_dec

    def pricing_bigint():
        # exact fixed-point longs: values are exact ≤s-decimal rationals,
        # so round(v * 10^s) recovers the integer numerator exactly; the
        # final decimal(38,s) re-scale reproduces dsum's double bit-for-bit
        def bsum2(c, scale=2):
            if isinstance(c, str):
                c = F.col(c)
            s = F.sum(F.round(c * F.lit(float(10**scale))).cast("bigint"))
            return (s.cast("decimal(38,0)") / F.lit(10**scale).cast("decimal(20,0)")).cast("double")

        def bavg(c, scale=2):
            return bsum2(c, scale) / F.count(F.col(c) if isinstance(c, str) else c)

        li = table(spark, SF_DIR, "lineitem")
        return _pricing_body(li, bsum2, bavg)

    cases["pricing_bigint"] = pricing_bigint

    def ols_bigint_fanout():
        def bsum2(c, scale=2):
            if isinstance(c, str):
                c = F.col(c)
            s = F.sum(F.round(c * F.lit(float(10**scale))).cast("bigint"))
            return (s.cast("decimal(38,0)") / F.lit(10**scale).cast("decimal(20,0)")).cast("double")

        from cooler_mapreduce_spark.operators.aggregates import _MLR_EXPRS

        li = table(spark, SF_DIR, "lineitem")
        q = F.col("l_quantity").cast("bigint")
        comp = li.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.count("*").cast("double").alias("nd"),
            F.sum(q).cast("double").alias("sx1"),
            bsum2("l_discount").alias("sx2"),
            bsum2("l_extendedprice").alias("sy"),
            F.sum(q * q).cast("double").alias("s11"),
            bsum2(F.col("l_quantity") * F.col("l_discount")).alias("s12"),
            bsum2(F.col("l_discount") * F.col("l_discount"), 4).alias("s22"),
            bsum2(F.col("l_quantity") * F.col("l_extendedprice")).alias("s1y"),
            bsum2(F.col("l_discount") * F.col("l_extendedprice"), 4).alias("s2y"),
        )
        return comp.select("l_returnflag", "n_rows", *[F.expr(e) for e in _MLR_EXPRS])

    cases["ols_bigint_fanout"] = ols_bigint_fanout

    def pricing_nofan():
        from cooler_mapreduce_spark.functions.numeric import davg, dsum

        li = table(spark, SF_DIR, "lineitem", fan_out=False)
        return _pricing_body(li, dsum, davg)

    cases["pricing_nofan"] = pricing_nofan

    # ---- pagerank bigint contribution sums ------------------------------
    def pagerank_bigint():
        from cooler_mapreduce_spark.operators.graph import (
            _DAMPING,
            _PR_ITERATIONS,
            _Q,
            _uniform_trade_graph,
        )

        edges, deg = _uniform_trade_graph(spark, SF_DIR)
        n = deg.agg(F.count("*").alias("n_nodes"))
        ranks = deg.crossJoin(F.broadcast(n)).select(
            F.col("src").alias("node"),
            "outdeg",
            (F.lit(1.0) / F.col("n_nodes")).alias("rank"),
        )
        q = F.lit(float(_Q))
        for _ in range(_PR_ITERATIONS):
            contribs = ranks.hint("shuffle_hash").join(
                edges, F.col("node") == F.col("src")
            ).select(
                F.col("dst").alias("to"),
                F.floor(F.col("rank") / F.col("outdeg") * q).cast("bigint").alias("c"),
            )
            sums = contribs.groupBy("to").agg(F.sum("c").alias("s"))
            ranks = (
                sums.join(deg.hint("shuffle_hash"), F.col("to") == F.col("src"))
                .crossJoin(F.broadcast(n))
                .select(
                    F.col("to").alias("node"),
                    "outdeg",
                    (
                        F.lit(0.15) / F.col("n_nodes")
                        + F.lit(_DAMPING) * (F.col("s").cast("double") / q)
                    ).alias("rank"),
                )
            )
        return (
            ranks.orderBy(F.desc("rank"), F.asc("node"))
            .limit(20)
            .select("node", F.round("rank", 12).alias("rank"))
        )

    cases["pagerank_bigint"] = pagerank_bigint

    # ---- pagerank: fold dst outdeg into the edge checkpoint -------------
    def pagerank_dstdeg():
        from cooler_mapreduce_spark.operators.graph import (
            _DAMPING,
            _PR_ITERATIONS,
            _Q,
        )

        li = table(spark, SF_DIR, "lineitem", fan_out=False)
        o = table(spark, SF_DIR, "orders", fan_out=False)
        fwd = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                (F.col("l_suppkey") * 2).alias("src"),
                (F.col("o_custkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        edges0 = fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        edges0 = edges0.repartition("src").localCheckpoint(eager=True)
        deg = edges0.groupBy("src").agg(F.count("*").alias("outdeg"))
        dd = deg.select(F.col("src").alias("d_dst"), F.col("outdeg").alias("dst_outdeg"))
        edges = (
            edges0.join(dd.hint("shuffle_hash"), F.col("dst") == F.col("d_dst"))
            .select("src", "dst", "dst_outdeg")
            .repartition("src")
            .localCheckpoint(eager=True)
        )
        deg = deg.localCheckpoint(eager=True)
        n = deg.agg(F.count("*").alias("n_nodes"))
        ranks = deg.crossJoin(F.broadcast(n)).select(
            F.col("src").alias("node"),
            "outdeg",
            (F.lit(1.0) / F.col("n_nodes")).alias("rank"),
        )
        q = F.lit(float(_Q))
        for _ in range(_PR_ITERATIONS):
            contribs = ranks.hint("shuffle_hash").join(
                edges, F.col("node") == F.col("src")
            ).select(
                F.col("dst").alias("to"),
                F.col("dst_outdeg").alias("od"),
                F.floor(F.col("rank") / F.col("outdeg") * q).alias("c"),
            )
            sums = contribs.groupBy("to").agg(
                F.sum("c").alias("s"), F.max("od").alias("od")
            )
            ranks = sums.crossJoin(F.broadcast(n)).select(
                F.col("to").alias("node"),
                F.col("od").alias("outdeg"),
                (
                    F.lit(0.15) / F.col("n_nodes")
                    + F.lit(_DAMPING) * (F.col("s").cast("double") / q)
                ).alias("rank"),
            )
        return (
            ranks.orderBy(F.desc("rank"), F.asc("node"))
            .limit(20)
            .select("node", F.round("rank", 12).alias("rank"))
        )

    cases["pagerank_dstdeg"] = pagerank_dstdeg

    # ---- pagerank: visible partitioning via ckpt-then-repartition -------
    # localCheckpoint does NOT preserve outputPartitioning (probed on
    # Spark 4.1: Scan ExistingRDD comes back UnknownPartitioning), so the
    # committed repartition("src").localCheckpoint pattern re-exchanges
    # edges AND deg every iteration. Variant: checkpoint the raw frame,
    # then put an explicit repartition(n, key) ON TOP — the planner sees
    # the hash partitioning (zero ENSURE_REQUIREMENTS exchanges in the
    # loop except the groupBy), and AQE's stage cache runs the identical
    # REPARTITION_BY_NUM exchange once, reusing it across iterations.
    def pagerank_reuse():
        from cooler_mapreduce_spark.operators.graph import (
            _DAMPING,
            _PR_ITERATIONS,
            _Q,
        )

        cpus_ = spark.sparkContext.defaultParallelism
        li = table(spark, SF_DIR, "lineitem", fan_out=False)
        o = table(spark, SF_DIR, "orders", fan_out=False)
        fwd = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                (F.col("l_suppkey") * 2).alias("src"),
                (F.col("o_custkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        edges0 = fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint(eager=True)
        edges = edges0.repartition(cpus_, "src")
        deg = (
            edges0.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .localCheckpoint(eager=True)
            .repartition(cpus_, "src")
        )
        n = deg.agg(F.count("*").alias("n_nodes"))
        ranks = deg.crossJoin(F.broadcast(n)).select(
            F.col("src").alias("node"),
            "outdeg",
            (F.lit(1.0) / F.col("n_nodes")).alias("rank"),
        )
        q = F.lit(float(_Q))
        for _ in range(_PR_ITERATIONS):
            contribs = ranks.hint("shuffle_hash").join(
                edges, F.col("node") == F.col("src")
            ).select(
                F.col("dst").alias("to"),
                F.floor(F.col("rank") / F.col("outdeg") * q).alias("c"),
            )
            sums = contribs.groupBy("to").agg(F.sum("c").alias("s"))
            ranks = (
                sums.join(deg.hint("shuffle_hash"), F.col("to") == F.col("src"))
                .crossJoin(F.broadcast(n))
                .select(
                    F.col("to").alias("node"),
                    "outdeg",
                    (
                        F.lit(0.15) / F.col("n_nodes")
                        + F.lit(_DAMPING) * (F.col("s").cast("double") / q)
                    ).alias("rank"),
                )
            )
        return (
            ranks.orderBy(F.desc("rank"), F.asc("node"))
            .limit(20)
            .select("node", F.round("rank", 12).alias("rank"))
        )

    cases["pagerank_reuse"] = pagerank_reuse

    # ---- triangle: orderkey-partitioned basket build --------------------
    def tri_fanout_graph():
        cpus_ = spark.sparkContext.defaultParallelism
        li = table(spark, SF_DIR, "lineitem", fan_out=False).select(
            "l_orderkey", "l_partkey"
        )
        li = li.repartition(cpus_, "l_orderkey")
        basket = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        )
        edges = (
            basket.select(
                F.explode(
                    F.flatten(
                        F.expr(
                            "transform(ps, (x, i) -> transform("
                            "slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v)))"
                        )
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .distinct()
            .localCheckpoint(eager=True)
        )
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
            .localCheckpoint(eager=True)
        )
        du = deg.select(F.col("node").alias("u"), F.col("d").alias("du")).hint(
            "shuffle_hash"
        )
        dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv")).hint(
            "shuffle_hash"
        )
        ranked = edges.join(du, "u").join(dv, "v")
        lower_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        oriented = ranked.select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        ).localCheckpoint(eager=True)
        return oriented.limit(1)

    cases["tri_fanout_graph"] = tri_fanout_graph

    # ---- triangle census stage split ------------------------------------
    def tri_graph_only():
        from cooler_mapreduce_spark.operators.graph import _copurchase_graph

        edges, deg, oriented = _copurchase_graph(spark, SF_DIR)
        return oriented.limit(1)

    cases["tri_graph_only"] = tri_graph_only

    for name in sys.argv[1:]:
        fn = cases[name]
        mn, raw = _steady(fn)
        print(f"# {name}: min={mn:.3f} runs={raw}", file=sys.stderr)
        print(json.dumps({"case": name, "min": mn, "runs": raw}))
    spark.stop()


if __name__ == "__main__":
    main()
