#!/usr/bin/env python
"""Build the 10x inflated copy of sf0.1 used by scale_sweep.py.

Method (the same one behind SCALING.md "Measured 10x scale-up"): the
SF-scaled tables are unioned K times with key offsets so join/group keys
stay distinct across replicas (no artificial key collapse); dimension
tables (region/nation/customer/supplier/part) are copied as-is — at a
real 10x SF they grow too, but sharing them keeps every join's RIGHT
side constant so the sweep isolates FACT-side scaling. documents and
embeddings inflate with doc_id/vec_id offsets; their text/vector
payloads repeat, which makes pair-producing dedup queries' OUTPUT grow
superlinearly — that is the inflation method, not a plan defect (see
SCALING.md's interpretation rules).

Usage:
    python scripts/build_inflated.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cooler_mapreduce_spark.session import get_session  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_inflated"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

#: table -> key columns that get +i*OFFSET per replica (keeps keys
#: globally distinct; foreign keys into the SHARED dims stay unchanged).
_OFFSET = 100_000_000
_FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    # event_id offsets so replicas stay globally distinct rows (distinct/
    # key-on-event_id queries must scale, not collapse to 1x — round-6
    # advice); user_id stays shared: per-user history just gets denser
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    spark = get_session("inflate")
    os.makedirs(DST, exist_ok=True)
    for t in _DIMS:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
        print(f"{t}: shared (copied)")
    for t, keys in _FACTS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(K):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * _OFFSET))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: x{K} ({out.count()} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
