"""Closing full-registry rehearsal (the r7 practice, now checked in):
run EVERY registered query from a fresh ``local[8]`` /
8-shuffle-partition process — the CPU-count axis the driver may differ
on — and check each against its DuckDB oracle (hash-match for oracled
queries, rows-check for the rows-only tiers).

Usage: python scripts/full_rehearsal.py [sf_dir]   (default sf0.01)
Prints one line per query and a final SUMMARY line; exits non-zero on
any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # the default 1g driver heap survives sf0.01 but kills the JVM at
        # sf0.1's graph tier (checkpoint blocks live in the single local
        # JVM); match the engine session's allocation
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.oracle import assert_matches_oracle

    qs, osql = e.queries(), e.oracle_sql()
    n_hash = n_rows = 0
    failed: list[str] = []
    for name in qs:
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                assert_matches_oracle(df, osql[name], sf_dir, name)
                n_hash += 1
                print(f"{name} HASH-GREEN", flush=True)
            else:
                n = df.count()
                assert n >= 0
                n_rows += 1
                print(f"{name} rows-only n={n}", flush=True)
        except Exception as ex:  # noqa: BLE001 — rehearsal must report, not die
            failed.append(name)
            print(f"{name} FAIL {str(ex)[:200]}", flush=True)
    print(
        f"SUMMARY total={len(qs)} hash_green={n_hash} rows_only={n_rows} "
        f"failed={len(failed)} {failed}"
    )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
