"""Developer loop: check named queries against their oracles on one session.

Usage: python scripts/dev_check.py name [name ...] [--sf DIR]
Same harness as tests/test_oracle_parity.py, without pytest startup cost
per query; exits non-zero on the first failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.session import get_session
    from tests.oracle import assert_matches_oracle

    specs = load_all()
    spark = get_session("dev-check", cpus=8)
    for name in args:
        spec = specs[name]
        df = spec.fn(spark, sf_dir)
        if spec.oracle is None:
            n = df.count()
            print(f"{name} ROWS-ONLY n={n}", flush=True)
        else:
            assert_matches_oracle(df, spec.oracle, sf_dir, name)
            print(f"{name} HASH-GREEN", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
