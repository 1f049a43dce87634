"""Every registered query with an oracle must hash-match it (driver's gate,
run locally at sf0.01). Adding a query to the registry auto-enrolls it."""

from __future__ import annotations

import pytest

from cooler_mapreduce_spark.registry import load_all
from tests.oracle import assert_matches_oracle

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, oracle_sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_matches_oracle(df, spec.oracle, oracle_sf_dir, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
