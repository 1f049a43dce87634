"""DuckDB oracle harness — local mirror of the driver's correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side, then
compares (row count, column names, canonicalized values) with *exact*
equality.

The driver's canonicalizer sorts result frames with pandas
``sort_values``, which throws ``unhashable type: numpy.ndarray`` on
array-valued cells — so an oracle-checked query must emit ONLY scalar
cells (strings/numbers/bools/dates). ``assert_matches_oracle`` enforces
that (rejecting array/map/struct output columns on either side); under
that restriction passing here implies passing the driver's gate under
any canonicalization it uses. Queries with legitimately nested results
serialize them (``array_join``/``array_to_string``) or reshape to long
form before returning.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

from cooler_mapreduce_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _cell(v):
    """Canonical, hashable, engine-agnostic form of one value."""
    if v is None:
        return "∅"
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _cell(x)) for k, x in v.items()))
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # exact bits — floats must match bit-for-bit
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon = []
        for v in row:
            try:
                if v is None or (isinstance(v, float) and math.isnan(v)) or (
                    not isinstance(v, (np.ndarray, list, tuple, dict)) and pd.isna(v)
                ):
                    canon.append("∅" if not isinstance(v, float) else "NaN")
                    continue
            except (TypeError, ValueError):
                pass
            canon.append(_cell(v))
        out.append(tuple(canon))
    out.sort()
    return out


def _reject_complex_columns(df, name: str, side: str) -> None:
    """Driver-gate fidelity: its canonicalizer can't sort/hash array cells.

    Scans EVERY cell, not a head sample — a nullable array column whose
    first rows happen to be NULL must still be rejected."""
    complex_cols = [
        c
        for c in df.columns
        if any(
            isinstance(v, (np.ndarray, list, tuple, dict))
            for v in df[c]
        )
    ]
    assert not complex_cols, (
        f"{name}: {side} emits non-scalar cells in {complex_cols} — the driver's "
        f"canonicalizer cannot hash these; serialize with array_join/array_to_string "
        f"or reshape to long form"
    )


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    _reject_complex_columns(got, name, "Spark query")
    _reject_complex_columns(want, name, "oracle SQL")
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    g, w = canonical_rows(got), canonical_rows(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")
