"""Bit-deterministic float aggregates (Spark side + oracle-SQL side).

Floating-point ``SUM`` is order-dependent: Spark combines partial sums in
shuffle-arrival order, so two runs (or Spark vs. an oracle engine) can
differ in the last ULPs. That is fine for analytics but fatal for a
value-hash correctness gate — and it gets *worse* at 100 TB where thousands
of partials combine in nondeterministic order.

The fix: aggregate through fixed-point decimals (exact, associative,
commutative — order-independent), then cast the final value to double.
Both Spark and DuckDB compute the identical decimal sum and the identical
nearest-double, bit for bit, regardless of partition count or arrival
order. Derived stats (avg) divide that exact sum by an exact count in
double — one deterministic FP op.

``dsum``/``davg`` build the Spark Column; ``sql_dsum``/``sql_davg`` emit
the matching DuckDB SQL fragment. Use them in *every* oracle-checked query
that sums or averages a double column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: decimal(30, s) sums promote to decimal(38, s) in both Spark and DuckDB —
#: 36 integer digits of headroom, no overflow at any realistic scale.
_PRECISION = 30


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / exact count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
