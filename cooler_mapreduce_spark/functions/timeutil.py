"""Timestamp arithmetic that is agnostic to TIMESTAMP vs TIMESTAMP_NTZ.

Parquet writers differ on whether event time is annotated as
UTC-adjusted (``isAdjustedToUTC=true`` → Spark ``TIMESTAMP``) or naive
(``isAdjustedToUTC=false`` → Spark ``TIMESTAMP_NTZ`` under the default
``spark.sql.parquet.inferTimestampNTZ.enabled``). ``unix_micros`` only
accepts the former, so any operator using it breaks the moment a source
switches annotation — exactly what a multi-tenant 100 TB lake does.
``timestamp_diff`` accepts both types, and every gap/duration here is a
*difference*, which is annotation-invariant. Use these helpers instead
of ``unix_micros`` in operators.

LTZ contract: the epoch literals below are TIMESTAMP_NTZ, so when the
input column is TIMESTAMP (LTZ) the mixed-type coercion measures
against the session-timezone clock, and ``wall_trunc``'s NTZ cast
renders the instant in the session zone — i.e. for LTZ inputs "wall
clock" means *the session-timezone rendering of the instant*, which is
the only wall clock an instant has. The engine pins the session
timezone to UTC (``session.apply_session_defaults``), making both
flavors agree bit-for-bit — asserted by
tests/test_invariance.py::test_result_invariant_under_timestamp_flavor,
which runs the event-time queries on UTC-adjusted and naive copies of
the same instants. Deployments that unpin the session timezone get
session-zone wall clocks for LTZ columns, by design.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.column import Column as ColumnType


def us_between(start: Column | str, end: Column | str) -> Column:
    """Microseconds from ``start`` to ``end`` (end - start), exact
    integer arithmetic; NULL if either side is NULL. Works for both
    ``TIMESTAMP`` and ``TIMESTAMP_NTZ`` columns (both sides must be the
    same type, which same-column lag/min/max always satisfies)."""
    s = start if isinstance(start, ColumnType) else F.col(start)
    e = end if isinstance(end, ColumnType) else F.col(end)
    return F.timestamp_diff("MICROSECOND", s, e)


def wall_trunc(ts: Column | str, unit: str) -> Column:
    """Truncate a timestamp to hour/day/month in its OWN wall clock,
    returning TIMESTAMP_NTZ.

    ``F.date_trunc`` always returns session-timezone TIMESTAMP — for an
    NTZ input it round-trips the value through the session zone, so the
    collected result shifts with ``spark.sql.session.timeZone`` (and
    with the renderer: collect() uses the JVM zone, toPandas() the
    session zone). These forms never leave the wall clock: day/month go
    through tz-free DATE truncation; hour is integer arithmetic on
    seconds-since-epoch.
    """
    c = ts if isinstance(ts, ColumnType) else F.col(ts)
    if unit == "day":
        return F.to_date(c).cast("timestamp_ntz")
    if unit == "month":
        return F.trunc(c, "month").cast("timestamp_ntz")
    if unit == "hour":
        # microsecond-level arithmetic: second-level deltas would leave
        # the fractional seconds of ts in place. Both diff operands are
        # NTZ (the input is cast explicitly), so the arithmetic never
        # mixes timestamp flavors: a mixed NTZ-literal/LTZ-column diff
        # would silently measure against the UTC instant clock instead
        # of the wall clock. For LTZ inputs the NTZ cast reads the wall
        # clock in the SESSION timezone — the engine pins it to UTC
        # (session.apply_session_defaults), which is the documented
        # contract for LTZ event-time columns.
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        wall = c.cast("timestamp_ntz")
        us = F.timestamp_diff("MICROSECOND", epoch, wall)
        hour_us = 3_600_000_000
        delta = (F.floor(us / hour_us) * hour_us - us).cast("long")
        return F.timestamp_add("MICROSECOND", delta, wall)
    raise ValueError(f"unsupported unit {unit!r}; use hour/day/month")


def sec_since_epoch(ts: Column | str) -> Column:
    """Whole seconds since 1970-01-01 00:00:00 in the column's own clock
    (wall-clock for NTZ; for LTZ inputs, the wall clock in the session
    timezone, which the engine pins to UTC — the diff is computed
    NTZ-vs-NTZ so flavors never mix, see :func:`wall_trunc`). Replaces
    ``cast(ts as long)``, which Spark forbids on TIMESTAMP_NTZ.
    Truncates like the long cast (diff is non-negative for post-epoch
    data, so truncation == floor)."""
    c = ts if isinstance(ts, ColumnType) else F.col(ts)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("SECOND", epoch, c.cast("timestamp_ntz"))
