"""Query registry — the engine's public query inventory.

Each operator/query from SURVEY.md §2 registers here with:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native implementation;
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run over the same
  parquet tables (None only for genuinely non-SQL-expressible operators,
  e.g. custom stateful streaming);
- ``tags`` — coverage-category labels matching SURVEY.md §2.4.

The driver's correctness gate runs every entry side-by-side with its oracle
and hash-compares values, so implementations alias every computed column to
the oracle's column names and keep float outputs *bit-deterministic* (see
``functions.numeric``).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

#: Modules that self-register queries on import, in registration order.
_QUERY_MODULES = (
    "cooler_mapreduce_spark.operators.parity",
    "cooler_mapreduce_spark.operators.tpch",
    "cooler_mapreduce_spark.operators.joins",
    "cooler_mapreduce_spark.operators.windows",
    "cooler_mapreduce_spark.operators.aggregates",
    "cooler_mapreduce_spark.operators.setops",
    "cooler_mapreduce_spark.operators.scalars",
    "cooler_mapreduce_spark.operators.dedup",
    "cooler_mapreduce_spark.operators.similarity",
    "cooler_mapreduce_spark.operators.textstats",
    "cooler_mapreduce_spark.operators.sampling",
    "cooler_mapreduce_spark.operators.merge",
    "cooler_mapreduce_spark.operators.behavioral",
    "cooler_mapreduce_spark.operators.multimodal",
    "cooler_mapreduce_spark.operators.skew",
    "cooler_mapreduce_spark.operators.udtf_ops",
    "cooler_mapreduce_spark.operators.mapreduce",
    "cooler_mapreduce_spark.operators.sqlapi",
    "cooler_mapreduce_spark.operators.pipeline",
    "cooler_mapreduce_spark.streaming.windows",
    "cooler_mapreduce_spark.streaming.stateful",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named engine query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate not-yet-written modules during incremental build, but
            # re-raise genuine import errors inside an existing module.
            if e.name and not e.name.startswith("cooler_mapreduce_spark"):
                raise
    return QUERIES
