"""Registry plumbing for conformance queries.

Conventions that make the DuckDB-oracle hash comparison robust:
- every computed/aggregate column is aliased identically on both sides;
- floating-point aggregates are ``round(x, n)``-ed in BOTH engines (double
  summation order differs between engines; rounding inside the query makes
  results bit-comparable);
- rankings/limits always carry a deterministic tiebreak column;
- timestamps stay TIMESTAMP_NTZ end-to-end (timezone-independent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from map_reduce_engine_spark.io import read_table


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB over the fixture views; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite once swallowed a query for a whole round —
            # duplicate registration is always a bug, fail at import
            raise ValueError(f"duplicate registry name: {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture table loader (handles the events nanos-timestamp special case)."""
    return read_table(spark, sf_dir, name)
