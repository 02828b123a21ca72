"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``map_reduce_engine_spark/queries/`` — one registry
entry per implemented operator from SURVEY.md §2 (reference parity, Part B
relational categories, Part C LLM-pipeline extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's cwd
sys.path.insert(0, str(Path(__file__).resolve().parent))

from map_reduce_engine_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: WordCount over documents.

    The reference's flagship job (WordCount.java:13-35) as a declarative
    scan → explode → hash-aggregate pipeline.
    """
    return REGISTRY["wordcount"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for non-SQL-expressible ops)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
