"""Query registry — every operator's (Spark callable, DuckDB oracle SQL) pair.

This is the engine's conformance surface: each entry is one capability from
SURVEY.md §2 (Part A reference parity, Part B relational categories, Part C
LLM-pipeline extensions). The driver runs the Spark side and the oracle SQL
side-by-side at sf0.01 and hash-compares results (CORRECTNESS gate);
entries without SQL-expressible semantics carry ``oracle=None`` and get a
rows-only check.
"""

from map_reduce_engine_spark.queries.base import REGISTRY, Query

# importing registers the queries
from map_reduce_engine_spark.queries import relational  # noqa: F401
from map_reduce_engine_spark.queries import text  # noqa: F401
from map_reduce_engine_spark.queries import events  # noqa: F401
from map_reduce_engine_spark.queries import dedup  # noqa: F401
from map_reduce_engine_spark.queries import similarity  # noqa: F401
from map_reduce_engine_spark.queries import temporal  # noqa: F401
from map_reduce_engine_spark.queries import advanced  # noqa: F401
from map_reduce_engine_spark.queries import tpch  # noqa: F401
from map_reduce_engine_spark.queries import pipeline  # noqa: F401
from map_reduce_engine_spark.queries import retrieval  # noqa: F401

__all__ = ["REGISTRY", "Query"]
