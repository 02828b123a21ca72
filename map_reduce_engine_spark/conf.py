"""Scoped session-conf overrides for iterative loop operators.

Iterative DataFrame loops (pagerank, connected components, label
propagation, BFS, BPE training) want AQE off and a graph-sized
``spark.sql.shuffle.partitions`` for the loop's duration: round shapes are
static and co-partitioned, so runtime re-planning only adds per-stage
latency, and surplus partitions multiply scheduling overhead on
vocabulary-sized state (measured ~2x wall time; see operators/graph.py).

Spark has no per-plan setting for these, so the override is necessarily
visible to anything planned on the same ``SparkSession`` while a loop runs
— callers that interleave planning with a running loop operator should use
a separate session (``spark.newSession()`` shares the context but not the
SQLConf). What this module DOES guarantee is overlap safety within a
session: each conf key's pristine value is recorded by the *outermost*
scope and restored only when the *last* scope holding it exits, so two
overlapping loops can never leave the session stuck on the inner loop's
values (the naive save/set/restore-in-finally idiom is last-writer-wins).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from collections.abc import Iterator, Mapping

from pyspark.sql import SparkSession

_lock = threading.Lock()
# (id(session), conf key) -> [depth, pristine value]
_held: dict[tuple[int, str], list] = {}


@contextmanager
def scoped_conf(spark: SparkSession, settings: Mapping[str, object]) -> Iterator[None]:
    """Set ``settings`` on ``spark.conf`` for the scope, then restore.

    Re-entrant and overlap-safe per (session, key): the first scope to
    touch a key records its pristine value; nested/overlapping scopes may
    re-set the key, and the pristine value is restored only when the last
    scope for that key exits.
    """
    keys = [(id(spark), k) for k in settings]
    with _lock:
        for (sid, k) in keys:
            slot = _held.get((sid, k))
            if slot is None:
                _held[(sid, k)] = [1, spark.conf.get(k)]
            else:
                slot[0] += 1
    try:
        for k, v in settings.items():
            spark.conf.set(k, str(v))
        yield
    finally:
        with _lock:
            for (sid, k) in keys:
                slot = _held[(sid, k)]
                slot[0] -= 1
                if slot[0] == 0:
                    spark.conf.set(k, slot[1])
                    del _held[(sid, k)]


@contextmanager
def loop_conf(spark: SparkSession, num_partitions: int) -> Iterator[None]:
    """The iterative-loop profile: AQE off + clamped shuffle partitions."""
    with scoped_conf(
        spark,
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": str(num_partitions),
        },
    ):
        yield
