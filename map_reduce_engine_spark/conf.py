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
session: scopes form a per-(session, key) STACK — the first scope records
the pristine value, every scope pushes its own value, and when any scope
exits the next-innermost still-active scope's value is re-applied (the
pristine value only when the last holder exits). So a loop nested inside
another loop neither leaks its value into the remainder of the outer scope
nor clobbers the outer restore (the naive save/set/restore-in-finally idiom
is last-writer-wins on both counts).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from collections.abc import Iterator, Mapping

from pyspark.sql import SparkSession

_lock = threading.Lock()
# (id(session), conf key) -> [pristine value, [(scope token, value), ...]]
_held: dict[tuple[int, str], list] = {}


@contextmanager
def scoped_conf(spark: SparkSession, settings: Mapping[str, object]) -> Iterator[None]:
    """Set ``settings`` on ``spark.conf`` for the scope, then restore.

    Re-entrant and overlap-safe per (session, key): scopes stack. The first
    scope to touch a key records its pristine value; on exit, each scope
    removes its own entry and re-applies the value of the next-innermost
    scope still holding the key (the pristine value when none remains) —
    so an inner scope exiting mid-way through an outer scope restores the
    OUTER scope's value, not the session default and not its own leftover.
    """
    token = object()
    sid = id(spark)
    with _lock:
        # Read pristine values INSIDE the lock (a concurrent scope's
        # set/restore of the same key must not be snapshotted as
        # "pristine") but BEFORE any mutation of the registry: conf.get
        # can raise for keys without defaults, and reads-then-writes
        # ordering means a raise leaves no phantom stack entries that
        # later scopes would "restore". Only keys no scope currently
        # holds need a read — held keys already carry their pristine.
        pristine = {
            k: spark.conf.get(k) for k in settings if (sid, k) not in _held
        }
        for k, v in settings.items():
            slot = _held.get((sid, k))
            if slot is None:
                _held[(sid, k)] = [pristine[k], [(token, str(v))]]
            else:
                slot[1].append((token, str(v)))
    try:
        for k, v in settings.items():
            spark.conf.set(k, str(v))
        yield
    finally:
        with _lock:
            for k in settings:
                slot = _held[(sid, k)]
                slot[1] = [e for e in slot[1] if e[0] is not token]
                if slot[1]:
                    spark.conf.set(k, slot[1][-1][1])
                else:
                    spark.conf.set(k, slot[0])
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
