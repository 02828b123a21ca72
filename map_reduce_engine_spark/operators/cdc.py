"""CDC / upsert operators: MERGE-INTO emulation and SCD2 history.

The reference has no mutation concept at all (jobs are read→compute→write,
``MasterNode.java:415-421``); these are the change-data-capture operators a
production table pipeline needs. Without a transactional table format
(Delta/Iceberg jars are not in this environment) MERGE is emulated the
classic way: anti-join + union — a full rewrite of the target, which is
exactly what a parquet-only lakehouse does (rewrite the affected partitions;
with Delta the same operators become native ``MERGE INTO``).

Scale shape: one shuffle-or-broadcast join on the merge key per operator,
no windows over raw data except SCD2's per-key version ordering (bounded by
versions-per-key, not table size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE INTO target USING source: matched rows replaced, new inserted.

    Implemented as ``target ANTI-JOIN source ∪ source`` — the standard
    emulation on immutable storage. Both inputs must share a schema.
    """
    untouched = target.join(source.select(*keys), keys, "left_anti")
    return untouched.unionByName(source)


def merge_delete(target: DataFrame, tombstones: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ... WHEN MATCHED THEN DELETE: drop target rows whose key
    appears in ``tombstones`` (one anti-join)."""
    return target.join(tombstones.select(*keys), keys, "left_anti")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str,
    current_flag: str = "is_current",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: append new versions, close old ones.

    ``dim`` carries (business key, attributes, valid_from, valid_to,
    is_current); ``updates`` carries (key, attributes, effective_col).
    Each updated key's current row is closed at the update's effective
    timestamp and the update appended as the new current version. Keys not
    updated pass through untouched.
    """
    eff = updates.select(
        F.col(key), F.col(effective_col).alias("__eff")
    )
    closed = (
        dim.join(F.broadcast(eff), key, "inner")
        .where(F.col(current_flag))
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(current_flag, F.lit(False))
        .drop("__eff")
    )
    untouched = dim.join(eff.select(key), key, "left_anti").unionByName(
        dim.join(eff.select(key), key, "left_semi").where(~F.col(current_flag))
    )
    new_versions = (
        updates.withColumn(valid_from, F.col(effective_col))
        .withColumn(valid_to, F.lit(None).cast(dim.schema[valid_to].dataType))
        .withColumn(current_flag, F.lit(True))
        .drop(effective_col)
    )
    return untouched.unionByName(closed).unionByName(new_versions, allowMissingColumns=False)


def latest_version_per_key(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """Compact a change log to its latest version per key (CDC replay):
    one window over (key) ordered by version desc — the read-side of
    upsert when the log is append-only."""
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_build(
    log: DataFrame,
    key: str,
    order_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    seq_col: str = "version_seq",
) -> DataFrame:
    """Build the full SCD2 history from an append-only change log.

    Every log row becomes one dimension version: ``valid_from`` is the row's
    own change timestamp (the first of ``order_cols``), ``valid_to`` is the
    next version's — NULL (open interval) on the latest — and the latest row
    per key carries ``is_current``.  ``order_cols`` must end in a unique
    tiebreak column so version order is deterministic under ties.

    Scale shape: one shuffle on the business key; the window frame is
    bounded by versions-per-key, never table size.  This is the batch
    "replay the log into a queryable history" half of CDC; ``scd2_apply``
    is the incremental "merge one day's updates" half.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        log.withColumn(seq_col, F.row_number().over(w).cast("bigint"))
        .withColumn(valid_from, F.col(order_cols[0]))
        .withColumn(valid_to, F.lead(order_cols[0]).over(w))
        .withColumn(current_flag, F.col(valid_to).isNull())
    )
