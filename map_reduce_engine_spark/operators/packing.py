"""Sequence packing + winnowing fingerprints as reusable operators.

Extracted cores of the ``pack_sequences`` / ``winnowing_fingerprint``
conformance queries (queries/pipeline.py) so their guarantees are
property-testable over arbitrary inputs (tests/test_pipeline_properties.py),
not just the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.text import tokens_col


def pack_bins(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a ``bin_id`` by running-sum position within its group.

    bin_id = floor((cumsum(size) - 1) / budget) over (partition by group,
    order by order_col). Deterministic for a stable order key; the window
    partitions by group so per-task state is one group's rows.

    Bin-capacity contract: a bin's total exceeds ``budget`` only by the
    overhang of its LAST item (an item straddling the boundary joins the
    bin its cumulative range starts in) — i.e. sum(bin) < budget +
    max(item) for every bin. When every item fits the budget, bin ids are
    contiguous from 0 per group; an item LARGER than the budget occupies
    its cumulative range alone and skips the intervening bin ids.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "bin_id", F.floor((F.sum(size_col).over(w) - 1) / budget).cast("bigint")
    )


def winnow_hashes_col(arr_col: str, k: int = 4) -> Column:
    """Array of md5-prefix rolling hashes of the ``k``-grams of a token
    array column (referenced by name).

    Engine-portable (md5 is identical everywhere, unlike xxhash64), so
    fingerprints computed by different engines agree — the property the
    DuckDB oracle twin relies on.

    PRECONDITION: callers must filter ``size(arr) >= k`` first — Spark's
    ``sequence(1, 0)`` is a descending [1, 0], not empty, so a shorter
    array would index position 0/-1 (see operators/text.py::skipgram_pairs
    for the guarded pattern).
    """
    grams = ", ".join(f"{arr_col}[i{'+' + str(j) if j else ''}-1]" for j in range(k))
    return F.expr(
        f"transform(sequence(1, size({arr_col}) - {k - 1}),"
        f" i -> cast(conv(substr(md5(concat_ws(' ', {grams})), 1, 8), 16, 10) as bigint))"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """(id, fp) — winnowing fingerprint selection (Schleimer et al. SIGMOD'03).

    Hash every token k-gram, slide a window of ``w`` positions, keep each
    window's minimum hash, distinct per document. Guarantee: two documents
    sharing a contiguous token run of ≥ w + k - 1 tokens share at least one
    selected fingerprint. Window state is per-document (partitionBy id).
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("l")
    ).where(F.size("l") >= k)
    hashes = toks.select(
        "id", F.posexplode(winnow_hashes_col("l", k=k)).alias("pos", "h")
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    return hashes.select("id", F.min("h").over(win).alias("fp")).distinct()
