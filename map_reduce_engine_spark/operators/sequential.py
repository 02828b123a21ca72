"""Sequential per-group operators — the sanctioned grouped-map Python path.

Some per-group logic is genuinely order-dependent (recurrences over event
time) and has no single-statement SQL form. These run as Arrow-batched
``applyInPandas`` — the reference's per-group ReduceRunner analogue
(``ReduceRunner.java:90-105``), here with bounded per-group state and
deterministic ordering.

Scale shape: one shuffle on the group key; each task holds one group's rows
(bounded by per-user event counts, not table size). This is the engine's
pattern for any custom stateful batch operator; the streaming twin is
``applyInPandasWithState`` (streaming/windows.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def ewma_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Final exponentially-weighted moving average per group.

    ``s_1 = x_1; s_i = alpha*x_i + (1-alpha)*s_{i-1}`` over rows ordered by
    ``order_cols`` (must be a unique key within the group for determinism).
    Returns (group, ewma, n_events).
    """
    schema = f"{group_col} BIGINT, ewma DOUBLE, n_events BIGINT"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s = None
        for x in pdf[value_col]:
            s = float(x) if s is None else alpha * float(x) + (1.0 - alpha) * s
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "ewma": [s], "n_events": [len(pdf)]}
        )

    cols = [group_col, *order_cols, value_col]
    return df.select(*cols).groupBy(group_col).applyInPandas(run, schema=schema)


def ewma_per_group_arrow(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """``ewma_per_group`` on the Arrow-native grouped path (``applyInArrow``).

    Identical recurrence; the group arrives as a ``pyarrow.Table`` with NO
    pandas materialization — for wide groups this skips the Arrow→pandas
    conversion entirely (no index, no block consolidation), the cheapest
    Python boundary Spark 4 offers. Conformance-tested to produce exactly
    the applyInPandas twin's results.
    """
    import pyarrow as pa

    schema = f"{group_col} BIGINT, ewma DOUBLE, n_events BIGINT"

    def run(table: "pa.Table") -> "pa.Table":
        idx = sorted(
            range(table.num_rows),
            key=lambda i: tuple(table[c][i].as_py() for c in order_cols),
        )
        s = None
        vals = table[value_col]
        for i in idx:
            x = float(vals[i].as_py())
            s = x if s is None else alpha * x + (1.0 - alpha) * s
        return pa.table(
            {
                group_col: [table[group_col][0].as_py()],
                "ewma": [s],
                "n_events": [table.num_rows],
            }
        )

    cols = [group_col, *order_cols, value_col]
    return df.select(*cols).groupBy(group_col).applyInArrow(run, schema=schema)
