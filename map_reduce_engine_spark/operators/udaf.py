"""Custom aggregates through the Arrow grouped-agg ``pandas_udf`` surface.

The reference's user-defined aggregation is the reduce UDF + the
``AddInterface`` merge (``ReduceRunner.java:90-108,154-172``); Spark's
typed equivalent is a grouped-aggregate pandas_udf (or a JVM Aggregator).
This module deliberately does NOT use ``from __future__ import annotations``
— pandas_udf infers the eval type from *runtime* type hints, and postponed
(stringified) annotations defeat that inference.

UDAF contract at scale: the function sees one whole group as pandas Series
(Arrow-batched). Results must be insensitive to the row order within the
group — same associativity/commutativity contract the reference's
AddInterface merge imposes.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg(v: pd.Series, w: pd.Series) -> float:
    """Weighted arithmetic mean of ``v`` under weights ``w``."""
    return float((v * w).sum() / w.sum())


@pandas_udf("long")
def weight_sum(w: pd.Series) -> int:
    return int(w.sum())
