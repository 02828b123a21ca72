"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
are the explicit versions for the cases AQE can't fix — a single
pathological key inside an aggregation, or a join where one fact key is so
hot that even a split partition overwhelms its task.

Salting is semantics-preserving only for decomposable operations, which is
exactly what these helpers enforce:

- ``salted_agg``: two-level aggregation. Partial agg on (keys, salt) spreads
  a hot key over ``n_salts`` reducers; the final agg on keys merges partials.
  Supported merges are the algebraic ones (sum/count/min/max — count merges
  by summing partial counts).
- ``salted_join``: the fact side gets a random salt in [0, n_salts); the
  (small) dim side is replicated once per salt value. The join key becomes
  (key, salt), so one hot key fans across ``n_salts`` tasks. Row multiplicity
  is preserved exactly — each fact row matches the single dim replica
  carrying its salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summation
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-level salted aggregation: ``aggs`` maps output column name →
    (function, input column), function ∈ {sum, count, min, max}.

    Equivalent to ``df.groupBy(keys).agg(...)`` for any input, but a key
    carrying 10^9 rows is reduced by ``n_salts`` tasks instead of one.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_PARTIAL)
    if unknown:
        raise ValueError(f"non-decomposable agg function(s): {sorted(unknown)}")
    salted = df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: equivalent to ``fact.join(dim, on, how)``
    (how ∈ inner / left) with hot fact keys spread across ``n_salts`` tasks.

    The dim side is exploded ×``n_salts`` — use only when dim is small
    relative to the cluster (the same regime where you'd broadcast; salting
    matters when dim is too big to broadcast but far smaller than fact).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left joins only")
    f = fact.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, [*on, "__salt"], how).drop("__salt")
