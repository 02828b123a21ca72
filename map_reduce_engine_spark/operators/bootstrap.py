"""Poisson bootstrap — resampling-based uncertainty at corpus scale.

The classic bootstrap resamples the dataset B times — impossible at 100 TB.
The Poisson bootstrap replaces each replicate's resample with independent
per-row Poisson(1) weights: one pass over the data computes all B replicate
statistics simultaneously (explode B replicate ids per row, weight each
copy, one weighted aggregate per replicate). The approximation is exact in
the n→∞ limit (multinomial(n, 1/n) → Poisson(1)) — which is precisely the
regime where you need it.

Weights are DETERMINISTIC: the uniform driving the Poisson inverse-CDF is
the portable md5-prefix hash of (row key, replicate id), so the same rows
get the same weights on every engine, run, and partitioning — replicate
statistics are reproducible and DuckDB-oracle-checkable, unlike rand()
seeding which neither survives re-partitioning nor crosses engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.dedup import portable_base31

_TWO31 = float(1 << 31)


def _poisson1_cumulative(max_k: int = 7) -> list[float]:
    """Cumulative Poisson(1) probabilities c_0..c_{max_k-1} (then weight=max_k).

    Embedded as decimal literals via repr() on BOTH engines, so the CASE
    thresholds parse to bit-identical doubles.
    """
    acc, cum, fact = [], 0.0, 1.0
    for k in range(max_k):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        acc.append(cum)
    return acc


def poisson1_weight(u: Column, max_k: int = 7) -> Column:
    """Poisson(1) inverse-CDF of a uniform in [0, 1) as a CASE ladder."""
    cums = _poisson1_cumulative(max_k)
    expr = F.lit(max_k)
    for k in range(max_k - 1, -1, -1):
        expr = F.when(u < F.lit(cums[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson1_weight_sql(u_sql: str, max_k: int = 7) -> str:
    """The identical ladder as DuckDB SQL (same repr() literals)."""
    cums = _poisson1_cumulative(max_k)
    whens = " ".join(
        f"WHEN {u_sql} < {cums[k]!r} THEN {k}" for k in range(max_k)
    )
    return f"(CASE {whens} ELSE {max_k} END)"


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicates: int = 32,
    alpha: float = 0.05,
) -> DataFrame:
    """One-row (point_mean, ci_lo, ci_hi, n_replicates) via Poisson bootstrap.

    Plan shape: explode ``n_replicates`` ids per row (a projection — rows
    fan out B×, but only (key, value, replicate) wide), ONE hash aggregate
    keyed by replicate (B rows out regardless of input size), then the
    percentile CI over the B replicate means with the spelled-out
    row_number interpolation (each output value draws on ≤2 replicate
    means, so float summation order cannot drift across engines).
    """
    from pyspark.sql import Window

    b = n_replicates
    base = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("double").alias("x")
    )
    # the explode fans work out B× — make sure that stage is at least
    # core-parallel. A single small input file otherwise serializes B·n md5
    # evaluations into one task (measured 6.6× slower at local[32]); at
    # production scale input partitions exceed cores and this is a no-op.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < parallelism:
        base = base.repartition(parallelism)
    rep = base.withColumn("r", F.explode(F.expr(f"sequence(0, {b - 1})")))
    u = (
        portable_base31(
            F.concat(F.col("k").cast("string"), F.lit(":"), F.col("r").cast("string"))
        )
        / F.lit(_TWO31)
    )
    means = (
        rep.withColumn("w", poisson1_weight(u))
        .groupBy("r")
        .agg((F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m"))
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("rn")
    )

    def interp(p: float) -> Column:
        # idx = 1 + (B-1)*p; linear interpolation between floor and ceil rank
        idx = 1.0 + (b - 1) * p
        lo_rn, frac = int(math.floor(idx)), idx - math.floor(idx)
        lo = F.max(F.when(F.col("rn") == lo_rn, F.col("m")))
        hi = F.max(F.when(F.col("rn") == min(lo_rn + 1, b), F.col("m")))
        return lo + F.lit(frac) * (hi - lo)

    ci = ranked.agg(
        F.round(interp(alpha / 2), 4).alias("ci_lo"),
        F.round(interp(1 - alpha / 2), 4).alias("ci_hi"),
    )
    point = df.agg(
        F.round(F.avg(F.col(value_col).cast("double")), 4).alias("point_mean")
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "point_mean", "ci_lo", "ci_hi", F.lit(b).cast("bigint").alias("n_replicates")
    )
