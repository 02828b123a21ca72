"""End-to-end privacy release audit as one composable job.

The privacy-gate example composition (next to model_eval / causal_audit /
timeseries_health): one quasi-identifier schema in, the full release
dossier out — the three-level audit ladder (k-anonymity: classes big
enough; l-diversity: sensitive values varied enough; t-closeness:
sensitive values distributed like the population) plus the
differentially-private release counts that ship when the gates pass.
Every stage is a shipped registry query.

Stages:
  1. k-anon   — equivalence-class size census (k=5)
  2. l-div    — distinct-l / entropy-l per class
  3. t-close  — per-class total-variation distance vs the population
  4. dp       — Laplace-noised release counts (the publish artifact)
  5. write    — one parquet per audit + a single-row release gate

The returned gate row carries each level's worst case and a release_ok
flag — the sign-off a data-release board actually reads.

Run: ``python -m map_reduce_engine_spark privacy-audit <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    max_at_risk_share: float = 0.05,
    min_l: int = 3,
    max_t_ppm: int = 300_000,
) -> DataFrame:
    """Execute the audit; returns the 1-row release gate after writing
    the per-level artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    kanon = REGISTRY["k_anonymity_audit"].fn(spark, sf_dir)
    ldiv = REGISTRY["l_diversity_audit"].fn(spark, sf_dir)
    tclose = REGISTRY["t_closeness_audit"].fn(spark, sf_dir)
    dp = REGISTRY["dp_noisy_counts"].fn(spark, sf_dir)

    write_parquet(kanon, f"{out_dir}/k_anonymity")
    write_parquet(ldiv, f"{out_dir}/l_diversity")
    write_parquet(tclose, f"{out_dir}/t_closeness")
    write_parquet(dp, f"{out_dir}/dp_release_counts")

    worst_l = ldiv.agg(F.min("distinct_l").alias("min_distinct_l"))
    worst_t = tclose.agg(F.max("t_ppm").alias("worst_t_ppm"))
    gate = (
        kanon.select("groups_below_k", "rows_at_risk", "at_risk_share")
        .crossJoin(F.broadcast(worst_l))
        .crossJoin(F.broadcast(worst_t))
        .select(
            "groups_below_k",
            "rows_at_risk",
            "at_risk_share",
            "min_distinct_l",
            "worst_t_ppm",
            (
                (F.col("at_risk_share") <= F.lit(max_at_risk_share))
                & (F.col("min_distinct_l") >= F.lit(min_l))
                & (F.col("worst_t_ppm") <= F.lit(max_t_ppm))
            ).alias("release_ok"),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
