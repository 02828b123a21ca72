"""End-to-end multi-group comparison dossier as one composable job.

The assumption-gated test ladder every "does segment X behave differently"
question should run (next to timeseries_health_job and model_eval_job):
one grouping in, the full parametric/nonparametric verdict out — every
stage a shipped registry query.

Stages:
  1. parametric   — one-way ANOVA (anova_value_by_type): F on means,
                    assuming normal-ish residuals AND equal variances
  2. assumptions  — Brown-Forsythe (brown_forsythe_variance_test): is the
                    equal-variance assumption even true?
  3. post-hoc     — Tukey-Kramer HSD (tukey_hsd_pairs): WHICH pairs differ,
                    at the family-wise error rate
  4. robust       — Kruskal-Wallis (kruskal_wallis_test): the rank test
                    that needs neither normality nor equal variances
  5. blocked      — Friedman (friedman_test): the day-blocked variant that
                    removes the hot-day nuisance
  6. write        — one parquet per test + a single-row verdict gate

The gate row implements the textbook decision rule: if Brown-Forsythe
rejects equal variances, the ANOVA F is not trustworthy — defer to
Kruskal-Wallis; `tests_agree` reports whether the parametric and
nonparametric routes reach the same conclusion anyway (when they do, the
assumption debate is moot).

Run: ``python -m map_reduce_engine_spark group-comparison <sf_dir> <out_dir>``
or call :func:`run` with a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# F(4, inf) 95% critical value x1000 — the same cut the ANOVA would use at
# these sample sizes (df_within >> 100).
_F_CRIT_MILLI = 2372


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Execute the dossier; returns the 1-row verdict gate after writing
    the per-test artifacts."""
    from map_reduce_engine_spark.io import write_parquet
    from map_reduce_engine_spark.queries.base import REGISTRY

    anova = REGISTRY["anova_value_by_type"].fn(spark, sf_dir)
    bf = REGISTRY["brown_forsythe_variance_test"].fn(spark, sf_dir)
    tukey = REGISTRY["tukey_hsd_pairs"].fn(spark, sf_dir)
    kw = REGISTRY["kruskal_wallis_test"].fn(spark, sf_dir)
    friedman = REGISTRY["friedman_test"].fn(spark, sf_dir)

    write_parquet(anova, f"{out_dir}/anova")
    write_parquet(bf, f"{out_dir}/brown_forsythe")
    write_parquet(tukey, f"{out_dir}/tukey_hsd")
    write_parquet(kw, f"{out_dir}/kruskal_wallis")
    write_parquet(friedman, f"{out_dir}/friedman")

    anova_sig = anova.select(
        F.round(F.col("f_stat"), 6).alias("anova_f"),
        (F.expr("CAST(floor(f_stat * 1000 + 0.5) AS BIGINT)") > _F_CRIT_MILLI).alias(
            "anova_significant"
        ),
    )
    bf_flag = bf.groupBy().agg(
        F.max("f_milli").alias("bf_f_milli"),
        F.max(F.col("variances_differ").cast("int")).cast("boolean").alias(
            "variances_differ"
        ),
    )
    kw_flag = kw.groupBy().agg(
        F.max("h_milli").alias("kw_h_milli"),
        F.max(F.col("significant").cast("int")).cast("boolean").alias("kw_significant"),
    )
    fr_flag = friedman.groupBy().agg(
        F.max("q_milli").alias("friedman_q_milli"),
        F.max(F.col("significant").cast("int")).cast("boolean").alias(
            "friedman_significant"
        ),
    )
    tukey_n = tukey.agg(
        F.sum(F.col("pair_differs").cast("int")).cast("bigint").alias("n_pairs_differ")
    )

    gate = (
        anova_sig.crossJoin(F.broadcast(bf_flag))
        .crossJoin(F.broadcast(kw_flag))
        .crossJoin(F.broadcast(fr_flag))
        .crossJoin(F.broadcast(tukey_n))
        .select(
            "anova_f",
            "anova_significant",
            "bf_f_milli",
            "variances_differ",
            "kw_h_milli",
            "kw_significant",
            "friedman_q_milli",
            "friedman_significant",
            "n_pairs_differ",
            # the decision rule: trust ANOVA only when BF passes
            F.when(F.col("variances_differ"), F.col("kw_significant"))
            .otherwise(F.col("anova_significant"))
            .alias("groups_differ"),
            (F.col("anova_significant") == F.col("kw_significant")).alias(
                "tests_agree"
            ),
        )
    )
    write_parquet(gate, f"{out_dir}/gate")
    return gate
