"""Skew salting equivalence + bucketed-table exchange elimination."""

from __future__ import annotations

import io as _io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from map_reduce_engine_spark.io import read_table, write_bucketed
from map_reduce_engine_spark.operators.skew import salted_agg, salted_join

import pytest

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


def _plan(df) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    plain = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.count("*").alias("n"),
            F.min("l_discount").alias("mn"),
            F.max("l_tax").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "sq": ("sum", "l_quantity"),
                "n": ("count", "l_orderkey"),
                "mn": ("min", "l_discount"),
                "mx": ("max", "l_tax"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable():
    import pytest

    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"a": ("avg", "x")})


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    plain = {
        tuple(r)
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name")
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"), cust, ["c_custkey"], n_salts=4
        )
        .select("o_orderkey", "c_name")
        .collect()
    }
    assert salted == plain


def test_salted_left_join_preserves_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
    dim = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "d"])
    out = {(r.k, r.v, r.d) for r in salted_join(fact, dim, ["k"], n_salts=4, how="left").collect()}
    assert out == {(1, "a", "x"), (2, "b", "y"), (99, "zz", None)}


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with zero Exchange operators — the write-once/join-many co-location
    contract that removes the per-query shuffle at scale."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "b_orders", 4, ["o_orderkey"],
        path=str(tmp_path / "b_orders"), sort_by=["o_orderkey"],
    )
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "b_lineitem", 4, ["l_orderkey"],
        path=str(tmp_path / "b_lineitem"), sort_by=["l_orderkey"],
    )
    # at fixture scale the planner would broadcast instead (which also skips
    # bucketing); force the sort-merge path the test is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # neither shuffle nor broadcast exchange
        # and the result is right
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
