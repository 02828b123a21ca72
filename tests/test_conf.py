"""scoped_conf / loop_conf: restore semantics under nesting and overlap."""

from map_reduce_engine_spark.conf import loop_conf, scoped_conf

KEY = "spark.sql.shuffle.partitions"
AQE = "spark.sql.adaptive.enabled"


def test_scoped_conf_restores(spark):
    before = spark.conf.get(KEY)
    with scoped_conf(spark, {KEY: "3"}):
        assert spark.conf.get(KEY) == "3"
    assert spark.conf.get(KEY) == before


def test_scoped_conf_restores_on_error(spark):
    before = spark.conf.get(KEY)
    try:
        with scoped_conf(spark, {KEY: "3"}):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(KEY) == before


def test_nested_scopes_restore_pristine_not_inner(spark):
    """The naive save/restore idiom is last-writer-wins: an inner scope's
    `finally` would re-install the OUTER scope's override as if it were the
    session default. The registry tracks the pristine value instead."""
    before = spark.conf.get(KEY)
    with scoped_conf(spark, {KEY: "5"}):
        with scoped_conf(spark, {KEY: "2"}):
            assert spark.conf.get(KEY) == "2"
        # inner exit must NOT restore yet — the outer scope still holds it
        assert spark.conf.get(KEY) == "2"
    assert spark.conf.get(KEY) == before


def test_interleaved_exit_order_restores_pristine(spark):
    """Simulate two overlapping loop operators exiting out of order."""
    before = spark.conf.get(KEY)
    a = scoped_conf(spark, {KEY: "7"})
    b = scoped_conf(spark, {KEY: "4"})
    a.__enter__()
    b.__enter__()
    a.__exit__(None, None, None)  # outer exits first
    assert spark.conf.get(KEY) == "4"
    b.__exit__(None, None, None)
    assert spark.conf.get(KEY) == before


def test_loop_conf_profile(spark):
    before_parts = spark.conf.get(KEY)
    before_aqe = spark.conf.get(AQE)
    with loop_conf(spark, 2):
        assert spark.conf.get(KEY) == "2"
        assert spark.conf.get(AQE) == "false"
    assert spark.conf.get(KEY) == before_parts
    assert spark.conf.get(AQE) == before_aqe
