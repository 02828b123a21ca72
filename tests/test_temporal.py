"""Unit tests for the temporal join operators (as-of, range self-join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.temporal import asof_join, range_self_join

import pytest

pytestmark = pytest.mark.quick  # registry-independent: the builder inner loop


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01T10:00:00"), 101.0),  # exact-time match
            (3, "B", _ts("2024-01-01T09:00:00"), 50.0),   # before any quote → null
            (4, "C", _ts("2024-01-01T12:00:00"), 7.0),    # key with no quotes → null
        ],
        "trade_id INT, sym STRING, ts TIMESTAMP_NTZ, px DOUBLE",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 99.5),
            ("A", _ts("2024-01-01T10:00:03"), 99.7),
            ("A", _ts("2024-01-01T10:00:09"), 99.9),
            ("B", _ts("2024-01-01T11:00:00"), 49.5),
        ],
        "sym STRING, ts TIMESTAMP_NTZ, bid DOUBLE",
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r.trade_id: (r.asof_ts, r.asof_bid)
        for r in asof_join(trades, quotes, ["sym"], "ts", "ts", ["bid"]).collect()
    }
    assert out[1] == (_ts("2024-01-01T10:00:03"), 99.7)  # latest quote <= trade
    assert out[2] == (_ts("2024-01-01T10:00:00"), 99.5)  # same-timestamp inclusive
    assert out[3] == (None, None)  # trade precedes all quotes on its key
    assert out[4] == (None, None)  # key absent from right side


def test_asof_forward(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r.trade_id: (r.asof_ts, r.asof_bid)
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"], direction="forward"
        ).collect()
    }
    assert out[1] == (_ts("2024-01-01T10:00:09"), 99.9)  # earliest quote >= trade
    assert out[2] == (_ts("2024-01-01T10:00:00"), 99.5)  # inclusive at equal time
    assert out[3] == (_ts("2024-01-01T11:00:00"), 49.5)
    assert out[4] == (None, None)


def test_asof_tolerance_voids_stale_matches(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r.trade_id: r.asof_bid
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"],
            tolerance=F.expr("INTERVAL 1 SECOND"),
        ).collect()
    }
    assert out[1] is None  # nearest match is 2s old > 1s tolerance
    assert out[2] == 99.5  # 0s gap survives


def test_asof_left_rows_preserved(spark):
    trades, quotes = _trades_quotes(spark)
    assert asof_join(trades, quotes, ["sym"], "ts", "ts", ["bid"]).count() == trades.count()


def test_range_self_join_matches_brute_force(spark):
    rows = [
        (i, "u1", _ts(f"2024-01-01T10:{m:02d}:00")) for i, m in enumerate([0, 1, 2, 30, 59])
    ] + [(10, "u2", _ts("2024-01-01T10:00:30"))]
    df = spark.createDataFrame(rows, "id INT, user STRING, ts TIMESTAMP_NTZ")
    tol = 120
    got = {
        (r.id1, r.id2, r.gap_us)
        for r in range_self_join(df, ["user"], "id", "ts", tol).collect()
    }
    want = set()
    for i1, u1, t1 in rows:
        for i2, u2, t2 in rows:
            gap = abs((t1 - t2).total_seconds())
            if u1 == u2 and i1 < i2 and gap <= tol:
                want.add((i1, i2, int(gap * 1_000_000)))
    assert got == want
    assert (0, 2, 120_000_000) in got  # boundary pair exactly at tolerance


def test_asof_is_window_not_join(spark):
    """The as-of composition must contain no join at all — one shuffle on
    the key, one window pass (the 100 TB property)."""
    import io as _io
    from contextlib import redirect_stdout

    trades, quotes = _trades_quotes(spark)
    df = asof_join(trades, quotes, ["sym"], "ts", "ts", ["bid"])
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Join" not in p
    assert "Window" in p
