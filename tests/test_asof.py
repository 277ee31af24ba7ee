"""As-of join operator tests (no native Spark operator — union-timeline
construction) against a brute-force oracle."""

from __future__ import annotations

import datetime as dt

from crawler_tjce_spark.operators.joins import asof_join_timeline


def test_asof_basic(spark):
    quotes = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 10, 0), 100.0),
            (dt.datetime(2024, 1, 1, 10, 5), 101.0),
            (dt.datetime(2024, 1, 1, 10, 10), 99.0),
        ],
        "qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9, 59)),   # before all quotes → null
            (2, dt.datetime(2024, 1, 1, 10, 0)),   # equal ts matches
            (3, dt.datetime(2024, 1, 1, 10, 7)),
            (4, dt.datetime(2024, 1, 1, 11, 0)),
        ],
        "tid int, tts timestamp",
    )
    out = asof_join_timeline(trades, quotes, "tts", "qts", ["px"])
    got = {r["tid"]: r["px"] for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 101.0, 4: 99.0}


def test_asof_partitioned(spark):
    right = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0), ("b", dt.datetime(2024, 1, 2), 2.0)],
        "k string, rts timestamp, v double",
    )
    left = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 3)), ("b", dt.datetime(2024, 1, 1))],
        "k string, lts timestamp",
    )
    out = asof_join_timeline(left, right, "lts", "rts", ["v"], partition_by=["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": 1.0, "b": None}  # b's only right row is later
