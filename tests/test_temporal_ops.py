"""Unit tests for the composition-based temporal joins (as-of, range)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_ingestion_gcp_spark.operators.temporal import (
    asof_join_backward,
    bucketed_range_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00")),
            (2, "A", _ts("2024-01-01 10:05:00")),
            (3, "A", _ts("2024-01-01 09:00:00")),  # before any quote -> null
            (4, "B", _ts("2024-01-01 10:00:00")),  # equal ts -> inclusive
        ],
        "trade_id bigint, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (10, "A", _ts("2024-01-01 09:59:00"), 100.0),
            (11, "A", _ts("2024-01-01 10:04:00"), 101.0),
            (12, "A", _ts("2024-01-01 10:06:00"), 999.0),  # after: never matched
            (13, "B", _ts("2024-01-01 10:00:00"), 55.0),
        ],
        "quote_id bigint, sym string, ts timestamp, px double",
    )
    out = {
        r.trade_id: (r.asof_quote_id, r.asof_px)
        for r in asof_join_backward(
            trades, quotes, key="sym", left_ts="ts", right_ts="ts",
            right_payload=["quote_id", "px"], tiebreak="quote_id",
        ).collect()
    }
    assert out[1] == (10, 100.0)  # latest at-or-before 10:00
    assert out[2] == (11, 101.0)  # skips ahead-of-time quote
    assert out[3] == (None, None)  # nothing before
    assert out[4] == (13, 55.0)  # equal timestamp is inclusive


def test_range_join_boundaries(spark):
    intervals = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 19.5, 35.0)], "iv_id bigint, lo double, hi double"
    )
    points = spark.createDataFrame(
        [(100, 10.0), (101, 20.0), (102, 25.0), (103, 9.99), (104, 35.01)],
        "pt_id bigint, x double",
    )
    got = sorted(
        (r.iv_id, r.pt_id)
        for r in bucketed_range_join(
            intervals, points, lo="lo", hi="hi", x="x", bucket_width=7.0
        ).collect()
    )
    # inclusive bounds on both ends; outside-by-epsilon points excluded;
    # overlapping intervals each match their own points
    assert got == [(1, 100), (1, 101), (2, 101), (2, 102)]


def test_asof_nearest_directions_and_ties(spark):
    """Nearest as-of: backward-inclusive, forward-exclusive, |gap| ties
    resolved backward."""
    from weather_data_ingestion_gcp_spark.operators.temporal import asof_join_nearest

    L = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:10"),  # equidistant: back 10:00:00, fwd 10:00:20
            (2, 1, "2024-01-01 10:00:00"),  # equal-ts right -> backward, gap 0
            (3, 2, "2024-01-01 09:00:00"),  # only forward exists
            (4, 3, "2024-01-01 09:00:00"),  # no right rows at all
        ],
        "lid bigint, k bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    R = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 10:00:00"),
            (101, 1, "2024-01-01 10:00:20"),
            (200, 2, "2024-01-01 09:05:00"),
        ],
        "rid bigint, k bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.lid: r
        for r in asof_join_nearest(
            L, R, key="k", left_ts="ts", right_ts="ts",
            right_payload=["rid"], tiebreak="rid",
        ).collect()
    }
    assert (out[1].asof_rid, out[1].asof_direction, out[1].asof_gap_us) == (100, "b", 10_000_000)
    assert (out[2].asof_rid, out[2].asof_direction, out[2].asof_gap_us) == (100, "b", 0)
    assert (out[3].asof_rid, out[3].asof_direction, out[3].asof_gap_us) == (200, "f", 300_000_000)
    assert out[4].asof_rid is None and out[4].asof_direction is None
