"""Stream-stream interval join: correctness of the attribution window and
the bounded-state contract (watermarks on both sides)."""

from __future__ import annotations

import json

from weather_data_ingestion_gcp_spark.streaming.joins import clicks_within

IMP_SCHEMA = "ad_id BIGINT, imp_ts TIMESTAMP"
CLK_SCHEMA = "ad_id BIGINT, click_ts TIMESTAMP"


def _land(tmp_path, sub: str, name: str, rows: list[dict]) -> None:
    p = tmp_path / sub / name
    p.parent.mkdir(exist_ok=True, parents=True)
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_stream_stream_interval_join_attributes_clicks(spark, tmp_path):
    _land(
        tmp_path,
        "imp",
        "i1.json",
        [
            {"ad_id": 1, "imp_ts": "2024-01-01 10:00:00"},
            {"ad_id": 2, "imp_ts": "2024-01-01 10:00:00"},
            {"ad_id": 1, "imp_ts": "2024-01-01 11:00:00"},
        ],
    )
    _land(
        tmp_path,
        "clk",
        "c1.json",
        [
            {"ad_id": 1, "click_ts": "2024-01-01 10:04:00"},  # within 10m of 10:00 imp
            {"ad_id": 1, "click_ts": "2024-01-01 10:30:00"},  # inside no window
            {"ad_id": 2, "click_ts": "2024-01-01 10:09:59"},  # boundary: kept
            {"ad_id": 2, "click_ts": "2024-01-01 10:10:01"},  # past window: dropped
            {"ad_id": 1, "click_ts": "2024-01-01 11:05:00"},  # matches 11:00 imp only
            {"ad_id": 3, "click_ts": "2024-01-01 10:01:00"},  # no impression
        ],
    )
    imp = spark.readStream.schema(IMP_SCHEMA).json(str(tmp_path / "imp"))
    clk = spark.readStream.schema(CLK_SCHEMA).json(str(tmp_path / "clk"))
    q = (
        clicks_within(imp, clk)
        .writeStream.format("memory")
        .queryName("attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.ad_id, str(r.imp_ts), str(r.click_ts), r.lag_us)
        for r in spark.sql("SELECT * FROM attr").collect()
    )
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:04:00", 240_000_000),
        (1, "2024-01-01 11:00:00", "2024-01-01 11:05:00", 300_000_000),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:09:59", 599_000_000),
    ]


def test_interval_join_same_semantics_in_batch(spark):
    """The operator is mode-agnostic: the identical call on batch frames
    gives the identical result (streams only add state management)."""
    imp = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "ad_id bigint, imp_ts string"
    ).selectExpr("ad_id", "CAST(imp_ts AS TIMESTAMP) imp_ts")
    clk = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00"), (1, "2024-01-01 10:20:00")],
        "ad_id bigint, click_ts string",
    ).selectExpr("ad_id", "CAST(click_ts AS TIMESTAMP) click_ts")
    rows = clicks_within(imp, clk).collect()
    assert len(rows) == 1 and rows[0].lag_us == 300_000_000


def test_stream_static_enrichment_no_state(spark, tmp_path):
    """Stream-static broadcast enrichment: every micro-batch row picks up
    its dimension attributes; unmatched keys survive (left join) with
    nulls — and the query needs no watermark or state store."""
    from weather_data_ingestion_gcp_spark.streaming.joins import enrich_with_dim

    _land(
        tmp_path,
        "ev",
        "e1.json",
        [
            {"ad_id": 1, "imp_ts": "2024-01-01 10:00:00"},
            {"ad_id": 2, "imp_ts": "2024-01-01 10:01:00"},
            {"ad_id": 9, "imp_ts": "2024-01-01 10:02:00"},  # no dim row
        ],
    )
    dim = spark.createDataFrame(
        [(1, "search"), (2, "display")], "ad_id bigint, channel string"
    )
    ev = spark.readStream.schema(IMP_SCHEMA).json(str(tmp_path / "ev"))
    q = (
        enrich_with_dim(ev, dim, "ad_id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {r.ad_id: r.channel for r in spark.sql("SELECT * FROM enriched").collect()}
    assert got == {1: "search", 2: "display", 9: None}
    # no stateful operator ran: the progress metrics report zero state rows
    assert all(
        op.get("numRowsTotal", 0) == 0
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )


def test_stream_stream_outer_join_emits_unclicked_after_watermark(spark, tmp_path):
    """left_outer: impressions with no click emit null-padded ONCE their
    join window is provably closed (watermark passed imp_ts + within +
    click lateness). A far-future heartbeat row on each stream advances
    the watermarks so availableNow drains the outer state."""
    _land(
        tmp_path, "imp", "i1.json",
        [
            {"ad_id": 1, "imp_ts": "2024-01-01 10:00:00"},  # clicked
            {"ad_id": 9, "imp_ts": "2024-01-01 10:00:00"},  # never clicked
        ],
    )
    _land(
        tmp_path, "clk", "c1.json",
        [{"ad_id": 1, "click_ts": "2024-01-01 10:04:00"}],
    )
    # heartbeats far past every window: watermark moves, outer state drains
    _land(tmp_path, "imp", "i2.json", [{"ad_id": 99, "imp_ts": "2024-01-01 23:00:00"}])
    _land(tmp_path, "clk", "c2.json", [{"ad_id": 99, "click_ts": "2024-01-01 23:00:00"}])

    imp = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "imp"))
    )
    clk = (
        spark.readStream.schema(CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "clk"))
    )
    q = (
        clicks_within(imp, clk, how="left_outer")
        .writeStream.format("memory")
        .queryName("attr_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.ad_id, str(r.imp_ts)): (str(r.click_ts), r.lag_us)
        for r in spark.sql("SELECT * FROM attr_outer").collect()
    }
    assert rows[(1, "2024-01-01 10:00:00")] == ("2024-01-01 10:04:00", 240_000_000)
    # the unclicked impression came through null-padded
    assert rows[(9, "2024-01-01 10:00:00")] == ("None", None)
