"""applyInPandasWithState: per-user running totals accumulate across
micro-batches and survive via the checkpointed state store."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from weather_data_ingestion_gcp_spark.streaming.stateful import user_running_stats

EVENTS_SCHEMA = "user_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _land(tmp_path, name: str, rows: list[tuple[int, str, float]]) -> None:
    p = tmp_path / "in" / name
    p.parent.mkdir(exist_ok=True)
    p.write_text(
        "\n".join(json.dumps({"user_id": u, "ts": t, "value": v}) for u, t, v in rows) + "\n"
    )


def test_stateful_running_totals_across_batches(spark, tmp_path):
    _land(tmp_path, "b1.json", [(1, "2024-01-01 10:00:00", 1.5), (1, "2024-01-01 10:05:00", 2.5), (2, "2024-01-01 10:06:00", 4.0)])
    _land(tmp_path, "b2.json", [(1, "2024-01-01 11:00:00", 3.0), (3, "2024-01-01 11:01:00", 7.0)])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(str(tmp_path / "in"))
    )
    q = (
        user_running_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM user_stats")
    # last emission per user = the accumulated totals over ALL batches
    last = {
        r.user_id: r
        for r in emitted.withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.desc("emit_seq"))
            ),
        )
        .filter("rk = 1")
        .collect()
    }
    assert last[1].n_events == 3 and last[1].value_total == 7.0
    assert last[2].n_events == 1 and last[2].value_total == 4.0
    assert last[3].n_events == 1 and last[3].value_total == 7.0
    # user 1 appeared in two different micro-batches -> state carried over
    assert last[1].emit_seq == 2


def test_transform_with_state_typed_state_vars(spark, tmp_path):
    """v2 API (transformWithStateInPandas): value + map state accumulate
    across micro-batches. Requires protobuf (the v2 state protocol);
    skipped where the package is absent."""
    import pytest

    pytest.importorskip("google.protobuf")
    _land(tmp_path, "c1.json", [(1, "2024-01-01 10:00:00", 1.5), (2, "2024-01-01 10:06:00", 4.0)])
    _land(tmp_path, "c2.json", [(1, "2024-01-01 11:00:00", 3.0), (1, "2024-01-01 11:02:00", 2.0)])

    from weather_data_ingestion_gcp_spark.streaming.stateful import user_activity_profile

    schema = "user_id BIGINT, ts TIMESTAMP, value DOUBLE, event_type STRING"
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    # derive a type column deterministically so batches carry 2 types
    ev = raw.withColumn("event_type", F.expr("CASE WHEN value < 3 THEN 'a' ELSE 'b' END"))
    q = (
        user_activity_profile(ev)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM profiles WHERE user_id = 1 ORDER BY n_events DESC LIMIT 1"
    ).collect()
    assert rows and rows[0].n_events == 3
    assert rows[0].value_total == 6.5
    assert rows[0].n_event_types == 2  # 1.5,2.0 -> 'a'; 3.0 -> 'b'


def test_streaming_mg_candidates_bounded_and_heavy_survives(spark, tmp_path):
    """Streaming Misra-Gries: the dominant word survives across
    micro-batches with count >= true - n_bucket/(k+1); per-bucket state
    stays bounded at k counters no matter how many distinct words pass."""
    import json as _json

    from weather_data_ingestion_gcp_spark.streaming.stateful import (
        streaming_heavy_hitter_candidates,
    )

    def land(name, words):
        p = tmp_path / "win" / name
        p.parent.mkdir(exist_ok=True)
        p.write_text("\n".join(_json.dumps({"w": w}) for w in words) + "\n")

    # 'hot' appears 30x across two batches among 20 singleton words
    land("m1.json", ["hot"] * 15 + [f"r{i}" for i in range(10)])
    land("m2.json", ["hot"] * 15 + [f"r{i}" for i in range(10, 20)])

    stream = (
        spark.readStream.schema("w STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "win"))
    )
    q = (
        streaming_heavy_hitter_candidates(stream, n_buckets=4, k=4)
        .writeStream.format("memory")
        .queryName("mg_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM mg_stream").collect()
    assert rows
    # final emission per bucket
    last_seq = {}
    for r in rows:
        last_seq[r.bucket] = max(last_seq.get(r.bucket, 0), r.emit_seq)
    final = [r for r in rows if r.emit_seq == last_seq[r.bucket]]
    by_bucket: dict[int, list] = {}
    for r in final:
        by_bucket.setdefault(r.bucket, []).append(r)
    # bounded state: every bucket holds <= k candidates
    assert all(len(v) <= 4 for v in by_bucket.values())
    # the heavy word survived with the MG lower-bound guarantee
    hot = [r for r in final if r.w == "hot"]
    assert hot, "dominant word must remain a candidate"
    n_bucket = hot[0].n_seen
    assert hot[0].mg_count >= 30 - n_bucket // (4 + 1)
    # state carried across the two micro-batches
    assert hot[0].emit_seq >= 2
