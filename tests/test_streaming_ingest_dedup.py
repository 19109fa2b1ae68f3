"""Streaming exactly-once deduplicating ingest
(streaming/ingest_dedup.py): the reference's landing->raw loop
(Load-gcs-to-bq/main.py:71-84) at streaming grain with the two
guarantees it lacks — no double-append on redelivery, no duplicate keys
in the raw table."""

from __future__ import annotations

import os

from weather_data_ingestion_gcp_spark.sources.txlog import TxLogTable
from weather_data_ingestion_gcp_spark.streaming.ingest_dedup import (
    dedup_ingest_sink,
)

_SCHEMA = "doc_id long, text string"


def _land(landing: str, name: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(landing, exist_ok=True)
    tmp = os.path.join(landing, name + ".tmp")
    with open(tmp, "w") as f:
        for i, t in rows:
            f.write('{"doc_id": %d, "text": "%s"}\n' % (i, t))
    os.rename(tmp, os.path.join(landing, name))


def _run_stream(spark, landing: str, ckpt: str, sink) -> None:
    q = (
        spark.readStream.schema(_SCHEMA)
        .json(landing)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_ingest_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    t = TxLogTable(str(tmp_path / "docs"))
    sink = dedup_ingest_sink(t, "ingest-docs", ["doc_id"])

    # batch 0: in-batch duplicate (doc 2 twice) collapses to one row
    _land(landing, "a.json", [(1, "alpha"), (2, "beta"), (2, "beta"), (3, "gamma")])
    _run_stream(spark, landing, ckpt, sink)
    assert sorted(
        r["doc_id"] for r in t.read(spark).collect()
    ) == [1, 2, 3]

    # batch 1: cross-batch duplicate (doc 3) must not land again
    _land(landing, "b.json", [(3, "gamma"), (4, "delta")])
    _run_stream(spark, landing, ckpt, sink)
    assert sorted(
        r["doc_id"] for r in t.read(spark).collect()
    ) == [1, 2, 3, 4]

    # crash replay of batch 1: the txn key makes the append a no-op
    replay = spark.createDataFrame([(3, "gamma"), (4, "delta")], _SCHEMA)
    sink(replay, 1)
    assert sorted(
        r["doc_id"] for r in t.read(spark).collect()
    ) == [1, 2, 3, 4]

    # a genuinely new batch: only the unseen key lands
    nxt = spark.createDataFrame([(4, "delta"), (5, "epsilon")], _SCHEMA)
    sink(nxt, 2)
    assert sorted(
        r["doc_id"] for r in t.read(spark).collect()
    ) == [1, 2, 3, 4, 5]
    # the table's row count equals its distinct-key count (no dup ever)
    assert t.read(spark).count() == t.read(spark).select("doc_id").distinct().count()


def test_in_batch_duplicate_winner_is_deterministic(spark, tmp_path):
    """Two payloads for one key in a batch: the lexicographically-least
    row lands, on every partitioning — the value-level half of the
    exactly-once claim (dropDuplicates alone keeps an arbitrary row)."""
    t = TxLogTable(str(tmp_path / "docs"))
    sink = dedup_ingest_sink(t, "q", ["doc_id"])
    rows = [(1, "zeta"), (1, "alpha"), (2, "beta")]
    for n_parts, bid in ((1, 0), (8, 1)):
        batch = spark.createDataFrame(rows, _SCHEMA).repartition(n_parts)
        sink(batch, bid)
    got = {(r["doc_id"], r["text"]) for r in t.read(spark).collect()}
    # batch 1 saw keys 1,2 already present -> no new rows; batch 0's
    # winner for key 1 must be the least payload regardless of layout
    assert got == {(1, "alpha"), (2, "beta")}


def test_null_keys_do_not_reland_across_batches(spark, tmp_path):
    """The anti-join is null-safe: a NULL-keyed row ingested once must
    not land again in later batches (plain equi anti-join never matches
    NULL = NULL)."""
    t = TxLogTable(str(tmp_path / "docs"))
    sink = dedup_ingest_sink(t, "q", ["doc_id"])
    sink(spark.createDataFrame([(None, "nokey"), (1, "one")], _SCHEMA), 0)
    sink(spark.createDataFrame([(None, "nokey"), (2, "two")], _SCHEMA), 1)
    rows = [(r["doc_id"], r["text"]) for r in t.read(spark).collect()]
    assert sorted(rows, key=str) == [(1, "one"), (2, "two"), (None, "nokey")]


def test_map_typed_payload_still_ingests(spark, tmp_path):
    """Non-orderable payload columns (maps) dedup through the JSON-hash
    tiebreak instead of crashing the window sort."""
    t = TxLogTable(str(tmp_path / "docs"))
    sink = dedup_ingest_sink(t, "q", ["doc_id"])
    df = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"a": "y"}), (2, {"b": "z"})],
        "doc_id long, attrs map<string,string>",
    )
    sink(df, 0)
    assert sorted(r["doc_id"] for r in t.read(spark).collect()) == [1, 2]


def test_orderable_tie_with_map_difference_is_deterministic(spark, tmp_path):
    """Two rows that tie on EVERY orderable payload column but differ in
    a map column must resolve to the same winner on every partitioning —
    the JSON-hash tiebreak closes the value-level exactly-once gap that
    row_number over orderable columns alone leaves open."""
    schema = "doc_id long, text string, attrs map<string,string>"
    rows = [
        (1, "same", {"v": "first"}),
        (1, "same", {"v": "second"}),
        (2, "other", {"v": "x"}),
    ]
    winners = set()
    for i, n_parts in enumerate((1, 8)):
        t = TxLogTable(str(tmp_path / f"docs{i}"))
        sink = dedup_ingest_sink(t, "q", ["doc_id"])
        order = rows if i == 0 else list(reversed(rows))
        batch = spark.createDataFrame(order, schema).repartition(n_parts)
        sink(batch, 0)
        got = {r["doc_id"]: r["attrs"]["v"] for r in t.read(spark).collect()}
        assert set(got) == {1, 2}
        winners.add(got[1])
    # same winner under both input orders and partitionings
    assert len(winners) == 1


def test_rn_payload_column_survives(spark, tmp_path):
    """A payload column literally named _rn must not be clobbered by the
    dedup tiebreak machinery."""
    t = TxLogTable(str(tmp_path / "docs"))
    sink = dedup_ingest_sink(t, "q", ["doc_id"])
    df = spark.createDataFrame(
        [(1, 77, "a"), (1, 99, "b")], "doc_id long, _rn long, text string"
    )
    sink(df, 0)
    row = t.read(spark).collect()[0]
    assert row["_rn"] == 77 and row["text"] == "a"  # least tuple wins


def test_streaming_materialized_view_via_change_feed(spark, tmp_path):
    """Streaming + CDF + IVM composed: each micro-batch appends to the
    txlog table, then brings a per-key rollup from the pre-batch to the
    post-batch snapshot using TxLogTable.changes deltas — a streaming
    materialized view with no full recompute anywhere. The maintained
    view must equal a from-scratch aggregate after every batch,
    including a crash-replayed batch (txn no-op => empty change feed =>
    view unchanged)."""
    from pyspark.sql import functions as F

    from weather_data_ingestion_gcp_spark.operators import incremental

    t = TxLogTable(str(tmp_path / "docs"))
    view = {"df": None}

    def full_recompute():
        return {
            r["k"]: (r["n"], r["total"])
            for r in t.read(spark)
            .groupBy(F.col("text").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.col("doc_id").cast("double")).alias("total"))
            .collect()
        }

    def sink(batch_df, batch_id):
        pre = t.version()
        t.append(batch_df, txn=("mv", int(batch_id)))
        post = t.version()
        ch = t.changes(spark, pre, post).select(
            F.col("text").alias("k"),
            F.col("doc_id").cast("double").alias("v"),
            "_change_type",
        )
        base = view["df"]
        if base is None:
            base = spark.createDataFrame(
                [], "k string, n long, total double"
            )
        # materialize the merged view (a real job would write it to its
        # own table; localCheckpoint keeps the test's lineage bounded)
        view["df"] = incremental.refresh_rollup(
            base, ch, ["k"], "v"
        ).localCheckpoint()

    sink(spark.createDataFrame([(1, "a"), (2, "b")], _SCHEMA), 0)
    assert {r["k"]: (r["n"], r["total"]) for r in view["df"].collect()} \
        == full_recompute()
    sink(spark.createDataFrame([(3, "a"), (4, "c")], _SCHEMA), 1)
    assert {r["k"]: (r["n"], r["total"]) for r in view["df"].collect()} \
        == full_recompute()
    # crash replay of batch 1: txn no-op, empty feed, view unchanged
    before = {r["k"]: (r["n"], r["total"]) for r in view["df"].collect()}
    sink(spark.createDataFrame([(3, "a"), (4, "c")], _SCHEMA), 1)
    after = {r["k"]: (r["n"], r["total"]) for r in view["df"].collect()}
    assert before == after == full_recompute()
