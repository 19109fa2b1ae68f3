"""Substrate equivalence: the reference's full daily cycle — land hourly
NDJSON -> streaming load -> daily rollup -> op logs -> retention ->
compaction — run END TO END on both storage bindings (partitioned
parquet and the transaction-log table), producing identical warehouse
contents. This is the architectural claim of SURVEY §2.1 substrate
replacement made executable: the jobs layer is substrate-blind, and the
txlog binding adds row-grained semantics without changing a single
result."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_data_ingestion_gcp_spark.jobs import WeatherWarehouse
from weather_data_ingestion_gcp_spark.schemas import WEATHER_SCHEMA
from weather_data_ingestion_gcp_spark.sources.landing import write_landing_file
from weather_data_ingestion_gcp_spark.sources.txlog import TxLogTableStorage
from weather_data_ingestion_gcp_spark.streaming.pipeline import run_landing_stream
from tests.conftest import hourly_rows


def _run_cycle(spark, base, storage=None):
    landing = str(base / "landing")
    wh = WeatherWarehouse(spark, str(base / "wh"), storage=storage)
    rows = hourly_rows(days=3)
    df = spark.createDataFrame(rows, WEATHER_SCHEMA)
    for i, day in enumerate(sorted({r["dt"] for r in rows})):
        write_landing_file(
            spark,
            df.filter(F.col("dt") == F.lit(day)),
            landing,
            stamp=f"2022070{i + 1}-23:00:05",
        )
    run_landing_stream(spark, landing, wh, str(base / "ckpt"))
    wh.log(log_type="bq-load-logging", message_type="success",
           process="cycle", message="done")
    days = sorted({r["dt"] for r in rows})
    dropped = wh.cleanup_hourly(
        retention_days=2, today=days[-1] + dt.timedelta(days=1)
    )
    return wh, sorted(dropped)


def _canon(df, keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_both_bindings_produce_identical_warehouse(spark, tmp_path):
    wh_pq, dropped_pq = _run_cycle(spark, tmp_path / "pq")
    wh_tx, dropped_tx = _run_cycle(
        spark, tmp_path / "tx",
        storage=TxLogTableStorage(spark, str(tmp_path / "tx" / "wh")),
    )
    # retention dropped the same days (partition drop vs row-level
    # delete): dt <= today - 2 is inclusive, so days 1 and 2 go
    assert dropped_pq == dropped_tx and len(dropped_pq) == 2
    # daily rollups identical column-for-column
    cols = sorted(set(wh_pq.read_daily().columns))
    assert _canon(wh_pq.read_daily(), cols) == _canon(wh_tx.read_daily(), cols)
    # surviving raw rows identical
    hcols = ["dt", "current_time"]
    assert _canon(wh_pq.read_hourly(), hcols) == _canon(wh_tx.read_hourly(), hcols)
    # both logged the cycle (stream batches also log)
    for wh in (wh_pq, wh_tx):
        assert wh.read_logs().filter("message_type = 'success'").count() >= 1
    # txlog extra: time travel still shows the pre-retention day count
    hourly = wh_tx.storage.table("hourly")
    # one delete commit per dropped day — step back over both
    pre_retention = hourly.version() - len(dropped_tx)
    assert (
        hourly.read(spark, version=pre_retention)
        .select("dt").distinct().count()
        == 3
    )
    # compaction on the txlog binding preserves contents
    n = hourly.read(spark).count()
    hourly.compact(spark, target_files=1)
    assert hourly.read(spark).count() == n
