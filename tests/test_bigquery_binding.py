"""BigQuery ``TableStorage`` binding contract test (SURVEY §2.1 S8).

No connector jar and no GCP credentials exist in this sandbox, so the
binding's EXACT Spark invocation chain — formats, options, modes — is
exercised against a registered Python data source implementing the small
subset of spark-bigquery-connector semantics the binding uses:

- ``option("table", "project.dataset.table")`` addressing,
- ``mode("append")`` with ``partitionField``/``partitionType=DAY``
  column partitioning (rows are physically routed to day partitions,
  as BigQuery does) or ``clusteredFields`` for non-date layouts,
- ``mode("overwrite")`` + ``datePartition=YYYYMMDD`` single-partition
  replace (the connector's documented partition-overwrite contract),
- schema-authoritative reads.

A fake ``bigquery.Client`` covers the DDL surface the connector lacks
(``get_table``, ``delete_table`` with ``$YYYYMMDD`` partition
decorators). The same WeatherWarehouse seam scenario the parquet and
txlog bindings pass runs unchanged on this binding.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

import pytest
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from weather_data_ingestion_gcp_spark.jobs import WeatherWarehouse
from weather_data_ingestion_gcp_spark.schemas import WEATHER_SCHEMA
from weather_data_ingestion_gcp_spark.sources.connectors import (
    BigQueryTableStorage,
)
from tests.conftest import hourly_rows


@dataclass
class _Commit(WriterCommitMessage):
    #: (partition_key, staged_file_path) pairs from one task
    files: list = field(default_factory=list)


class _Writer(DataSourceWriter):
    def __init__(self, root, options, schema: StructType, overwrite: bool):
        self.root = root
        self.table = options["table"]
        self.date_partition = options.get("datepartition")
        self.partition_field = options.get("partitionfield")
        self.schema = schema
        self.overwrite = overwrite
        self.stage = os.path.join(root, "_stage", uuid.uuid4().hex[:12])

    @staticmethod
    def _yyyymmdd(v) -> str:
        return str(v).replace("-", "")

    def write(self, it):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        groups: dict[str, list] = {}
        for row in it:
            d = row.asDict(recursive=True)
            if self.date_partition:  # single-partition overwrite write
                key = self.date_partition
            elif self.partition_field:  # DAY column partitioning
                key = self._yyyymmdd(d[self.partition_field])
            else:  # unpartitioned / clustered-only table
                key = "all"
            groups.setdefault(key, []).append(d)
        os.makedirs(self.stage, exist_ok=True)
        out = []
        for key, dicts in groups.items():
            path = os.path.join(self.stage, f"{key}-{uuid.uuid4().hex[:8]}.parquet")
            pq.write_table(pa.Table.from_pylist(dicts, schema=arrow_schema), path)
            out.append((key, path))
        return _Commit(files=out)

    def commit(self, messages):
        tdir = os.path.join(self.root, self.table)
        os.makedirs(tdir, exist_ok=True)
        if self.overwrite:
            if self.date_partition:  # replace exactly one day partition
                shutil.rmtree(
                    os.path.join(tdir, f"p={self.date_partition}"),
                    ignore_errors=True,
                )
            else:  # whole-table overwrite
                for name in os.listdir(tdir):
                    if name.startswith("p="):
                        shutil.rmtree(os.path.join(tdir, name))
        for m in messages:
            for key, path in m.files:
                pdir = os.path.join(tdir, f"p={key}")
                os.makedirs(pdir, exist_ok=True)
                shutil.move(path, os.path.join(pdir, os.path.basename(path)))
        with open(os.path.join(tdir, "_schema.json"), "w") as f:
            json.dump(self.schema.jsonValue(), f)
        shutil.rmtree(os.path.dirname(self.stage), ignore_errors=True)

    def abort(self, messages):
        shutil.rmtree(os.path.dirname(self.stage), ignore_errors=True)


class _Reader(DataSourceReader):
    def __init__(self, root, options, schema: StructType):
        self.tdir = os.path.join(root, options["table"])
        self.schema = schema

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        expected = to_arrow_schema(self.schema)
        for name in sorted(os.listdir(self.tdir)):
            pdir = os.path.join(self.tdir, name)
            if not name.startswith("p=") or not os.path.isdir(pdir):
                continue
            for fn in sorted(os.listdir(pdir)):
                if fn.endswith(".parquet"):
                    t = pq.read_table(os.path.join(pdir, fn))
                    t = t.select(expected.names).cast(expected)
                    yield from t.to_batches()


def make_fake_bigquery_datasource(root: str):
    """Build the registrable stand-in class with the storage root baked
    in (the class is pickled to Python workers at registration, so the
    root must be a class attribute, not late-bound module state)."""

    class FakeBigQueryDataSource(DataSource):
        ROOT = root

        @classmethod
        def name(cls):
            return "fakebigquery"

        def schema(self):
            sp = os.path.join(self.ROOT, self.options["table"], "_schema.json")
            with open(sp) as f:  # missing table -> raises, like the connector
                return StructType.fromJson(json.load(f))

        def reader(self, schema):
            return _Reader(self.ROOT, self.options, schema)

        def writer(self, schema, overwrite):
            return _Writer(self.ROOT, self.options, schema, overwrite)

    return FakeBigQueryDataSource


class FakeBigQueryClient:
    """get_table / delete_table with $YYYYMMDD decorators — the two
    calls the binding makes on google.cloud.bigquery.Client."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, ref: str) -> str:
        if "$" in ref:
            base, dp = ref.split("$", 1)
            return os.path.join(self.root, base, f"p={dp}")
        return os.path.join(self.root, ref)

    def get_table(self, ref: str):
        if not os.path.isdir(self._dir(ref)):
            raise KeyError(f"Not found: {ref}")
        return ref

    def delete_table(self, ref: str):
        d = self._dir(ref)
        if not os.path.isdir(d):
            raise KeyError(f"Not found: {ref}")
        shutil.rmtree(d)


@pytest.fixture()
def bq_storage(spark, tmp_path):
    import sys

    from pyspark import cloudpickle

    # the stand-in classes live in this test module, which Python workers
    # cannot import — serialize them by value instead of by reference
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    root = str(tmp_path / "bq")
    os.makedirs(root)
    spark.dataSource.register(make_fake_bigquery_datasource(root))
    client = FakeBigQueryClient(root)
    return BigQueryTableStorage(
        spark, "proj", "ds", format_name="fakebigquery", client=client
    ), root


def test_warehouse_runs_on_bigquery_binding(spark, tmp_path, bq_storage):
    """The same WeatherWarehouse jobs code runs against the BigQuery
    binding — the seam contract the parquet and txlog bindings pass."""
    storage, root = bq_storage
    wh = WeatherWarehouse(spark, str(tmp_path / "wh"), storage=storage)
    batch = spark.createDataFrame(hourly_rows(days=2), WEATHER_SCHEMA)
    wh.load_and_transform(batch)
    assert wh.read_daily().count() == 2
    # idempotent re-run: overwrite_partitions replaces the same days via
    # datePartition single-partition overwrites — no duplicates anywhere
    wh.load_and_transform(batch)
    assert wh.read_daily().count() == 2
    assert wh.read_hourly().count() == len(hourly_rows(days=2)) * 2
    # hourly is append-only (WRITE_APPEND, Load-gcs-to-bq/main.py:77):
    # re-ingest doubles it, exactly as on the parquet binding
    # retention: partition-decorator deletes through the client
    days = sorted({r["dt"] for r in hourly_rows(days=2)})
    dropped = wh.cleanup_hourly(
        retention_days=0, today=days[-1] + dt.timedelta(days=1)
    )
    assert sorted(dropped) == [str(d) for d in days]
    assert wh.read_hourly().count() == 0


def test_bigquery_binding_partition_routing(spark, bq_storage):
    """Day rows land in day partitions (partitionField DAY), and a
    datePartition overwrite replaces exactly one day."""
    storage, root = bq_storage
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1)), (2, dt.date(2024, 1, 2))],
        "id bigint, dt date",
    )
    storage.append(df, "t", ["dt"])
    tdir = os.path.join(root, "proj.ds.t")
    assert sorted(
        n for n in os.listdir(tdir) if n.startswith("p=")
    ) == ["p=20240101", "p=20240102"]
    # replace day 1 only
    repl = spark.createDataFrame([(10, dt.date(2024, 1, 1))], "id bigint, dt date")
    storage.overwrite_partitions(repl, "t", ["dt"])
    rows = {(r["id"], str(r["dt"])) for r in storage.read(spark, "t").collect()}
    assert rows == {(10, "2024-01-01"), (2, "2024-01-02")}
    # drop_partition = partition decorator delete via the client
    assert storage.drop_partition("t", "dt=2024-01-02") is True
    assert storage.drop_partition("t", "dt=2024-01-02") is False
    assert {r["id"] for r in storage.read(spark, "t").collect()} == {10}


def test_bigquery_binding_edges(spark, bq_storage):
    storage, root = bq_storage
    # partition decorator values must be DAY-shaped
    with pytest.raises(ValueError, match="DAY partition"):
        storage._yyyymmdd("not-a-day")
    assert storage._yyyymmdd(dt.date(2024, 1, 2)) == "20240102"
    assert storage._yyyymmdd("2024-01-02") == "20240102"
    # exists: client probe is authoritative
    assert storage.exists("never_written") is False
    df = spark.createDataFrame([(1, dt.date(2024, 1, 1))], "id bigint, dt date")
    storage.append(df, "edge_t", ["dt"])
    assert storage.exists("edge_t") is True
    # without a client, exists falls back to a read probe
    from weather_data_ingestion_gcp_spark.sources.connectors import (
        BigQueryTableStorage,
    )

    clientless = BigQueryTableStorage(
        spark, "proj", "ds", format_name="fakebigquery", client=None
    )
    assert clientless.exists("edge_t") is True
    assert clientless.exists("never_written") is False
    with pytest.raises(NotImplementedError):
        clientless.drop_partition("edge_t", "dt=2024-01-01")
    # non-date partition layouts route to clustering (append works, lands
    # under the unpartitioned key, still readable)
    logs = spark.createDataFrame([("x", "y", 1)], "a string, b string, v bigint")
    storage.append(logs, "logs_t", ["a", "b"])
    assert storage.read(spark, "logs_t").count() == 1


def test_bigquery_exists_surfaces_transient_errors(spark, bq_storage):
    """A transient client failure must RAISE, never read as 'table
    absent' — exists() feeding overwrite_partitions would otherwise
    silently append instead of replace, duplicating every day in the
    batch."""
    storage, root = bq_storage

    class FlakyClient:
        def get_table(self, ref):
            raise RuntimeError("503 Service Unavailable")

    from weather_data_ingestion_gcp_spark.sources.connectors import (
        BigQueryTableStorage,
    )

    flaky = BigQueryTableStorage(
        spark, "proj", "ds", format_name="fakebigquery", client=FlakyClient()
    )
    with pytest.raises(RuntimeError, match="503"):
        flaky.exists("t")
    df = spark.createDataFrame([(1, dt.date(2024, 1, 1))], "id bigint, dt date")
    with pytest.raises(RuntimeError, match="503"):
        flaky.overwrite_partitions(df, "t", ["dt"])
    # absence-shaped errors still read as absent
    assert storage.exists("definitely_missing") is False


def test_bigquery_overwrite_refuses_undoable_layouts(spark, bq_storage):
    """Layouts BigQuery cannot partition-replace fail LOUDLY (the
    parquet/txlog bindings can replace them; a silent append here would
    duplicate rows)."""
    storage, root = bq_storage
    logs = spark.createDataFrame([("x", "y", 1)], "a string, b string, v bigint")
    with pytest.raises(NotImplementedError, match="DAY-partitioned"):
        storage.overwrite_partitions(logs, "logs_nd", ["a", "b"])
    # NULL day values cannot be addressed by a datePartition replace
    storage.append(
        spark.createDataFrame([(1, dt.date(2024, 1, 1))], "id bigint, dt date"),
        "t_null", ["dt"],
    )
    withnull = spark.createDataFrame(
        [(2, dt.date(2024, 1, 1)), (3, None)], "id bigint, dt date"
    )
    with pytest.raises(ValueError, match="NULL"):
        storage.overwrite_partitions(withnull, "t_null", ["dt"])


def test_bigquery_daily_layout_keeps_leading_cluster_columns(spark, bq_storage):
    """partition_by=['part_month','dt'] must not silently drop the
    month column from the layout: dt becomes the DAY partition and the
    leading columns become clustered fields."""
    storage, root = bq_storage

    captured = {}
    real_writer = storage._writer

    def capturing_writer(df, table):
        w = real_writer(df, table)
        orig_option = w.option

        def option(k, v):
            captured[k] = v
            return orig_option(k, v)

        w.option = option
        return w

    storage._writer = capturing_writer
    df = spark.createDataFrame(
        [("2024-01", dt.date(2024, 1, 1), 1)],
        "part_month string, dt date, v bigint",
    )
    storage.append(df, "daily_t", ["part_month", "dt"])
    assert captured.get("partitionField") == "dt"
    assert captured.get("clusteredFields") == "part_month"
