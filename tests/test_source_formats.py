"""Source/sink format breadth: the engine reads and writes every format a
warehouse migration passes through (parquet is the native layout; CSV /
JSON / ORC round-trip losslessly for the reference's tabular types).
Partitioned variants must prune on read (the S10/S13 layout contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF}/nation.parquet")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip_lossless(spark, nation, tmp_path, fmt):
    dst = str(tmp_path / f"out_{fmt}")
    writer = nation.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(dst)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True).option("inferSchema", True)
    back = reader.load(dst)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # value-level: order-insensitive compare on the key + one text column
    want = sorted((r.n_nationkey, r.n_name) for r in nation.collect())
    got = sorted((int(r.n_nationkey), r.n_name) for r in back.collect())
    assert got == want


def test_partitioned_parquet_write_prunes_on_read(spark, tmp_path):
    e = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    dst = str(tmp_path / "orders_part")
    e.write.mode("overwrite").partitionBy("o_month").parquet(dst)
    one = spark.read.parquet(dst).where(F.col("o_month") == "1995-01")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_month" in plan
    assert one.count() == e.where(F.col("o_month") == "1995-01").count()


def test_csv_malformed_rows_routed_not_fatal(spark, tmp_path):
    """PERMISSIVE mode + columnNameOfCorruptRecord: bad rows land in the
    error-capture column instead of failing the load — the engine's P16
    error-routing behavior applied to file sources."""
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,2\n3\n4,5\n")  # row '3' is short
    df = (
        spark.read.option("header", True)
        .schema("a INT, b INT, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt is not None]
    assert len(bad) == 1 and bad[0].a == 3 and bad[0].b is None
