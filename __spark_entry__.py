"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship daily-rollup-shaped query on sf0.001 (the
  reference's GROUP BY dt multi-aggregate, sp_raw_to_transformed_create_
  weather_data_query.sql:26-55, transplanted onto the events table).
- ``queries()``: one entry per implemented operator family from
  SURVEY.md section 2 + the training-data-pipeline extensions.
- ``oracle_sql()``: DuckDB-equivalent SQL per query — every registered
  entry carries one as of round 12 (the streaming sink entry's converged
  output is SQL-expressible; its incremental-vs-batch equivalence leg is
  additionally raise_error-enforced inside the frame).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from weather_data_ingestion_gcp_spark.plans import ORACLE, QUERIES
from weather_data_ingestion_gcp_spark.session import apply_runtime_confs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return QUERIES["daily_rollup_events"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (tables pre-registered)."""
    return dict(ORACLE)
