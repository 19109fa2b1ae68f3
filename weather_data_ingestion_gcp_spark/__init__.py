"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``indranil0602/weather-data-ingestion-gcp``
pipeline (hourly weather ingest -> daily rollup -> retention -> op logs),
re-expressed Spark-first (DataFrame / Spark SQL / Structured Streaming),
plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal column plumbing).

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults
- ``schemas``    : authoritative StructTypes (weather hourly, logs, events)
- ``operators/`` : the reference's operator inventory (SURVEY.md section 2)
- ``functions/`` : scalar expression helpers (P5-P12)
- ``sources/``   : batch/landing readers and partitioned sinks
- ``plans/``     : the query library exposed through __spark_entry__.py
- ``streaming/`` : Structured Streaming glue (file source + foreachBatch)
"""

__version__ = "0.1.0"
