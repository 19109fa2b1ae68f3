"""Sources/sinks: NDJSON landing zone (the GCS bucket analog) and readers."""

from .landing import ingest_once, read_landing, write_landing_file  # noqa: F401
