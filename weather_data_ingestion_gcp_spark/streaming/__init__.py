"""Structured Streaming glue (SURVEY.md §2.7)."""

from .joins import clicks_within  # noqa: F401
from .pipeline import run_landing_stream, start_landing_stream  # noqa: F401
