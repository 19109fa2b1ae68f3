"""Structured Streaming glue (SURVEY.md §2.7)."""

from .pipeline import run_landing_stream, start_landing_stream  # noqa: F401
