"""Operator library — one module per family in SURVEY.md section 2."""
