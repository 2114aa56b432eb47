"""Utilities: profiling/observability (SURVEY.md §5)."""
