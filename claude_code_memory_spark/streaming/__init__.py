"""Structured Streaming paths (SURVEY.md §2.9 ST1-ST8)."""
