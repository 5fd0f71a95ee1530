"""Scans and parsers (SURVEY.md §2.1)."""
