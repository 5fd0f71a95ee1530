"""Embedder stages (SURVEY.md §2.10 UD1-UD5)."""
