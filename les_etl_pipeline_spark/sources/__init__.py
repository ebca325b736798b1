"""Distributed sources: EDW CSV and XML ingest (SURVEY.md §2.1)."""
