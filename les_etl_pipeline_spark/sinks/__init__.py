"""Partitioned sinks and the run ledger (SURVEY.md §2.2)."""
