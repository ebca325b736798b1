"""LLM-data-pipeline operators (BASELINE.json north star): deduplication,
similarity search, text analysis — populated incrementally."""

from __future__ import annotations

from .registry import register  # noqa: F401
