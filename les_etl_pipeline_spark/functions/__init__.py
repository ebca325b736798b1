"""Scalar function helpers shared across the query surface."""

from .rounding import hround  # noqa: F401
